"""Layout A/B: is HRNet branch-0's cost lane padding + per-conv relayouts?

Hypothesis (r5): an (8,1024,1024,18) bf16 tensor is physically ~7x its
logical bytes on TPU (18 of 128 lanes), so (a) every elementwise op on
branch-0 moves 2.1 GB instead of 300 MB, and (b) each packed conv's
pack/unpack reshape is a physical relayout between differently-padded
layouts, not a free bitcast. If true, keeping branch 0 packed ACROSS convs
(models/hrnet.py persistent-packed path) pays the relayout zero times
instead of 2x per conv.

Measures (in-jit reduced scalar, floor-subtracted, TPU v5e):
  1. relu on (8,1024,1024,18) vs its packed (8,1024,256,72) twin
  2. chain of 4 18->18 ConvBN-style convs: per-conv pack/unpack
     (packed_conv3x3_affine_act) vs persistent packed (packed_conv3x3_pre)
  3. transition1 shape 256->18 @ full res: native XLA vs fully-packed (4x
     MACs) vs dense-to-packed (2x MACs, (3,6) kernel stride (1,4))
  4. stride-2 18->36 @ full res (fusion downsample): native XLA vs
     packed-input stride-2 kernel
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from cdnet_tpu.ops import packed_conv as pc

    floor_s = bench.measure_dispatch_floor()
    print(f"floor {floor_s * 1e3:.1f} ms")

    def timed(fn, *args, iters=10):
        def reduced(*a):
            return jnp.sum(fn(*a).astype(jnp.float32))
        red = jax.jit(reduced)
        float(jax.device_get(red(*args)))
        t0 = time.time()
        for _ in range(iters):
            float(jax.device_get(red(*args)))
        return max((time.time() - t0) / iters - floor_s, 0.0) * 1e3

    rng = np.random.RandomState(0)
    B, H, W, C = 8, 1024, 1024, 18
    s = 4
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    xp = pc.pack(x, s)
    xp = jax.device_put(np.asarray(xp))  # materialize packed layout

    # --- 1. elementwise traffic
    t_relu_d = timed(lambda a: jnp.maximum(a, 0), x)
    t_relu_p = timed(lambda a: jnp.maximum(a, 0), xp)
    print(f"relu dense18 {t_relu_d:.2f} ms | packed72 {t_relu_p:.2f} ms")

    # --- 2. conv chain: pack/unpack each vs persistent
    ks = [jnp.asarray(rng.randn(3, 3, C, C), jnp.float32) * 0.2
          for _ in range(4)]
    sc = jnp.ones((C,), jnp.float32)
    of = jnp.zeros((C,), jnp.float32)

    def chain_roundtrip(a):
        for k in ks:
            a = pc.packed_conv3x3_affine_act(a, k, sc, of, relu=True, s=s)
        return a

    def chain_persistent(ap):
        for k in ks:
            ap = pc.packed_conv3x3_pre(ap, k, sc, of, relu=True, s=s)
        return ap

    t_rt = timed(chain_roundtrip, x)
    t_pp = timed(chain_persistent, xp)
    print(f"4-conv chain: roundtrip {t_rt:.2f} ms | persistent {t_pp:.2f} ms"
          f" ({t_rt / max(t_pp, 1e-9):.2f}x)")

    # --- 3. transition 256->18 @ full res
    cin = 256
    xt = jnp.asarray(rng.randn(B, H, W, cin), jnp.bfloat16)
    kt = jnp.asarray(rng.randn(3, 3, cin, C), jnp.float32) * 0.05

    def t_native(a):
        return jax.lax.conv_general_dilated(
            a, kt.astype(a.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(a.dtype)

    t_nat = timed(t_native, xt)
    t_full = timed(lambda a: pc.packed_conv3x3_affine_act(
        a, kt, sc, of, relu=True, s=s), xt)
    t_d2p = timed(lambda a: pc.dense_to_packed_conv3x3(
        a, kt, sc, of, relu=True, s=s), xt)
    print(f"trans 256->18: native {t_nat:.2f} | packed4x {t_full:.2f} | "
          f"dense->packed2x {t_d2p:.2f} ms")

    # --- 4. stride-2 18->36 @ full res
    k2 = jnp.asarray(rng.randn(3, 3, C, 36), jnp.float32) * 0.2
    sc36 = jnp.ones((36,), jnp.float32)
    of36 = jnp.zeros((36,), jnp.float32)

    def s2_native(a):
        return jax.lax.conv_general_dilated(
            a, k2.astype(a.dtype), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(a.dtype)

    t_s2n = timed(s2_native, x)
    t_s2p = timed(lambda a: pc.packed_conv3x3_s2(
        a, k2, sc36, of36, relu=False, s=s), xp)
    print(f"s2 18->36: native {t_s2n:.2f} | packed-in {t_s2p:.2f} ms")


if __name__ == "__main__":
    main()
