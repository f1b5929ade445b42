"""A/B the DAM head's non-conv overhead (VERDICT r4 #3, PERF.md §2).

The r4 bisection named the DAM head the top sink (102.6 ms of the 266 ms
fused forward at 8x1024^2) and hypothesized the overhead lives in its
non-conv full-res traffic: the BN affines (whose scales are runtime
parameters XLA cannot fold into the conv weights), the revAttention gate
multiplies on 64-channel tensors, and the residual adds. This harness
measures each candidate fix in isolation on the real chip:

  convbn    : conv3x3 64->64 alone vs conv+BN-affine+relu vs the affine
              PRE-FOLDED into the kernel (scale*k, offset as bias) — does
              XLA fuse the affine, and does folding matter?
  gate      : conv1x1(x * (1+sigmoid(q))) as written vs the commuted form
              (1+sigmoid(q)) * conv1x1_nobias(x) + b — the gate is a
              per-pixel SCALAR, so it commutes through the channel matmul
              exactly; commuting moves the full-res multiply from the
              64-ch input (1.07 GB at 8x1024^2 bf16) to the 9-ch output.
  head      : the full DAMHead as-is vs with both rewrites applied.

Methodology (PERF.md §5b): every timing is an in-jit program returning ONE
reduced scalar; dispatch floor subtracted; medians over iters.

Run:  python experiments/dam_head_ab.py  (on the TPU box)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=10, floor_s=0.0):
    import jax
    import jax.numpy as jnp

    def reduced(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    red = jax.jit(reduced)
    float(jax.device_get(red(*args)))  # compile
    ts = []
    for _ in range(iters):
        t0 = time.time()
        float(jax.device_get(red(*args)))
        ts.append(time.time() - t0)
    return max(float(np.median(ts)) - floor_s, 0.0) * 1e3


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "experiments", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import bench

    floor_s = bench.measure_dispatch_floor()
    print(f"dispatch floor: {floor_s * 1e3:.1f} ms")

    B, H, W = 8, 1024, 1024
    rng = np.random.RandomState(0)
    x64 = jnp.asarray(rng.rand(B, H, W, 64), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.float32)
    scale = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    offset = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)

    dn = ("NHWC", "HWIO", "NHWC")

    def conv_alone(x, k):
        return jax.lax.conv_general_dilated(
            x, k.astype(jnp.bfloat16), (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def conv_bn_relu(x, k, s, o):
        y = jax.lax.conv_general_dilated(
            x, k.astype(jnp.bfloat16), (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        return jnp.maximum(y * s + o, 0.0).astype(jnp.bfloat16)

    def conv_folded(x, k, s, o):
        y = jax.lax.conv_general_dilated(
            x, (k * s).astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        return jnp.maximum(y + o, 0.0).astype(jnp.bfloat16)

    print("== convbn (8x1024^2, 64->64 bf16) ==")
    t_a = timed(conv_alone, x64, k, floor_s=floor_s)
    t_b = timed(conv_bn_relu, x64, k, scale, offset, floor_s=floor_s)
    t_f = timed(conv_folded, x64, k, scale, offset, floor_s=floor_s)
    print(f"conv alone        {t_a:7.2f} ms")
    print(f"conv+affine+relu  {t_b:7.2f} ms  (+{t_b - t_a:.2f})")
    print(f"affine pre-folded {t_f:7.2f} ms  (+{t_f - t_a:.2f})")

    # --- gate commute -------------------------------------------------
    q = jnp.asarray(rng.randn(B, H, W, 1), jnp.float32)
    k9 = jnp.asarray(rng.randn(1, 1, 64, 9) * 0.05, jnp.float32)
    b9 = jnp.asarray(rng.randn(9) * 0.1, jnp.float32)

    def gate_as_written(x, q, k9, b9):
        g = 1.0 + jax.nn.sigmoid(q)
        feat = x * g.astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            feat, k9.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        return y + b9

    def gate_commuted(x, q, k9, b9):
        g = 1.0 + jax.nn.sigmoid(q)
        y = jax.lax.conv_general_dilated(
            x, k9.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        return y * g + b9

    print("== revAttention gate + 1x1 projection (64->9) ==")
    t_w = timed(gate_as_written, x64, q, k9, b9, floor_s=floor_s)
    t_c = timed(gate_commuted, x64, q, k9, b9, floor_s=floor_s)
    print(f"as written  {t_w:7.2f} ms")
    print(f"commuted    {t_c:7.2f} ms  ({t_w / max(t_c, 1e-9):.2f}x)")
    a = gate_as_written(x64, q, k9, b9)
    c = gate_commuted(x64, q, k9, b9)
    err = float(jnp.max(jnp.abs(a - c)))
    print(f"max |as_written - commuted| = {err:.5f} (bf16 rounding only)")

    # --- full head ----------------------------------------------------
    from cdnet_tpu.models import layers as L

    x16 = jnp.asarray(rng.rand(B, H, W, 16), jnp.bfloat16)

    head = L.DAMHead(out_c=3, direction_classes=9)
    v = head.init(jax.random.PRNGKey(0), x16[:1, :8, :8, :])

    def head_fn(v, x):
        return head.apply(v, x, train=False)

    print("== full DAMHead (8x1024^2, 16-ch input) ==")
    for mode in ("as-is",):
        t = timed(head_fn, v, x16, iters=8, floor_s=floor_s)
        print(f"head {mode:12s} {t:7.2f} ms")


if __name__ == "__main__":
    main()
