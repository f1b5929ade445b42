"""A/B: supertile-PACKED dense conv (pure XLA) vs native XLA conv vs the
Pallas supertile kernel, at the shapes that carry HRNet/DAM FLOPs.

Idea: a stride-1 SAME 3x3 conv with small Cout leaves the MXU lane-starved
(N=Cout lanes). Re-layout width into channels — x (N,H,W,C) -> packed
(N,H,W/s,s*C), a FREE row-major bitcast — and the conv becomes a dense 3x3
conv with Cin'=s*cin, Cout'=s*cout (full K/N occupancy) whose kernel is
structured-zero: output slot p tap dj reads input phase q = p+dj' (within
|dj'|<=1), supertile shift v = floor((p+dj')/s). Executed MACs = s x the
true conv, but at near-peak MXU rate: effective ~ rate(s*cin -> s*cout)/s,
vs XLA's native rate at Cout lanes. For Cout=18 (HRNet branch-0,
seg_hrnet_rev1.py:292-325) XLA native is 2.4 TF/s — packed should land
~10x that even after the s=7 overhead.

Run on the TPU box: python experiments/packed_conv_ab.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def packed_kernel(kernel: np.ndarray, s: int) -> np.ndarray:
    """(3,3,cin,cout) HWIO -> (3,3,s*cin,s*cout) structured-dense kernel.

    Packed output column u slot p (absolute col c=u*s+p) tap at absolute
    col c+dj, dj in {-1,0,1}: input phase q=(p+dj) mod s lives in packed
    column u+v with v=floor((p+dj)/s). For v in {-1,0,1} the packed 3x3
    kernel position (di, v+1) gets W[di, dj+1] at block (q*cin, p*cout).
    """
    _, _, cin, cout = kernel.shape
    out = np.zeros((3, 3, s * cin, s * cout), kernel.dtype)
    for p in range(s):
        for dj in (-1, 0, 1):
            q, v = (p + dj) % s, (p + dj) // s
            out[:, v + 1, q * cin:(q + 1) * cin, p * cout:(p + 1) * cout] \
                = kernel[:, dj + 1]
    return out


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "experiments", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    def timed(fn, *args, iters=8):
        red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        float(red(*args))  # compile
        t0 = time.time()
        for _ in range(iters):
            r = red(*args)
        float(r)
        return (time.time() - t0) / iters

    # (label, B, H, W, cin, cout, s list)
    cases = [
        ("hr18 1024^2 18->18", 8, 1024, 1024, 18, 18, (2, 4)),
        # tr1 256->18: packing multiplies cin-side MACs by s too — native
        # XLA (21.3 TF/s, K=256 already dense) is unbeatable there; a
        # packed attempt also OOM'd 16G HBM at the 1792-ch intermediate.
        ("hr36 512^2 36->36", 8, 512, 512, 36, 36, (3, 4)),
        ("dec16 1024^2 80->16", 8, 1024, 1024, 80, 16, (8,)),
        ("dam64 1024^2 64->64", 8, 1024, 1024, 64, 64, (2,)),
        ("dam270 1024^2 270->64", 8, 1024, 1024, 270, 64, (2,)),
    ]
    rng = np.random.RandomState(0)
    for label, b, h, w, cin, cout, ss in cases:
        x = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
        k = np.asarray(rng.randn(3, 3, cin, cout) * 0.05, np.float32)
        kb = jnp.asarray(k, jnp.bfloat16)
        tflop = 2 * 9 * b * h * w * cin * cout / 1e12
        t_xla = timed(conv, x, kb)
        print(f"{label:24s} xla    {t_xla*1e3:8.2f} ms "
              f"({tflop/t_xla:6.1f} TF/s)", flush=True)
        for s in ss:
            wp = -(-w // s) * s
            kp = jnp.asarray(packed_kernel(k, s), jnp.bfloat16)

            def packed(x, kp, s=s, wp=wp):
                xp = jnp.pad(x, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
                xp = xp.reshape(b, h, wp // s, s * cin)
                y = conv(xp, kp)
                return y.reshape(b, h, wp, cout)[:, :, :w]

            t_p = timed(packed, x, kp)
            # numerics check once per (case, s) — in-jit (eager calls
            # through the tunnel recompile per call, PERF.md §5b) and
            # reduced on device (full f32 maps would OOM the big cases)
            err = float(jax.jit(lambda x, kb, kp: jnp.max(jnp.abs(
                conv(x, kb).astype(jnp.float32)
                - packed(x, kp).astype(jnp.float32))))(x, kb, kp))
            print(f"{'':24s} s={s:<2d}   {t_p*1e3:8.2f} ms "
                  f"({tflop/t_p:6.1f} TF/s eff)  x{t_xla/t_p:4.2f}  "
                  f"max_err={err:.3g}", flush=True)


if __name__ == "__main__":
    main()
