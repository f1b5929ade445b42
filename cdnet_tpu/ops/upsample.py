"""Integer-factor bilinear upsampling as phase blends (no dots, no MXU).

``jax.image.resize(..., "bilinear")`` lowers on TPU to one dense dot per
spatial axis against an (in, out) interpolation matrix, preceded by the
relayouts that move each spatial axis into dot position. For HRNet's
branch-fusion exchanges (every module upsamples 2/4/8x back to branch-0
resolution — /root/reference/models/dam/seg_hrnet_rev1.py:249-268,
527-533) that is ~20 dots of 0.3-3 GFLOP each per forward plus their
transposes, competing with the trunk convs for the MXU
(experiments/roofline.py, ROOFLINE_MODEL=HRNet18_rev1).

For an INTEGER scale s with half-pixel centers (torch align_corners=False
== jax.image.resize semantics), the interpolation weights are periodic in
the output index with period s: output o = s*i + p samples source
coordinate i + (p + 0.5)/s - 0.5, a 2-tap blend whose weights depend only
on the phase p. So the whole resize is s*s fixed-weight blends of the
2x2-shifted input (pure VPU, fusable into neighbors) interleaved by a
reshape — one read of x, one write of the s^2-larger output, zero
transposes of the channel-minor NHWC layout.

Numerics: identical to jax.image.resize up to float associativity (the
unit test pins max-abs-diff on random tensors including the clamped
edges). Used by models/layers.py::resize_bilinear for integer upscales;
arbitrary ratios fall back to jax.image.resize.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _phase_taps(s: int) -> tuple[tuple[int, float, float], ...]:
    """Per-phase (left_tap_offset, w_left, w_right) for scale s.

    Output o = s*i + p reads source coordinate c = i + f_p with
    f_p = (p + 0.5)/s - 0.5 in (-0.5, 0.5): a blend of x[i + floor(f_p)]
    and x[i + floor(f_p) + 1] with right-weight frac(f_p)."""
    taps = []
    for p in range(s):
        f = (p + 0.5) / s - 0.5
        lo = int(np.floor(f))
        w_r = f - lo
        taps.append((lo, 1.0 - w_r, w_r))
    return tuple(taps)


def _upsample_axis(x: jnp.ndarray, axis: int, s: int) -> jnp.ndarray:
    """Upsample ONE spatial axis by integer s (bilinear, half-pixel
    centers, edge clamp). Phases come from SLICES of a single edge-padded
    copy (XLA fuses static slices into the blend arithmetic — the first
    implementation materialized each shifted copy via concatenate, which
    cost 9 full-tensor HBM round-trips for a 2D upsample: 17 ms for a 2x
    upsample of (8,512,512,64) bf16 vs ~4 ms this way), and the
    interleaving reshape is free because the phase axis sits immediately
    right of the upsampled axis in row-major order."""
    if s == 1:
        return x
    dt = x.dtype
    n = x.shape[axis]
    pads = [(0, 0)] * x.ndim
    pads[axis] = (1, 1)
    xp = jnp.pad(x, pads, mode="edge")

    def sl(off):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(1 + off, 1 + off + n)
        return xp[tuple(idx)]

    phases = []
    for lo, wl, wr in _phase_taps(s):
        if wr == 0.0:
            phases.append(sl(lo))
        elif wl == 0.0:
            phases.append(sl(lo + 1))
        else:
            phases.append(sl(lo) * jnp.asarray(wl, dt)
                          + sl(lo + 1) * jnp.asarray(wr, dt))
    y = jnp.stack(phases, axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = n * s
    return y.reshape(shape)


def upsample_bilinear_int(x: jnp.ndarray, sh: int, sw: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H*sh, W*sw, C), bilinear, half-pixel centers.

    Exactly jax.image.resize(x, (B, H*sh, W*sw, C), "bilinear") for integer
    sh, sw >= 1 (to float associativity): bilinear is separable, so the 2D
    upsample is two 1-axis phase-blend passes (W first — its interleave
    reshape is free in row-major — then H on the widened tensor)."""
    assert sh >= 1 and sw >= 1
    if sh == 1 and sw == 1:
        return x
    return _upsample_axis(_upsample_axis(x, 2, sw), 1, sh)


def resize_bilinear_fast(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize; integer upscales take the phase-blend path."""
    b, h0, w0, c = x.shape
    if h == h0 and w == w0:
        return x
    if h % h0 == 0 and w % w0 == 0:
        return upsample_bilinear_int(x, h // h0, w // w0)
    return jax.image.resize(x, (b, h, w, c), method="bilinear")
