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


def _shift1d(x: jnp.ndarray, axis: int, off: int) -> jnp.ndarray:
    """x[..., i + off, ...] with edge clamping (resize's coordinate clamp)."""
    if off == 0:
        return x
    n = x.shape[axis]
    idx = [slice(None)] * x.ndim
    if off > 0:
        idx[axis] = slice(off, None)
        body = x[tuple(idx)]
        idx[axis] = slice(n - 1, n)
        edge = x[tuple(idx)]
        reps = [1] * x.ndim
        reps[axis] = off
        return jnp.concatenate([body, jnp.tile(edge, reps)], axis=axis)
    idx[axis] = slice(None, off)
    body = x[tuple(idx)]
    idx[axis] = slice(0, 1)
    edge = x[tuple(idx)]
    reps = [1] * x.ndim
    reps[axis] = -off
    return jnp.concatenate([jnp.tile(edge, reps), body], axis=axis)


def upsample_bilinear_int(x: jnp.ndarray, sh: int, sw: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H*sh, W*sw, C), bilinear, half-pixel centers.

    Exactly jax.image.resize(x, (B, H*sh, W*sw, C), "bilinear") for integer
    sh, sw >= 1, as s^2 two-tap-per-axis phase blends + an interleaving
    reshape."""
    assert sh >= 1 and sw >= 1
    if sh == 1 and sw == 1:
        return x
    b, h, w, c = x.shape
    dt = x.dtype
    taps_h = _phase_taps(sh)
    taps_w = _phase_taps(sw)
    # Needed tap offsets per axis (at most {-1, 0} and {0, +1} appear).
    offs_h = sorted({o for t in taps_h for o in (t[0], t[0] + 1)})
    offs_w = sorted({o for t in taps_w for o in (t[0], t[0] + 1)})
    shifted = {(oh, ow): _shift1d(_shift1d(x, 1, oh), 2, ow)
               for oh in offs_h for ow in offs_w}
    # phases stacked as (B, H, sh, W, sw, C) then interleaved by reshape
    rows = []
    for lo_h, wl_h, wr_h in taps_h:
        cols = []
        for lo_w, wl_w, wr_w in taps_w:
            acc = None
            for oh, wh in ((lo_h, wl_h), (lo_h + 1, wr_h)):
                for ow, ww in ((lo_w, wl_w), (lo_w + 1, wr_w)):
                    wgt = wh * ww
                    if wgt == 0.0:
                        continue
                    term = shifted[(oh, ow)] * jnp.asarray(wgt, dt)
                    acc = term if acc is None else acc + term
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=3))        # (B, H, W, sw, C)
    y = jnp.stack(rows, axis=2)                     # (B, H, sh, W, sw, C)
    return y.reshape(b, h * sh, w * sw, c)


def resize_bilinear_fast(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize; integer upscales take the phase-blend path."""
    b, h0, w0, c = x.shape
    if h == h0 and w == w0:
        return x
    if h % h0 == 0 and w % w0 == 0:
        return upsample_bilinear_int(x, h // h0, w // w0)
    return jax.image.resize(x, (b, h, w, c), method="bilinear")
