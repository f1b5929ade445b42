"""conv3x3(bilinear_upsample_s(x)) computed entirely at LOW resolution.

HRNet's DAM head consumes `concat([x0, up(x1), up(x2), up(x3)])` at branch-0
resolution (`/root/reference/models/dam/seg_hrnet_rev1.py:527-533`); the
split ResidualUnit (models/layers.py) already avoids the 270-channel concat
by splitting the 3x3 conv along Cin, but each branch's partial still runs as
`conv3x3(upsample(x_j))`: materialize a (8,1024,1024,C_j) bf16 upsample
(0.6-2.4 GB per branch), then convolve it with only 64 output lanes at full
resolution.

Both steps are linear, so they compose into ONE low-resolution conv: with
integer scale s and half-pixel centers, bilinear interpolation weights are
periodic in the output index with period s (ops/upsample.py), and a 3x3 conv
tap at full-res offset d lands in low-res cell (p+d)//s at phase (p+d) mod s
— always within one cell of the center. The composite

    conv3x3_SAME(up_s(x)) == depth_to_space_s( conv3x3(x, K_comp) )

uses a composite kernel K_comp of shape (3, 3, Cin, s*s*Cout):

    K_comp[u, v, ci, (py, px, co)] =
        sum_{dy,dx} A_s[py, dy, u] * A_s[px, dx, v] * W[dy, dx, ci, co]

where A_s[p, d, u] is the weight of low-res cell offset u in the bilinear
sample at full-res phase p + d.  Executed MACs are IDENTICAL to the full-res
conv (9*Cin*Cout*H*W), but the conv runs with s^2*Cout dense output lanes
(256/1024/4096 for s=2/4/8) on an s^2-times-smaller spatial grid, and the
upsampled input never exists.

Boundary: the interior composite assumes bilinear values extend past the
image, which is wrong on two counts at the border — bilinear CLAMPS its
source coordinate at the edge, and the full-res conv zero-pads at the
full-res boundary. Both are restored exactly by recomputing the outermost
s full-res rows/cols through the direct path on 3-cell slabs (tiny), which
reproduces the true semantics including corners.

Used by models/layers.py::_split_conv3x3_bn_relu (the HRNet head merge);
f32 parity vs conv3x3(upsample(x)) is pinned in tests/test_models.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cdnet_tpu.ops.upsample import _phase_taps, upsample_bilinear_int


@functools.lru_cache(maxsize=None)
def _axis_matrix(s: int) -> np.ndarray:
    """A[p, d, u]: weight of low-res cell offset u-1 in the bilinear sample
    at full-res position s*i + p + (d-1), interior (un-clamped) semantics."""
    taps = _phase_taps(s)
    a = np.zeros((s, 3, 3), np.float32)
    for p in range(s):
        for d in (-1, 0, 1):
            q = p + d
            v, qp = q // s, q % s
            lo, wl, wr = taps[qp]
            a[p, d + 1, v + lo + 1] += wl
            a[p, d + 1, v + lo + 2] += wr
    return a


def composite_upconv_kernel(kernel: jnp.ndarray, s: int) -> jnp.ndarray:
    """(3,3,cin,cout) HWIO -> (3,3,cin,s*s*cout) composite kernel such that
    conv(x, K)[i,j] holds all s*s full-res outputs of cell (i,j)."""
    a = jnp.asarray(_axis_matrix(s))  # (s, 3, 3): [phase, tap d, cell u]
    kf = kernel.astype(jnp.float32)   # (dy, dx, cin, cout)
    k = jnp.einsum("pdu,qev,decf->uvcpqf", a, a, kf)
    s2 = s * s
    cin, cout = kernel.shape[2], kernel.shape[3]
    return k.reshape(3, 3, cin, s2 * cout)


def _depth_to_space(y: jnp.ndarray, s: int, cout: int) -> jnp.ndarray:
    b, h, w, _ = y.shape
    y = y.reshape(b, h, w, s, s, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(b, h * s, w * s, cout)


def _border_rows(x, kernel, s, top: bool):
    """True full-res output rows [0,s) (or [H-s,H)), all columns: direct
    path on a 3-cell slab. Exact incl. bilinear clamp + conv zero-pad."""
    dt = x.dtype
    slab = x[:, :3] if top else x[:, -3:]
    up = upsample_bilinear_int(slab, s, s)          # (B, 3s, W*s, C)
    # conv rows VALID over [zero, up rows 0..s] (top) — row r reads
    # up[r-1..r+1] with up[-1] == 0 (the conv's zero pad at the image edge)
    if top:
        rows = up[:, :s + 1]
        rows = jnp.concatenate([jnp.zeros_like(rows[:, :1]), rows], axis=1)
    else:
        rows = up[:, -(s + 1):]
        rows = jnp.concatenate([rows, jnp.zeros_like(rows[:, :1])], axis=1)
    return jax.lax.conv_general_dilated(
        rows, kernel.astype(dt), (1, 1), [(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dt)


def _border_cols(x, kernel, s, left: bool):
    """True full-res output cols [0,s) (or [W-s,W)), all rows."""
    dt = x.dtype
    slab = x[:, :, :3] if left else x[:, :, -3:]
    up = upsample_bilinear_int(slab, s, s)          # (B, H*s, 3s, C)
    if left:
        cols = up[:, :, :s + 1]
        cols = jnp.concatenate([jnp.zeros_like(cols[:, :, :1]), cols], axis=2)
    else:
        cols = up[:, :, -(s + 1):]
        cols = jnp.concatenate([cols, jnp.zeros_like(cols[:, :, :1])], axis=2)
    return jax.lax.conv_general_dilated(
        cols, kernel.astype(dt), (1, 1), [(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dt)


def conv3x3_of_upsampled(x: jnp.ndarray, kernel: jnp.ndarray,
                         s: int) -> jnp.ndarray:
    """conv3x3_SAME(upsample_bilinear_int(x, s, s), kernel) without ever
    materializing the upsample. x: (B,h,w,Cin); kernel: (3,3,Cin,Cout);
    returns (B, h*s, w*s, Cout) in x.dtype (f32 accumulation inside)."""
    if s == 1:
        return jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
    dt = x.dtype
    cout = kernel.shape[3]
    kc = composite_upconv_kernel(kernel, s).astype(dt)
    y = jax.lax.conv_general_dilated(
        x, kc, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dt)
    y = _depth_to_space(y, s, cout)
    # restore true border semantics (module docstring)
    y = y.at[:, :s].set(_border_rows(x, kernel, s, True))
    y = y.at[:, -s:].set(_border_rows(x, kernel, s, False))
    y = y.at[:, :, :s].set(_border_cols(x, kernel, s, True))
    y = y.at[:, :, -s:].set(_border_cols(x, kernel, s, False))
    return y
