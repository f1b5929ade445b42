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

from cdnet_tpu.ops.upsample import _phase_taps, _upsample_axis


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


def _edge_row_correction(x, kernel, s, top: bool):
    """What the ghost-padded composite over-adds on the outermost full-res
    output row: the conv's dy=+-1 tap reads the bilinear EXTENSION row
    (with edge-replicate ghosts, up_ext[-1] == up_w(x[first cell row]) —
    both bilinear taps hit the replicated value), where the true conv
    zero-pads. Returns (B, W_full, Cout) to subtract from row 0 (top) or
    H-1 (bottom)."""
    dt = x.dtype
    row = x[:, :1] if top else x[:, -1:]            # (B, 1, w, C)
    up_row = _upsample_axis(row, 2, s)              # (B, 1, W, C)
    up_row = jnp.pad(up_row, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    krow = kernel[:1] if top else kernel[2:]        # (1, 3, Cin, Cout)
    corr = jax.lax.conv_general_dilated(
        up_row, krow.astype(dt), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dt)
    return corr[:, 0]


def _edge_col_correction(x, kernel, s, left: bool):
    """Column analog of :func:`_edge_row_correction`: (B, H_full, Cout)."""
    dt = x.dtype
    col = x[:, :, :1] if left else x[:, :, -1:]     # (B, h, 1, C)
    up_col = _upsample_axis(col, 1, s)              # (B, H, 1, C)
    up_col = jnp.pad(up_col, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    kcol = kernel[:, :1] if left else kernel[:, 2:]  # (3, 1, Cin, Cout)
    corr = jax.lax.conv_general_dilated(
        up_col, kcol.astype(dt), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dt)
    return corr[:, :, 0]


def _depth_to_space_packed(y: jnp.ndarray, s: int, cout: int,
                           pack_s: int) -> jnp.ndarray:
    """(B,h,w,s*s*cout) composite output -> width-packed full-res
    (B, h*s, (w*s)/pack_s, pack_s*cout).

    Same transpose as :func:`_depth_to_space`; the trailing reshape
    regroups (w, s, cout) -> (w*s/pack_s, pack_s*cout) row-major — free
    for any s, pack_s with (w*s) % pack_s == 0 and (s % pack_s == 0 or
    pack_s % s == 0). Packed accumulation keeps the head-merge partials at
    dense lane occupancy ((B,1024,256,256) is 1.0 GB physical where the
    dense (B,1024,1024,64) twin is 2.0 GB lane-padded — the r5 OOM)."""
    b, h, w, _ = y.shape
    y = y.reshape(b, h, w, s, s, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))     # (b, h, s, w, s, cout)
    return y.reshape(b, h * s, (w * s) // pack_s, pack_s * cout)


def conv3x3_of_upsampled_packed(x: jnp.ndarray, kernel: jnp.ndarray,
                                s: int, pack_s: int):
    """Packed-output composite upconv WITHOUT border corrections.

    Returns (y_packed, corrections) where y_packed is
    (B, h*s, (w*s)/pack_s, pack_s*cout) and corrections is the tuple
    (top, bot, lef, rig, corner4) of ghost-extension terms the caller must
    subtract at the borders (see :func:`apply_border_corrections`).
    Corrections are ADDITIVE per branch, so a multi-branch sum can
    accumulate them separately and apply them ONCE on the summed map."""
    dt = x.dtype
    cout = kernel.shape[3]
    kc = composite_upconv_kernel(kernel, s).astype(dt)
    xg = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xg, kc, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dt)
    y = _depth_to_space_packed(y, s, cout, pack_s)
    top = _edge_row_correction(x, kernel, s, True)
    bot = _edge_row_correction(x, kernel, s, False)
    lef = _edge_col_correction(x, kernel, s, True)
    rig = _edge_col_correction(x, kernel, s, False)
    kf = kernel.astype(jnp.float32)
    corners = []
    for (ri, rk), (ci, ck) in (((0, 0), (0, 0)), ((0, 0), (-1, 2)),
                               ((-1, 2), (0, 0)), ((-1, 2), (-1, 2))):
        src = x[:, ri, ci].astype(jnp.float32)
        corners.append((src @ kf[rk, ck]).astype(dt))     # (B, Cout)
    return y, (top.astype(jnp.float32), bot.astype(jnp.float32),
               lef.astype(jnp.float32), rig.astype(jnp.float32),
               [c.astype(jnp.float32) for c in corners])


def apply_border_corrections_packed(y: jnp.ndarray, corr, cout: int,
                                    pack_s: int) -> jnp.ndarray:
    """Subtract summed ghost-extension border terms from a width-packed
    (B,H,W/S,S*cout) map: row terms reshape into packed layout for free;
    column terms live in the first/last PHASE block of the first/last
    packed cell (zero-padded into the channel dim), so every correction is
    one fused masked pass — no update-slices, no extra buffers."""
    top, bot, lef, rig, corners = corr
    dt = y.dtype
    b, hh, wc, sc = y.shape
    S = pack_s
    r = jax.lax.broadcasted_iota(jnp.int32, (1, hh, 1, 1), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wc, 1), 2)
    r0, rn = r == 0, r == hh - 1
    c0, cn = c == 0, c == wc - 1
    # (B, W, C) row terms -> packed (B, 1, W/S, S*C)
    topp = top.reshape(b, 1, wc, sc).astype(dt)
    botp = bot.reshape(b, 1, wc, sc).astype(dt)
    # (B, H, C) col terms -> phase block 0 of cell 0 / block S-1 of last
    lefp = jnp.pad(lef[:, :, None, :],
                   ((0, 0), (0, 0), (0, 0), (0, (S - 1) * cout))).astype(dt)
    rigp = jnp.pad(rig[:, :, None, :],
                   ((0, 0), (0, 0), (0, 0), ((S - 1) * cout, 0))).astype(dt)
    y = y - jnp.where(r0, topp, 0) - jnp.where(rn, botp, 0) \
          - jnp.where(c0, lefp, 0) - jnp.where(cn, rigp, 0)
    # corner add-backs (doubly-subtracted ghost corners)
    cpad = [(0, (S - 1) * cout), (0, (S - 1) * cout),
            ((S - 1) * cout, 0), ((S - 1) * cout, 0)]
    cmask = [r0 & c0, rn & c0, r0 & cn, rn & cn]
    order = [corners[0], corners[2], corners[1], corners[3]]
    for add, pad, m in zip(order, cpad, cmask):
        addp = jnp.pad(add[:, None, None, :],
                       ((0, 0), (0, 0), (0, 0), pad)).astype(dt)
        y = y + jnp.where(m, addp, 0)
    return y


def conv3x3_of_upsampled(x: jnp.ndarray, kernel: jnp.ndarray,
                         s: int) -> jnp.ndarray:
    """conv3x3_SAME(upsample_bilinear_int(x, s, s), kernel) without ever
    materializing the upsample. x: (B,h,w,Cin); kernel: (3,3,Cin,Cout);
    returns (B, h*s, w*s, Cout) in x.dtype (f32 accumulation inside).

    Border strategy: the input is padded with one edge-replicate ghost
    cell per side, which makes the bilinear CLAMP exact everywhere in the
    composite conv itself. The only residual error is the full-res conv's
    zero padding: on the outermost full-res row/col the dy/dx = +-1 taps
    must read zero, but the ghosted composite reads the bilinear extension
    (up_ext[-1] == up_w of the first cell row, since both bilinear taps
    land on the replicated value). Subtracting that extension's 1-D conv
    from the outermost row/col — with the doubly-removed corner term added
    back (inclusion-exclusion) — restores exact semantics with four thin
    dynamic-update-slices instead of the slab rewrites that cost 10-14 ms
    per call in the first implementation (experiments/comp probe, r5)."""
    if s == 1:
        return jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
    dt = x.dtype
    cout = kernel.shape[3]
    kc = composite_upconv_kernel(kernel, s).astype(dt)
    xg = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xg, kc, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dt)
    y = _depth_to_space(y, s, cout)
    # subtract the ghost extension the true conv would have zero-padded —
    # as MASKED broadcasts, not update-slices: four chained full-res DUS
    # held extra 1 GB temporaries and OOM'd the 16 GB v5e at 8x1024^2;
    # iota-masked terms fuse into one elementwise pass over y instead
    hh, ww = y.shape[1], y.shape[2]
    top = _edge_row_correction(x, kernel, s, True)[:, None]    # (B,1,W,C)
    bot = _edge_row_correction(x, kernel, s, False)[:, None]
    lef = _edge_col_correction(x, kernel, s, True)[:, :, None]  # (B,H,1,C)
    rig = _edge_col_correction(x, kernel, s, False)[:, :, None]
    r = jax.lax.broadcasted_iota(jnp.int32, (1, hh, 1, 1), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ww, 1), 2)
    r0, rn = r == 0, r == hh - 1
    c0, cn = c == 0, c == ww - 1
    y = y - jnp.where(r0, top, 0) - jnp.where(rn, bot, 0) \
          - jnp.where(c0, lef, 0) - jnp.where(cn, rig, 0)
    # corners: the (dy, dx) = (+-1, +-1) ghost term was subtracted twice
    # (once by the row pass, once by the col pass) — add it back. With
    # replicate ghosts, up_ext at a corner equals the corner source value.
    kf = kernel.astype(jnp.float32)
    for (rm, rk), (cm, ck) in (((r0, 0), (c0, 0)), ((r0, 0), (cn, 2)),
                               ((rn, 2), (c0, 0)), ((rn, 2), (cn, 2))):
        ri, ci = (0 if rk == 0 else -1), (0 if ck == 0 else -1)
        src = x[:, ri, ci].astype(jnp.float32)               # (B, Cin)
        add = (src @ kf[rk, ck]).astype(dt)                  # (B, Cout)
        y = y + jnp.where(rm & cm, add[:, None, None, :], 0)
    return y
