"""Pallas TPU kernels for the post-processing hot ops.

XLA expresses the DDM as ~26 separate HBM-roundtrip ops per TTA view
(lookup, 8 padded shifts, cosines, min, normalize). These kernels fuse the
whole map into VMEM-resident passes: labels load once, the direction-vector
lookup, the 8 neighbor cosines and the min-reduction all happen on-chip;
only the DDM is written back.

Two paths:
- single block (maps <= 512^2): grid = TTA views, one (H, W) block each,
  normalization included in-kernel.
- row-block tiled (arbitrary size, e.g. the 1024^2 bench tile): the label
  map is zero-padded by one row top/bottom, each grid step DMAs a
  (bh+2, W) window from HBM into VMEM scratch (1-px row halo; class 0 has a
  zero direction vector, so zero padding reproduces the reference's border
  masking exactly), and the per-view min/max normalization runs as one XLA
  fused reduce afterwards.

Numerics parity with :func:`cdnet_tpu.ops.ddm.generate_dd_map` (which remains
the reference implementation and the fallback for non-TPU backends).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cdnet_tpu.ops.geometry import _LABEL_TO_VECTOR

_NEIGHBORS_8 = [(1, 1), (1, 0), (1, -1), (0, 1), (0, -1),
                (-1, 1), (-1, 0), (-1, -1)]


def _vectors_from_labels(lab, direction_classes: int):
    """class map -> (vh, vw) via arithmetic select (tiny class count)."""
    table = np.asarray(_LABEL_TO_VECTOR[direction_classes], dtype=np.float32)
    vh = jnp.zeros(lab.shape, jnp.float32)
    vw = jnp.zeros(lab.shape, jnp.float32)
    for cls in range(direction_classes):
        is_c = lab == cls
        if table[cls, 0]:
            vh = jnp.where(is_c, table[cls, 0], vh)
        if table[cls, 1]:
            vw = jnp.where(is_c, table[cls, 1], vw)
    return vh, vw


def _ddm_kernel(labels_ref, out_ref, *, direction_classes: int):
    lab = labels_ref[0]  # (H, W) int32
    h, w = lab.shape
    vh, vw = _vectors_from_labels(lab, direction_classes)

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    center_norm = jnp.sqrt(vh * vh + vw * vw)

    min_cos = jnp.full((h, w), jnp.inf, jnp.float32)
    for dy, dx in _NEIGHBORS_8:
        # neighbor value orig[i+dy, j+dx]: roll by (-dy, -dx) (pltpu.roll
        # takes non-negative shifts -> wrap modulo the axis), zero the wrap
        nh = pltpu.roll(pltpu.roll(vh, (-dy) % h, 0), (-dx) % w, 1)
        nw = pltpu.roll(pltpu.roll(vw, (-dy) % h, 0), (-dx) % w, 1)
        valid = jnp.ones((h, w), jnp.bool_)
        if dy == 1:
            valid &= rows < h - 1
        elif dy == -1:
            valid &= rows > 0
        if dx == 1:
            valid &= cols < w - 1
        elif dx == -1:
            valid &= cols > 0
        nh = jnp.where(valid, nh, 0.0)
        nw = jnp.where(valid, nw, 0.0)
        dot = vh * nh + vw * nw
        nb_norm = jnp.sqrt(nh * nh + nw * nw)
        cos = dot / (center_norm * nb_norm + 1e-6)
        min_cos = jnp.minimum(min_cos, cos)

    min_cos = jnp.where(lab == 0, 1.0, min_cos)
    dd = 1.0 - jnp.round(min_cos)
    lo = jnp.min(dd)
    hi = jnp.max(dd)
    out_ref[0] = jnp.where(hi > lo, (dd - lo) / (hi - lo), jnp.zeros_like(dd))


# Mosaic memref slices must be aligned to the (8, 128) int32 tiling along the
# sublane dim: both the slice start and length need to be multiples of 8. A
# 1-row halo (bh+2 rows) is rejected ("Slice shape ... must be aligned to
# tiling (8), but is 258"), so the halo is 8 rows per side; only +-1 is read.
_HALO = 8


def _ddm_kernel_tiled(pad_ref, out_ref, scr_ref, sem, *, bh: int, w: int,
                      direction_classes: int):
    """One (bh, w) output block; reads a (bh+2*_HALO, w) window (row halo)."""
    v = pl.program_id(0)
    r = pl.program_id(1)
    cp = pltpu.make_async_copy(
        pad_ref.at[v, pl.ds(r * bh, bh + 2 * _HALO), :], scr_ref, sem)
    cp.start()
    cp.wait()
    lab = scr_ref[...]  # (bh+2*_HALO, w) int32, zero-padded at map borders
    vh, vw = _vectors_from_labels(lab, direction_classes)

    cols = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 1)
    c_vh, c_vw = vh[_HALO:bh + _HALO], vw[_HALO:bh + _HALO]
    center_norm = jnp.sqrt(c_vh * c_vh + c_vw * c_vw)

    min_cos = jnp.full((bh, w), jnp.inf, jnp.float32)
    for dy, dx in _NEIGHBORS_8:
        nh = vh[_HALO + dy:bh + _HALO + dy]   # static row shift in the halo
        nw = vw[_HALO + dy:bh + _HALO + dy]
        if dx:
            nh = pltpu.roll(nh, (-dx) % w, 1)
            nw = pltpu.roll(nw, (-dx) % w, 1)
            valid = cols < w - 1 if dx == 1 else cols > 0
            nh = jnp.where(valid, nh, 0.0)
            nw = jnp.where(valid, nw, 0.0)
        dot = c_vh * nh + c_vw * nw
        nb_norm = jnp.sqrt(nh * nh + nw * nw)
        min_cos = jnp.minimum(min_cos, dot / (center_norm * nb_norm + 1e-6))

    min_cos = jnp.where(lab[_HALO:bh + _HALO] == 0, 1.0, min_cos)
    out_ref[0] = 1.0 - jnp.round(min_cos)


# one (H, W) f32 working set is h*w*4 bytes; the single-block kernel holds ~6
# such arrays live -> cap it at 512^2 (~6 MB of the 16 MB VMEM); larger maps
# take the row-tiled path
_VMEM_SAFE_PIXELS = 512 * 512
_ROW_BLOCK = 256


@functools.partial(jax.jit, static_argnames=("direction_classes",))
def generate_dd_maps_pallas(label_direction: jnp.ndarray,
                            direction_classes: int = 9) -> jnp.ndarray:
    """(V, H, W) int direction-class maps -> (V, H, W) DDMs, fused in VMEM.
    Requires the 8-direction class layout (the CDNet default). vmap-safe:
    extra batch dims fold into the view axis (each map's DDM+normalization is
    independent), so the batched-tiles inference pipeline can vmap over it."""
    assert direction_classes - 1 == 8, "pallas kernel covers the 8-dir layout"
    return _ddm_pallas_9(label_direction.astype(jnp.int32))


@jax.custom_batching.custom_vmap
def _ddm_pallas_9(label_direction: jnp.ndarray) -> jnp.ndarray:
    return _ddm_pallas_impl(label_direction)


@_ddm_pallas_9.def_vmap
def _ddm_pallas_9_vmap(axis_size, in_batched, lab):
    if not in_batched[0]:
        return _ddm_pallas_9(lab), False
    n = lab.shape[0]
    flat = _ddm_pallas_9(lab.reshape((-1,) + lab.shape[2:]))
    return flat.reshape((n, -1) + flat.shape[1:]), True


def _ddm_pallas_impl(label_direction: jnp.ndarray) -> jnp.ndarray:
    direction_classes = 9
    v, h, w = label_direction.shape
    if h * w <= _VMEM_SAFE_PIXELS:
        return pl.pallas_call(
            functools.partial(_ddm_kernel, direction_classes=direction_classes),
            grid=(v,),
            in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((v, h, w), jnp.float32),
        )(label_direction.astype(jnp.int32))

    bh = _ROW_BLOCK
    hp = -(-h // bh) * bh
    wp = -(-w // 128) * 128  # lane-dim alignment
    pad = jnp.pad(label_direction.astype(jnp.int32),
                  ((0, 0), (_HALO, hp - h + _HALO), (0, wp - w)))
    dd = pl.pallas_call(
        functools.partial(_ddm_kernel_tiled, bh=bh, w=wp,
                          direction_classes=direction_classes),
        grid=(v, hp // bh),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, bh, wp), lambda i, r: (i, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, hp, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bh + 2 * _HALO, wp), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )(pad)[:, :h, :w]
    # per-view normalization (test_dam's generate_dd_map tail) as one XLA
    # fused reduce+scale
    lo = jnp.min(dd, axis=(1, 2), keepdims=True)
    hi = jnp.max(dd, axis=(1, 2), keepdims=True)
    return jnp.where(hi > lo, (dd - lo) / (hi - lo), 0.0)
