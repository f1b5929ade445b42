"""Pallas TPU kernels for the post-processing hot ops.

XLA expresses the DDM as ~26 separate HBM-roundtrip ops per TTA view
(lookup, 8 padded shifts, cosines, min, normalize). This kernel fuses the
whole map into one VMEM-resident pass per view: labels load once, the
direction-vector lookup, the 8 neighbor cosines (via pltpu.roll with border
masking) and the min-reduction all happen on-chip; only the final DDM is
written back. Grid = TTA views, one (H, W) block each.

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


def _ddm_kernel(labels_ref, out_ref, *, direction_classes: int):
    lab = labels_ref[0]  # (H, W) int32
    h, w = lab.shape
    table = np.asarray(_LABEL_TO_VECTOR[direction_classes], dtype=np.float32)

    # class -> (vh, vw) via arithmetic select (tiny class count)
    vh = jnp.zeros(lab.shape, jnp.float32)
    vw = jnp.zeros(lab.shape, jnp.float32)
    for cls in range(direction_classes):
        is_c = lab == cls
        if table[cls, 0]:
            vh = jnp.where(is_c, table[cls, 0], vh)
        if table[cls, 1]:
            vw = jnp.where(is_c, table[cls, 1], vw)

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


# one (H, W) f32 working set is h*w*4 bytes; the kernel holds ~6 such arrays
# live (vectors, norms, min_cos, masks) -> cap the single-block path at 512^2
# (~6 MB) to stay inside the 16 MB VMEM budget (observed 55 MB OOM at 1024^2)
_VMEM_SAFE_PIXELS = 512 * 512


@functools.partial(jax.jit, static_argnames=("direction_classes",))
def generate_dd_maps_pallas(label_direction: jnp.ndarray,
                            direction_classes: int = 9) -> jnp.ndarray:
    """(V, H, W) int direction-class maps -> (V, H, W) DDMs, one fused pass
    per view. Requires the 8-direction class layout (the CDNet default).
    Falls back to the XLA implementation for maps larger than 512x512
    (single-block VMEM budget)."""
    assert direction_classes - 1 == 8, "pallas kernel covers the 8-dir layout"
    v, h, w = label_direction.shape
    if h * w > _VMEM_SAFE_PIXELS:
        from cdnet_tpu.ops.ddm import generate_dd_map
        return jax.vmap(
            lambda m: generate_dd_map(m, direction_classes))(label_direction)
    return pl.pallas_call(
        functools.partial(_ddm_kernel, direction_classes=direction_classes),
        grid=(v,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, h, w), jnp.float32),
    )(label_direction.astype(jnp.int32))
