"""On-device connected-component labeling.

TPU-native replacement for skimage.measure.label / scipy.ndimage.label
(`/root/reference/test_dam.py:561`, `my_transforms_direction.py:723-779`,
`postproc_other.py:37,44`). Instead of host union-find, each foreground pixel
starts with its linear index and the component minimum is propagated to a
fixpoint. Long-range propagation is accelerated with segmented min-scans
(jax.lax.associative_scan) along rows and columns, so convergence needs only
a few sweeps for blob-like shapes (nuclei); a `lax.while_loop` guarantees the
exact fixpoint for arbitrary topology.

Label order parity: components end up numbered 1..N in raster order of their
topmost-leftmost pixel — the same order skimage.measure.label produces.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cdnet_tpu.ops.morphology import shifted_views

_INF = jnp.int32(2 ** 30)


def _segmented_min_scan(vals: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Min-scan along ``axis`` that resets at background pixels (both directions).

    Elements are (value, reset) pairs under the associative operator
    ``(v1,r1) ⊕ (v2,r2) = (v2 if r2 else min(v1,v2), r1|r2)``.

    Scans along a non-minor axis pay a per-stage relayout on TPU (a full
    sweep measured 1.8 ms at (8,256,256) vs 0.05 ms for the minor-axis scan),
    so the array is transposed minor-first and back — two cheap copies.
    """
    if axis != vals.ndim - 1 and axis != -1:
        vals_t = jnp.swapaxes(vals, axis, -1)
        mask_t = jnp.swapaxes(mask, axis, -1)
        return jnp.swapaxes(
            _segmented_min_scan(vals_t, mask_t, vals.ndim - 1), axis, -1)
    reset = ~mask

    def op(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.minimum(av, bv)), ar | br

    fwd, _ = jax.lax.associative_scan(op, (vals, reset), axis=axis)
    bwd, _ = jax.lax.associative_scan(op, (vals, reset), axis=axis, reverse=True)
    return jnp.minimum(fwd, bwd)


def _neighbor_min(vals: jnp.ndarray, mask: jnp.ndarray, connectivity: int) -> jnp.ndarray:
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 2:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    out = vals
    for _, view in shifted_views(vals, offs, _INF):
        out = jnp.minimum(out, view)
    return jnp.where(mask, out, _INF)


def label(mask: jnp.ndarray, connectivity: int = 2):
    """Connected components of a boolean mask.

    Returns ``(labels, num)`` with labels contiguous 1..num (int32), num as a
    traced scalar. ``connectivity``: 1 = 4-neighborhood
    (reference remove_small_points, test_dam.py:78), 2 = 8-neighborhood
    (skimage.measure.label default, test_dam.py:561).
    """
    mask = mask.astype(bool)
    h, w = mask.shape
    idx = (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w))
    vals = jnp.where(mask, idx, _INF)

    def sweep(v):
        v = _segmented_min_scan(v, mask, axis=1)
        v = _segmented_min_scan(v, mask, axis=0)
        v = _neighbor_min(v, mask, connectivity)
        return jnp.where(mask, v, _INF)

    def cond(state):
        v, changed = state
        return changed

    def body(state):
        v, _ = state
        nv = sweep(v)
        return nv, jnp.any(nv != v)

    from cdnet_tpu.ops import pallas_cc
    use_kernel = pallas_cc.fixpoint_applicable(h, w)
    if use_kernel:
        # same sweeps, VMEM-resident: no per-op dispatch between sweeps
        vals = pallas_cc.min_fixpoint(vals, mask, connectivity)
    else:
        vals, _ = jax.lax.while_loop(cond, body,
                                     (sweep(vals), jnp.array(True)))

    # Relabel component roots (pixels equal to their own linear index) to
    # contiguous ids in raster order — identical numbering to skimage.
    is_root = mask & (vals == idx)
    ranks = jnp.cumsum(is_root.reshape(-1)).reshape(h, w).astype(jnp.int32)
    if use_kernel:
        # gather-free tail: spread each root's rank through its component
        # with a second in-VMEM fixpoint (only the root is non-INF, so the
        # component min IS the root's rank — identical to the gather, and
        # a 1M-element gather costs ~8 ms on this chip)
        seeded = jnp.where(is_root, ranks, _INF)
        labels = pallas_cc.min_fixpoint(seeded, mask, connectivity)
        labels = jnp.where(mask, labels, 0)
    else:
        root_label = jnp.where(is_root, ranks, 0).reshape(-1)
        # component id of each pixel = rank of its root
        safe = jnp.clip(vals.reshape(-1), 0, h * w - 1)
        labels = jnp.where(mask.reshape(-1), root_label[safe],
                           0).reshape(h, w)
    return labels, jnp.max(ranks)
