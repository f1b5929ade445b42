"""On-device marker-based watershed.

TPU-native replacement for skimage.segmentation.watershed as used by the
reference's instance post-processing (`/root/reference/postproc_other.py:47`:
``watershed(-dist, marker, mask=pred)`` with ``dist`` a uint8 distance map).

Design: the image-foresting-transform (IFT) characterization of marker
watershed — a pixel belongs to the marker reachable by the path maximizing
the minimum ``dist`` along the path (the minimax/bottleneck metric; flooding
in decreasing ``dist`` order computes exactly this assignment, up to
tie-breaking). The (bottleneck value, label) pair packs into ONE int32 key
(``value << 16 | label``) so the whole flood is a single ``lax.while_loop``
fixpoint of 4-neighbor max-min relaxations: per iteration one vectorized pass,
converging in O(region diameter) iterations. The previous rising-level design
needed 256 levels x a BFS fixpoint each (512+ sequential passes; measured
~65 ms per 8x256^2 batch vs ~6 ms for this formulation).

Tie-breaking: skimage floods FIFO within an equal-``dist`` plateau; here ties
in bottleneck value resolve deterministically to the larger label id (the max
over packed keys). Watershed lines therefore match up to plateau boundaries —
sub-pixel-scale differences the dilation step after post-processing absorbs
(tests/test_label_ops.py::TestWatershed pins >95% agreement with a verbatim
priority-flood oracle).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cdnet_tpu.ops.morphology import shifted_views

_OFFS_4 = ((-1, 0), (1, 0), (0, -1), (0, 1))
# the packed int32 key gives dist its minimal high bits and labels the rest:
# with the default num_levels=256 that is 23 label bits (8.4M ids). Marker
# ids come from connected-component labeling, and every surviving component
# holds >= min_size (5) pixels after remove_small_objects, so even a
# 4096x4096 whole-slide mask yields < 2^22 ids — 16 bits (the round-2
# constant) could overflow there (advisor finding), 23 cannot.
_LABEL_BITS = 23
_LABEL_MASK = (1 << _LABEL_BITS) - 1


def watershed(dist: jnp.ndarray, markers: jnp.ndarray, mask: jnp.ndarray,
              num_levels: int = 256) -> jnp.ndarray:
    """Flood ``markers`` over ``mask`` in decreasing order of ``dist``.

    Equivalent to skimage ``watershed(-dist, markers, mask=mask)`` with
    4-connectivity (skimage default connectivity=1). ``dist`` is quantized
    to integer levels in [0, num_levels); labels must fit in the remaining
    ``_LABEL_BITS`` of the int32 key (see module constant above).
    """
    assert num_levels <= 1 << (31 - _LABEL_BITS), \
        f"num_levels={num_levels} overflows the packed int32 key"
    mask = mask.astype(bool)
    markers = jnp.where(mask, markers.astype(jnp.int32), 0)
    dist = jnp.clip(jnp.asarray(dist), 0, num_levels - 1).astype(jnp.int32)

    is_marker = markers > 0
    key = jnp.where(is_marker, (dist << _LABEL_BITS) | markers, 0)
    grow = mask & ~is_marker

    # Per-pixel transmission capacity for the line scans: a path continuing
    # THROUGH a pixel is capped by its dist; marker and non-mask pixels block
    # transmission (markers emit their own key but a foreign flood cannot pass
    # over an already-labeled seed — skimage pre-labels marker pixels).
    _BLOCK = jnp.int32(-(2 ** 30))
    cap_m = jnp.where(grow, dist, _BLOCK)

    def _cap(b, m):
        # cap a key's bottleneck value by capacity m (clamped so the packed
        # int32 can't overflow; any capped-negative key loses every max)
        val = jnp.maximum(jnp.minimum(b >> _LABEL_BITS, m), -1)
        return (val << _LABEL_BITS) | (b & _LABEL_MASK)

    def _line_op(a, b):
        """Associative bottleneck-path propagation along a line segment.

        State (best, m): ``best`` = strongest key emitted at the segment's
        right end, ``m`` = min transmission capacity across the segment."""
        ab, am = a
        bb, bm = b
        return jnp.maximum(bb, _cap(ab, bm)), jnp.minimum(am, bm)

    def _scan_axis(k, axis):
        # non-minor axes transpose minor-first (TPU scans along a non-minor
        # axis pay per-stage relayouts; see connected._segmented_min_scan)
        if axis != k.ndim - 1:
            cm = jnp.swapaxes(cap_m, axis, -1)
            kt = jnp.swapaxes(k, axis, -1)
            fwd, _ = jax.lax.associative_scan(_line_op, (kt, cm), axis=kt.ndim - 1)
            bwd, _ = jax.lax.associative_scan(_line_op, (kt, cm),
                                              axis=kt.ndim - 1, reverse=True)
            return jnp.swapaxes(jnp.maximum(fwd, bwd), axis, -1)
        fwd, _ = jax.lax.associative_scan(_line_op, (k, cap_m), axis=axis)
        bwd, _ = jax.lax.associative_scan(_line_op, (k, cap_m), axis=axis,
                                          reverse=True)
        return jnp.maximum(fwd, bwd)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        k, _ = state
        # long-range: segmented bottleneck scans along rows then columns
        # (valid path keys only -> sound accelerator; the unique supremum
        # fixpoint is unchanged, convergence drops from O(diameter) sweeps
        # to a handful)
        best = jnp.maximum(_scan_axis(k, 1), _scan_axis(k, 0))
        # local: 4-neighbor relaxation stitches rows and columns together
        for _, view in shifted_views(best, _OFFS_4, 0):
            # neighbor's bottleneck value capped by my own dist, keeping the
            # neighbor's label; unlabeled neighbors (label 0) contribute 0
            val = jnp.minimum(view >> _LABEL_BITS, dist)
            cand = (val << _LABEL_BITS) | (view & _LABEL_MASK)
            best = jnp.maximum(best, jnp.where((view & _LABEL_MASK) > 0,
                                               cand, 0))
        new = jnp.where(grow, jnp.maximum(k, best), k)
        return new, jnp.any(new != k)

    key, _ = jax.lax.while_loop(cond, body, (key, jnp.array(True)))
    return jnp.where(mask, key & _LABEL_MASK, 0)
