"""On-device marker-based watershed.

TPU-native replacement for skimage.segmentation.watershed as used by the
reference's instance post-processing (`/root/reference/postproc_other.py:47`:
``watershed(-dist, marker, mask=pred)`` with ``dist`` a uint8 distance map).

Design: the image-foresting-transform (IFT) characterization of marker
watershed — a pixel belongs to the marker reachable by the path maximizing
the minimum ``dist`` along the path (the minimax/bottleneck metric; flooding
in decreasing ``dist`` order computes exactly this assignment, up to
tie-breaking). The flood is a single ``lax.while_loop`` fixpoint of
4-neighbor max-min relaxations over a (value f32, label i32) pair, with
segmented line scans as a long-range accelerator: per iteration one
vectorized pass, converging in O(region diameter) iterations. (An earlier
rising-level design needed 256 levels x a BFS fixpoint each — 512+
sequential passes, ~65 ms per 8x256^2 batch vs ~6 ms for the minimax
formulation.)

Tie-breaking: skimage floods FIFO within an equal-``dist`` plateau. Round 2
packed (uint8 level, label) into one int32 and resolved plateau ties to the
larger label — metrically measurable on dense tiles (AJI up to -0.021 vs
the FIFO oracle, experiments/ws_divergence round-2 sweep) because uint8
quantization makes plateaus LARGE and max-label hands each plateau wholly to
one side. This version floods with a hop-penalized cost (see :func:`watershed`):
inside an equal-level plateau the cost is pure geodesic hop count —
skimage's FIFO/BFS split — and through the full postproc=1 pipeline the
device watershed now matches or BEATS the FIFO oracle on every swept dense
tile (min dAJI +0.0003, experiments/ws_divergence/RESULTS.md). Exact
remaining ties (rare; symmetric geometry) resolve to the larger label.

Labels are carried in their own int32 plane — no packed-key bit budget, so
any marker count is safe (the round-2 advisor flagged the 16-bit packed
limit).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cdnet_tpu.ops.morphology import shifted_views

_OFFS_4 = ((-1, 0), (1, 0), (0, -1), (0, 1))
_NEG = jnp.float32(-3e38)


def watershed(dist: jnp.ndarray, markers: jnp.ndarray, mask: jnp.ndarray,
              hop_penalty: float = 1.0 / 4096.0,
              use_scans: bool = True) -> jnp.ndarray:
    """Flood ``markers`` over ``mask`` in decreasing order of ``dist``.

    Equivalent to skimage ``watershed(-dist, markers, mask=mask)`` with
    4-connectivity (skimage default connectivity=1).

    Path cost: ``min(dist along path) - hop_penalty * path_length``,
    maximized lexicographically with the label as the final tie-break.
    The hop term is the FIFO surrogate: with integer/uint8 ``dist`` levels
    and ``hop_penalty * diameter < 1`` it never overrides a level
    difference, while inside an equal-level plateau the cost reduces to
    pure geodesic hop count — exactly skimage's BFS plateau split. Pure
    minimax (no hop term) is degenerate here: every pixel whose own dist is
    below its basin's connecting saddle has EQUAL bottleneck from several
    markers, so tie mass covers whole boundary bands, and any static
    tie-break loses ~0.01-0.02 AJI on dense tiles
    (experiments/ws_divergence/RESULTS.md).

    The per-segment transfer ``v -> min(v, a) - b`` composes in closed form
    (a' = min(a1, a2 + b1), b' = b1 + b2), so the hop-penalized flood stays
    a pair of associative line scans + a 4-neighbor relaxation inside one
    ``lax.while_loop``.

    The scan operator is associative in the VALUE plane but not in the
    LABEL plane (two sources collapsing to equal cost under a downstream
    cap can surface either label depending on the scan tree). This cannot
    leak into the result: per-pixel state only ever increases in
    lexicographic (value, label) order, the while_loop runs until NO update
    (scan or 4-neighbor) changes anything, and the supremum state — max
    path cost, then max label among max-cost paths — is derivable through
    4-neighbor relaxations alone (cost extension is monotone, so paths that
    tie at a pixel tie on every common suffix). The fixpoint is therefore
    unique and scan-tree/backend independent; the scans only accelerate
    convergence. ``use_scans=False`` drops the accelerator (same result,
    O(diameter) iterations) — used by the determinism test.
    """
    mask = mask.astype(bool)
    markers = jnp.where(mask, markers.astype(jnp.int32), 0)
    dist = jnp.asarray(dist).astype(jnp.float32)
    mu = jnp.float32(hop_penalty)

    is_marker = markers > 0
    val = jnp.where(is_marker, dist, _NEG)
    lab = markers
    grow = mask & ~is_marker

    # Per-pixel transmission cap for the line scans: a path continuing
    # THROUGH a pixel is capped by its dist; marker and non-mask pixels
    # block transmission (markers emit their own value but a foreign flood
    # cannot pass over an already-labeled seed — skimage pre-labels marker
    # pixels). The blocked cap must be -inf, NOT _NEG: ``_NEG - mu`` rounds
    # back to exactly ``_NEG`` in float32 (ulp at 3e38 >> mu), which TIES
    # the unlabeled initial state (_NEG, 0) and the label tie-break then
    # adopts the leaked label — a flood would cross barriers and claim
    # markerless components that skimage leaves unlabeled. ``-inf`` stays
    # -inf under the transfer and always loses to _NEG.
    cap_m = jnp.where(grow, dist, -jnp.inf)

    def _better(av, al, bv, bl):
        """Lexicographic (value, label) max — label breaks exact-value ties."""
        take_b = (bv > av) | ((bv == av) & (bl > al))
        return jnp.where(take_b, bv, av), jnp.where(take_b, bl, al)

    def _line_op(a, b):
        """Associative hop-penalized bottleneck propagation along a segment.

        State ((val, lab), (a, b)): strongest (value, label) emitted at the
        segment's right end, and the segment's transfer function
        ``v -> min(v, a) - b``."""
        (av, al), (aa, ab) = a
        (bv, bl), (ba, bb) = b
        v, l = _better(jnp.minimum(av, ba) - bb, al, bv, bl)
        return (v, l), (jnp.minimum(aa, ba + ab), ab + bb)

    def _scan_axis(v, l, axis):
        # non-minor axes transpose minor-first (TPU scans along a non-minor
        # axis pay per-stage relayouts; see connected._segmented_min_scan)
        t = axis != v.ndim - 1
        cm = jnp.swapaxes(cap_m, axis, -1) if t else cap_m
        vt = jnp.swapaxes(v, axis, -1) if t else v
        lt = jnp.swapaxes(l, axis, -1) if t else l
        seg = ((vt, lt), (cm, jnp.full_like(cm, mu)))
        (fv, fl), _ = jax.lax.associative_scan(_line_op, seg, axis=vt.ndim - 1)
        (bv, bl), _ = jax.lax.associative_scan(_line_op, seg, axis=vt.ndim - 1,
                                               reverse=True)
        rv, rl = _better(fv, fl, bv, bl)
        if t:
            return jnp.swapaxes(rv, axis, -1), jnp.swapaxes(rl, axis, -1)
        return rv, rl

    def cond(state):
        return state[2]

    def body(state):
        v, l, _ = state
        # long-range: segmented hop-penalized scans along rows THEN columns,
        # composed (the column scan consumes the row scan's output, so one
        # iteration covers every staircase H-then-V path — valid path costs
        # only -> sound accelerator; the unique supremum fixpoint is
        # unchanged, convergence drops from O(diameter) sweeps to a handful)
        if use_scans:
            rv, rl = _scan_axis(v, l, 1)
            bv, bl = _scan_axis(rv, rl, 0)
        else:
            bv, bl = v, l
        # local: 4-neighbor relaxation stitches rows and columns together
        views = list(shifted_views(bv, _OFFS_4, _NEG))
        lviews = list(shifted_views(bl, _OFFS_4, 0))
        for (_, nv), (_, nl) in zip(views, lviews):
            cand_v = jnp.minimum(nv, dist) - mu
            has = nl > 0
            bv, bl = _better(bv, bl, jnp.where(has, cand_v, _NEG), nl)
        nv2, nl2 = _better(v, l, jnp.where(grow, bv, _NEG),
                           jnp.where(grow, bl, 0))
        changed = jnp.any((nv2 != v) | (nl2 != l))
        return nv2, nl2, changed

    val, lab, _ = jax.lax.while_loop(cond, body,
                                     (val, lab, jnp.array(True)))
    return jnp.where(mask, lab, 0)
