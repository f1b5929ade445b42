"""On-device Euclidean distance transforms via jump flooding.

TPU-native replacement for scipy.ndimage.distance_transform_edt as used by the
reference in label synthesis and watershed post-processing
(`/root/reference/my_transforms_direction.py:802,822`, `postproc_other.py:24`).

Key insight (SURVEY.md §2.3): the reference computes a *separate* EDT per
nucleus mask, but since other nuclei are also zeros of that mask, the
per-instance EDT equals the distance to the nearest pixel of a *different*
label. One joint jump-flood pass over the instance-label image therefore
replaces the reference's O(N) per-instance loop.

"Nearest different label" cannot be answered by filtering candidates against
the querying pixel's label during propagation (intermediate pixels of another
label would discard exactly the seeds the query needs). Instead each pixel
tracks its TWO nearest seeds under the constraint that they carry distinct
labels — the standard 2-channel jump flooding for multi-label Voronoi — and
the query picks channel 1 if its label differs from the pixel's own, else
channel 2. Two +1 refinement rounds (JFA+2) remove the rare residual JFA
approximation errors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cdnet_tpu.ops.morphology import _shift2d

_BIG = jnp.int32(1 << 30)


def _jfa_steps(h: int, w: int) -> list[int]:
    steps = []
    k = 1
    while k < max(h, w):
        k <<= 1
    k >>= 1
    while k >= 1:
        steps.append(k)
        k >>= 1
    return steps + [2, 1]  # JFA+2 refinement


def _two_nearest_distinct(seed_mask: jnp.ndarray, seed_label: jnp.ndarray):
    """Per-pixel (seed1, seed2): the two nearest seeds with distinct labels.

    Returns ((h1, w1, l1, d1), (h2, w2, l2, d2)); invalid entries have
    h == -1 and d == _BIG.
    """
    h, w = seed_mask.shape
    hh = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ww = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def dist2(sh, sw):
        d = (sh - hh) ** 2 + (sw - ww) ** 2
        return jnp.where(sh >= 0, d, _BIG)

    neg1 = jnp.full((h, w), -1, jnp.int32)
    s1 = (jnp.where(seed_mask, hh, -1), jnp.where(seed_mask, ww, -1),
          jnp.where(seed_mask, seed_label, -1))
    s2 = (neg1, neg1, neg1)
    steps = jnp.asarray(_jfa_steps(h, w), dtype=jnp.int32)

    def merge(best1, best2, cand):
        """Fold one candidate seed into the (best1, best2) distinct-label pair."""
        b1h, b1w, b1l = best1
        b2h, b2w, b2l = best2
        ch, cw, cl = cand
        d1, d2, dc = dist2(b1h, b1w), dist2(b2h, b2w), dist2(ch, cw)
        same_as_b1 = cl == b1l
        # case A: candidate beats best1
        a = dc < d1
        #   if same label as b1: replace b1 only; else push b1 down to b2
        n1h = jnp.where(a, ch, b1h)
        n1w = jnp.where(a, cw, b1w)
        n1l = jnp.where(a, cl, b1l)
        push = a & ~same_as_b1
        n2h = jnp.where(push, b1h, b2h)
        n2w = jnp.where(push, b1w, b2w)
        n2l = jnp.where(push, b1l, b2l)
        # case B: candidate between best1 and best2, different label from best1
        nd2 = dist2(n2h, n2w)
        b = (~a) & (~same_as_b1) & (dc < nd2)
        n2h = jnp.where(b, ch, n2h)
        n2w = jnp.where(b, cw, n2w)
        n2l = jnp.where(b, cl, n2l)
        return (n1h, n1w, n1l), (n2h, n2w, n2l)

    # One graph per ROUND, looped with fori — keeps the XLA graph small (the
    # fully unrolled JFA is ~6k ops and stalls compilation). Shifted-in
    # wrapped entries from jnp.roll are still valid seeds (positions are
    # absolute), so no masking is needed.
    def round_body(i, state):
        s1, s2 = state
        k = steps[i]
        new1, new2 = s1, s2
        for sy in (-1, 0, 1):
            for sx in (-1, 0, 1):
                if sy == 0 and sx == 0:
                    continue
                for src in (s1, s2):
                    cand = tuple(jnp.roll(c, (sy * k, sx * k), (0, 1))
                                 for c in src)
                    new1, new2 = merge(new1, new2, cand)
        return new1, new2

    s1, s2 = jax.lax.fori_loop(0, len(_jfa_steps(h, w)), round_body, (s1, s2))
    d1 = dist2(s1[0], s1[1])
    d2 = dist2(s2[0], s2[1])
    return (s1 + (d1,)), (s2 + (d2,))


def distance_to_different_label(labels: jnp.ndarray) -> jnp.ndarray:
    """Squared distance from every pixel to the nearest pixel of another label."""
    labels = jnp.asarray(labels, dtype=jnp.int32)
    # seeds: pixels 8-adjacent to a different label
    from cdnet_tpu.ops.morphology import shifted_views
    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if (dy, dx) != (0, 0)]
    diff = jnp.zeros(labels.shape, bool)
    for _, nb in shifted_views(labels, offs, -1):
        diff = diff | ((nb != labels) & (nb >= 0))
    (h1, w1, l1, d1), (h2, w2, l2, d2) = _two_nearest_distinct(diff, labels)
    use1 = l1 != labels
    return jnp.where(use1, d1, d2)


def edt_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """Joint per-instance EDT of an instance-label image.

    For each pixel p with label L(p) != 0, the Euclidean distance to the
    nearest pixel q with L(q) != L(p); 0 on background. Equals the reference's
    per-nucleus ``distance_transform_edt(mask == k)`` summed over k.
    """
    labels = jnp.asarray(labels, dtype=jnp.int32)
    d2 = distance_to_different_label(labels)
    d = jnp.sqrt(d2.astype(jnp.float32))
    return jnp.where(labels != 0, d, 0.0)


def edt_binary(mask: jnp.ndarray) -> jnp.ndarray:
    """Distance from each foreground pixel to the nearest background pixel.

    Parity with scipy.ndimage.distance_transform_edt(mask): returns 0 where
    mask == 0. scipy's EDT ignores the image border (no implicit zeros
    outside), and so does this.
    """
    return edt_labels(mask.astype(jnp.int32))


def normalized_instance_edt(labels: jnp.ndarray) -> jnp.ndarray:
    """Per-instance EDT normalized to max 1 within each instance.

    The reference's ``distance_i / distance_i.max()`` accumulated over
    instances (`my_transforms_direction.py:801-804`), computed jointly: the
    per-instance max is a segmented max over the label image.
    """
    labels = jnp.asarray(labels, dtype=jnp.int32)
    d = edt_labels(labels)
    n = int(np.prod(labels.shape))
    flat_l = labels.reshape(-1)
    flat_d = d.reshape(-1)
    inst_max = jnp.zeros(n + 1, dtype=d.dtype).at[flat_l].max(flat_d)
    denom = jnp.maximum(inst_max[flat_l], 1e-7).reshape(labels.shape)
    return jnp.where(labels != 0, d / denom, 0.0)
