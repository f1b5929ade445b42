"""Instance-center search: vectorized 8-ray bisection "centerness" maximization.

TPU-native replacement for the reference's numba-JIT `get_centerpoint2`
(`/root/reference/my_transforms_direction.py:651-685`) — the only first-party
compiled hotspot in the reference. The reference runs, per nucleus, a Python
double loop over pixels, 8 rays and 30 bisection steps; here all pixels of all
instances are processed jointly: every foreground pixel bisects its 8 ray
lengths against the *label image* (staying inside means landing on a pixel of
the same instance id), then a segmented argmax per instance picks the winner.

Semantics parity: ray directions (sin, cos)(2*pi*k/8), bisection l=0, r=1000,
30 halvings, round-half-to-even coordinate rounding, centerness = min_r/max_r,
strictly-greater update (first raster-order maximum wins).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cdnet_tpu.ops.morphology import _shift2d


def _run_length(same_next: jnp.ndarray, step: tuple[int, int],
                max_steps: int) -> jnp.ndarray:
    """f(p) = same_next(p) ? 1 + f(p + step) : 0 via pointer jumping.

    ``same_next[p]`` = the successor one ``step`` away exists and carries the
    same label. ceil(log2(max_steps)) rounds of STATIC shifts — no gathers
    (arbitrary-index gathers made the bisection formulation 1.6 s/batch on
    v5e).
    """
    dy, dx = step
    run = same_next.astype(jnp.int32)
    k = 1
    while k < max_steps:
        shifted = _shift2d(run, -dy * k, -dx * k, 0)
        run = run + jnp.where(run == k, shifted, 0)
        k <<= 1
    return run


# get_centerpoint2 ray directions P[k] = (sin, cos)(2*pi*k/8) -> grid steps
_RAY_STEPS = ((0, 1), (1, 1), (1, 0), (1, -1),
              (0, -1), (-1, -1), (-1, 0), (-1, 1))
# |P[k]| per component step: 1 on axes, sin(45deg) per diagonal cell
_RAY_NORM = np.asarray(
    [1.0 if (dy == 0 or dx == 0) else np.sqrt(2.0) / 2.0
     for dy, dx in _RAY_STEPS], dtype=np.float32)


def centerness_map(labels: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel centerness (min_ray/max_ray) on foreground, 0 on background.

    The reference's 8-ray bisection (30 halvings of [0, 1000],
    my_transforms_direction.py:651-685) converges to the supremum mid where
    ``round(p + dir * mid)`` still lands on the same instance. The rounded
    ray visits exactly the straight cell chain p, p+step, p+2*step, ..., so
    for an inside-run of L cells the supremum is ``(L - 0.5) / |dir_step|``
    (capped at the bisection's r0 = 1000). Run lengths come from log-step
    pointer jumping.
    """
    labels = jnp.asarray(labels, dtype=jnp.int32)
    h, w = labels.shape
    rays = []
    for (dy, dx), norm in zip(_RAY_STEPS, _RAY_NORM):
        nb = _shift2d(labels, -dy, -dx, -1)
        run = _run_length(nb == labels, (dy, dx), max(h, w)) + 1
        rays.append(jnp.minimum((run.astype(jnp.float32) - 0.5) / norm,
                                1000.0))
    rays = jnp.stack(rays)
    cent = jnp.min(rays, axis=0) / jnp.max(rays, axis=0)
    return jnp.where(labels > 0, cent, 0.0)


def centers_from_centerness(flat_l: jnp.ndarray, flat_c: jnp.ndarray,
                            h: int, w: int, n: int, base=0):
    """Winning pixel per instance id base+1..base+n from a flat centerness
    field: argmax of centerness, ties broken to the FIRST raster-order pixel
    (the reference's strictly-greater update, my_transforms_direction.py's
    get_centerpoint2). Shared by :func:`instance_centers` and the chunked
    label-synthesis loop (which sweeps base over id ranges inside a
    while_loop with ONE precomputed centerness field)."""
    rel = flat_l - base
    in_r = (rel >= 1) & (rel <= n)
    rel = jnp.where(in_r, rel, 0)
    best = jnp.full(n + 1, -1.0, dtype=flat_c.dtype).at[rel].max(
        jnp.where(in_r, flat_c, -1.0))
    idx = jnp.arange(h * w, dtype=jnp.int32)
    is_best = in_r & (flat_c == best[rel])
    win = jnp.full(n + 1, jnp.int32(h * w)).at[
        jnp.where(is_best, rel, 0)].min(jnp.where(is_best, idx, h * w))
    win = win[1:]
    valid = (best[1:] > -1.0) & (win < h * w)
    centers = jnp.stack([win // w, win % w], axis=-1)
    return jnp.where(valid[:, None], centers, 0), valid


def instance_centers(labels: jnp.ndarray, max_instances: int):
    """Centers of instances 1..max_instances.

    Returns ``(centers, valid)``: centers (max_instances, 2) int32 (h, w)
    coordinates — row k holds the center of instance id k+1 — and valid
    (max_instances,) bool. Ties broken to the first raster-order pixel,
    matching the reference's strictly-greater update.
    """
    labels = jnp.asarray(labels, dtype=jnp.int32)
    h, w = labels.shape
    cent = centerness_map(labels)
    return centers_from_centerness(labels.reshape(-1), cent.reshape(-1),
                                   h, w, max_instances)
