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


def centerness_map(labels: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel centerness (min_ray/max_ray) on foreground, 0 on background."""
    labels = jnp.asarray(labels, dtype=jnp.int32)
    h, w = labels.shape
    hh = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    ww = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    angles = 2.0 * np.pi / 8.0 * np.arange(8)
    dir_h = jnp.asarray(np.sin(angles), dtype=jnp.float32)  # P[k][0]
    dir_w = jnp.asarray(np.cos(angles), dtype=jnp.float32)  # P[k][1]

    def ray_length(k):
        dh, dw = dir_h[k], dir_w[k]

        def bisect(_, lr):
            l, r = lr
            mid = (l + r) * 0.5
            nh = jnp.round(hh + dh * mid).astype(jnp.int32)
            nw = jnp.round(ww + dw * mid).astype(jnp.int32)
            inb = (nh >= 0) & (nh < h) & (nw >= 0) & (nw < w)
            same = labels[jnp.clip(nh, 0, h - 1), jnp.clip(nw, 0, w - 1)] == labels
            ok = inb & same
            return jnp.where(ok, mid, l), jnp.where(ok, r, mid)

        l0 = jnp.zeros((h, w), jnp.float32)
        r0 = jnp.full((h, w), 1000.0, jnp.float32)
        _, r = jax.lax.fori_loop(0, 30, bisect, (l0, r0))
        return r

    rays = jnp.stack([ray_length(k) for k in range(8)])  # (8, H, W)
    cent = jnp.min(rays, axis=0) / jnp.max(rays, axis=0)
    return jnp.where(labels > 0, cent, 0.0)


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
    flat_l = labels.reshape(-1)
    flat_c = cent.reshape(-1)
    n = max_instances + 1

    best = jnp.full(n, -1.0, dtype=cent.dtype).at[flat_l].max(flat_c)
    idx = jnp.arange(h * w, dtype=jnp.int32)
    is_best = (flat_c == best[flat_l]) & (flat_l > 0)
    win = jnp.full(n, jnp.int32(h * w)).at[
        jnp.where(is_best, flat_l, 0)].min(jnp.where(is_best, idx, h * w))
    win = win[1:]
    valid = (best[1:] > -1.0) & (win < h * w)
    centers = jnp.stack([win // w, win % w], axis=-1)
    return jnp.where(valid[:, None], centers, 0), valid
