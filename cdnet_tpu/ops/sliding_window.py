"""Sliding-window (overlap-tile) inference as a batched tile grid.

The reference's `split_forward` / `split_forward_dam`
(`/root/reference/utils.py:603-726`) runs a serial Python loop over tiles,
one forward each. TPU-native design (SURVEY.md §2.4/§5): the tile grid is
extracted as ONE (T, size, size, C) batch, forwarded in a single (optionally
mesh-sharded) call, and the center crops are scattered back — tiles are
independent, so no halo exchange is needed; overlap margins are recomputed,
not communicated.

Padding parity: zero-pad H and W up to a multiple of (size - overlap) past
``size`` (utils.py:666-675); each tile writes back only its center region
(margins overlap//2, except at image borders).
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def plan_tiles(h: int, w: int, size: int, overlap: int):
    """Static tile plan: padded size + tile origin list (reference loop bounds)."""
    stride = size - overlap
    pad_h = 0 if h <= size else stride - (h - size) % stride
    pad_w = 0 if w <= size else stride - (w - size) % stride
    hp, wp = h + pad_h, w + pad_w
    # range's stop (hp - overlap) already guarantees every r < hp - overlap
    rows = list(range(0, max(hp - overlap, 1), stride)) if hp > size else [0]
    cols = list(range(0, max(wp - overlap, 1), stride)) if wp > size else [0]
    return hp, wp, rows, cols


def split_forward(apply_fn: Callable, image: jnp.ndarray, size: int,
                  overlap: int) -> dict:
    """Tiled forward over one (H, W, C) image.

    ``apply_fn``: (T, size, size, C) -> dict of outputs with the tile axis at
    -3 and SPATIAL DIMS LAST — (T, size, size) or (C', T, size, size).
    Small-channel maps keep (H, W) in the TPU-tiled minor dims this way (a
    channels-last (T,s,s,C') f32 map is lane-padded C'->128). The tile batch
    is the natural axis to shard over the mesh. Returns dict of stitched
    outputs, (H, W) or (C', H, W).
    """
    h, w, c = image.shape
    if h <= size and w <= size:
        # whole-image path (all_img_test=1, test_dam.py:940-949)
        out = apply_fn(image[None])
        return {k: jnp.squeeze(v, axis=-3) for k, v in out.items()}

    hp, wp, rows, cols = plan_tiles(h, w, size, overlap)
    padded = jnp.pad(image, ((0, hp - h), (0, wp - w), (0, 0)))

    tiles = []
    for i in rows:
        for j in cols:
            tiles.append(jax.lax.dynamic_slice(padded, (i, j, 0), (size, size, c)))
    batch = jnp.stack(tiles)
    outs = apply_fn(batch)

    stitched = {}
    half = overlap // 2
    for key, val in outs.items():
        lead = val.shape[:-3]
        zeros = (0,) * len(lead)
        canvas = jnp.zeros(lead + (hp, wp), val.dtype)
        t = 0
        for i in rows:
            for j in cols:
                i0 = i + half if i > 0 else 0
                i1 = i + size - half if i + size < hp else hp
                j0 = j + half if j > 0 else 0
                j1 = j + size - half if j + size < wp else wp
                patch = jax.lax.dynamic_slice(
                    val[..., t, :, :], zeros + (i0 - i, j0 - j),
                    lead + (i1 - i0, j1 - j0))
                canvas = jax.lax.dynamic_update_slice(canvas, patch,
                                                      zeros + (i0, j0))
                t += 1
        stitched[key] = canvas[..., :h, :w]
    return stitched
