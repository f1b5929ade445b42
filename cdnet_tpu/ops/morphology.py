"""On-device morphology: dilation/erosion, hole filling, small-object removal.

TPU-native replacements for the reference's skimage/scipy morphology calls
(`/root/reference/test_dam.py:546-563`, `my_transforms_direction.py:735-779`,
`postproc_other.py:40-53`). Structuring-element ops are expressed as max/min
over a static set of shifted views (XLA fuses these into a handful of
vectorized ops); hole filling is a background flood-fill fixpoint
(`lax.while_loop`), which stays entirely on device.

All functions take/return (..., H, W) arrays and are jit-compatible.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def disk_offsets(radius: int) -> tuple[tuple[int, int], ...]:
    """Offsets of skimage.morphology.disk(radius): dy^2+dx^2 <= r^2."""
    offs = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy * dy + dx * dx <= radius * radius:
                offs.append((dy, dx))
    return tuple(offs)


def disk(radius: int) -> np.ndarray:
    """Boolean disk structuring element (parity with skimage.morphology.disk)."""
    r = np.arange(-radius, radius + 1)
    return (r[:, None] ** 2 + r[None, :] ** 2) <= radius * radius


def _shift2d(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """Shift the last two axes by (dy, dx), filling vacated pixels with `fill`.

    out[..., i, j] = x[..., i - dy, j - dx] where in bounds.
    """
    if dy == 0 and dx == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [
        (max(dy, 0), max(-dy, 0)),
        (max(dx, 0), max(-dx, 0)),
    ]
    xp = jnp.pad(x, pad, constant_values=fill)
    h, w = x.shape[-2], x.shape[-1]
    start_h = max(-dy, 0)
    start_w = max(-dx, 0)
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(xp, start_h, start_h + h, axis=x.ndim - 2),
        start_w, start_w + w, axis=x.ndim - 1)


def dilation(image: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """Grayscale/label dilation by a disk (parity with skimage.morphology.dilation).

    On label images the max rule matches skimage: overlapping dilations resolve
    to the larger label, as in the reference's instance dilation
    (`my_transforms_direction.py:760,768`; `test_dam.py:563`).
    """
    fill = _min_fill(image.dtype)
    out = image
    for dy, dx in disk_offsets(radius):
        if dy == 0 and dx == 0:
            continue
        out = jnp.maximum(out, _shift2d(image, dy, dx, fill))
    return out


def erosion(image: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """Grayscale erosion by a disk (parity with skimage.morphology.erosion).

    skimage pads with the image max for erosion, so borders erode only from
    in-bounds neighbors; we replicate by filling shifts with +max.
    """
    fill = _max_fill(image.dtype)
    out = image
    for dy, dx in disk_offsets(radius):
        if dy == 0 and dx == 0:
            continue
        out = jnp.minimum(out, _shift2d(image, dy, dx, fill))
    return out


def _min_fill(dtype):
    if jnp.issubdtype(dtype, jnp.bool_):
        return False
    if jnp.issubdtype(dtype, jnp.integer):
        return jnp.iinfo(dtype).min
    return -jnp.inf


def _max_fill(dtype):
    if jnp.issubdtype(dtype, jnp.bool_):
        return True
    if jnp.issubdtype(dtype, jnp.integer):
        return jnp.iinfo(dtype).max
    return jnp.inf


def _neighbor_or(mask: jnp.ndarray, connectivity: int) -> jnp.ndarray:
    """OR of 4- or 8-neighborhood (one binary dilation step)."""
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 2:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    out = mask
    for dy, dx in offs:
        out = out | _shift2d(mask, dy, dx, False)
    return out


def binary_fill_holes(mask: jnp.ndarray) -> jnp.ndarray:
    """Fill holes = foreground plus background not reachable from the border.

    Parity with scipy.ndimage.binary_fill_holes (4-connected background flood),
    used at `test_dam.py:546` and `postproc_other.py:51`. Flood-fill runs as a
    `lax.while_loop` fixpoint on device.
    """
    mask = mask.astype(bool)
    bg = ~mask
    h, w = mask.shape[-2], mask.shape[-1]
    border = jnp.zeros_like(mask).at[..., 0, :].set(True)
    border = border.at[..., h - 1, :].set(True)
    border = border.at[..., :, 0].set(True)
    border = border.at[..., :, w - 1].set(True)
    seed = border & bg

    def cond(state):
        cur, changed = state
        return changed

    def body(state):
        cur, _ = state
        nxt = (cur | _neighbor_or(cur, connectivity=1)) & bg
        return nxt, jnp.any(nxt != cur)

    reach, _ = jax.lax.while_loop(cond, body, (seed, jnp.array(True)))
    return mask | (bg & ~reach)


def remove_small_objects(labels: jnp.ndarray, min_size: int,
                         max_label: int | None = None) -> jnp.ndarray:
    """Zero out instances smaller than ``min_size`` pixels.

    Parity with skimage.morphology.remove_small_objects *on a label image*
    (`postproc_other.py:46-48`). For boolean inputs, label first (see
    :func:`cdnet_tpu.ops.connected.label`) — skimage does the same internally.
    ``max_label``: static bound on label ids for the on-device bincount
    (defaults to H*W, which is always safe but slower).
    """
    labels = jnp.asarray(labels)
    assert labels.ndim == 2, "2-D label image expected; vmap for batches"
    n = int(np.prod(labels.shape)) if max_label is None else max_label + 1
    sizes = jnp.bincount(labels.reshape(-1), length=n)
    small = sizes[labels] < min_size
    return jnp.where(small, 0, labels)
