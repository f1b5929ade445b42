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


def shifted_views(image: jnp.ndarray, offsets, fill):
    """Pad ONCE by the max offset and yield a statically-sliced view per
    offset. One pad + k slices instead of k pads — the per-shift jnp.pad in
    a naive implementation shows up as k separate dispatch+copy kernels on
    TPU (measured 28ms for a radius-2 label dilation at 1024^2)."""
    ry = max(abs(dy) for dy, _ in offsets)
    rx = max(abs(dx) for _, dx in offsets)
    pad = [(0, 0)] * (image.ndim - 2) + [(ry, ry), (rx, rx)]
    xp = jnp.pad(image, pad, constant_values=fill)
    h, w = image.shape[-2], image.shape[-1]
    for dy, dx in offsets:
        yield (dy, dx), jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(xp, ry - dy, ry - dy + h, axis=image.ndim - 2),
            rx - dx, rx - dx + w, axis=image.ndim - 1)


def dilation(image: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """Grayscale/label dilation by a disk (parity with skimage.morphology.dilation).

    On label images the max rule matches skimage: overlapping dilations resolve
    to the larger label, as in the reference's instance dilation
    (`my_transforms_direction.py:760,768`; `test_dam.py:563`).
    """
    fill = _min_fill(image.dtype)
    out = image
    offs = [o for o in disk_offsets(radius) if o != (0, 0)]
    for _, view in shifted_views(image, offs, fill):
        out = jnp.maximum(out, view)
    return out


def erosion(image: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """Grayscale erosion by a disk (parity with skimage.morphology.erosion).

    skimage pads with the image max for erosion, so borders erode only from
    in-bounds neighbors; we replicate by filling shifts with +max.
    """
    fill = _max_fill(image.dtype)
    out = image
    offs = [o for o in disk_offsets(radius) if o != (0, 0)]
    for _, view in shifted_views(image, offs, fill):
        out = jnp.minimum(out, view)
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


def binary_erosion_scipy(mask: jnp.ndarray) -> jnp.ndarray:
    """scipy.ndimage.binary_erosion parity: cross structure, border_value=0
    (the reference's marker-erosion step, postproc_other.py:43)."""
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    out = mask.astype(bool)
    for _, view in shifted_views(mask.astype(bool), offs, False):
        out = out & view
    return out


def _neighbor_or(mask: jnp.ndarray, connectivity: int) -> jnp.ndarray:
    """OR of 4- or 8-neighborhood (one binary dilation step)."""
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 2:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    out = mask
    for _, view in shifted_views(mask, offs, False):
        out = out | view
    return out


def _segmented_or_scan(reached: jnp.ndarray, allowed: jnp.ndarray,
                       axis: int) -> jnp.ndarray:
    """OR-scan along ``axis`` that resets at disallowed pixels (both
    directions): reachability propagates across whole allowed runs in one
    step instead of one pixel per iteration. Non-minor axes transpose
    minor-first (TPU scans along a non-minor axis pay per-stage relayouts)."""
    if axis not in (reached.ndim - 1, -1):
        return jnp.swapaxes(
            _segmented_or_scan(jnp.swapaxes(reached, axis, -1),
                               jnp.swapaxes(allowed, axis, -1),
                               reached.ndim - 1), axis, -1)
    reset = ~allowed

    def op(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, av | bv), ar | br

    fwd, _ = jax.lax.associative_scan(op, (reached, reset), axis=axis)
    bwd, _ = jax.lax.associative_scan(op, (reached, reset), axis=axis,
                                      reverse=True)
    return (fwd | bwd) & allowed


def flood_reach(seed: jnp.ndarray, allowed: jnp.ndarray,
                connectivity: int = 1) -> jnp.ndarray:
    """All ``allowed`` pixels 4-/8-connected to ``seed`` through ``allowed``.

    Run-length OR-scans along rows and columns + one neighbor step per sweep
    converge in a handful of sweeps for natural masks (vs. one pixel per
    iteration for naive dilation flooding).
    """
    seed = seed & allowed

    if seed.ndim == 2:
        from cdnet_tpu.ops import pallas_cc
        if pallas_cc.fixpoint_applicable(*seed.shape):
            # flood == min-propagation of 0-valued seeds through `allowed`
            vals = jnp.where(seed, jnp.int32(0), jnp.int32(2 ** 30))
            res = pallas_cc.min_fixpoint(vals, allowed, connectivity)
            return (res == 0) & allowed

    def sweep(r):
        r = _segmented_or_scan(r, allowed, axis=r.ndim - 1)
        r = _segmented_or_scan(r, allowed, axis=r.ndim - 2)
        r = (r | _neighbor_or(r, connectivity)) & allowed
        return r

    def cond(state):
        return state[1]

    def body(state):
        r, _ = state
        nr = sweep(r)
        return nr, jnp.any(nr != r)

    reach, _ = jax.lax.while_loop(cond, body, (sweep(seed), jnp.array(True)))
    return reach


def binary_fill_holes(mask: jnp.ndarray) -> jnp.ndarray:
    """Fill holes = foreground plus background not reachable from the border.

    Parity with scipy.ndimage.binary_fill_holes (4-connected background flood),
    used at `test_dam.py:546` and `postproc_other.py:51`.
    """
    mask = mask.astype(bool)
    bg = ~mask
    h, w = mask.shape[-2], mask.shape[-1]
    border = jnp.zeros_like(mask).at[..., 0, :].set(True)
    border = border.at[..., h - 1, :].set(True)
    border = border.at[..., :, 0].set(True)
    border = border.at[..., :, w - 1].set(True)
    reach = flood_reach(border & bg, bg, connectivity=1)
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
