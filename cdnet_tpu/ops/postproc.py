"""Inference post-processing: DDM boundary enhancement -> instance map.

The reference's per-image host pipeline (`/root/reference/test_dam.py:518-563`
+ `postproc_other.py:15-55`) re-expressed as jit-compiled device functions so
masks never leave the TPU (BASELINE.json north star):

1. boundary enhancement (DDM_switch=100, test_dam.py:530-539):
   inside3 = dilate(point/max(point) > 0.2, disk(1));
   eb = 2*(DDM - DDM*inside3);
   prob[..., 2] = (prob[..., 2] + 0.5*eb) * (1 + eb); pred = argmax
2. pred_inside (class 1) -> fill holes -> 4-connected CC + area filter
   (remove_small_objects(bool) semantics) -> relabel
3. postproc=0: 8-connected CC labeling (measure.label); postproc=1:
   watershed re-split (postproc_other.process ws=True, min_size=10 default)
4. disk(radius) label dilation
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cdnet_tpu.ops.connected import label as cc_label
from cdnet_tpu.ops.edt import normalized_instance_edt
from cdnet_tpu.ops.morphology import (binary_erosion_scipy, binary_fill_holes,
                                      dilation, remove_small_objects)
from cdnet_tpu.ops.watershed import watershed


def enhance_boundary(prob_maps: jnp.ndarray, point_map: jnp.ndarray,
                     ddm: jnp.ndarray) -> jnp.ndarray:
    """DDM_switch=100 boundary enhancement (test_dam.py:530-539).

    prob_maps (H,W,3) softmax, point_map (H,W), ddm (H,W) in [0,1].
    """
    inside3 = (point_map / jnp.maximum(jnp.max(point_map), 1e-7)) > 0.2
    inside3 = dilation(inside3, 1)
    eb = 2.0 * (ddm - ddm * inside3)
    enhanced = (prob_maps[..., 2] + 0.5 * eb) * (1.0 + eb)
    return prob_maps.at[..., 2].set(enhanced)


def enhance_boundary_cf(prob_maps: jnp.ndarray, point_map: jnp.ndarray,
                        ddm: jnp.ndarray) -> jnp.ndarray:
    """:func:`enhance_boundary` on channel-FIRST probs (3, H, W) — identical
    numerics, TPU-friendly layout (H,W stay in the tiled minor dims)."""
    inside3 = (point_map / jnp.maximum(jnp.max(point_map), 1e-7)) > 0.2
    inside3 = dilation(inside3, 1)
    eb = 2.0 * (ddm - ddm * inside3)
    enhanced = (prob_maps[2] + 0.5 * eb) * (1.0 + eb)
    return prob_maps.at[2].set(enhanced)


@functools.partial(jax.jit, static_argnames=("min_area", "radius", "use_watershed",
                                              "ws_min_size", "rescue_markerless"))
def instances_from_pred(pred: jnp.ndarray, min_area: int = 20, radius: int = 2,
                        use_watershed: bool = False, ws_min_size: int = 10,
                        rescue_markerless: bool = True):
    """3-class argmax map -> instance labels (test_dam.py:544-563).

    Returns (labels int32, pred2 bool). ``use_watershed`` = opt.post.postproc.

    ``rescue_markerless`` (watershed path, on by default — a deliberate
    improvement over the reference): a mask component whose marker was
    erased by the EDT-threshold/erosion/remove-small chain (typical for
    small nuclei) is unreachable by the flood; skimage/the reference drop
    it entirely (postproc_other.py:41-48), deleting a real predicted
    nucleus. Here each such component keeps its own instance id instead.
    On the dense-tile sweep this is worth +0.01-0.02 AJI vs the reference
    semantics (experiments/ws_divergence/RESULTS.md); pass False for
    output-exact reference parity.
    """
    pred_inside = pred == 1
    pred_inside2 = binary_fill_holes(pred_inside)
    # remove_small_objects on bool: 4-connected CC + area filter -> bool
    lab4, _ = cc_label(pred_inside2, connectivity=1)
    lab4 = remove_small_objects(lab4, min_area)
    pred2 = lab4 > 0
    if use_watershed:
        # postproc_other.process(pred_inside*255, ws=True): note the reference
        # feeds the PRE-fill inside mask here (test_dam.py:557)
        lab, _ = cc_label(pred_inside, connectivity=1)
        dist_f = 255.0 * normalized_instance_edt(lab)
        # markers use the reference's uint8 threshold (postproc_other.py:41);
        # the flood itself gets the UNquantized distance — sub-level
        # resolution dissolves quantization plateaus (FIFO-tie parity in
        # metric space, experiments/ws_divergence/RESULTS.md)
        dist = dist_f.astype(jnp.uint8)
        marker = dist > 125
        marker = binary_fill_holes(marker)
        marker = binary_erosion_scipy(marker)
        mlab, _ = cc_label(marker, connectivity=1)
        mlab = remove_small_objects(mlab, ws_min_size)
        labels = watershed(dist_f, mlab, pred_inside)
        if rescue_markerless:
            # orphan = mask pixels no flood reached == components with no
            # surviving marker (every marked component floods completely);
            # re-seed each with its own CC id past the current maximum
            orphan = pred_inside & (labels == 0)
            olab, _ = cc_label(orphan, connectivity=1)
            labels = jnp.where(orphan, olab + jnp.max(labels), labels)
        labels = remove_small_objects(labels, ws_min_size)
    else:
        labels, _ = cc_label(pred2, connectivity=2)
    labels = dilation(labels, radius)
    return labels, pred2


def _diamond_dilation(labels: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Label dilation with an L1-diamond structuring element (the dcan
    k_disk, postproc_other.py:83-91, is |dy|+|dx| <= 3, not a Euclidean disk).

    Uses shifted_views' pad-once pattern: one pad + k static slices instead
    of k pads (the per-shift jnp.pad variant costs a dispatch+copy kernel
    per offset — see morphology.shifted_views)."""
    from cdnet_tpu.ops.morphology import shifted_views
    offs = [(dy, dx)
            for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)
            if 0 < abs(dy) + abs(dx) <= radius]
    out = labels
    for _, view in shifted_views(labels, offs, 0):
        out = jnp.maximum(out, view)
    return out


def _per_instance_dilate_fill(labels: jnp.ndarray, radius: int,
                              max_instances: int) -> jnp.ndarray:
    """Reference loop `for inst_id: dilate; fill_holes; canvas[...]=id`
    (postproc_other.py:60-68, 91-97): each instance is dilated and
    hole-filled INDEPENDENTLY (a cavity between two instances is a hole of
    neither and stays background), ascending-id overwrite == max-id rule.

    Vectorized over CHUNKS of ``max_instances`` ids inside a while_loop, so
    any instance count is handled exactly (no silent cap): the loop runs
    ceil(n_labels / max_instances) iterations, each a vmapped
    dilate+fill over one id chunk, combined with the max-id rule."""
    ids0 = jnp.arange(1, max_instances + 1, dtype=jnp.int32)
    n_labels = jnp.max(labels)

    def chunk_canvas(start):
        ids = start + ids0
        onehot = labels[None] == ids[:, None, None]
        dil = jax.vmap(
            lambda m: _diamond_dilation(m.astype(jnp.int32), radius) > 0)(onehot)
        # batched XLA flood: a chunk-wide vmap over the pallas fixpoint
        # would serialize into per-instance kernels (see pallas_cc._op_vmap)
        from cdnet_tpu.ops.pallas_gate import scoped_disable
        with scoped_disable(True):
            filled = jax.vmap(binary_fill_holes)(dil)
        return jnp.max(jnp.where(filled, ids[:, None, None], 0), axis=0)

    def cond(state):
        start, _ = state
        return start < n_labels

    def body(state):
        start, canvas = state
        return start + max_instances, jnp.maximum(canvas, chunk_canvas(start))

    _, canvas = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros_like(labels)))
    return canvas


@functools.partial(jax.jit, static_argnames=("min_size", "max_instances"))
def process_dcan(blb: jnp.ndarray, cnt: jnp.ndarray, min_size: int = 10,
                 max_instances: int = 160):
    """DCAN post-processing (postproc_other.py:69-97): instances from
    (blob - contour) > 0.3, small-object removal, then per-instance diamond-3
    dilation + hole filling."""
    mask = (blb - cnt) > 0.3
    labels, _ = cc_label(mask, connectivity=1)
    labels = remove_small_objects(labels, min_size)
    return _per_instance_dilate_fill(labels, 3, max_instances)


@functools.partial(jax.jit, static_argnames=("min_size", "max_instances"))
def process_micronet(pred: jnp.ndarray, min_size: int = 10,
                     max_instances: int = 160):
    """Micro-Net post-processing (postproc_other.py:50-68): fill holes, CC,
    remove-small, then per-instance cross-kernel dilation + hole fill."""
    mask = binary_fill_holes(pred > 0.5)
    labels, _ = cc_label(mask, connectivity=1)
    labels = remove_small_objects(labels, min_size)
    return _per_instance_dilate_fill(labels, 1, max_instances)
