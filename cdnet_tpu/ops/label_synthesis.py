"""On-device training-label synthesis (3-class / point heatmap / direction map).

TPU-native re-design of the reference's `LabelEncoding`
(`/root/reference/my_transforms_direction.py:687-885`), which runs a Python
loop per nucleus (scipy EDT + numba center search + torch Sobel) on CPU
dataloader workers. Here the whole synthesis is one jit program:

1. 3-class map: inside = instance>0 (dropped if the class has <5 px), boundary
   via the reference's *bitwise* ``dilate(labels) & ~erode(labels)`` on
   instance ids (my_transforms_direction.py:757-759 — faithfully including the
   id-bit-pattern quirk).
2. instance map for supervision: watershed re-split of the inside mask
   (postproc_other.process ws=True, min_size=5) then disk(1) dilation
   (my_transforms_direction.py:766-768).
3. centers: vectorized 8-ray centerness argmax (ops/centerpoint).
4. point target: 255 at centers, Gaussian sigma=2 (scipy reflect parity).
5. direction classes: per-instance center-distance fields on the dilated
   instance (closed-form |p - c|, replacing the reference's EDT of the
   point-map complement), 11x11 Sobel per instance (batched conv on the MXU),
   last-instance-wins combination (ascending-id loop parity), angle ->
   8-sector quantization -> classes 1..8, 0 = background.

Static bound ``max_instances`` makes the per-instance batch jit-compatible
(SURVEY.md §7 hard part (a)).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cdnet_tpu.ops import geometry
from cdnet_tpu.ops import centerpoint
from cdnet_tpu.ops.centerpoint import centerness_map
from cdnet_tpu.ops.connected import label as cc_label
from cdnet_tpu.ops.edt import normalized_instance_edt
from cdnet_tpu.ops.filters import gaussian_filter
from cdnet_tpu.ops.morphology import (binary_erosion_scipy, binary_fill_holes,
                                      dilation, erosion, remove_small_objects)
from cdnet_tpu.ops.watershed import watershed



@functools.partial(jax.jit, static_argnames=("radius",))
def ternary_label(instance_labels: jnp.ndarray, radius: int = 1):
    """Instance map -> (3-class map, inside mask) (my_transforms_direction.py:745-759).

    Returns (label_3c in {0,1,2}, new_label_inside bool). The boundary class
    uses the reference's bitwise ``dilate & ~erode`` on raw instance ids.
    """
    labels = jnp.asarray(instance_labels, dtype=jnp.int32)
    inside = (labels > 0).astype(jnp.int32)
    # remove_small_objects(new_label, 5) on an int image treats value 1 as one
    # component: the whole class drops if it has < 5 px total
    inside = jnp.where(jnp.sum(inside) >= 5, inside, 0)
    new_label_inside = inside > 0
    dil = dilation(labels, 1)
    ero = erosion(labels, radius)
    boun = jnp.bitwise_and(dil, jnp.bitwise_not(ero))
    label_3c = jnp.where(boun > 0, 2, inside)
    return label_3c.astype(jnp.int32), new_label_inside


@functools.partial(jax.jit, static_argnames=("min_size",))
def resplit_instances(inside_mask: jnp.ndarray,
                      min_size: int = 5) -> jnp.ndarray:
    """postproc_other.process(..., ws=True) semantics on device.

    4-connected CC -> per-instance EDT (uint8-normalized) -> marker =
    dist>125, fill holes, scipy-erode, CC, remove-small -> watershed ->
    remove-small. (postproc_other.py:36-48)
    """
    mask = inside_mask.astype(bool)
    lab, _ = cc_label(mask, connectivity=1)
    dist_f = 255.0 * normalized_instance_edt(lab)
    dist = dist_f.astype(jnp.uint8)  # markers: reference uint8 threshold
    marker = dist > 125
    marker = binary_fill_holes(marker)
    marker = binary_erosion_scipy(marker)
    mlab, _ = cc_label(marker, connectivity=1)
    mlab = remove_small_objects(mlab, min_size)
    # flood on the unquantized distance (plateau-tie parity; see watershed.py)
    ws = watershed(dist_f, mlab, mask)
    ws = remove_small_objects(ws, min_size)
    return ws


@functools.partial(jax.jit, static_argnames=("max_instances", "radius", "sobel_ksize"))
def direction_and_point(label_instance: jnp.ndarray, inside_mask: jnp.ndarray,
                        max_instances: int, radius: int = 1,
                        sobel_ksize: int = 11):
    """Instance map (already disk(1)-dilated) -> (direction 0..8, point gaussian).

    my_transforms_direction.py:788-871 semantics: per instance — center via
    8-ray centerness, center-distance field on the disk(radius)-dilated
    instance, 11x11 Sobel, last-id-wins merge — then angle quantization into
    8 classes (+1 shift, 0 = background outside ``inside_mask``).

    ``max_instances`` is a CHUNK size, not a cap: ids are processed in
    while_loop rounds of ``max_instances`` until max(labels) is covered, so
    any instance count is handled exactly (the reference's per-instance
    Python loop runs over every id, my_transforms_direction.py:800-835; the
    round-2 version silently gave ids past the bound a constant wrong
    direction class). One round suffices for typical tiles, so the common
    case costs exactly what the unchunked version did.
    """
    labels = jnp.asarray(label_instance, dtype=jnp.int32)
    h, w = labels.shape
    n = max_instances

    # centerness is chunk-independent: compute once
    cent = centerness_map(labels)
    flat_l = labels.reshape(-1)
    flat_c = cent.reshape(-1)
    n_total = jnp.max(labels)

    hh = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    ww = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ih = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    iw = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    kbank = geometry.sobel_kernel(sobel_ksize)           # (k,k,1,2)
    pad = [(sobel_ksize // 2,) * 2] * 2

    def chunk_centers(base):
        """instance_centers for ids base+1 .. base+n, reusing the one
        precomputed centerness field (winner semantics live in
        centerpoint.centers_from_centerness)."""
        return centerpoint.centers_from_centerness(flat_l, flat_c, h, w, n,
                                                   base)

    def chunk_body(carry):
        base, owner, gh, gw, point = carry
        centers, valid = chunk_centers(base)
        ids = base + jnp.arange(1, n + 1, dtype=jnp.int32)

        # per-instance dilated masks (n,H,W) for this id range
        onehot = labels[None] == ids[:, None, None]
        onehot_dil = jax.vmap(lambda m: dilation(m, radius))(onehot)
        onehot_dil = onehot_dil & valid[:, None, None]

        # center-distance field: |p - c_k| * mask ; normalized, inverted
        dy = hh[None] - centers[:, 0, None, None].astype(jnp.float32)
        dx = ww[None] - centers[:, 1, None, None].astype(jnp.float32)
        int_pos = jnp.sqrt(dy * dy + dx * dx) * onehot_dil
        max_k = jnp.max(int_pos.reshape(n, -1), axis=1)
        dcm = (1.0 - int_pos / (max_k[:, None, None] + 1e-7)) * onehot_dil

        # 11x11 Sobel per instance, zeroed outside that instance's dilated
        # mask. As a DEPTHWISE conv with the instance dim in lanes: the
        # natural (N*batch, H, W, 1) single-channel conv leaves the MXU/VPU
        # lanes 99% idle (measured 24 ms for this one conv at batch 8);
        # grouped over n=160 lane channels it is a well-tiled stencil
        # (~4 ms). Numerics are identical: same kernel per group, same zero
        # padding.
        xc = jnp.moveaxis(dcm, 0, -1)[None]              # (1,H,W,n)
        grads = jnp.stack([
            jnp.moveaxis(jax.lax.conv_general_dilated(
                xc, jnp.tile(kbank[..., c:c + 1], (1, 1, 1, n)), (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=n)[0], -1, 0)
            for c in range(2)])                          # (2,n,H,W)
        grads = grads * onehot_dil[None]

        # last-writer-wins by ascending id: owner = max covering id, both
        # within this chunk and across chunks (bases ascend)
        c_owner = jnp.max(jnp.where(onehot_dil, ids[:, None, None], 0),
                          axis=0)                        # (H,W)
        c_idx = jnp.clip(c_owner - 1 - base, 0, n - 1)
        c_gh = jnp.where(c_owner > 0, grads[0][c_idx, ih, iw], 0.0)
        c_gw = jnp.where(c_owner > 0, grads[1][c_idx, ih, iw], 0.0)
        upd = c_owner > owner
        owner = jnp.where(upd, c_owner, owner)
        gh = jnp.where(upd, c_gh, gh)
        gw = jnp.where(upd, c_gw, gw)
        point = point.at[centers[:, 0], centers[:, 1]].add(
            jnp.where(valid, 255.0, 0.0))
        return base + n, owner, gh, gw, point

    init = (jnp.zeros((), jnp.int32),
            jnp.zeros((h, w), jnp.int32),                # owner
            jnp.zeros((h, w), jnp.float32),              # gh
            jnp.zeros((h, w), jnp.float32),              # gw
            jnp.zeros((h, w), jnp.float32))              # point
    _, owner, gh, gw, point = jax.lax.while_loop(
        lambda c: c[0] < n_total, chunk_body, init)

    # angle -> 8-class quantization (my_transforms_direction.py:852-871).
    # The reference's angle_to_vector -> vector_to_label round-trip maps an
    # angle to its sector center and back through atan2(sin, cos) — an exact
    # identity on sector centers — so one align_angle gives the same class
    # without materializing an (H,W,2) vector field.
    angle = jnp.rad2deg(jnp.arctan2(gh, gw))
    angle = jnp.where(inside_mask, angle, 0.0)
    _, dir_cls = geometry.align_angle(angle, num_classes=8)
    dir_cls = jnp.where(inside_mask, dir_cls + 1, 0).astype(jnp.int32)

    # point heatmap: 255 at centers (accumulated per chunk above), gaussian
    # sigma=2; the reference casts float16
    point_gauss = gaussian_filter(point, sigma=2).astype(jnp.float16)
    return dir_cls, point_gauss.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("max_instances", "radius"))
def synthesize_labels(instance_labels: jnp.ndarray, max_instances: int = 160,
                      radius: int = 1):
    """Full LabelEncoding for instance-level input (the MoNuSeg/CPM17 path).

    Returns dict with:
      - "label_3c":  (H,W) int32 in {0 bg, 1 inside, 2 boundary}
      - "point":     (H,W) float32 Gaussian point heatmap (peak ~255)
      - "direction": (H,W) int32 in {0..8} (0 = background)
      - "instance":  (H,W) int32 re-split + dilated supervision instances
    """
    label_3c, inside = ternary_label(instance_labels, radius)
    label_instance = resplit_instances(label_3c == 1, min_size=5)
    label_instance = dilation(label_instance, radius)
    dir_cls, point = direction_and_point(label_instance, inside,
                                         max_instances, radius)
    return {"label_3c": label_3c, "point": point, "direction": dir_cls,
            "instance": label_instance}
