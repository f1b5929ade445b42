"""Direction geometry: angle <-> vector <-> direction-class conversions.

TPU-native re-design of the reference's DTOffsetHelper + Sobel kernel bank
(`/root/reference/data_prepare/SegFix_offset_helper.py:50-132,247-341,424-506`).
The reference builds these maps with per-class boolean-mask loops on the host;
here every conversion is a closed-form vectorized expression (gather / ceil),
so the whole pipeline stays inside one XLA program.

Conventions (identical to the reference):
- Angles are degrees in (-180, 180], measured as atan2(h_component, w_component),
  i.e. angle 0 points along +w (image "right"), angle 90 along +h (image "down").
- Direction class ``i`` of ``num_classes`` covers the half-open angular interval
  ``(-180 + i*step - step/2, -180 + i*step + step/2]`` with ``step = 360/num_classes``;
  class 0 is centered at -180 and also absorbs angles above ``180 - step/2``.
- Class->offset lookup tables carry an optional leading "background" row
  (tables for 5/9/17 classes prepend ``[0, 0]``), matching
  ``label_to_vector_mapping`` (`SegFix_offset_helper.py:50-89`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Class -> (offset_h, offset_w) lookup tables. Semantics follow the reference's
# `label_to_vector_mapping` (SegFix_offset_helper.py:50-89): entries are unit
# grid steps toward the class's angular center; 5/9/17 variants prepend a
# zero row for the background class.
_LABEL_TO_VECTOR: dict[int, list[list[int]]] = {
    4: [[-1, -1], [-1, 1], [1, 1], [1, -1]],
    5: [[0, 0], [-1, -1], [-1, 1], [1, 1], [1, -1]],
    8: [[0, -1], [-1, -1], [-1, 0], [-1, 1], [0, 1], [1, 1], [1, 0], [1, -1]],
    9: [[0, 0], [0, -1], [-1, -1], [-1, 0], [-1, 1], [0, 1], [1, 1], [1, 0], [1, -1]],
    16: [
        [0, -2], [-1, -2], [-2, -2], [-2, -1],
        [-2, 0], [-2, 1], [-2, 2], [-1, 2],
        [0, 2], [1, 2], [2, 2], [2, 1],
        [2, 0], [2, -1], [2, -2], [1, -2],
    ],
    17: [
        [0, 0], [0, -2], [-1, -2], [-2, -2], [-2, -1],
        [-2, 0], [-2, 1], [-2, 2], [-1, 2],
        [0, 2], [1, 2], [2, 2], [2, 1],
        [2, 0], [2, -1], [2, -2], [1, -2],
    ],
    32: [
        [0, -4], [-1, -4], [-2, -4], [-3, -4], [-4, -4], [-4, -3], [-4, -2], [-4, -1],
        [-4, 0], [-4, 1], [-4, 2], [-4, 3], [-4, 4], [-3, 4], [-2, 4], [-1, 4],
        [0, 4], [1, 4], [2, 4], [3, 4], [4, 4], [4, 3], [4, 2], [4, 1],
        [4, 0], [4, -1], [4, -2], [4, -3], [4, -4], [3, -4], [2, -4], [1, -4],
    ],
}


def label_to_vector_table(num_classes: int) -> jnp.ndarray:
    """(num_classes, 2) int32 lookup table of (offset_h, offset_w) per class."""
    return jnp.asarray(_LABEL_TO_VECTOR[num_classes], dtype=jnp.int32)


def align_angle(angle_map: jnp.ndarray, num_classes: int = 8):
    """Quantize angles (degrees) into ``num_classes`` sectors.

    Returns ``(aligned_angle, class_index)``. Matches the reference's
    `DTOffsetHelper.align_angle` (SegFix_offset_helper.py:312-341) including
    the half-open right-closed sector boundaries and the special 4-class
    diagonal quantization (`align_angle_c4`, :287-309).
    """
    angle_map = jnp.asarray(angle_map)
    if num_classes == 4:
        # c4 mode: [-180,-90) -> 0, [-90,0) -> 1, [0,90) -> 2, [90,180) -> 3
        idx = jnp.clip(jnp.trunc((angle_map + 180.0) / 90.0).astype(jnp.int32), 0, 3)
        new_angle = idx.astype(angle_map.dtype) * 90.0 - 135.0
        return new_angle, idx
    step = 360.0 / num_classes
    # Class i covers (center_i - step/2, center_i + step/2] with
    # center_i = -180 + i*step: i = ceil(u - 0.5) for u = (angle+180)/step,
    # wrapped so u > n - 0.5 folds back to class 0.
    u = (angle_map + 180.0) / step
    idx = jnp.ceil(u - 0.5).astype(jnp.int32)
    idx = jnp.where(idx >= num_classes, 0, idx)
    idx = jnp.where(idx < 0, 0, idx)
    new_angle = (-180.0 + idx.astype(angle_map.dtype) * step)
    return new_angle, idx


def angle_to_vector(angle_map: jnp.ndarray, num_classes: int | None = 8) -> jnp.ndarray:
    """Angles (degrees) -> unit vectors ``[..., (h, w)]``.

    ``vector = [sin(a), cos(a)]`` after optional sector alignment; parity with
    `DTOffsetHelper.angle_to_vector` (SegFix_offset_helper.py:424-450).
    """
    angle_map = jnp.asarray(angle_map, dtype=jnp.float32)
    if num_classes is not None:
        angle_map, _ = align_angle(angle_map, num_classes)
    rad = jnp.deg2rad(angle_map)
    return jnp.stack([jnp.sin(rad), jnp.cos(rad)], axis=-1)


def vector_to_label(vector_map: jnp.ndarray, num_classes: int = 8) -> jnp.ndarray:
    """Vectors ``[..., (h, w)]`` -> direction class indices.

    Parity with `DTOffsetHelper.vector_to_label` (SegFix_offset_helper.py:487-506):
    angle = atan2(v_h, v_w) in degrees, then sector alignment.
    """
    angle = jnp.rad2deg(jnp.arctan2(vector_map[..., 0], vector_map[..., 1]))
    _, idx = align_angle(angle, num_classes)
    return idx


def angle_to_direction_label(
    angle_map: jnp.ndarray,
    seg_label_map: jnp.ndarray | None = None,
    num_classes: int = 8,
) -> jnp.ndarray:
    """Angles -> class labels with -1 for ignored (background) pixels.

    Parity with `DTOffsetHelper.angle_to_direction_label`
    (SegFix_offset_helper.py:452-484) in its distance_map=None form.
    """
    _, label_map = align_angle(angle_map, num_classes)
    if seg_label_map is not None:
        label_map = jnp.where(seg_label_map == -1, -1, label_map)
    return label_map


def label_to_vector(label_map: jnp.ndarray, num_classes: int = 8) -> jnp.ndarray:
    """Direction-class map -> integer offset vectors ``[..., (h, w)]``.

    Replaces the reference's per-class masked assignment
    (`DTOffsetHelper.label_to_vector`, SegFix_offset_helper.py:247-261) with
    arithmetic selects over the tiny class table — a table gather at 1024^2
    measured 15 ms/run on v5e; the select chain fuses to one pass.
    Out-of-range labels (e.g. -1 ignore) map to (0, 0).
    """
    mapping = _LABEL_TO_VECTOR[num_classes]
    lab = jnp.asarray(label_map)
    vh = jnp.zeros(lab.shape, jnp.int32)
    vw = jnp.zeros(lab.shape, jnp.int32)
    for cls, (h_off, w_off) in enumerate(mapping):
        is_c = lab == cls
        if h_off:
            vh = jnp.where(is_c, h_off, vh)
        if w_off:
            vw = jnp.where(is_c, w_off, vw)
    return jnp.stack([vh, vw], axis=-1)


@functools.lru_cache(maxsize=None)
def _sobel_numpy(ksize: int) -> np.ndarray:
    """(ksize, ksize, 2) float32; channel 0 = h-gradient (y), channel 1 = w-gradient (x).

    Weight at offset (j', i') from the center is ``i'/(i'^2+j'^2)`` for the x
    kernel and ``j'/(i'^2+j'^2)`` for the y kernel, center weight 0 — the
    large-support Sobel of the reference (`Sobel._generate_sobel_kernel`,
    SegFix_offset_helper.py:102-132).
    """
    assert ksize % 2 == 1, "sobel kernel size must be odd"
    half = (ksize - 1) / 2.0
    k = np.zeros((ksize, ksize, 2), dtype=np.float32)
    for j in range(ksize):
        for i in range(ksize):
            j_, i_ = j - half, i - half
            if j_ == 0 and i_ == 0:
                continue
            r2 = i_ * i_ + j_ * j_
            k[j, i, 0] = j_ / r2  # y / h gradient
            k[j, i, 1] = i_ / r2  # x / w gradient
    return k


def sobel_kernel(ksize: int = 11) -> jnp.ndarray:
    """(ksize, ksize, 1, 2) HWIO kernel for NHWC conv: out ch 0 = d/dh, ch 1 = d/dw."""
    return jnp.asarray(_sobel_numpy(ksize)[:, :, None, :])


def angle_to_offset(angle_map: jnp.ndarray, distance_map: jnp.ndarray | None = None,
                    num_classes: int = 8, max_distance: int = 5,
                    min_distance: int = 0) -> jnp.ndarray:
    """Angles -> integer offset vectors, zeroed outside the distance band.

    Parity with `DTOffsetHelper.angle_to_offset` (SegFix_offset_helper.py:
    344-390) with scale=1.
    """
    _, idx = align_angle(angle_map, num_classes)
    vec = label_to_vector_table(num_classes)[idx]
    if distance_map is not None:
        ok = (distance_map <= max_distance) & (distance_map >= min_distance)
        vec = jnp.where(ok[..., None], vec, 0)
    return vec


def distance_to_mask_label(distance_map: jnp.ndarray, seg_label_map: jnp.ndarray,
                           max_distance: int = 5, min_distance: int = 0) -> jnp.ndarray:
    """Distance band -> binary mask label with -1 ignore
    (SegFix_offset_helper.py:263-284)."""
    keep = (distance_map <= max_distance) & (distance_map >= min_distance)
    out = jnp.where(keep, 1, 0)
    return jnp.where(seg_label_map == -1, -1, out)


def distance_to_energy_label(distance_map: jnp.ndarray, seg_label_map: jnp.ndarray,
                             energy_level_step: int = 5,
                             max_distance: int = 5) -> jnp.ndarray:
    """Distance -> quantized energy level with -1 ignore
    (SegFix_offset_helper.py:191-219)."""
    num_levels = max_distance // energy_level_step + 1
    lvl = jnp.clip(
        (distance_map // energy_level_step).astype(jnp.int32), 0, num_levels - 2
    ) if num_levels > 1 else jnp.zeros(distance_map.shape, jnp.int32)
    lvl = jnp.where(distance_map >= max_distance, num_levels - 1, lvl)
    return jnp.where(seg_label_map == -1, -1, lvl)


def encode_multi_labels(dir_labels: jnp.ndarray) -> jnp.ndarray:
    """uint8 bitmask -> 8 binary channels (SegFix_offset_helper.py:137-148)."""
    bits = jnp.arange(8, dtype=jnp.int32)
    return ((dir_labels[..., None].astype(jnp.int32) & (1 << bits)) != 0
            ).astype(jnp.int32)


def edge_mask_to_vector(edge_mask: jnp.ndarray, ksize: int = 11,
                        normalized: bool = True) -> jnp.ndarray:
    """Edge mask -> Sobel offset field (SegFix_offset_helper.py:150-168).

    ``edge_mask``: (..., H, W), 1 = edge. Returns (..., H, W, 2).
    """
    field = 1.0 - jnp.clip(edge_mask.astype(jnp.float32), 0.0, 1.0)
    grad = sobel_gradients(field, ksize)
    if normalized:
        norm = jnp.sqrt(jnp.sum(grad ** 2, axis=-1, keepdims=True))
        grad = grad / jnp.maximum(norm, 1e-12)
    return grad


def logits_to_vector(dir_logits: jnp.ndarray, num_classes: int = 8) -> jnp.ndarray:
    """Direction logits -> expected unit offset vector
    (SegFix_offset_helper.py:221-237). ``dir_logits``: (..., num_classes)."""
    probs = jax.nn.softmax(dir_logits, axis=-1)
    table = label_to_vector_table(num_classes).astype(jnp.float32)
    vec = probs @ table  # (..., 2)
    norm = jnp.sqrt(jnp.sum(vec ** 2, axis=-1, keepdims=True))
    return vec / jnp.maximum(norm, 1e-12)


def get_opposite_angle(angle_map: jnp.ndarray) -> jnp.ndarray:
    """Angle + 180 wrapped to (-180, 180] (SegFix_offset_helper.py:239-244)."""
    new = angle_map + 180.0
    return jnp.where((new >= 180.0) & (new <= 360.0), new - 360.0, new)


def sobel_gradients(field: jnp.ndarray, ksize: int = 11) -> jnp.ndarray:
    """Cross-correlate a (..., H, W) scalar field with the Sobel bank.

    Returns (..., H, W, 2) with (d/dh, d/dw). Both torch's F.conv2d and
    lax.conv_general_dilated compute cross-correlation, so numerics match the
    reference's `edge_mask_to_vector` / LabelEncoding usage exactly.
    """
    field = jnp.asarray(field, dtype=jnp.float32)
    batch_shape = field.shape[:-2]
    h, w = field.shape[-2:]
    x = field.reshape((-1, h, w, 1))
    out = jax.lax.conv_general_dilated(
        x,
        sobel_kernel(ksize),
        window_strides=(1, 1),
        padding=[(ksize // 2, ksize // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out.reshape(batch_shape + (h, w, 2))
