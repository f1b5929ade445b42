"""Direction Difference Map (DDM) generation.

TPU-native re-design of the reference's `generate_dd_map`
(`/root/reference/data_prepare/getDirectionDiffMap.py:44-108`): direction-class
map -> per-class offset vectors -> min cosine similarity against the 8 (or 4)
zero-padded neighbor shifts -> boundary-evidence map in [0, 1]. The reference
loops over shifted copies on the host; here the shifts are a static unrolled
set of padded slices inside one jit program, batchable over TTA views with
``vmap``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cdnet_tpu.ops.geometry import label_to_vector

# feature_k[i, j] = orig[i + dy, j + dx]; our _shift2d(x, s_h, s_w) gives
# out[i, j] = x[i - s_h, j - s_w], so shift = (-dy, -dx).
_NEIGHBORS_8 = [
    (1, 1), (1, 0), (1, -1),   # features 1..3 (getDirectionDiffMap.py:71-73)
    (0, 1), (0, -1),           # features 4, 6
    (-1, 1), (-1, 0), (-1, -1),  # features 7..9
]
_NEIGHBORS_4 = [(1, 0), (0, 1), (0, -1), (-1, 0)]  # features 2,4,6,8 (:58-61)


def generate_dd_map(label_direction: jnp.ndarray, direction_classes: int = 9) -> jnp.ndarray:
    """(H, W) int direction-class map (0 = background) -> (H, W) float DDM in [0,1].

    Numerics parity with getDirectionDiffMap.py:44-108: cosine denominator
    eps 1e-6, ``1 - round(min_cos)`` with round-half-to-even, min-max
    normalization over the image.
    """
    label_direction = jnp.asarray(label_direction)
    vec = label_to_vector(label_direction, direction_classes).astype(jnp.float32)
    neighbors = _NEIGHBORS_4 if direction_classes - 1 == 4 else _NEIGHBORS_8

    center = vec
    center_norm = jnp.sqrt(center[..., 0] ** 2 + center[..., 1] ** 2)
    min_cos = jnp.full(label_direction.shape, jnp.inf, dtype=jnp.float32)
    # pad once; each neighbor is a static slice (feature_k[p] = orig[p + d])
    vh = jnp.pad(vec[..., 0], 1)
    vw = jnp.pad(vec[..., 1], 1)
    h, w = label_direction.shape[-2], label_direction.shape[-1]
    for dy, dx in neighbors:
        nb_h = jax.lax.dynamic_slice(vh, (1 + dy, 1 + dx), (h, w))
        nb_w = jax.lax.dynamic_slice(vw, (1 + dy, 1 + dx), (h, w))
        dot = center[..., 0] * nb_h + center[..., 1] * nb_w
        nb_norm = jnp.sqrt(nb_h ** 2 + nb_w ** 2)
        cos = dot / (center_norm * nb_norm + 1e-6)
        min_cos = jnp.minimum(min_cos, cos)

    min_cos = jnp.where(label_direction == 0, 1.0, min_cos)
    dd = 1.0 - jnp.round(min_cos)
    lo, hi = jnp.min(dd), jnp.max(dd)
    return jnp.where(hi > lo, (dd - lo) / (hi - lo), jnp.zeros_like(dd))


def generate_dd_maps_batch(label_directions: jnp.ndarray,
                           direction_classes: int = 9) -> jnp.ndarray:
    """(V, H, W) batched DDM: the fused Pallas kernel on TPU (one VMEM pass
    per view / row block instead of ~26 XLA HBM round trips), vmapped XLA
    elsewhere. Identical numerics (tests/test_pallas.py)."""
    from cdnet_tpu.ops.pallas_gate import scoped_off
    if (direction_classes == 9 and not scoped_off()
            and jax.devices()[0].platform == "tpu"):
        from cdnet_tpu.ops.pallas_kernels import generate_dd_maps_pallas
        return generate_dd_maps_pallas(label_directions, direction_classes)
    return jax.vmap(
        lambda m: generate_dd_map(m, direction_classes))(label_directions)
