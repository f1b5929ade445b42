"""Test-time augmentation as a batch axis + direction-class vote tables.

The reference runs 8 sequential forwards (identity, h-flip, v-flip, hv-flip,
rot90, rot90+h, rot90+v, rot90+hv) and inverse-transforms each output on the
host (`/root/reference/test_dam.py:313-450`). TPU-native design (SURVEY.md
§2.4): fold the 8 symmetries into the leading batch axis — ONE forward on the
mesh — and invert with the same static index maps.

`DcmVoting`/`DcmVoting2` permutation tables (`utils.py:1119-1159`) remap the
8 direction classes under each symmetry for majority voting.
"""
from __future__ import annotations


import jax.numpy as jnp
import numpy as np

# order matches test_dam.py: id, hf, vf, hvf, r90, r90+hf, r90+vf, r90+hvf
TTA_NAMES = ("id", "hf", "vf", "hvf", "r90", "r90_hf", "r90_vf", "r90_hvf")

# class remap tables for DcmVoting2 (utils.py:1144): trans[i][j] = class j seen
# in TTA view i corresponds to class trans[i][j] in the identity frame.
DCM_VOTING_TRANS = jnp.asarray([
    [0, 1, 2, 3, 4, 5, 6, 7, 8],
    [0, 5, 4, 3, 2, 1, 8, 7, 6],
    [0, 1, 8, 7, 6, 5, 4, 3, 2],
    [0, 5, 6, 7, 8, 1, 2, 3, 4],
    [0, 3, 4, 5, 6, 7, 8, 1, 2],
    [0, 7, 6, 5, 4, 3, 2, 1, 8],
    [0, 3, 2, 1, 8, 7, 6, 5, 4],
    [0, 7, 8, 1, 2, 3, 4, 5, 6],
], dtype=jnp.int32)




# which views carry each primitive transform (order: id, hf, vf, hvf, r90,
# r90_hf, r90_vf, r90_hvf); flips are applied AFTER the rotation on views 4-7
_FLIP_W = np.asarray([0, 1, 0, 1, 0, 1, 0, 1], bool)[:, None, None, None]
_FLIP_H = np.asarray([0, 0, 1, 1, 0, 0, 1, 1], bool)[:, None, None, None]
_ROT = np.asarray([0, 0, 0, 0, 1, 1, 1, 1], bool)[:, None, None, None]


def expand(image_hwc: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (8, H, W, C) stack of the 8 symmetry views.

    Whole-tensor rev/rot90 + per-view select masks: per-view slice+stack
    chains and index gathers both made XLA:TPU choose N/C-minor tiled
    layouts (up to 170x padding; gathers measured 37-328 ms/run at 1024^2).
    rev/transpose are native layout-preserving copies. Requires H == W.
    """
    x = jnp.broadcast_to(image_hwc[None], (8,) + image_hwc.shape)
    x = jnp.where(jnp.asarray(_ROT), jnp.rot90(x, k=1, axes=(1, 2)), x)
    x = jnp.where(jnp.asarray(_FLIP_W), jnp.flip(x, axis=2), x)
    x = jnp.where(jnp.asarray(_FLIP_H), jnp.flip(x, axis=1), x)
    return x


def invert(outputs_8hwc: jnp.ndarray) -> jnp.ndarray:
    """Inverse-transform each of the 8 views back to the identity frame.

    Spatial-only — for direction-class maps apply :data:`DCM_VOTING_TRANS`
    separately (the reference itself does NOT remap classes in the DDM-fusion
    path, and neither do we by default). Undo order matches the reference's
    re-flips (test_dam.py:356-362,428-443): flips first, then rot90 k=3.
    """
    x = outputs_8hwc
    x = jnp.where(jnp.asarray(_FLIP_W), jnp.flip(x, axis=2), x)
    x = jnp.where(jnp.asarray(_FLIP_H), jnp.flip(x, axis=1), x)
    x = jnp.where(jnp.asarray(_ROT), jnp.rot90(x, k=3, axes=(1, 2)), x)
    return x


def invert_last2(x: jnp.ndarray) -> jnp.ndarray:
    """:func:`invert` for (..., 8, H, W) tensors — the view axis at -3 and
    spatial dims LAST, the TPU-friendly layout for small-channel maps (a
    (8,H,W,C) tensor with C in {1,3,9} is lane-padded C->128 on TPU; keeping
    H,W minor avoids up to 42x physical inflation on every elementwise op)."""
    fw = jnp.asarray(np.asarray(_FLIP_W).reshape(8, 1, 1))
    fh = jnp.asarray(np.asarray(_FLIP_H).reshape(8, 1, 1))
    rot = jnp.asarray(np.asarray(_ROT).reshape(8, 1, 1))
    x = jnp.where(fw, jnp.flip(x, axis=-1), x)
    x = jnp.where(fh, jnp.flip(x, axis=-2), x)
    x = jnp.where(rot, jnp.rot90(x, k=3, axes=(-2, -1)), x)
    return x


#  DcmVoting (utils.py:1112-1139): numberListAll[i][j-1] = source class in
#  view i that becomes class j in the identity frame (class 0 passes through)
_NUMBER_LIST_ALL = jnp.asarray([
    [1, 2, 3, 4, 5, 6, 7, 8], [5, 4, 3, 2, 1, 8, 7, 6],
    [1, 8, 7, 6, 5, 4, 3, 2], [5, 6, 7, 8, 1, 2, 3, 4],
    [7, 8, 1, 2, 3, 4, 5, 6], [7, 6, 5, 4, 3, 2, 1, 8],
    [3, 2, 1, 8, 7, 6, 5, 4], [3, 4, 5, 6, 7, 8, 1, 2],
], dtype=jnp.int32)


def dcm_voting(direction_maps_8hw: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel MODE over remapped TTA direction maps (utils.py:1112-1139).

    View 0 passes through unchanged; views 1..7 remap class
    ``numberListAll[i][j]`` -> ``j+1``. Ties resolve to the smallest class
    (scipy.stats.mode semantics).
    """
    d = direction_maps_8hw.astype(jnp.int32)
    remapped = [d[0]]
    for i in range(1, 8):
        out = jnp.zeros_like(d[i])
        for j in range(8):
            out = jnp.where(d[i] == _NUMBER_LIST_ALL[i, j], j + 1, out)
        remapped.append(out)
    stack = jnp.stack(remapped)
    counts = jnp.stack([(stack == k).sum(0) for k in range(9)])
    return jnp.argmax(counts, axis=0)


def dcm_voting2(direction_maps_8hw: jnp.ndarray) -> jnp.ndarray:
    """Majority vote over TTA direction-class maps (utils.py:1144-1159).

    Input: (8, H, W) int class maps already inverse-transformed spatially.
    Each view's classes are remapped into the identity frame, then per-pixel
    argmax over vote counts (ties -> lowest class, like np.argmax).
    """
    d = direction_maps_8hw.astype(jnp.int32)
    # 9-entry table lookup per view as a direct gather — the broadcasted
    # take_along_axis formulation materialized a (8,9,H,W) int32
    # intermediate (~288 MB at 1000^2) just to index a 9-entry row
    remapped = DCM_VOTING_TRANS[jnp.arange(8)[:, None, None], d]
    votes = jnp.zeros((9,) + d.shape[1:], jnp.int32)
    for i in range(8):
        votes = votes + (remapped[i][None] == jnp.arange(9)[:, None, None])
    return jnp.argmax(votes, axis=0)
