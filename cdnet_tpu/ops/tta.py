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


def expand(image_hwc: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (8, H', W', C) stack of the 8 symmetry views.

    PIL ``rotate(90, expand=True)`` is a counter-clockwise rotation == np.rot90
    k=1 on (H, W) axes; flips follow test_dam.py:314-317, 373-377 exactly.
    Requires H == W for a stackable batch (pad beforehand otherwise).
    """
    img = image_hwc
    hf = jnp.flip(img, axis=1)
    vf = jnp.flip(img, axis=0)
    hvf = jnp.flip(hf, axis=0)
    r90 = jnp.rot90(img, k=1, axes=(0, 1))
    r90_hf = jnp.flip(r90, axis=1)
    r90_vf = jnp.flip(r90, axis=0)
    r90_hvf = jnp.flip(r90_hf, axis=0)
    return jnp.stack([img, hf, vf, hvf, r90, r90_hf, r90_vf, r90_hvf])


def invert(outputs_8hwc: jnp.ndarray) -> jnp.ndarray:
    """Inverse-transform each of the 8 views back to the identity frame.

    Matches the reference's re-flip order (test_dam.py:356-362, 428-443):
    flips first, then rot90 k=3 for the rotated group. Spatial-only — for
    direction-class maps apply :data:`DCM_VOTING_TRANS` separately (the
    reference itself does NOT remap classes in the DDM-fusion path, and
    neither do we by default).
    """
    o = outputs_8hwc
    outs = [
        o[0],
        jnp.flip(o[1], axis=1),
        jnp.flip(o[2], axis=0),
        jnp.flip(jnp.flip(o[3], axis=0), axis=1),
        jnp.rot90(o[4], k=3, axes=(0, 1)),
        jnp.rot90(jnp.flip(o[5], axis=1), k=3, axes=(0, 1)),
        jnp.rot90(jnp.flip(o[6], axis=0), k=3, axes=(0, 1)),
        jnp.rot90(jnp.flip(jnp.flip(o[7], axis=0), axis=1), k=3, axes=(0, 1)),
    ]
    return jnp.stack(outs)


def dcm_voting2(direction_maps_8hw: jnp.ndarray) -> jnp.ndarray:
    """Majority vote over TTA direction-class maps (utils.py:1144-1159).

    Input: (8, H, W) int class maps already inverse-transformed spatially.
    Each view's classes are remapped into the identity frame, then per-pixel
    argmax over vote counts (ties -> lowest class, like np.argmax).
    """
    d = direction_maps_8hw.astype(jnp.int32)
    remapped = jnp.take_along_axis(
        DCM_VOTING_TRANS[:, :, None, None].repeat(d.shape[1], 2).repeat(d.shape[2], 3),
        d[:, None, :, :], axis=1)[:, 0]
    votes = jnp.zeros((9,) + d.shape[1:], jnp.int32)
    for i in range(8):
        votes = votes + (remapped[i][None] == jnp.arange(9)[:, None, None])
    return jnp.argmax(votes, axis=0)
