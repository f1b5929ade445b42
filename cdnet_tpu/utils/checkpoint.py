"""Checkpointing with the reference's logical layout.

The reference saves ``{epoch, state_dict, best_iou, best_loss, optimizer}``
to ``checkpoints/checkpoint.pth.tar`` every epoch, numbered copies during the
final 10 epochs (if epoch > 40), and a best copy on val-IoU improvement
(`/root/reference/train.py:416-428,461-479`). Same fields here, serialized
as flax msgpack pytrees (TPU-native: no pickle, no torch).
"""
from __future__ import annotations

import json
import os
import shutil

import jax
from flax import serialization


def _paths(ckpt_dir: str, tag: str):
    return (os.path.join(ckpt_dir, f"checkpoint_{tag}.msgpack"),
            os.path.join(ckpt_dir, f"checkpoint_{tag}.meta.json"))


def save_checkpoint(ckpt_dir: str, state: dict, epoch: int,
                    is_best: bool = False, num_epochs: int = 300,
                    checkpoint_freq: int = 100,
                    extra_meta: dict | None = None) -> None:
    """Reference save_checkpoint semantics (train.py:461-479).

    ``state``: pytree dict (params / batch_stats / opt_state / ...).
    Writes ``checkpoint.msgpack`` (+meta), a numbered copy in the last 10
    epochs when epoch > 40 or on checkpoint_freq multiples, and
    ``checkpoint_best`` when ``is_best``. ``extra_meta``: host-side scalars
    stored alongside ``epoch`` in the meta JSON — the reference checkpoints
    best_iou/best_loss and the torch optimizer's reduced lr (train.py:
    461-479); here that is best_iou + the ReduceLROnPlateau tracker state,
    restored on resume via :func:`load_meta`.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    state = jax.device_get(state)
    blob = serialization.to_bytes(state)
    meta = {"epoch": epoch, **(extra_meta or {})}
    path = os.path.join(ckpt_dir, "checkpoint.msgpack")
    with open(path, "wb") as f:
        f.write(blob)
    with open(os.path.join(ckpt_dir, "checkpoint.meta.json"), "w") as f:
        json.dump(meta, f)
    numbered = (epoch > 40 and epoch >= num_epochs - 10) or (
        checkpoint_freq and epoch % checkpoint_freq == 0)
    if numbered:
        p, m = _paths(ckpt_dir, str(epoch))
        shutil.copyfile(path, p)
        with open(m, "w") as f:
            json.dump(meta, f)
    if is_best:
        p, m = _paths(ckpt_dir, "best")
        shutil.copyfile(path, p)
        with open(m, "w") as f:
            json.dump(meta, f)


def load_checkpoint(path: str, target: dict) -> tuple[dict, int]:
    """Restore a checkpoint into ``target``'s pytree structure.

    ``path``: the .msgpack file (or its stem). Returns (state, epoch).
    """
    if not path.endswith(".msgpack"):
        path = path + ".msgpack"
    with open(path, "rb") as f:
        state = serialization.from_bytes(target, f.read())
    meta_path = path.replace(".msgpack", ".meta.json")
    epoch = 0
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            epoch = json.load(f).get("epoch", 0)
    return state, epoch


def load_meta(path: str) -> dict:
    """Full meta JSON for a checkpoint (epoch + extra_meta scalars)."""
    if not path.endswith(".msgpack"):
        path = path + ".msgpack"
    meta_path = path.replace(".msgpack", ".meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}
