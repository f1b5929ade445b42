"""Build the shared parity-race dataset in BOTH directory layouts.

One synthetic nuclei dataset (cdnet_tpu.data.synthetic.synthetic_tile,
master seed 7), written twice:

- ``ref_ws/data/MoNuSeg_oridata``  — the reference's expected layout
  (`/root/reference/train.py:265-289`: images/train_300, weight_maps/
  train_300, labels/train_300 with ``*_label.png`` whose channel 0 carries
  instance ids; `/root/reference/test_dam.py:233-241`: images/test,
  labels/test/*_label.png, labels/test_ins/*.npy)
- ``tpu_ws/data/MoNuSeg_oridata``  — cdnet_tpu's layout
  (cdnet_tpu/train.py:53-58: images/train, weight_maps/train,
  labels_instance/train with ``*_label.npy``; cdnet_tpu/infer.py test dirs
  images/test + labels/test/*.npy)

Both sides therefore train and evaluate on BYTE-IDENTICAL tiles.

Shapes: 16 train tiles 128x128 (10-26 nuclei), 8 test tiles 256x256
(30-80 nuclei). Sized for the race's hard constraint: the reference trains
on 1 CPU core.
"""
from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, "/root/repo")
from cdnet_tpu.data.synthetic import synthetic_tile  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
REF = os.path.join(HERE, "ref_ws", "data", "MoNuSeg_oridata")
TPU = os.path.join(HERE, "tpu_ws", "data", "MoNuSeg_oridata")

N_TRAIN, TRAIN_SIZE, TRAIN_NUCLEI = 16, 128, (10, 26)
N_TEST, TEST_SIZE, TEST_NUCLEI = 8, 256, (30, 80)
MASTER_SEED = 7


def mkdirs(*paths):
    for p in paths:
        os.makedirs(p, exist_ok=True)


def save_png(path, arr):
    Image.fromarray(arr).save(path)


def label_png3(inst):
    """3-channel label PNG, channel 0 = instance ids (uint8).

    The reference's LabelEncoding takes channel 0 and, seeing >2 unique
    values, treats it as instance-level (my_transforms_direction.py:713-719,
    743-744). Ids here stay < 256 by construction."""
    assert inst.max() < 256, "uint8 id overflow"
    out = np.zeros(inst.shape + (3,), np.uint8)
    out[..., 0] = inst.astype(np.uint8)
    return out


def main():
    mkdirs(os.path.join(REF, "images", "train_300"),
           os.path.join(REF, "weight_maps", "train_300"),
           os.path.join(REF, "labels", "train_300"),
           os.path.join(REF, "images", "test"),
           os.path.join(REF, "labels", "test"),
           os.path.join(REF, "labels", "test_ins"),
           os.path.join(TPU, "images", "train"),
           os.path.join(TPU, "weight_maps", "train"),
           os.path.join(TPU, "labels_instance", "train"),
           os.path.join(TPU, "images", "test"),
           os.path.join(TPU, "labels", "test"))

    for i in range(N_TRAIN):
        rng = np.random.RandomState(MASTER_SEED * 1000003 + i)
        img, inst, wmap = synthetic_tile(rng, TRAIN_SIZE, TRAIN_NUCLEI)
        name = f"train_{i:03d}"
        save_png(os.path.join(REF, "images", "train_300", name + ".png"), img)
        save_png(os.path.join(REF, "weight_maps", "train_300",
                              name + "_weight.png"), wmap)
        save_png(os.path.join(REF, "labels", "train_300",
                              name + "_label.png"), label_png3(inst))
        save_png(os.path.join(TPU, "images", "train", name + ".png"), img)
        save_png(os.path.join(TPU, "weight_maps", "train",
                              name + "_weight.png"), wmap)
        np.save(os.path.join(TPU, "labels_instance", "train",
                             name + "_label.npy"), inst.astype(np.int32))
        print(f"{name}: {inst.max()} nuclei")

    for i in range(N_TEST):
        rng = np.random.RandomState(MASTER_SEED * 2000003 + i)
        img, inst, wmap = synthetic_tile(rng, TEST_SIZE, TEST_NUCLEI)
        name = f"test_{i:03d}"
        save_png(os.path.join(REF, "images", "test", name + ".png"), img)
        save_png(os.path.join(REF, "labels", "test", name + "_label.png"),
                 label_png3(inst))
        np.save(os.path.join(REF, "labels", "test_ins", name + ".npy"),
                inst.astype(np.int64))
        save_png(os.path.join(TPU, "images", "test", name + ".png"), img)
        np.save(os.path.join(TPU, "labels", "test", name + ".npy"),
                inst.astype(np.int32))
        print(f"{name}: {inst.max()} nuclei")


if __name__ == "__main__":
    main()
