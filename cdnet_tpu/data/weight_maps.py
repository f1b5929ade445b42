"""Weight-map generation for training (`*_weight.png`).

The reference consumes precomputed weight maps (`/root/reference/
data_folder.py:48-49`, loaded per sample and divided by 20 in the train loop,
train_util_dam.py:102) but ships no generator. This module provides the
standard U-Net-style map so the framework is self-sufficient:

    w(p) = w_base + w0 * exp(-(d1(p) + d2(p))^2 / (2 sigma^2))

with d1/d2 the distances to the nearest and second-nearest instances —
emphasizing the thin background ridges separating touching nuclei
(Ronneberger et al. 2015, eq. 2). Values are scaled to uint8 so that the
reference's /20 normalization lands in the usual range.

CLI: python -m cdnet_tpu.data.weight_maps --labels-dir D --out-dir O
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from scipy.ndimage import distance_transform_edt


def unet_weight_map(instance_labels: np.ndarray, w0: float = 10.0,
                    sigma: float = 5.0, w_base: float = 1.0) -> np.ndarray:
    """Instance map -> float weight map (U-Net eq. 2)."""
    labels = np.asarray(instance_labels)
    ids = np.unique(labels)
    ids = ids[ids != 0]
    h, w = labels.shape
    if ids.size == 0:
        return np.full((h, w), w_base, np.float32)
    # running two-smallest distances: two H*W buffers instead of stacking
    # one full-image EDT per instance (a 1000^2 tile with ~700 nuclei would
    # stack 5.6 GB of float64)
    d1 = np.full((h, w), np.inf)
    d2 = np.full((h, w), np.inf)
    for k in ids:
        d = distance_transform_edt(labels != k)
        closer = d < d1
        d2 = np.where(closer, d1, np.minimum(d2, d))
        d1 = np.where(closer, d, d1)
    # one instance: d2 stays +inf and the ridge term vanishes (U-Net eq. 2
    # defines d2 as distance to the SECOND-nearest cell; a zero d2 would
    # fabricate a phantom neighbor and draw a maximal ridge around every
    # isolated nucleus)
    gap = d1 + d2                      # +inf when only one instance exists
    ridge = w0 * np.exp(-(gap ** 2) / (2.0 * sigma ** 2))  # exp(-inf) == 0
    out = w_base + ridge * (labels == 0)
    return out.astype(np.float32)


def weight_map_uint8(instance_labels: np.ndarray, scale: float = 20.0) -> np.ndarray:
    """uint8 encoding: the train loop divides by 20, so w_base=1 -> 20/20 = 1."""
    return np.clip(unet_weight_map(instance_labels) * scale, 0, 255).astype(np.uint8)


def main(argv=None):
    from PIL import Image
    from cdnet_tpu.data.dataset import img_loader

    p = argparse.ArgumentParser()
    p.add_argument("--labels-dir", required=True,
                   help="instance label files (.npy/.mat/.png)")
    p.add_argument("--out-dir", required=True)
    ns = p.parse_args(argv)
    os.makedirs(ns.out_dir, exist_ok=True)
    for f in sorted(os.listdir(ns.labels_dir)):
        stem = os.path.splitext(f)[0]
        path = os.path.join(ns.labels_dir, f)
        if f.endswith(".png"):
            # open WITHOUT an RGB convert: instance-id PNGs are often
            # 16/32-bit ('I;16'/'I'), and convert('RGB') clips every id
            # above 255 — merging instances and erasing exactly the ridges
            # this map exists to mark
            lab = np.asarray(Image.open(path))
        else:
            lab = np.asarray(img_loader(path))
        if lab.ndim == 3:
            lab = lab[..., 0]
        wm = weight_map_uint8(lab)
        # reference pairing convention: <stem minus '_label'>_weight.png
        stem = stem[:-6] if stem.endswith("_label") else stem
        Image.fromarray(wm).save(os.path.join(ns.out_dir, f"{stem}_weight.png"))
        print(f"{stem}_weight.png", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
