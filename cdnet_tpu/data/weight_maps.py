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
    # distance to each instance (stacked), then the two smallest
    dists = np.stack([distance_transform_edt(labels != k) for k in ids])
    if len(ids) == 1:
        d1 = dists[0]
        d2 = np.zeros_like(d1)
    else:
        part = np.partition(dists, 1, axis=0)
        d1, d2 = part[0], part[1]
    ridge = w0 * np.exp(-((d1 + d2) ** 2) / (2.0 * sigma ** 2))
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
        lab = np.asarray(img_loader(os.path.join(ns.labels_dir, f)))
        if lab.ndim == 3:
            lab = lab[..., 0]
        wm = weight_map_uint8(lab)
        # reference pairing convention: <stem minus '_label'>_weight.png
        stem = stem[:-6] if stem.endswith("_label") else stem
        Image.fromarray(wm).save(os.path.join(ns.out_dir, f"{stem}_weight.png"))
        print(f"{stem}_weight.png", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
