"""Pixel-level segmentation metrics.

Parity with the reference's `accuracy_pixel_level` /
`compute_pixel_level_metrics` (`/root/reference/utils.py:67-109`): metrics are
computed on the "inside" class (pred==1 vs label==1) per batch element and
averaged. Implemented as a single vectorized pass (works on NumPy or JAX
arrays) instead of the reference's per-image Python loop.
"""
from __future__ import annotations

import numpy as np

EPS = 1e-10


def compute_pixel_level_metrics(pred, target):
    """Binary masks -> [acc, iou, recall, precision, F1, performance].

    Reference: utils.py:88-109.
    """
    pred = np.asarray(pred, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    tp = float(np.sum(pred * target))
    tn = float(np.sum((1 - pred) * (1 - target)))
    fp = float(np.sum(pred * (1 - target)))
    fn = float(np.sum((1 - pred) * target))

    precision = tp / (tp + fp + EPS)
    recall = tp / (tp + fn + EPS)
    f1 = 2 * precision * recall / (precision + recall + EPS)
    acc = (tp + tn) / (tp + fp + tn + fn + EPS)
    performance = (recall + tn / (tn + fp + EPS)) / 2
    iou = tp / (tp + fp + fn + EPS)
    return [acc, iou, recall, precision, f1, performance]


def jaccard_samples(pred, target):
    """sklearn jaccard_score(average='samples') on 2-D binary maps: each ROW
    is one sample; mean over rows of |intersection| / |union| (rows with an
    empty union score 1 when the prediction row is also empty, else 0 —
    sklearn's zero-division behavior returns 0 with a warning; we use 0).
    Parity with the reference's ji1 (test_dam.py:590)."""
    pred = (np.asarray(pred) > 0).astype(np.int64)
    target = (np.asarray(target) > 0).astype(np.int64)
    inter = (pred & target).sum(axis=1)
    union = (pred | target).sum(axis=1)
    scores = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    return float(scores.mean())


def accuracy_pixel_level(output, target):
    """Batched ternary-label metrics on the inside class (reference utils.py:67-83).

    ``output``/``target``: (B, H, W) integer class maps. Returns the 6-vector
    averaged over the batch.
    """
    output = np.asarray(output)
    target = np.asarray(target)
    batch = target.shape[0]
    results = np.zeros(6, dtype=np.float64)
    for i in range(batch):
        results += np.array(
            compute_pixel_level_metrics(output[i] == 1, target[i] == 1))
    return [v / batch for v in results]
