"""Instance-level metrics: AJI, AJI+, Panoptic Quality, instance Dice.

Numerics parity with the reference's HoVer-Net-derived implementations
(`/root/reference/stats_utils.py:7-438`), including the author's added
FP/FN/less/more error decomposition of AJI (stats_utils.py:36-98) and the
exact greedy argmax pairing order. Where the reference builds per-instance
boolean masks in O(N * H * W) Python loops, this module computes one sparse
contingency table with ``np.bincount`` — identical results, orders of
magnitude faster on 1000x1000 tiles.

The Hungarian-assignment paths (AJI+, PQ with match_iou<0.5,
pair_coordinates) stay host-side on the (tiny) contingency matrix
(SURVEY.md §2.3: assignment is metrics-only, never in the device hot path).
"""
from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment


def _contingency(true: np.ndarray, pred: np.ndarray):
    """Sparse pairwise intersection table between instance maps.

    Returns (inter, true_sizes, pred_sizes, n_true, n_pred) where ``inter`` is
    the dense (n_true, n_pred) intersection-count matrix over *contiguous*
    ids 1..n (call :func:`remap_label` first, as the reference requires).
    """
    true = np.asarray(true, dtype=np.int64)
    pred = np.asarray(pred, dtype=np.int64)
    n_true = int(true.max())
    n_pred = int(pred.max())
    true_sizes = np.bincount(true.ravel(), minlength=n_true + 1)[1:].astype(np.float64)
    pred_sizes = np.bincount(pred.ravel(), minlength=n_pred + 1)[1:].astype(np.float64)
    if n_true == 0 or n_pred == 0:
        return (np.zeros((n_true, n_pred)), true_sizes, pred_sizes, n_true, n_pred)
    joint = true.ravel() * (n_pred + 1) + pred.ravel()
    counts = np.bincount(joint, minlength=(n_true + 1) * (n_pred + 1))
    inter = counts.reshape(n_true + 1, n_pred + 1)[1:, 1:].astype(np.float64)
    return inter, true_sizes, pred_sizes, n_true, n_pred


def get_fast_aji(true, pred):
    """AJI with error decomposition (reference stats_utils.py:7-98).

    Greedy 1-to-many pairing: each GT instance takes the pred with max IoU
    (argmax ties resolved to the lowest pred id, as np.argmax does).
    Returns (aji, fp_ratio, fn_ratio, less_ratio, more_ratio).
    """
    inter, t_sizes, p_sizes, n_true, n_pred = _contingency(true, pred)
    if n_true == 0 or n_pred == 0:
        return 0.0, 0.0, 0.0, 0.0, 0.0
    # union only defined where inter > 0 (reference caches only overlapping pairs)
    union = np.where(inter > 0, t_sizes[:, None] + p_sizes[None, :] - inter, 0.0)
    iou = inter / (union + 1.0e-6)

    paired_pred = np.argmax(iou, axis=1)
    max_iou = np.max(iou, axis=1)
    paired_true = np.nonzero(max_iou > 0.0)[0]
    paired_pred = paired_pred[paired_true]

    overall_inter = inter[paired_true, paired_pred].sum()
    overall_union = union[paired_true, paired_pred].sum()
    # author's decomposition: FP/FN pixels within the paired set
    overall_fp = (p_sizes[paired_pred] - inter[paired_true, paired_pred]).sum()
    overall_fn = (t_sizes[paired_true] - inter[paired_true, paired_pred]).sum()

    unpaired_true = np.setdiff1d(np.arange(n_true), paired_true)
    unpaired_pred = np.setdiff1d(np.arange(n_pred), paired_pred)
    less_pred = t_sizes[unpaired_true].sum()
    more_pred = p_sizes[unpaired_pred].sum()
    overall_union += less_pred + more_pred

    aji = overall_inter / overall_union
    fm = overall_union - overall_inter
    if fm == 0:  # perfect match; reference would divide by zero here
        return aji, 0.0, 0.0, 0.0, 0.0
    return (aji, overall_fp / fm, overall_fn / fm, less_pred / fm, more_pred / fm)


def get_fast_aji_plus(true, pred):
    """AJI+ with maximal unique (Hungarian) pairing (reference stats_utils.py:108-178)."""
    inter, t_sizes, p_sizes, n_true, n_pred = _contingency(true, pred)
    if n_true == 0 or n_pred == 0:
        return 0.0
    union = np.where(inter > 0, t_sizes[:, None] + p_sizes[None, :] - inter, 0.0)
    iou = inter / (union + 1.0e-6)
    paired_true, paired_pred = linear_sum_assignment(-iou)
    keep = iou[paired_true, paired_pred] > 0.0
    paired_true, paired_pred = paired_true[keep], paired_pred[keep]
    overall_inter = inter[paired_true, paired_pred].sum()
    overall_union = union[paired_true, paired_pred].sum()
    unpaired_true = np.setdiff1d(np.arange(n_true), paired_true)
    unpaired_pred = np.setdiff1d(np.arange(n_pred), paired_pred)
    overall_union += t_sizes[unpaired_true].sum() + p_sizes[unpaired_pred].sum()
    return overall_inter / overall_union


def get_fast_pq(true, pred, match_iou: float = 0.5):
    """Panoptic quality [dq, sq, pq] + pairing info (reference stats_utils.py:182-275)."""
    assert match_iou >= 0.0, "Cant' be negative"
    inter, t_sizes, p_sizes, n_true, n_pred = _contingency(true, pred)
    union = t_sizes[:, None] + p_sizes[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(inter > 0, inter / union, 0.0)

    if match_iou >= 0.5:
        keep = iou > match_iou
        paired_true, paired_pred = np.nonzero(keep)
        paired_iou = iou[paired_true, paired_pred]
    else:
        pt, pp = linear_sum_assignment(-iou)
        pi = iou[pt, pp]
        sel = pi > match_iou
        paired_true, paired_pred, paired_iou = pt[sel], pp[sel], pi[sel]

    unpaired_true = np.setdiff1d(np.arange(n_true), paired_true)
    unpaired_pred = np.setdiff1d(np.arange(n_pred), paired_pred)
    tp = len(paired_true)
    fp = len(unpaired_pred)
    fn = len(unpaired_true)
    dq = tp / (tp + 0.5 * fp + 0.5 * fn) if (tp + fp + fn) > 0 else 0.0
    sq = paired_iou.sum() / (tp + 1.0e-6)
    return [dq, sq, dq * sq], [
        list(paired_true + 1), list(paired_pred + 1),
        list(unpaired_true + 1), list(unpaired_pred + 1),
    ]


def get_dice_1(true, pred):
    """Traditional foreground dice (reference stats_utils.py:323-334)."""
    true = (np.asarray(true) > 0).astype(np.float64)
    pred = (np.asarray(pred) > 0).astype(np.float64)
    denom = true.sum() + pred.sum()
    if denom == 0:
        return 0.0
    return 2.0 * float((true * pred).sum()) / float(denom)


def get_fast_dice_2(true, pred):
    """Ensemble dice: sums |t|+|p| and 2*inter over all overlapping instance
    pairs (reference stats_utils.py:279-317)."""
    inter, t_sizes, p_sizes, n_true, n_pred = _contingency(true, pred)
    if n_true == 0 or n_pred == 0:
        return 0.0
    mask = inter > 0
    overall_inter = inter[mask].sum()
    pair_total = (t_sizes[:, None] + p_sizes[None, :])[mask].sum()
    if pair_total == 0:
        return 0.0
    return 2.0 * overall_inter / pair_total


def remap_label(pred, by_size: bool = False):
    """Make instance ids contiguous 1..N (reference stats_utils.py:361-389)."""
    pred = np.asarray(pred)
    pred_ids = np.unique(pred)
    pred_ids = pred_ids[pred_ids != 0]
    if pred_ids.size == 0:
        return pred
    if by_size:
        sizes = np.array([(pred == i).sum() for i in pred_ids])
        pred_ids = pred_ids[np.argsort(-sizes, kind="stable")]
    lut = np.zeros(int(pred.max()) + 1, dtype=np.int32)
    lut[pred_ids] = np.arange(1, len(pred_ids) + 1)
    return lut[pred]


def pair_coordinates(set_a: np.ndarray, set_b: np.ndarray, radius: float):
    """Munkres point matching within a radius (reference stats_utils.py:393-438)."""
    dists = np.sqrt(((set_a[:, None, :] - set_b[None, :, :]) ** 2).sum(-1))
    idx_a, idx_b = linear_sum_assignment(dists)
    cost = dists[idx_a, idx_b]
    paired_a = idx_a[cost <= radius]
    paired_b = idx_b[cost <= radius]
    unpaired_a = np.setdiff1d(np.arange(set_a.shape[0]), paired_a)
    unpaired_b = np.setdiff1d(np.arange(set_b.shape[0]), paired_b)
    # column_stack keeps shape (0, 2) when nothing pairs (the reference's
    # np.array(list(zip(...))) collapses to shape (0,), crashing any caller
    # that indexes pairing[:, 0] on a zero-match image)
    pairing = np.column_stack([paired_a, paired_b]).astype(np.int64)
    return pairing, unpaired_a.astype(np.int64), unpaired_b.astype(np.int64)
