"""Object-level metrics: greedy max-IoU instance matching + Hausdorff.

Exact-semantics ports of the reference's host metrics:
- `nuclei_accuracy_object_level` (`/root/reference/utils.py:243-330`):
  SEQUENTIAL greedy matching over GT ids with used-pred removal, unweighted
  dice/iou/hausdorff averages over matches, and a matched-pairs AJI.
- `gland_accuracy_object_level` (`utils.py:433-600`): GlaS-style — pred-side
  TP counting at >=50% GT coverage, then area-weighted dice/iou/hausdorff in
  both directions with max-OVERLAP matching.
- `read_annotation_xml` (`utils.py:112-150`): MoNuSeg Aperio XML polygons.

The O(N^2 * H * W) per-instance mask loops of the reference are replaced by
one bincount contingency table; matching decisions are bit-identical.
"""
from __future__ import annotations

import numpy as np
import scipy.ndimage as ndi
from scipy.spatial.distance import directed_hausdorff

from cdnet_tpu.metrics.instance import _contingency


def label_equal_values(labels: np.ndarray, connectivity: int = 2) -> np.ndarray:
    """skimage.measure.label semantics on an int image: connected regions of
    EQUAL nonzero value get distinct ids (touching different values stay
    separate)."""
    labels = np.asarray(labels)
    structure = ndi.generate_binary_structure(2, connectivity)
    # single pass over the foreground, then split only the components that
    # span multiple input values (one full-image ndi.label per DISTINCT
    # value — ~700 on a MoNuSeg GT tile — cost seconds per eval image)
    cc, n = ndi.label(labels != 0, structure=structure)
    out = cc.astype(np.int32)
    if n == 0:
        return out
    # a component is pure iff every pixel carries one value: compare per-
    # component min == max of the input values
    mins = ndi.minimum(labels, cc, index=np.arange(1, n + 1))
    maxs = ndi.maximum(labels, cc, index=np.arange(1, n + 1))
    nxt = n
    mixed = np.nonzero(np.asarray(mins) != np.asarray(maxs))[0] + 1
    for comp in mixed:
        region = cc == comp
        sub = np.where(region, labels, 0)
        for v in np.unique(sub):
            if v == 0:
                continue
            sub_cc, m = ndi.label(sub == v, structure=structure)
            out[sub_cc > 0] = sub_cc[sub_cc > 0] + nxt
            nxt += m
    if len(mixed):
        # splitting left the mixed components' original ids unused; compact
        # to consecutive 1..N (callers iterate range(1, N+1) like the
        # reference's measure.label output, utils.py:243-330)
        uniq = np.unique(out)
        lut = np.zeros(int(out.max()) + 1, np.int32)
        lut[uniq] = np.arange(len(uniq), dtype=np.int32)
        out = lut[out]
    return out


def _haus(a_pts: np.ndarray, b_pts: np.ndarray) -> float:
    return float(max(directed_hausdorff(a_pts, b_pts)[0],
                     directed_hausdorff(b_pts, a_pts)[0]))


def nuclei_accuracy_object_level(pred: np.ndarray, gt: np.ndarray,
                                 compute_hausdorff: bool = True):
    """(recall, precision, F1, dice, iou, hausdorff, AJI) — utils.py:243-330."""
    pred_labeled = label_equal_values(pred)
    gt_labeled = label_equal_values(gt)
    inter, gt_sizes, pred_sizes, n_gt, n_pred = _contingency(gt_labeled,
                                                             pred_labeled)
    tp = fn = 0.0
    dice = iou = haus = 0.0
    c_sum = u_sum = 0.0
    count = 0.0
    used = np.zeros(n_pred, bool)
    for i in range(n_gt):
        row = np.where(used, 0.0, inter[i]) if n_pred else np.zeros(0)
        if n_pred == 0 or row.sum() == 0:
            fn += 1
            u_sum += gt_sizes[i]
            continue
        cand = np.nonzero(row > 0)[0]
        ious = row[cand] / (pred_sizes[cand] + gt_sizes[i] - row[cand])
        k = cand[int(np.argmax(ious))]  # first max (strictly-greater update)
        overlap = row[k]
        tp += 1
        count += 1
        dice += 2 * overlap / (pred_sizes[k] + gt_sizes[i])
        iou += overlap / (pred_sizes[k] + gt_sizes[i] - overlap)
        if compute_hausdorff:
            haus += _haus(np.argwhere(pred_labeled == k + 1),
                          np.argwhere(gt_labeled == i + 1))
        c_sum += overlap
        u_sum += pred_sizes[k] + gt_sizes[i] - overlap
        used[k] = True

    fp = n_pred - tp
    recall = tp / (tp + fn + 1e-10)
    precision = tp / (tp + fp + 1e-10)
    f1 = 2 * tp / (2 * tp + fp + fn + 1e-10)
    count = count or 1.0
    dice /= count
    iou /= count
    # NaN (not a fake-perfect 0.0) when the metric was skipped, so logExl /
    # result.txt rows stay distinguishable from a genuine Hausdorff of 0
    haus = haus / count if compute_hausdorff else float("nan")
    u_sum += pred_sizes[~used].sum()
    aji = c_sum / u_sum if u_sum else 0.0
    return recall, precision, f1, dice, iou, haus, aji


def gland_accuracy_object_level(pred: np.ndarray, gt: np.ndarray):
    """(recall, precision, F1, dice, iou, hausdorff) — utils.py:433-600."""
    pred_labeled = label_equal_values(pred, connectivity=2)
    gt_labeled = label_equal_values(gt, connectivity=2)
    # remove 1-2 px noise from gt, then relabel (utils.py:446-448)
    sizes = np.bincount(gt_labeled.ravel())
    small = np.nonzero(sizes < 3)[0]
    gt_labeled[np.isin(gt_labeled, small)] = 0
    gt_labeled = label_equal_values(gt_labeled, connectivity=2)

    inter, gt_sizes, pred_sizes, n_gt, n_pred = _contingency(gt_labeled,
                                                             pred_labeled)
    # --- F1: per-pred max-overlap GT must be >=50% covered (utils.py:453-492)
    # NOTE deliberate reference parity: the reference counts TP per PRED
    # without consuming the matched GT (utils.py:457-485), so two pred
    # fragments each covering >=50% of one gland BOTH count as TP — TP can
    # exceed n_gt and FN = n_gt - TP can go negative, pushing recall/F1
    # past 1 on over-segmented glands. Kept as-is because the number must
    # match the reference's own metric.
    tp = fp = 0.0
    for j in range(n_pred):
        col = inter[:, j] if n_gt else np.zeros(0)
        if n_gt == 0 or col.sum() == 0:
            fp += 1
            continue
        i = int(np.argmax(col))
        if col[i] / gt_sizes[i] >= 0.5:
            tp += 1
        else:
            fp += 1
    fn = n_gt - tp
    if tp == 0:
        precision = recall = f1 = 0.0
    else:
        precision = tp / (tp + fp)
        recall = tp / (tp + fn)
        f1 = 2 * precision * recall / (precision + recall)

    gt_total = gt_sizes.sum() or 1.0
    pred_total = pred_sizes.sum() or 1.0

    def side(rows_inter, a_sizes, b_sizes, a_labeled, b_labeled, a_total):
        """One direction of the area-weighted dice/iou/hausdorff sweep."""
        d = v = h = 0.0
        n_a, n_b = rows_inter.shape
        for i in range(n_a):
            row = rows_inter[i]
            w = a_sizes[i] / a_total
            if n_b == 0 or row.sum() == 0:
                # nearest object by hausdorff (utils.py:507-529)
                a_pts = np.argwhere(a_labeled == i + 1)
                min_h = 1e5
                for j in range(n_b):
                    min_h = min(min_h, _haus(np.argwhere(b_labeled == j + 1),
                                             a_pts))
                h += w * (min_h if n_b else 0.0)
                continue
            j = int(np.argmax(row))  # max OVERLAP, not max IoU
            o = row[j]
            d += w * (2 * o / (b_sizes[j] + a_sizes[i]))
            v += w * (o / (b_sizes[j] + a_sizes[i] - o))
            h += w * _haus(np.argwhere(b_labeled == j + 1),
                           np.argwhere(a_labeled == i + 1))
        return d, v, h

    dice_g, iou_g, haus_g = side(inter, gt_sizes, pred_sizes,
                                 gt_labeled, pred_labeled, gt_total)
    dice_s, iou_s, haus_s = side(inter.T, pred_sizes, gt_sizes,
                                 pred_labeled, gt_labeled, pred_total)
    return (recall, precision, f1, (dice_g + dice_s) / 2,
            (iou_g + iou_s) / 2, (haus_g + haus_s) / 2)


def read_annotation_polygons(path: str) -> list:
    """MoNuSeg Aperio XML -> list of (N,2) float vertex arrays
    (reference utils.py:112-128 `read_annotation`)."""
    import math
    import xml.etree.ElementTree as ET

    tree = ET.parse(path)
    polys = []
    for region in tree.getroot().iter("Region"):
        pts = [(math.floor(float(v.attrib["X"])),
                math.floor(float(v.attrib["Y"])))
               for v in region.iter("Vertex")]
        if len(pts) < 3:
            # annotation noise: 0 vertices crashes cv2.drawContours, 1-2
            # rasterize to a handful of pixels that would count as a full
            # GT instance
            continue
        polys.append(np.asarray(pts, np.int32))
    return polys


def _rasterize_polygon(poly: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    """One polygon -> binary mask (reference `to_mask_instance`,
    utils.py:136-150: floored int vertices + cv2.drawContours FILLED)."""
    import cv2

    mask = np.zeros(shape, np.uint8)
    cv2.drawContours(mask, [poly.reshape(-1, 1, 2)], 0, 1,
                     thickness=cv2.FILLED)
    return mask.astype(bool)


def nuclei_accuracy_annotation_object_level(pred: np.ndarray,
                                            annotation_path: str,
                                            compute_hausdorff: bool = True):
    """groundtruth=1 variant (reference utils.py:152-241): GT instances come
    from XML polygons (possibly overlapping), sorted by vertex count
    descending; same greedy max-IoU matching + consume-on-match as
    nuclei_accuracy_object_level. Returns the same 7-tuple."""
    polys = read_annotation_polygons(annotation_path)
    polys.sort(key=len, reverse=True)
    n_gt = len(polys)
    pred_labeled = label_equal_values(pred)
    n_pred = int(pred_labeled.max())
    alive = np.ones(n_pred + 1, bool)  # pred ids not yet consumed
    alive[0] = False
    pred_sizes = np.bincount(pred_labeled.ravel(), minlength=n_pred + 1)

    tp = fn = 0.0
    dice = iou = haus = 0.0
    c_sum = u_sum = 0.0
    count = 0.0
    for poly in polys:
        gt_i = _rasterize_polygon(poly, pred_labeled.shape)
        gt_size = gt_i.sum()
        over = pred_labeled[gt_i]
        over = over[(over > 0) & alive[np.minimum(over, n_pred)]]
        if over.size == 0:
            fn += 1
            u_sum += gt_size
            continue
        cand, cnts = np.unique(over, return_counts=True)
        ious = cnts / (pred_sizes[cand] + gt_size - cnts)
        j = int(np.argmax(ious))  # first strict max (reference `>` update)
        k, overlap = int(cand[j]), float(cnts[j])
        tp += 1
        count += 1
        dice += 2 * overlap / (pred_sizes[k] + gt_size)
        iou += overlap / (pred_sizes[k] + gt_size - overlap)
        if compute_hausdorff:
            haus += _haus(np.argwhere(pred_labeled == k), np.argwhere(gt_i))
        c_sum += overlap
        u_sum += pred_sizes[k] + gt_size - overlap
        alive[k] = False

    fp = n_pred - tp
    recall = tp / (tp + fn + 1e-10)
    precision = tp / (tp + fp + 1e-10)
    f1 = 2 * tp / (2 * tp + fp + fn + 1e-10)
    count = count or 1.0
    u_sum += pred_sizes[1:][alive[1:]].sum()
    aji = c_sum / u_sum if u_sum else 0.0
    haus = haus / count if compute_hausdorff else float("nan")
    return (recall, precision, f1, dice / count, iou / count, haus, aji)


def read_annotation_xml(path: str, shape: tuple[int, int]) -> np.ndarray:
    """MoNuSeg Aperio XML -> instance mask (reference utils.py:112-150).

    Each <Region> polygon becomes one instance id, rasterized EXACTLY like
    the reference's `to_mask_instance` (floored int vertices +
    cv2.drawContours FILLED) so every metric in a run — object-level,
    HoVer-Net, pixel — sees the same GT raster as
    nuclei_accuracy_annotation_object_level.
    """
    polys = read_annotation_polygons(path)
    canvas = np.zeros(shape, np.int32)
    for inst, poly in enumerate(polys, start=1):
        canvas[_rasterize_polygon(poly, shape)] = inst
    return canvas
