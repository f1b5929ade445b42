"""Object-level metrics vs verbatim reference-loop oracles (utils.py:243-600)."""
import numpy as np
import pytest
import scipy.ndimage as ndi
from scipy.spatial.distance import directed_hausdorff as hausdorff

from cdnet_tpu.metrics import (gland_accuracy_object_level, label_equal_values,
                               nuclei_accuracy_object_level, read_annotation_xml)


def oracle_nuclei(pred, gt):
    """utils.py:243-330 verbatim (measure.label == label_equal_values)."""
    pred_labeled = label_equal_values(pred).copy()
    gt_labeled = label_equal_values(gt)
    Ns = len(np.unique(pred_labeled)) - 1
    Ng = len(np.unique(gt_labeled)) - 1
    TP = FN = 0.0
    dice = haus = iou = C = U = count = 0.0
    for i in range(1, Ng + 1):
        gt_i = np.where(gt_labeled == i, 1, 0)
        overlap_part = pred_labeled * gt_i
        obj_no = np.unique(overlap_part)
        obj_no = obj_no[obj_no != 0]
        if obj_no.size == 0:
            FN += 1
            U += np.sum(gt_i)
            continue
        max_iou = 0.0
        for k in obj_no:
            o = np.sum(overlap_part == k)
            tmp_pred = np.where(pred_labeled == k, 1, 0)
            t_iou = float(o) / (np.sum(tmp_pred) + np.sum(gt_i) - o)
            if t_iou > max_iou:
                max_iou = t_iou
                pred_i = tmp_pred
                overlap_area = o
        TP += 1
        count += 1
        dice += 2 * float(overlap_area) / (np.sum(pred_i) + np.sum(gt_i))
        iou += float(overlap_area) / (np.sum(pred_i) + np.sum(gt_i) - overlap_area)
        si, gi = np.argwhere(pred_i), np.argwhere(gt_i)
        haus += max(hausdorff(si, gi)[0], hausdorff(gi, si)[0])
        C += overlap_area
        U += np.sum(pred_i) + np.sum(gt_i) - overlap_area
        pred_labeled[pred_i > 0] = 0
    FP = Ns - TP
    recall = TP / (TP + FN + 1e-10)
    precision = TP / (TP + FP + 1e-10)
    F1 = 2 * TP / (2 * TP + FP + FN + 1e-10)
    count = count or 1
    U += np.sum(pred_labeled > 0)
    return recall, precision, F1, dice / count, iou / count, haus / count, C / U


def blobs(rng, shape=(48, 48), n=5):
    lab = np.zeros(shape, np.int32)
    hh, ww = np.mgrid[0:shape[0], 0:shape[1]]
    for k in range(1, n + 1):
        cy, cx = rng.randint(5, shape[0] - 5, 2)
        r = rng.randint(3, 7)
        lab[(hh - cy) ** 2 + (ww - cx) ** 2 <= r * r] = k
    return lab


class TestLabelEqualValues:
    def test_touching_distinct_values_stay_separate(self):
        x = np.zeros((8, 8), np.int32)
        x[2:6, 1:4] = 1
        x[2:6, 4:7] = 2
        out = label_equal_values(x)
        assert len(np.unique(out)) == 3

    def test_same_value_two_blobs_split(self):
        x = np.zeros((8, 8), np.int32)
        x[0:2, 0:2] = 7
        x[6:8, 6:8] = 7
        out = label_equal_values(x)
        assert len(np.unique(out)) == 3


class TestNucleiObjectLevel:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_vs_oracle(self, seed):
        rng = np.random.RandomState(seed)
        gt = blobs(rng)
        pred = blobs(rng, n=6)
        got = nuclei_accuracy_object_level(pred, gt)
        want = oracle_nuclei(pred, gt)
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_perfect(self, rng):
        gt = blobs(rng)
        r = nuclei_accuracy_object_level(gt.copy(), gt)
        assert r[0] == pytest.approx(1.0, abs=1e-6)   # recall
        assert r[3] == pytest.approx(1.0, abs=1e-9)   # dice
        assert r[6] == pytest.approx(1.0, abs=1e-9)   # AJI


class TestGlandObjectLevel:
    def test_perfect(self, rng):
        gt = blobs(rng)
        r = gland_accuracy_object_level(gt.copy(), gt)
        assert r[2] == pytest.approx(1.0)             # F1
        assert r[3] == pytest.approx(1.0, abs=1e-9)   # dice
        assert r[5] == pytest.approx(0.0, abs=1e-9)   # hausdorff

    def test_split_prediction_penalised(self):
        gt = np.zeros((32, 32), np.int32)
        gt[8:24, 8:24] = 1
        pred = np.zeros_like(gt)
        pred[8:24, 8:16] = 1
        pred[8:24, 17:24] = 2
        r = gland_accuracy_object_level(pred, gt)
        assert r[2] < 1.0 and 0 < r[3] < 1.0


class TestXML:
    def test_polygon_rasterization(self, tmp_path):
        xml = """<?xml version="1.0"?>
        <Annotations><Annotation><Regions>
          <Region><Vertices>
            <Vertex X="2" Y="2"/><Vertex X="10" Y="2"/>
            <Vertex X="10" Y="10"/><Vertex X="2" Y="10"/>
          </Vertices></Region>
          <Region><Vertices>
            <Vertex X="14" Y="14"/><Vertex X="18" Y="14"/><Vertex X="16" Y="18"/>
          </Vertices></Region>
        </Regions></Annotation></Annotations>"""
        p = tmp_path / "ann.xml"
        p.write_text(xml)
        mask = read_annotation_xml(str(p), (24, 24))
        assert mask[5, 5] == 1
        assert mask[15, 16] == 2
        assert mask[0, 0] == 0
        assert len(np.unique(mask)) == 3
