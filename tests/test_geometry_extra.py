"""Extended DTOffsetHelper parity (angle_to_offset / distance labels / etc.)."""
import numpy as np
import pytest

from cdnet_tpu.ops import geometry as G


class TestAngleToOffset:
    def test_reference_smoke(self):
        # SegFix_offset_helper.py:516: angle_to_offset(angle, distance_map)
        angle = np.array([[0.0, 45.0, 90.0, 180.0, -180.0]])
        dist = np.array([[1.0, 2.0, 3.0, 255.0, 4.0]])
        off = np.asarray(G.angle_to_offset(angle, dist, num_classes=8))
        # classes 4,5,6,0,0 -> vectors (0,1),(1,1),(1,0),(0,-1),(0,-1);
        # dist 255 > max_distance 5 -> zeroed
        want = np.array([[[0, 1], [1, 1], [1, 0], [0, 0], [0, -1]]])
        np.testing.assert_array_equal(off, want)


class TestDistanceLabels:
    def test_mask_label(self):
        dist = np.array([[1.0, 2.0, 3.0, 255.0, 4.0]])
        seg = np.array([[-1, 0, 0, 0, 0]])
        out = np.asarray(G.distance_to_mask_label(dist, seg))
        np.testing.assert_array_equal(out, [[-1, 1, 1, 0, 1]])

    def test_energy_label(self):
        dist = np.array([[0.0, 4.0, 5.0, 99.0]])
        seg = np.zeros_like(dist)
        out = np.asarray(G.distance_to_energy_label(dist, seg))
        # step 5, max 5 -> levels {0, 1}; >=5 -> top level
        np.testing.assert_array_equal(out, [[0, 0, 1, 1]])


class TestBitEncoding:
    def test_encode_multi_labels(self):
        x = np.array([[0, 1, 5, 255]], np.uint8)
        out = np.asarray(G.encode_multi_labels(x))
        assert out.shape == (1, 4, 8)
        np.testing.assert_array_equal(out[0, 0], np.zeros(8))
        np.testing.assert_array_equal(out[0, 1], [1, 0, 0, 0, 0, 0, 0, 0])
        np.testing.assert_array_equal(out[0, 2], [1, 0, 1, 0, 0, 0, 0, 0])
        np.testing.assert_array_equal(out[0, 3], np.ones(8))


class TestVectorFns:
    def test_edge_mask_to_vector_points_away_from_edge(self):
        # vertical edge at w=8: offsets should point along +/-w, normalized
        mask = np.zeros((17, 17), np.float32)
        mask[:, 8] = 1.0
        vec = np.asarray(G.edge_mask_to_vector(mask))
        assert vec.shape == (17, 17, 2)
        norms = np.sqrt((vec ** 2).sum(-1))
        assert np.all(norms[:, :7] > 0.99)
        assert abs(vec[8, 4, 0]) < 0.1 and vec[8, 4, 1] < -0.9  # points left

    def test_logits_to_vector_onehot(self):
        logits = np.full((1, 8), -1e9, np.float32)
        logits[0, 6] = 0.0  # class 6 -> offset (1, 0)
        vec = np.asarray(G.logits_to_vector(logits))
        np.testing.assert_allclose(vec[0], [1.0, 0.0], atol=1e-5)

    def test_get_opposite_angle(self):
        a = np.array([0.0, 90.0, -90.0, 180.0])
        out = np.asarray(G.get_opposite_angle(a))
        np.testing.assert_allclose(out, [-180.0, -90.0, 90.0, 0.0])
