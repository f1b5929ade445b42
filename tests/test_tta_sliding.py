"""TTA symmetry inversion + sliding-window stitching (SURVEY.md §4d)."""
import numpy as np
import pytest

from cdnet_tpu.ops import sliding_window as SW
from cdnet_tpu.ops import tta


class TestTTA:
    def test_expand_invert_identity(self, rng):
        img = rng.rand(16, 16, 3).astype(np.float32)
        views = tta.expand(img)
        assert views.shape == (8, 16, 16, 3)
        back = np.asarray(tta.invert(views))
        for i in range(8):
            np.testing.assert_allclose(back[i], img, atol=1e-6)

    def test_views_are_distinct(self, rng):
        img = rng.rand(8, 8, 1).astype(np.float32)
        views = np.asarray(tta.expand(img))
        flat = views.reshape(8, -1)
        assert len({tuple(np.round(v, 5)) for v in flat}) == 8

    def test_dcm_voting_identity_consensus(self):
        # all views agree (in their own frames mapped back): voting returns it
        d = np.full((8, 6, 6), 0, np.int32)
        d[0] = 3
        # build view i as the class that maps back to 3: trans[i][j]==3 -> j
        trans = np.asarray(tta.DCM_VOTING_TRANS)
        for i in range(8):
            j = int(np.nonzero(trans[i] == 3)[0][0])
            d[i] = j
        out = np.asarray(tta.dcm_voting2(d))
        assert (out == 3).all()


class TestSlidingWindow:
    def test_stitch_equals_full_for_linear_fn(self, rng):
        # a pixel-local fn must produce identical stitched vs whole output;
        # apply_fn contract: tile axis at -3, spatial dims last
        img = rng.rand(100, 80, 3).astype(np.float32)

        def apply_fn(batch):
            return {"mask": np.moveaxis(batch * 2.0 + 1.0, -1, 0)}

        out = SW.split_forward(apply_fn, img, size=64, overlap=16)
        np.testing.assert_allclose(np.asarray(out["mask"]),
                                   np.moveaxis(img * 2 + 1, -1, 0), atol=1e-6)

    def test_whole_image_path(self, rng):
        img = rng.rand(32, 32, 3).astype(np.float32)
        called = {}

        def apply_fn(batch):
            called["shape"] = batch.shape
            return {"m": batch[..., 0]}

        SW.split_forward(apply_fn, img, size=64, overlap=16)
        assert called["shape"] == (1, 32, 32, 3)

    def test_invert_last2_matches_invert(self, rng):
        maps = rng.rand(8, 12, 12, 3).astype(np.float32)
        a = np.asarray(tta.invert(maps))
        b = np.asarray(tta.invert_last2(np.moveaxis(maps, -1, 0)))
        np.testing.assert_allclose(np.moveaxis(b, 0, -1), a, atol=0)

    def test_plan_matches_reference_padding(self):
        # reference: pad = (size-overlap) - (h-size) % (size-overlap)
        hp, wp, rows, cols = SW.plan_tiles(1000, 1000, 256, 40)
        stride = 256 - 40
        assert (hp - 256) % stride == 0
        assert rows[0] == 0 and rows[-1] + 256 == hp
        assert all(b - a == stride for a, b in zip(rows, rows[1:]))
