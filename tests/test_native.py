"""Native host ops (C++ via ctypes) vs the NumPy fallback path."""
import numpy as np
import pytest

from cdnet_tpu.data import native_loader as NL


def make_samples(rng, n=4, hw=64):
    return [((rng.rand(hw, hw, 3) * 255).astype(np.uint8),
             (rng.rand(hw, hw) * 255).astype(np.uint8),
             rng.randint(0, 5, (hw, hw)).astype(np.int32)) for _ in range(n)]


@pytest.mark.skipif(not NL.available(), reason="native lib not built")
class TestNativeBatch:
    def test_matches_numpy_fallback(self):
        rng = np.random.RandomState(0)
        samples = make_samples(rng)
        # identical RNG draws for both paths
        got = NL.assemble_batch(samples, crop=32, rng=np.random.RandomState(7))
        lib = NL._lib
        NL._lib = False  # force the real fallback (None would just re-load)
        try:
            want = NL.assemble_batch(samples, crop=32,
                                     rng=np.random.RandomState(7))
        finally:
            NL._lib = lib
        np.testing.assert_array_equal(got["instance"], want["instance"])
        np.testing.assert_array_equal(got["weight"], want["weight"])
        np.testing.assert_allclose(got["image"], want["image"], atol=1e-5)

    def test_shapes_and_ranges(self):
        rng = np.random.RandomState(1)
        out = NL.assemble_batch(make_samples(rng), crop=48,
                                rng=np.random.RandomState(2))
        assert out["image"].shape == (4, 48, 48, 3)
        assert out["image"].dtype == np.float32
        assert 0.0 <= out["image"].min() and out["image"].max() <= 1.0
        assert out["instance"].dtype == np.int32

    def test_warp_matches_numpy(self):
        rng = np.random.RandomState(3)
        img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        wm = (rng.rand(32, 32) * 255).astype(np.uint8)
        inst = rng.randint(0, 4, (32, 32)).astype(np.int32)
        yy, xx = np.mgrid[0:32, 0:32].astype(np.float32)
        sy = yy + rng.randn(32, 32).astype(np.float32) * 2
        sx = xx + rng.randn(32, 32).astype(np.float32) * 2
        got = NL.warp_nearest(img, wm, inst, sy, sx)
        lib = NL._lib
        NL._lib = False  # force the real fallback (None would just re-load)
        try:
            want = NL.warp_nearest(img, wm, inst, sy, sx)
        finally:
            NL._lib = lib
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)


class TestFallback:
    def test_numpy_path_without_lib(self):
        rng = np.random.RandomState(0)
        lib = NL._lib
        NL._lib = False  # force the real fallback (None would just re-load)
        try:
            out = NL.assemble_batch(make_samples(rng, n=2), crop=32,
                                    rng=np.random.RandomState(0))
            assert out["image"].shape == (2, 32, 32, 3)
        finally:
            NL._lib = lib
