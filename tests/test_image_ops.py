"""Morphology / connected components / EDT vs scipy oracles (SURVEY.md §4c)."""
import numpy as np
import pytest
import scipy.ndimage as ndi

from cdnet_tpu.ops import connected, edt, morphology


def blobs(rng, shape=(64, 64), n=6, r=(3, 9)):
    lab = np.zeros(shape, dtype=np.int32)
    hh, ww = np.mgrid[0:shape[0], 0:shape[1]]
    for k in range(1, n + 1):
        cy, cx = rng.randint(0, shape[0]), rng.randint(0, shape[1])
        rad = rng.randint(*r)
        lab[(hh - cy) ** 2 + (ww - cx) ** 2 <= rad * rad] = k
    return lab


class TestMorphology:
    def test_disk_matches_skimage_formula(self):
        d2 = morphology.disk(2)
        want = np.array([
            [0, 0, 1, 0, 0],
            [0, 1, 1, 1, 0],
            [1, 1, 1, 1, 1],
            [0, 1, 1, 1, 0],
            [0, 0, 1, 0, 0]], bool)
        np.testing.assert_array_equal(d2, want)

    @pytest.mark.parametrize("radius", [1, 2, 3])
    def test_dilation_erosion_vs_scipy(self, rng, radius):
        img = (rng.rand(40, 40) * 10).astype(np.int32)
        selem = morphology.disk(radius)
        got_d = np.asarray(morphology.dilation(img, radius))
        got_e = np.asarray(morphology.erosion(img, radius))
        want_d = ndi.grey_dilation(img, footprint=selem)
        want_e = ndi.grey_erosion(img, footprint=selem)
        np.testing.assert_array_equal(got_d, want_d)
        np.testing.assert_array_equal(got_e, want_e)

    def test_label_dilation_max_rule(self):
        lab = np.zeros((9, 9), np.int32)
        lab[2, 2] = 5
        lab[2, 4] = 3
        out = np.asarray(morphology.dilation(lab, 1))
        assert out[2, 3] == 5  # overlapping dilations -> max label

    @pytest.mark.slow
    def test_fill_holes_vs_scipy(self, rng):
        mask = blobs(rng, n=4) > 0
        mask[10:20, 10:20] = True
        mask[13:17, 13:17] = False  # a hole
        got = np.asarray(morphology.binary_fill_holes(mask))
        want = ndi.binary_fill_holes(mask)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.slow
    def test_fill_holes_border_open_region_not_filled(self):
        mask = np.zeros((16, 16), bool)
        mask[4:12, 4:12] = True
        mask[6:10, 6:10] = False
        mask[8, 4:7] = False  # channel to... still enclosed? open the ring
        mask[6:10, 0:7] = False
        got = np.asarray(morphology.binary_fill_holes(mask))
        want = ndi.binary_fill_holes(mask)
        np.testing.assert_array_equal(got, want)

    def test_remove_small_objects(self):
        lab = np.zeros((16, 16), np.int32)
        lab[0:4, 0:4] = 1        # 16 px
        lab[8, 8] = 2            # 1 px
        out = np.asarray(morphology.remove_small_objects(lab, min_size=5))
        assert out[0, 0] == 1 and out[8, 8] == 0


class TestConnected:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("connectivity", [1, 2])
    def test_vs_scipy(self, seed, connectivity):
        rng = np.random.RandomState(seed)
        mask = rng.rand(48, 48) > 0.6
        structure = ndi.generate_binary_structure(2, connectivity)
        want, n_want = ndi.label(mask, structure=structure)
        got, n_got = connected.label(mask, connectivity=connectivity)
        got, n_got = np.asarray(got), int(n_got)
        assert n_got == n_want
        # same partition (bijective relabel)
        pairs = set(zip(want.ravel().tolist(), got.ravel().tolist()))
        assert len(pairs) == n_want + 1  # each scipy label maps to exactly one
        assert all((a == 0) == (b == 0) for a, b in pairs)

    def test_raster_order(self):
        mask = np.zeros((8, 8), bool)
        mask[6, 1] = True   # appears later in raster order
        mask[1, 5] = True   # appears first
        got, n = connected.label(mask)
        got = np.asarray(got)
        assert int(n) == 2
        assert got[1, 5] == 1 and got[6, 1] == 2

    @pytest.mark.slow
    def test_spiral_worst_case(self):
        # a long snake exercises the while_loop fixpoint
        mask = np.zeros((32, 32), bool)
        mask[0, :] = True
        mask[:, -1] = True
        mask[-1, :] = True
        mask[2:, 0] = True
        mask[2, 0:20] = True
        got, n = connected.label(mask, connectivity=1)
        assert int(n) == 1


class TestEDT:
    def test_binary_vs_scipy(self, rng):
        mask = blobs(rng, n=5) > 0
        got = np.asarray(edt.edt_binary(mask))
        want = ndi.distance_transform_edt(mask)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_per_instance_equals_reference_loop(self, rng):
        lab = blobs(rng, n=6)
        got = np.asarray(edt.edt_labels(lab))
        want = np.zeros(lab.shape)
        for k in np.unique(lab)[1:]:
            want += ndi.distance_transform_edt(lab == k)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_normalized_instance_edt(self, rng):
        lab = blobs(rng, n=5)
        got = np.asarray(edt.normalized_instance_edt(lab))
        want = np.zeros(lab.shape)
        for k in np.unique(lab)[1:]:
            d = ndi.distance_transform_edt(lab == k)
            want += d / d.max()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_touching_instances(self):
        lab = np.zeros((16, 16), np.int32)
        lab[4:12, 2:8] = 1
        lab[4:12, 8:14] = 2  # touching at column 8
        got = np.asarray(edt.edt_labels(lab))
        want = ndi.distance_transform_edt(lab == 1) + ndi.distance_transform_edt(lab == 2)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestUpsamplePhaseBlend:
    """ops/upsample phase-blend == jax.image.resize bilinear (the contract
    HRNet's pretrained-trunk parity rests on — half-pixel centers, edge
    clamp). Covers the scales HRNet's exchanges use (2/4/8), mixed per-axis
    factors, odd sizes, and bf16."""

    @pytest.mark.parametrize("sh,sw", [(2, 2), (4, 4), (8, 8), (2, 4),
                                       (3, 3), (1, 2), (5, 2)])
    def test_matches_jax_image_resize(self, sh, sw):
        import jax
        import jax.numpy as jnp
        from cdnet_tpu.ops.upsample import upsample_bilinear_int

        rng = np.random.RandomState(sh * 10 + sw)
        x = jnp.asarray(rng.randn(2, 7, 5, 3).astype(np.float32))
        got = upsample_bilinear_int(x, sh, sw)
        want = jax.image.resize(x, (2, 7 * sh, 5 * sw, 3), method="bilinear")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_bf16_close(self):
        import jax
        import jax.numpy as jnp
        from cdnet_tpu.ops.upsample import upsample_bilinear_int

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 16, 16, 18).astype(np.float32),
                        jnp.bfloat16)
        got = upsample_bilinear_int(x, 2, 2).astype(jnp.float32)
        want = jax.image.resize(x, (1, 32, 32, 18),
                                method="bilinear").astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-2, rtol=3e-2)

    def test_resize_bilinear_fast_fallback_and_identity(self):
        import jax
        import jax.numpy as jnp
        from cdnet_tpu.ops.upsample import resize_bilinear_fast

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
        assert resize_bilinear_fast(x, 8, 8) is x
        got = resize_bilinear_fast(x, 12, 20)  # non-integer ratio -> fallback
        want = jax.image.resize(x, (1, 12, 20, 2), method="bilinear")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
