"""Model zoo: shape/head contracts + param-count sanity (SURVEY.md §2.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cdnet_tpu.config import Config
from cdnet_tpu.models import choose_model


def _init_apply(model, shape=(1, 64, 64, 3)):
    # jit both phases: eager per-op dispatch costs 30s+ for the deep zoo
    # models, while the jitted program lands in the persistent compile cache
    # (tests/conftest.py) so repeat suite runs skip the compile entirely
    x = jnp.zeros(shape, jnp.float32)
    variables = jax.jit(lambda k, a: model.init(k, a, train=False))(
        jax.random.PRNGKey(0), x)
    out = jax.jit(lambda v, a: model.apply(v, a, train=False))(variables, x)
    return variables, out


def n_params(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


def cfg_for(name):
    c = Config()
    c.model.model_name = name
    c.model.compute_dtype = "float32"  # CPU tests
    return c


@pytest.mark.slow
@pytest.mark.slowzoo
class TestHeads:
    def test_unet_single_head(self):
        model = choose_model(cfg_for("UNet"))
        _, out = _init_apply(model)
        assert set(out) == {"mask"}
        assert out["mask"].shape == (1, 64, 64, 3)
        assert out["mask"].dtype == jnp.float32

    def test_fullnet_full_resolution(self):
        model = choose_model(cfg_for("FullNet"))
        _, out = _init_apply(model, (1, 48, 48, 3))
        assert out["mask"].shape == (1, 48, 48, 3)

    def test_default_model_three_heads(self):
        model = choose_model(cfg_for("UNet2RevA1_vgg16"))
        _, out = _init_apply(model)
        assert set(out) == {"mask", "point", "direction"}
        assert out["mask"].shape == (1, 64, 64, 3)
        assert out["point"].shape == (1, 64, 64, 1)
        assert out["direction"].shape == (1, 64, 64, 9)

    def test_mandd_two_heads_no_point(self):
        model = choose_model(cfg_for("model_unet_MandD"))
        _, out = _init_apply(model)
        assert set(out) == {"mask", "direction"}
        assert out["direction"].shape[-1] == 9

    @pytest.mark.parametrize("name,ch", [("model_unet_MandD4", 5),
                                         ("model_unet_MandD16", 17)])
    def test_mandd_class_variants(self, name, ch):
        model = choose_model(cfg_for(name))
        _, out = _init_apply(model, (1, 32, 32, 3))
        assert out["direction"].shape[-1] == ch

    def test_hrnet_three_heads(self):
        model = choose_model(cfg_for("HRNet18_rev1"))
        _, out = _init_apply(model, (1, 32, 32, 3))
        assert set(out) == {"mask", "point", "direction"}
        assert out["mask"].shape == (1, 32, 32, 3)

    def test_unknown_name_raises(self):
        with pytest.raises(ValueError):
            choose_model(cfg_for("NopeNet"))


class TestFastSmoke:
    """Fast-gate coverage: head contracts at tiny shape (the full-size and
    full-zoo variants are @slow)."""

    def test_unet_head_tiny(self):
        model = choose_model(cfg_for("UNet"))
        _, out = _init_apply(model, (1, 32, 32, 3))
        assert set(out) == {"mask"}
        assert out["mask"].shape == (1, 32, 32, 3)

    def test_unknown_name_raises_fast(self):
        with pytest.raises(ValueError):
            choose_model(cfg_for("NopeNet"))


class TestParams:
    def test_vgg_backbone_param_count(self):
        # torchvision vgg16_bn.features has 14.72M params (convs+bns)
        from cdnet_tpu.models.vgg_unet import VGG16Backbone
        model = VGG16Backbone(dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                               train=False)
        total = n_params(variables)
        assert abs(total - 14_719_808) < 10_000, total

    def test_train_mode_updates_batch_stats(self):
        model = choose_model(cfg_for("UNet"))
        x = jnp.ones((2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out, mutated = model.apply(variables, x, train=True,
                                   mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
        assert "batch_stats" in mutated


class TestVirtualConcat:
    """ResidualUnit over a branch list == the unit over the materialized
    upsampled concat (HRNet's DAM head input, seg_hrnet_rev1.py:527-533):
    the split is an exact linear-algebra rewrite, so f32 agreement is to
    rounding; params bind to the IDENTICAL tree either way."""

    def _branches(self, rng, dtype):
        return [jnp.asarray(rng.rand(2, 16, 16, 18), dtype),
                jnp.asarray(rng.rand(2, 8, 8, 36), dtype),
                jnp.asarray(rng.rand(2, 4, 4, 72), dtype),
                jnp.asarray(rng.rand(2, 2, 2, 144), dtype)]

    def test_split_equals_dense_f32(self):
        from cdnet_tpu.models import layers as L
        rng = np.random.RandomState(7)
        xs = self._branches(rng, jnp.float32)
        ru = L.ResidualUnit(64, dtype=jnp.float32)
        v = ru.init(jax.random.PRNGKey(0), xs, train=False)
        got = ru.apply(v, xs, train=False)
        ref = ru.apply(v, L._materialized_concat(xs, jnp.float32),
                       train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)

    def test_param_tree_identical_to_dense(self):
        from cdnet_tpu.models import layers as L
        rng = np.random.RandomState(8)
        xs = self._branches(rng, jnp.float32)
        ru = L.ResidualUnit(64, dtype=jnp.float32)
        v_split = ru.init(jax.random.PRNGKey(0), xs, train=False)
        v_dense = ru.init(jax.random.PRNGKey(0),
                          L._materialized_concat(xs, jnp.float32),
                          train=False)
        tree = jax.tree_util.tree_structure
        assert tree(v_split) == tree(v_dense)
        for a, b in zip(jax.tree_util.tree_leaves(v_split),
                        jax.tree_util.tree_leaves(v_dense)):
            assert a.shape == b.shape

    def test_train_falls_back_to_dense(self):
        from cdnet_tpu.models import layers as L
        rng = np.random.RandomState(9)
        xs = self._branches(rng, jnp.float32)
        ru = L.ResidualUnit(64, dtype=jnp.float32)
        v = ru.init(jax.random.PRNGKey(0), xs, train=False)
        out, mutated = ru.apply(v, xs, train=True,
                                mutable=["batch_stats"])
        assert out.shape == (2, 16, 16, 64)
        assert "batch_stats" in mutated


class TestCompositeUpconv:
    """conv3x3(bilinear_up_s(x)) collapsed to one low-res conv +
    depth-to-space (ops/upconv.py; the HRNet head merge runs on this)."""

    @pytest.mark.parametrize("s,h,w,cin,cout", [
        (2, 7, 9, 5, 4), (4, 6, 5, 3, 7), (8, 4, 6, 2, 3), (1, 5, 5, 3, 3),
    ])
    def test_matches_direct_path(self, s, h, w, cin, cout):
        from cdnet_tpu.ops.upconv import conv3x3_of_upsampled
        from cdnet_tpu.ops.upsample import upsample_bilinear_int
        rng = np.random.RandomState(s + cin)
        x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
        k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.3, jnp.float32)
        ref = jax.lax.conv_general_dilated(
            upsample_bilinear_int(x, s, s), k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = conv3x3_of_upsampled(x, k, s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)


class TestPersistentPackedHRNet:
    """HRNet's branch 0 runs width-packed across stages 2-4 at inference
    (models/hrnet.py; the dense 18-ch full-res map is lane-padded 18->128
    on TPU — experiments/packed_layout_ab.py). The packed path must be a
    pure re-layout: f32 forward parity with the dense path to rounding."""

    def test_forced_packed_equals_dense_f32(self):
        from cdnet_tpu.models.hrnet import HRNet18DAM
        from cdnet_tpu.ops import packed_conv
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
        model = HRNet18DAM(dtype=jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        old = packed_conv.MODE
        try:
            packed_conv.MODE = "off"
            ref = model.apply(v, x, train=False)
            packed_conv.MODE = "force"
            got = model.apply(v, x, train=False)
        finally:
            packed_conv.MODE = old
        for k in ref:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(ref[k]), atol=1e-3)

    def test_gate_respects_geometry(self):
        from cdnet_tpu.ops import packed_conv
        old = packed_conv.MODE
        try:
            packed_conv.MODE = "force"
            ok = packed_conv.persistent_pack_applicable(
                train=False, h=64, w=64, s=4, dtype=jnp.float32)
            bad_w = packed_conv.persistent_pack_applicable(
                train=False, h=64, w=60, s=4, dtype=jnp.float32)
            trn = packed_conv.persistent_pack_applicable(
                train=True, h=64, w=64, s=4, dtype=jnp.float32)
        finally:
            packed_conv.MODE = old
        assert ok and not bad_w and not trn


@pytest.mark.slow
@pytest.mark.slowzoo
class TestExtendedZoo:
    @pytest.mark.parametrize("name", ["UNet_resnet50", "SegNet", "PSPNet",
                                      "DeepLab", "FCN8", "HRNet18",
                                      "FCN_pooling"])
    def test_forward_shapes(self, name):
        model = choose_model(cfg_for(name))
        _, out = _init_apply(model, (1, 64, 64, 3))
        assert out["mask"].shape == (1, 64, 64, 3), name

    def test_resnet101_variant(self):
        model = choose_model(cfg_for("UNet_resnet101"))
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                               train=False)
        # resnet101 has 23 layer3 blocks
        names = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        keys = {p[0].key for p in [k for k, _ in names]}
        assert "backbone" in keys

    def test_segnet_unpool_roundtrip(self):
        from cdnet_tpu.models.legacy import _pool_with_indices, _unpool_with_indices
        x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 2), jnp.float32)
        p, idx = _pool_with_indices(x)
        up = _unpool_with_indices(p, idx)
        # unpooled maxima sit at their original positions
        assert up.shape == x.shape
        np.testing.assert_allclose(np.asarray(up).max(), np.asarray(x).max())
        mask = np.asarray(up) != 0
        np.testing.assert_allclose(np.asarray(x)[mask], np.asarray(up)[mask])

    @pytest.mark.parametrize("name", ["SegResNet", "PSPDenseNet"])
    def test_second_wave_legacy(self, name):
        model = choose_model(cfg_for(name))
        _, out = _init_apply(model, (1, 64, 64, 3))
        assert out["mask"].shape == (1, 64, 64, 3), name

    def test_xception_backbone_contract(self):
        """deeplabv3_plus.py:134-247: stride-16 2048ch features + stride-4
        128ch low-level skip; 16 middle-flow blocks at 728ch."""
        from cdnet_tpu.models.legacy import XceptionBackbone
        model = XceptionBackbone(dtype=jnp.float32)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(lambda k, a: model.init(k, a, train=False))(
            jax.random.PRNGKey(0), x)
        feats, low = jax.jit(lambda v, a: model.apply(v, a, train=False))(
            variables, x)
        assert feats.shape == (1, 4, 4, 2048)
        assert low.shape == (1, 16, 16, 128)

    def test_deeplab_resnet_variant(self):
        cfg = cfg_for("DeepLab")
        cfg.model.backbone = "resnet50"
        model = choose_model(cfg)
        _, out = _init_apply(model, (1, 64, 64, 3))
        assert out["mask"].shape == (1, 64, 64, 3)
