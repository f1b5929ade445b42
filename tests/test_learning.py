"""Learning regression: a tiny model must fit a few synthetic tiles
(guards the full synthesis -> loss -> optimizer loop against silent breaks)."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from cdnet_tpu.config import Config
from cdnet_tpu.data.synthetic import synthetic_tile
from cdnet_tpu.models import choose_model
from cdnet_tpu.optimizers import get_optimizer, init_params_for
from cdnet_tpu.parallel import TrainState, make_train_step


def test_one_train_step_smoke():
    """Fast-gate: one full train step (synthesis -> loss -> grad -> update)
    compiles and yields a finite, changing loss at tiny shape."""
    cfg = Config()
    cfg.model.model_name = "UNet"
    cfg.model.compute_dtype = "float32"
    cfg.model.direction = 0
    cfg.model.mseloss = 0

    rng = np.random.RandomState(0)
    inst = np.zeros((2, 32, 32), np.int32)
    inst[:, 8:16, 8:16] = 1
    batch = {
        "image": jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32),
        "weight": jnp.full((2, 32, 32), 20.0, jnp.float32),
        "instance": jnp.asarray(inst),
    }
    model = choose_model(cfg)
    opt = get_optimizer(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch["image"][:1],
                           train=False)
    params = init_params_for(cfg.train.optimizer, variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=variables["batch_stats"],
                       opt_state=opt.init(params))
    step = make_train_step(model, cfg, opt, max_instances=8)
    state2, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert int(state2.step) == 1


def test_dropout_model_trains():
    """A model containing nn.Dropout (FullNet, drop_rate=0.1) must train —
    the step must supply a 'dropout' RNG (regression: flax raised 'Need
    PRNG for dropout' on the first step for every dropout model)."""
    cfg = Config()
    cfg.model.model_name = "FullNet"
    cfg.model.compute_dtype = "float32"
    cfg.model.direction = 0
    cfg.model.mseloss = 0

    rng = np.random.RandomState(0)
    inst = np.zeros((1, 16, 16), np.int32)
    inst[:, 4:9, 4:9] = 1
    batch = {
        "image": jnp.asarray(rng.rand(1, 16, 16, 3), jnp.float32),
        "weight": jnp.full((1, 16, 16), 20.0, jnp.float32),
        "instance": jnp.asarray(inst),
    }
    model = choose_model(cfg)
    opt = get_optimizer(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch["image"], train=False)
    params = init_params_for(cfg.train.optimizer, variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=variables["batch_stats"],
                       opt_state=opt.init(params))
    step = make_train_step(model, cfg, opt, max_instances=4)
    state2, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
@pytest.mark.slowtrain
def test_unet_fits_synthetic_tiles():
    cfg = Config()
    cfg.model.model_name = "UNet"
    cfg.model.compute_dtype = "float32"
    cfg.model.direction = 0
    cfg.model.mseloss = 0
    cfg.train.lr = 3e-3

    # batch 4 / 18 steps: the smallest budget where the full-width UNet
    # still clears F1>0.5 on the easy blobs with margin (measured ~0.8 by
    # step 18; batch 8 x 25 steps cost 184s of the slowtrain gate's 300s)
    rng = np.random.RandomState(0)
    tiles = [synthetic_tile(rng, 64) for _ in range(4)]
    batch = {
        "image": jnp.asarray(np.stack([t[0] for t in tiles]), jnp.float32) / 255.0,
        "weight": jnp.full((4, 64, 64), 20.0, jnp.float32),
        "instance": jnp.asarray(np.stack([t[1] for t in tiles])),
    }

    model = choose_model(cfg)
    opt = get_optimizer(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch["image"][:1],
                           train=False)
    params = init_params_for(cfg.train.optimizer, variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=variables["batch_stats"],
                       opt_state=opt.init(params))
    step = make_train_step(model, cfg, opt, max_instances=32)

    first_f1 = last_f1 = None
    for i in range(18):
        state, m = step(state, batch)
        f1 = float(m["pixel_F1"])
        first_f1 = first_f1 if first_f1 is not None else f1
        last_f1 = f1
    assert last_f1 > 0.5, (first_f1, last_f1)
    assert last_f1 > first_f1
