"""Scheduler / optimizer coverage: every scheduler name runs a real train
step end-to-end (the reference builds these in utils.py:907-962 and steps
them per epoch in train.py:404-413). Round-1 regression: ReduceLROnPlateau
crashed at step 1 because optax's reduce_on_plateau needs ``value=`` in
``opt.update`` and the train step didn't pass it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cdnet_tpu.config import Config
from cdnet_tpu.models import choose_model
from cdnet_tpu.optimizers import get_optimizer, init_params_for, make_schedule
from cdnet_tpu.parallel import TrainState, make_train_step

SCHEDULERS = ["None", "StepLR", "ExponentialLR", "ReduceLROnPlateau",
              "CosineAnnealingWarmRestarts"]


def _tiny_cfg(scheduler):
    cfg = Config()
    cfg.model.model_name = "UNet"
    cfg.model.compute_dtype = "float32"
    cfg.model.direction = 0
    cfg.model.mseloss = 0
    cfg.train.scheduler = scheduler
    return cfg


def _tiny_batch():
    rng = np.random.RandomState(0)
    inst = np.zeros((2, 32, 32), np.int32)
    inst[:, 4:12, 4:12] = 1
    inst[:, 18:28, 18:28] = 2
    return {
        "image": jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32),
        "weight": jnp.full((2, 32, 32), 20.0, jnp.float32),
        "instance": jnp.asarray(inst),
    }


@pytest.mark.slow
@pytest.mark.parametrize("scheduler", SCHEDULERS)
def test_one_train_step_under_every_scheduler(scheduler):
    cfg = _tiny_cfg(scheduler)
    model = choose_model(cfg)
    opt = get_optimizer(cfg, steps_per_epoch=2)
    batch = _tiny_batch()
    variables = model.init(jax.random.PRNGKey(0), batch["image"][:1],
                           train=False)
    params = init_params_for(cfg.train.optimizer, variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=variables["batch_stats"],
                       opt_state=opt.init(params))
    step = make_train_step(model, cfg, opt, max_instances=8)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"])), scheduler
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"])), scheduler


@pytest.mark.parametrize("opt_name", ["sgd", "adam", "radam", "radam4s",
                                      "adamw", "ranger"])
def test_every_optimizer_name_updates(opt_name):
    """utils.py:907-962 name surface: every optimizer builds and applies."""
    from cdnet_tpu.optimizers import init_params_for

    cfg = _tiny_cfg("None")
    cfg.train.optimizer = opt_name
    opt = get_optimizer(cfg)
    raw = {"w": jnp.ones(4), "b": jnp.zeros(2)}
    params = init_params_for(opt_name, raw)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like,
                         params.fast if opt_name == "ranger" else params)
    updates, state = opt.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    leaves = jax.tree_util.tree_leaves(new)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_plateau_scale_drops_after_patience():
    """reduce_on_plateau halves the LR scale after `patience` flat steps."""
    cfg = _tiny_cfg("ReduceLROnPlateau")
    cfg.train.lr_decay = 0.5
    cfg.train.step = 2
    opt = get_optimizer(cfg, steps_per_epoch=1)  # patience = 2 updates
    params = {"w": jnp.ones(4)}
    state = opt.init(params)
    grads = {"w": jnp.ones(4)}
    for _ in range(8):
        updates, state = opt.update(grads, state, params,
                                    value=jnp.float32(1.0))
        params = optax.apply_updates(params, updates)
    scale = float(jax.tree_util.tree_leaves(
        [s.scale for s in jax.tree_util.tree_leaves(state, is_leaf=lambda x: hasattr(x, "scale")) if hasattr(s, "scale")])[0])
    assert scale < 1.0


def test_schedule_shapes():
    cfg = _tiny_cfg("StepLR")
    cfg.train.lr, cfg.train.lr_decay, cfg.train.step = 0.1, 0.5, 2
    s = make_schedule(cfg, steps_per_epoch=1)
    assert s(0) == pytest.approx(0.1)
    assert s(2) == pytest.approx(0.05)   # epoch 2 // step 2 = 1 decay
    assert s(4) == pytest.approx(0.025)
    cfg.train.scheduler = "ExponentialLR"
    s = make_schedule(cfg, steps_per_epoch=1)
    assert s(3) == pytest.approx(0.1 * 0.5 ** 3)
    cfg.train.scheduler = "CosineAnnealingWarmRestarts"
    s = make_schedule(cfg, steps_per_epoch=1)
    assert s(0) == pytest.approx(0.1)           # cos(0)
    assert s(1) == pytest.approx(0.05)          # T_0=2: cos(pi/2) midpoint
    assert s(2) == pytest.approx(0.1)           # restart, T_i=4
