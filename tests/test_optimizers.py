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
    """PlateauTracker + plateau_scale: flat val losses shrink the update."""
    from cdnet_tpu.optimizers import PlateauTracker, set_plateau_scale

    cfg = _tiny_cfg("ReduceLROnPlateau")
    cfg.train.lr_decay = 0.5
    cfg.train.step = 2
    opt = get_optimizer(cfg, steps_per_epoch=1)
    params = {"w": jnp.ones(4)}
    state = opt.init(params)
    grads = {"w": jnp.ones(4)}
    tracker = PlateauTracker(cfg.train.lr_decay, cfg.train.step)
    scales = []
    for _epoch in range(8):
        updates, state = opt.update(grads, state, params,
                                    value=jnp.float32(1.0))
        params = optax.apply_updates(params, updates)
        scale = tracker.step(1.0)  # flat val loss every epoch
        scales.append(scale)
        state = set_plateau_scale(state, scale)
    # patience=2: first reduction after epoch 3 (bad epochs 1,2,3 > patience)
    assert scales[:3] == [1.0, 1.0, 1.0]
    assert scales[3] == 0.5
    # the scale actually lands in opt_state and shrinks the next update
    updates, state = opt.update(grads, state, params, value=jnp.float32(1.0))
    assert np.allclose(np.asarray(updates["w"]),
                       scales[-1] * -cfg.train.lr, atol=1e-6)


def test_plateau_tracker_matches_torch_epoch_for_epoch():
    """PlateauTracker vs torch ReduceLROnPlateau on a noisy loss trajectory
    (the reference's construction: 'min', factor=lr_decay, patience=step;
    utils.py:951-954). LR must agree at EVERY epoch."""
    import torch

    from cdnet_tpu.optimizers import PlateauTracker

    lr0, factor, patience = 0.1, 0.5, 3
    p = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([p], lr=lr0)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, "min", factor=factor, patience=patience)
    tracker = PlateauTracker(factor, patience, base_lr=lr0)

    rng = np.random.RandomState(3)
    losses = np.concatenate([
        1.0 / (np.arange(10) + 1.0),          # improving
        np.full(12, 0.2) + rng.rand(12) * 1e-6,  # plateau
        0.05 / (np.arange(8) + 1.0),          # improving again
        np.full(10, 0.05),                    # plateau
    ])
    for e, v in enumerate(losses):
        tsched.step(float(v))
        scale = tracker.step(float(v))
        torch_lr = topt.param_groups[0]["lr"]
        assert torch_lr == pytest.approx(lr0 * scale, rel=1e-12), \
            f"epoch {e}: torch {torch_lr} vs ours {lr0 * scale}"
    assert tracker.scale < 1.0  # the trajectory did trigger reductions


@pytest.mark.parametrize("name,step,decay", [
    ("StepLR", 5, 0.995), ("ExponentialLR", 1, 0.97),
    ("CosineAnnealingWarmRestarts", 4, 0.9)])
def test_schedule_matches_torch_over_epochs_and_steps(name, step, decay):
    """make_schedule(steps_per_epoch=M) vs the torch scheduler stepped once
    per epoch (train.py:404-413): for every epoch e and within-epoch step m,
    our lr(e*M + m) must equal torch's lr at epoch e — the round-2 driver
    regression was decaying per optimizer STEP (steps_per_epoch defaulted
    to 1)."""
    import torch

    lr0, M = 0.01, 7
    cfg = _tiny_cfg(name)
    cfg.train.lr, cfg.train.lr_decay, cfg.train.step = lr0, decay, step
    sched = make_schedule(cfg, steps_per_epoch=M)

    p = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([p], lr=lr0)
    if name == "StepLR":
        tsched = torch.optim.lr_scheduler.StepLR(topt, step_size=step,
                                                 gamma=decay)
    elif name == "ExponentialLR":
        tsched = torch.optim.lr_scheduler.ExponentialLR(topt, gamma=decay)
    else:
        tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
            topt, T_0=step, T_mult=2, eta_min=0)
    # the cosine closed form evaluates in f32 inside jit; 1e-4 relative slack
    # covers its rounding, the geometric schedules are exact to 1e-6
    rel = 1e-4 if name == "CosineAnnealingWarmRestarts" else 1e-6
    for epoch in range(40):
        torch_lr = topt.param_groups[0]["lr"]
        for m in range(M):
            ours = float(sched(epoch * M + m))
            assert ours == pytest.approx(torch_lr, rel=rel), \
                f"{name} epoch {epoch} step {m}"
        tsched.step()


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
