"""Optimizer + LR-schedule factory (parity with `/root/reference/utils.py:907-990`
and the hhl_utils RAdam/Ranger family).

Implemented on optax: the reference's torch optimizers map to composable
gradient transforms that live inside the jit-compiled train step — no
host-side parameter groups. `ranger` = RAdam wrapped in Lookahead
(hhl_utils/ranger.py:26).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def make_schedule(cfg, steps_per_epoch: int = 1) -> Callable[[int], float]:
    """Epoch-granular LR schedules (reference semantics; utils.py:940-962,965-977).

    - 'StepLR':  lr * lr_decay^(epoch // step)
    - 'ExponentialLR': lr * lr_decay^epoch
    - 'CosineAnnealingWarmRestarts': T_0 = step, T_mult = 2, eta_min = 0
    - 'None' / other: constant lr (adjust_learning_rate with scheduler None
      keeps lr fixed, utils.py:968-971)
    """
    t = cfg.train
    base, decay, step_size = t.lr, t.lr_decay, max(t.step, 1)
    name = t.scheduler

    def epoch_of(step):
        return step // steps_per_epoch

    if name == "StepLR":
        return lambda s: base * decay ** (epoch_of(s) // step_size)
    if name == "ExponentialLR":
        return lambda s: base * decay ** epoch_of(s)
    if name == "CosineAnnealingWarmRestarts":
        # closed form (traceable under jit, unlike a python while): with
        # T_mult=2 the k-th restart begins at epoch T_0*(2^k - 1), so
        # k = floor(log2(e/T_0 + 1)), T_i = T_0*2^k
        def sched(s):
            e = epoch_of(s)
            k = jnp.floor(jnp.log2(e / step_size + 1.0))
            t_i = step_size * 2.0 ** k
            t_cur = e - step_size * (2.0 ** k - 1.0)
            return 0.5 * base * (1 + jnp.cos(jnp.pi * t_cur / t_i))
        return sched
    # 'ReduceLROnPlateau' is stateful on the per-epoch val loss; handled by
    # the host-side PlateauTracker + plateau_scale transform below.
    return lambda s: base


def radam_4step(learning_rate, b1: float = 0.9, b2: float = 0.99,
                eps: float = 1e-8, weight_decay: float = 0.0
                ) -> optax.GradientTransformation:
    """RAdam_4step (reference hhl_utils/radam.py:84-180, update_all=False,
    additional_four=False): moments accumulate from step 1, but parameters
    are frozen for the first 4 steps; afterwards the rectified-RAdam update
    applies (its SMA term exceeds the >4 threshold from step 5 on), with
    coupled weight decay ``p -= wd*lr*p`` in the same branch."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return {"step": jnp.zeros((), jnp.int32),
                "mu": zeros, "nu": jax.tree.map(jnp.zeros_like, params)}

    def update(grads, state, params=None, **_):
        del _
        step = state["step"] + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state["mu"], grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state["nu"], grads)
        sf = step.astype(jnp.float32)
        lr = learning_rate(step) if callable(learning_rate) else learning_rate
        beta2_t = b2 ** sf
        n_sma_max = 2.0 / (1 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * sf * beta2_t / (1 - beta2_t)
        rect = jnp.sqrt((n_sma - 4) / (n_sma_max - 4) * (n_sma - 2) / n_sma
                        * n_sma_max / (n_sma_max - 2))
        step_size = lr * rect / (1 - b1 ** sf)
        active = step > 4

        def upd(m, v, p):
            denom = jnp.sqrt(v) / jnp.sqrt(1 - beta2_t) + eps
            u = -step_size * m / denom
            if params is not None and weight_decay:
                u = u - weight_decay * lr * p
            return jnp.where(active, u, 0.0)

        updates = jax.tree.map(upd, mu, nu,
                               params if params is not None else mu)
        return updates, {"step": step, "mu": mu, "nu": nu}

    return optax.GradientTransformation(init, update)


def get_optimizer(cfg, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """`utils.get_optimizer` parity: optimizer name -> optax transform chain."""
    t = cfg.train
    schedule = make_schedule(cfg, steps_per_epoch)
    name = t.optimizer.lower()
    wd = t.weight_decay

    if name == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(learning_rate=schedule, momentum=cfg.train.momentum),
        )
    elif name == "adam":
        # torch Adam(weight_decay) adds wd*p to the gradient (L2, not AdamW)
        opt = optax.chain(
            optax.add_decayed_weights(wd),
            optax.adam(learning_rate=schedule, b1=0.9, b2=0.99),
        )
    elif name == "radam":
        # hhl RAdam applies weight decay as a DIRECT lr-scaled param shrink
        # (radam.py:70-72: p -= wd*lr*p) OUTSIDE the moment estimates —
        # decay goes after scale_by_radam, not into the gradient (the
        # add-to-grad form feeds wd*p into exp_avg/exp_avg_sq and changes
        # the adaptive denominator)
        opt = optax.chain(
            optax.scale_by_radam(b1=0.9, b2=0.99),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(schedule),
        )
    elif name == "radam4s":
        opt = radam_4step(schedule, b1=0.9, b2=0.99, weight_decay=wd)
    elif name == "adamw":
        warmup = 4000
        warm = optax.linear_schedule(0.0, 1.0, warmup)
        opt = optax.chain(
            optax.adamw(learning_rate=lambda s: schedule(s) * warm(s),
                        b1=0.9, b2=0.99, weight_decay=wd),
        )
    elif name == "ranger":
        # Ranger = lookahead(RAdam); decay is the same direct lr-scaled
        # shrink as radam (ranger.py:147-148), eps=1e-5 (ranger.py:28)
        inner = optax.chain(
            optax.scale_by_radam(b1=0.9, b2=0.99, eps=1e-5),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(schedule),
        )
        if t.scheduler == "ReduceLROnPlateau":
            # the plateau scale must multiply the INNER updates: optax
            # lookahead updates "should not be modified before they are
            # applied" or fast/slow params desynchronize at sync steps
            inner = optax.chain(inner, plateau_scale())
        opt = optax.lookahead(inner, sync_period=6, slow_step_size=0.5)
    else:
        raise ValueError(f"Optimizer {t.optimizer} not available")

    if t.scheduler == "ReduceLROnPlateau" and name != "ranger":
        # torch ReduceLROnPlateau steps ONCE PER EPOCH on the validation loss
        # (utils.py:951-954, train.py:404-413). The epoch-level decision is
        # host-side state (PlateauTracker below); the jitted step only sees a
        # scale factor living in opt_state, which the train driver refreshes
        # between epochs via set_plateau_scale.
        opt = optax.chain(opt, plateau_scale())
    # uniform update signature: every optimizer accepts (and plain ones
    # ignore) the ``value=`` kwarg the train step always passes
    return optax.with_extra_args_support(opt)


def plateau_scale() -> optax.GradientTransformation:
    """Multiply updates by a driver-controlled scalar (ReduceLROnPlateau's
    current lr / base-lr ratio). The scalar is opt_state so it is a traced
    array — updating it between epochs does not retrigger compilation."""

    def init(params):
        del params
        return {"plateau_scale": jnp.ones((), jnp.float32)}

    def update(updates, state, params=None, **_):
        del params, _
        scaled = jax.tree.map(lambda u: u * state["plateau_scale"], updates)
        return scaled, state

    return optax.GradientTransformation(init, update)


def set_plateau_scale(opt_state, scale: float):
    """Return opt_state with every plateau_scale leaf replaced by ``scale``."""
    def visit(node):
        if isinstance(node, dict) and "plateau_scale" in node:
            return {"plateau_scale": jnp.asarray(scale, jnp.float32)}
        return node
    return jax.tree.map(visit, opt_state,
                        is_leaf=lambda n: isinstance(n, dict)
                        and "plateau_scale" in n)


class PlateauTracker:
    """torch.optim.lr_scheduler.ReduceLROnPlateau('min') host-side semantics
    (the reference's exact construction: factor=lr_decay, patience=step,
    threshold=1e-4 rel, cooldown=0, min_lr=0; utils.py:951-954). ``step``
    takes the per-epoch val loss and returns the cumulative lr scale."""

    def __init__(self, factor: float, patience: int, threshold: float = 1e-4,
                 eps: float = 1e-8, base_lr: float = 1.0):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.eps = eps
        self.base_lr = base_lr
        self.best = float("inf")
        self.num_bad = 0
        self.scale = 1.0

    def step(self, value: float) -> float:
        if value < self.best * (1.0 - self.threshold):
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            # torch skips the update when the lr delta is below eps
            old = self.base_lr * self.scale
            new = old * self.factor
            if old - new > self.eps:
                self.scale *= self.factor
            self.num_bad = 0
        return self.scale


def init_params_for(opt_name: str, params):
    """Lookahead needs a LookaheadParams pair; others take params directly."""
    if opt_name.lower() == "ranger":
        return optax.LookaheadParams.init_synced(params)
    return params
