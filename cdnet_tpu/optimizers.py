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
    # 'ReduceLROnPlateau' is stateful on val loss; handled by the train driver
    # via optax.contrib.reduce_on_plateau when selected.
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
        opt = optax.chain(
            optax.add_decayed_weights(wd),
            optax.radam(learning_rate=schedule, b1=0.9, b2=0.99),
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
        inner = optax.chain(
            optax.add_decayed_weights(wd),
            optax.radam(learning_rate=schedule, b1=0.9, b2=0.99),
        )
        opt = optax.lookahead(inner, sync_period=6, slow_step_size=0.5)
    else:
        raise ValueError(f"Optimizer {t.optimizer} not available")

    if t.scheduler == "ReduceLROnPlateau":
        # torch ReduceLROnPlateau steps per epoch (utils.py:943-947); optax's
        # reduce_on_plateau counts opt.update calls, so denominate patience
        # in steps. The train step feeds the loss via ``opt.update(...,
        # value=loss)`` — see parallel/train_step.py.
        opt = optax.chain(opt, optax.contrib.reduce_on_plateau(
            factor=t.lr_decay, patience=t.step * steps_per_epoch))
    # uniform update signature: every optimizer accepts (and plain ones
    # ignore) the ``value=`` kwarg the train step always passes
    return optax.with_extra_args_support(opt)


def init_params_for(opt_name: str, params):
    """Lookahead needs a LookaheadParams pair; others take params directly."""
    if opt_name.lower() == "ranger":
        return optax.LookaheadParams.init_synced(params)
    return params
