"""Sharded train / eval steps.

One jit-compiled program per step: on-device label synthesis (batched via
vmap), forward, composite loss, backward, optimizer update — the entire
per-batch body of the reference's `train_util_dam.train`
(`/root/reference/train_util_dam.py:45-339`) with its CPU one-hot loops and
per-batch `.cuda()` transfers replaced by XLA. Data parallelism comes from the
batch arriving sharded over the mesh's "data" axis; XLA inserts the gradient
all-reduce over ICI automatically.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cdnet_tpu import losses
from cdnet_tpu.metrics.pixel import EPS
from cdnet_tpu.ops.label_synthesis import synthesize_labels


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def prepare_targets(batch: dict, cfg, max_instances: int = 160) -> dict:
    """Batch of instance labels -> full supervision dict, all on device.

    ``batch``: {"image": (N,H,W,C), "weight": (N,H,W), "instance": (N,H,W)}.
    Replaces the reference's per-sample CPU LabelEncoding + per-batch numpy
    one-hot prep (train_util_dam.py:59-142). The /20 weight scaling matches
    train_util_dam.py:102.
    """
    m = cfg.model
    # keep label synthesis on the batched XLA path: per-sample vmap over the
    # pallas CC fixpoint would serialize via lax.map (and pallas_call cannot
    # partition in a sharded train program) — the batched scans are already
    # the right shape here
    from cdnet_tpu.ops.pallas_gate import scoped_disable
    with scoped_disable(True):
        synth = jax.vmap(
            functools.partial(synthesize_labels, max_instances=max_instances)
        )(batch["instance"].astype(jnp.int32))
    mask_t = synth["label_3c"]
    targets = {
        "mask": mask_t,
        "mask_onehot": jax.nn.one_hot(mask_t, m.out_c, dtype=jnp.float32),
        "weight": batch["weight"].astype(jnp.float32) / 20.0,
        "instance": synth["instance"],
    }
    if m.mseloss == 1:
        targets["point"] = synth["point"][..., None]
    if m.direction == 1:
        # direction one-hot is additionally masked to foreground classes
        # (train_util_dam.py:138-140 zeroes one-hot outside mask in {1,2})
        donehot = jax.nn.one_hot(synth["direction"], m.direction_classes,
                                 dtype=jnp.float32)
        fg = (mask_t == 1) | (mask_t == 2)
        donehot = donehot * fg[..., None]
        targets["direction"] = synth["direction"]
        targets["direction_onehot"] = donehot
    return targets


def pixel_metrics_device(pred: jnp.ndarray, target: jnp.ndarray):
    """Inside-class pixel metrics on device (utils.py:12-62 tensor variant)."""
    p = (pred == 1).astype(jnp.float32)
    t = (target == 1).astype(jnp.float32)
    axes = tuple(range(1, p.ndim))
    tp = jnp.sum(p * t, axes)
    tn = jnp.sum((1 - p) * (1 - t), axes)
    fp = jnp.sum(p * (1 - t), axes)
    fn = jnp.sum((1 - p) * t, axes)
    precision = tp / (tp + fp + EPS)
    recall = tp / (tp + fn + EPS)
    f1 = 2 * precision * recall / (precision + recall + EPS)
    acc = (tp + tn) / (tp + fp + tn + fn + EPS)
    iou = tp / (tp + fp + fn + EPS)
    return {k: jnp.mean(v) for k, v in
            dict(pixel_acc=acc, pixel_iou=iou, pixel_recall=recall,
                 pixel_precision=precision, pixel_F1=f1).items()}


def make_train_step(model, cfg, opt: optax.GradientTransformation,
                    max_instances: int = 160) -> Callable:
    """Build the jitted train step: (state, batch) -> (state, metrics)."""
    is_lookahead = cfg.train.optimizer.lower() == "ranger"

    def loss_fn(params, batch_stats, batch, targets, step):
        # dropout RNG: deterministic per step (folded from the config seed)
        # — without it every nn.Dropout model (FullNet, FCN_pooling, PSPNet,
        # PSPDenseNet, FCN8) crashed at the first train step. alpha==3 is
        # intentionally NOT an SSIM path: the reference's only alpha==3 code
        # (train_util.py:156-165) is dead (model_ssimloss is hard-reset to 0
        # at :193) and train_util_dam treats alpha==3 as "no extra loss";
        # losses.ssim_loss stays available as a library function.
        rng = jax.random.fold_in(jax.random.PRNGKey(cfg.train.seed), step)
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        total, comps = losses.composite_loss(out, targets, cfg, max_instances)
        return total, (comps, mut["batch_stats"], out)

    @jax.jit
    def train_step(state: TrainState, batch: dict):
        targets = prepare_targets(batch, cfg, max_instances)
        grad_params = state.params.fast if is_lookahead else state.params
        (total, (comps, new_bs, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(grad_params, state.batch_stats, batch,
                                   targets, state.step)
        # value= is accepted (and ignored) by every chain via
        # with_extra_args_support; ReduceLROnPlateau is epoch-granular and
        # driven by the host (optimizers.PlateauTracker + plateau_scale)
        updates, new_opt = opt.update(grads, state.opt_state, state.params,
                                      value=total)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(comps)
        pred = jnp.argmax(out["mask"], axis=-1)
        metrics.update(pixel_metrics_device(pred, targets["mask"]))
        return (state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_bs, opt_state=new_opt),
                metrics)

    return train_step


def make_sliding_eval_step(model, cfg, max_instances: int = 160,
                           return_pred: bool = False) -> Callable:
    """Jitted sliding-window validation (reference train.py:216-259 +
    train_util_dam.validate:469-474): one (1,H,W,C) val image per call,
    forwarded tile-by-tile with ``input_size``/``val_overlap`` via
    split_forward (the tile grid is ONE batched forward, not the reference's
    serial loop), loss + pixel metrics computed on the stitched full-image
    outputs. Falls through to a whole-image forward when the image fits in
    one tile (split_forward handles both)."""
    from cdnet_tpu.ops.sliding_window import split_forward
    size, overlap = cfg.train.input_size, cfg.train.val_overlap
    if overlap >= size:
        # stride = size - overlap must stay positive; overlap >= size
        # produces a negative pad inside split_forward (e.g. the reference
        # default val_overlap=40 with --input-size 32). Any overlap < size
        # is geometrically valid and passes through untouched.
        import warnings
        warnings.warn(f"val_overlap={overlap} >= input_size={size}; "
                      f"clamping to {size // 4}")
        overlap = size // 4

    @jax.jit
    def eval_step(state: TrainState, batch: dict):
        # one val image per call (reference validates at batch 1,
        # train.py:216-259); a larger batch would silently broadcast the
        # single forwarded image's outputs against every target
        assert batch["image"].shape[0] == 1, (
            f"sliding eval expects batch 1, got {batch['image'].shape[0]}")
        targets = prepare_targets(batch, cfg, max_instances)
        params = state.params.slow if cfg.train.optimizer.lower() == "ranger" \
            else state.params
        variables = {"params": params, "batch_stats": state.batch_stats}

        def apply(tiles):
            # fused Pallas convs have no SPMD rule: keep XLA convs when the
            # eval state may be sharded over >1 devices (single-chip eval
            # keeps the kernel; its fallback is armed via choose_model)
            from cdnet_tpu.ops import pallas_conv
            with pallas_conv.scoped_disable(jax.device_count() > 1):
                out = model.apply(variables, tiles, train=False)
            res = {"mask": jnp.moveaxis(out["mask"], -1, 0)}    # (3,T,s,s)
            if "point" in out:
                res["point"] = out["point"][..., 0]             # (T,s,s)
            if "direction" in out:
                res["direction"] = jnp.moveaxis(out["direction"], -1, 0)
            return res

        st = split_forward(apply, batch["image"][0], size, overlap)
        out = {"mask": jnp.moveaxis(st["mask"], 0, -1)[None]}
        if "point" in st:
            out["point"] = st["point"][None, ..., None]
        if "direction" in st:
            out["direction"] = jnp.moveaxis(st["direction"], 0, -1)[None]
        _, comps = losses.composite_loss(out, targets, cfg, max_instances)
        pred = jnp.argmax(out["mask"], axis=-1)
        metrics = dict(comps)
        metrics.update(pixel_metrics_device(pred, targets["mask"]))
        if return_pred:
            return metrics, pred, targets["mask"]
        return metrics

    return eval_step


def make_eval_step(model, cfg, max_instances: int = 160,
                   return_pred: bool = False) -> Callable:
    """Jitted validation step: (state, batch) -> metrics (no grads).

    ``return_pred=True`` additionally returns (pred argmax, 3-class target)
    for the driver's optional object-level validation metrics
    (train_util_dam.py:589-605, the do_object_metric path)."""

    @jax.jit
    def eval_step(state: TrainState, batch: dict):
        targets = prepare_targets(batch, cfg, max_instances)
        params = state.params.slow if cfg.train.optimizer.lower() == "ranger" \
            else state.params
        from cdnet_tpu.ops import pallas_conv
        with pallas_conv.scoped_disable(jax.device_count() > 1):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], train=False)
        _, comps = losses.composite_loss(out, targets, cfg, max_instances)
        pred = jnp.argmax(out["mask"], axis=-1)
        metrics = dict(comps)
        metrics.update(pixel_metrics_device(pred, targets["mask"]))
        if return_pred:
            return metrics, pred, targets["mask"]
        return metrics

    return eval_step
