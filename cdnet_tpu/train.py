"""Training driver (reference `train.py` parity, TPU-native execution).

CLI: ``python -m cdnet_tpu.train [flags]`` — same flag surface as the
reference `Options` (`/root/reference/options.py`), plus ``--synthetic N`` to
train on generated tiles when no dataset is on disk.

Flow parity with `/root/reference/train.py:47-458`: seed, logging, experiment
CSV row, model/optimizer build, optional checkpoint resume, epoch loop with
per-epoch checkpointing + best-IoU copy + EarlyStopping(-(F1+IoU)).
TPU-native differences: label synthesis happens inside the jitted train step
(no CPU worker LabelEncoding), batches are sharded over the mesh (DP), and
BN/optimizer state live in a TrainState pytree.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from cdnet_tpu import config as C
from cdnet_tpu.data.dataset import DataFolder
from cdnet_tpu.data.synthetic import SyntheticDataset
from cdnet_tpu.data.transforms import get_transforms
from cdnet_tpu.models import choose_model
from cdnet_tpu.optimizers import (PlateauTracker, get_optimizer,
                                  init_params_for, set_plateau_scale)
from cdnet_tpu.parallel import (TrainState, make_mesh,
                                make_sliding_eval_step, make_train_step,
                                replicate, shard_batch)
from cdnet_tpu.utils import (AverageMeter, EarlyStopping, ExperimentCSV,
                             load_checkpoint, load_meta, save_checkpoint,
                             setup_logging)


def build_dataset(cfg, synthetic: int = 0, label_postfix: str = "label.npy",
                  split: str = "train"):
    """Train dataset: synthetic tiles or the reference directory layout
    (images/{split}, weight_maps/{split}, labels_instance/{split}; postfix
    'label.npy' for MoNuSeg, 'label.mat' for CPM17 — train.py:233-238)."""
    from cdnet_tpu.data.transforms import load_mean_std
    names = [n for n in cfg.train.trans_train if n != "label_encoding"]
    ms = load_mean_std(cfg) if not synthetic else None
    if ms is None:
        names = [n for n in names if n != "normalize"]
    tf = get_transforms(names, cfg.train.input_size, cfg.train.seed,
                        mean=ms[0] if ms else None,
                        std=ms[1] if ms else None)
    if synthetic:
        return SyntheticDataset(synthetic, max(cfg.train.input_size, 64),
                                cfg.train.seed, data_transform=tf)
    img_dir = os.path.join(cfg.train.data_dir, "images", split)
    weight_dir = os.path.join(cfg.train.weight_map_dir, split)
    label_dir = os.path.join(cfg.train.data_dir, "labels_instance", split)
    post_fix = ["weight.png", label_postfix]
    return DataFolder([img_dir, weight_dir, label_dir], post_fix,
                      num_channels=cfg.model.in_c, data_transform=tf)


def build_val_dataset(cfg, synthetic: int = 0,
                      label_postfix: str = "label.npy"):
    """Held-out validation data (reference train.py:216-259: a separate val
    DataFolder at batch 1, deterministic transforms — to_tensor/normalize
    only, no augmentation). Synthetic mode draws from a disjoint seed stream
    so val tiles never overlap the train set."""
    from cdnet_tpu.data.transforms import load_mean_std
    ms = load_mean_std(cfg) if not synthetic else None
    names = ["to_tensor"] + (["normalize"] if ms is not None else [])
    tf = get_transforms(names, cfg.train.input_size, cfg.train.seed,
                        mean=ms[0] if ms else None,
                        std=ms[1] if ms else None)
    if synthetic:
        n_val = max(2, synthetic // 4)
        return SyntheticDataset(n_val, max(cfg.train.input_size, 64),
                                cfg.train.seed + 99991, data_transform=tf)
    img_dir = os.path.join(cfg.train.data_dir, "images", "val")
    weight_dir = os.path.join(cfg.train.weight_map_dir, "val")
    label_dir = os.path.join(cfg.train.data_dir, "labels_instance", "val")
    return DataFolder([img_dir, weight_dir, label_dir],
                      ["weight.png", label_postfix],
                      num_channels=cfg.model.in_c, data_transform=tf)


def _instance_ids(inst) -> np.ndarray:
    """Instance-id plane of a label array: 3-channel label PNGs carry the
    ids in channel 0 (my_transforms_direction.py:718)."""
    inst = np.asarray(inst)
    if inst.ndim == 3:
        inst = inst[..., 0]
    return inst.astype(np.int32)


def batches_of(dataset, batch_size: int, rng: np.random.RandomState,
               drop_last: bool = True, native_crop: int = 0):
    """Shuffled epoch iterator assembling device-ready dict batches.

    ``native_crop`` > 0 routes batch assembly through the C++ fused
    crop/flip/jitter path (data/native_loader.py); the dataset must then
    yield raw (uint8 img, uint8 weight, int32 instance) tiles.
    """
    order = rng.permutation(len(dataset))
    for s in range(0, len(order) - (batch_size - 1 if drop_last else 0),
                   batch_size):
        idx = order[s:s + batch_size]
        if drop_last and len(idx) < batch_size:
            return
        samples = [dataset[int(i)] for i in idx]
        if native_crop:
            from cdnet_tpu.data.native_loader import assemble_batch
            yield assemble_batch(samples, native_crop, rng)
            continue
        imgs, weights, insts = [], [], []
        for img, wmap, inst in samples:
            imgs.append(np.asarray(img, np.float32))
            weights.append(np.asarray(wmap, np.float32))
            insts.append(_instance_ids(inst))
        yield {"image": np.stack(imgs), "weight": np.stack(weights),
               "instance": np.stack(insts)}


def init_state(cfg, model, sample_image, opt, rng_seed: int = 0,
               reference_checkpoint: str = "") -> TrainState:
    variables = model.init(jax.random.PRNGKey(rng_seed), sample_image[:1],
                           train=False)
    if reference_checkpoint:
        from cdnet_tpu.models.weights import import_reference_checkpoint
        variables = import_reference_checkpoint(
            reference_checkpoint,
            jax.tree.map(np.asarray, jax.device_get(variables)))
        variables = jax.tree.map(jnp.asarray, variables)
    elif cfg.model.pretrained and cfg.model.pretrained_path:
        from cdnet_tpu.models.weights import apply_pretrained
        variables = apply_pretrained(cfg, variables)
    params = init_params_for(cfg.train.optimizer, variables["params"])
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=opt.init(params))


def make_stopper(cfg) -> EarlyStopping | None:
    """early_stop <= 0 disables early stopping entirely (reference
    train.py:308,442 gates both construction and the per-epoch call on
    early_stop > 0; EarlyStopping(patience=0) would instead stop at the
    FIRST non-improving epoch past min_epoch — the round-3 race bug)."""
    if cfg.train.early_stop > 0:
        return EarlyStopping(patience=cfg.train.early_stop)
    return None


def main(argv=None):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--synthetic", type=int, default=0,
                        help="train on N synthetic tiles instead of a dataset")
    parser.add_argument("--max-instances", type=int, default=160)
    parser.add_argument("--label-postfix", type=str, default="label.npy",
                        help="'label.npy' (MoNuSeg) or 'label.mat' (CPM17)")
    parser.add_argument("--native-loader", action="store_true",
                        help="use the C++ fused batch assembler (crop/flip/"
                             "jitter path; bypasses the full transform stack)")
    parser.add_argument("--reference-checkpoint", type=str, default="",
                        help="initialize from a reference-trained .pth.tar "
                             "(full-model migration; fine-tune path)")
    parser.add_argument("--do-object-metric", action="store_true",
                        help="object-level recall/precision/F1/dice/iou/AJI "
                             "during validation (the reference's dormant "
                             "do_object_metric path, train_util_dam.py:589; "
                             "slow — per-image greedy matching on host)")
    ns, rest = parser.parse_known_args(argv)
    cfg = C.parse_args(rest, is_train=True)

    np.random.seed(cfg.train.seed)
    os.makedirs(cfg.train.save_dir, exist_ok=True)
    ckpt_dir = os.path.join(cfg.train.save_dir, "checkpoints")
    logger, logger_results = setup_logging(cfg.train.save_dir)
    cfg.to_json(os.path.join(cfg.train.save_dir, "config.json"))
    # the reference's full hyperparameter column block (train.py:106-173's
    # 84-column logExl head; metric columns are filled by the test driver)
    tf = set(cfg.train.trans_train)
    ExperimentCSV(os.path.join("experiments", f"logExl_{cfg.dataset}.csv")).append(
        cfg.exp_filename(), {
            "dataset": cfg.dataset, "Model": cfg.model.model_name,
            "Epoch": cfg.train.num_epochs, "input_size": cfg.train.input_size,
            "val_overlap": cfg.train.val_overlap,
            "batch_size": cfg.train.batch_size,
            "multi_class": int(cfg.model.multi_class),
            "add_weightMap": cfg.model.add_weight_map,
            "alpha": cfg.train.alpha, "dice": cfg.model.dice,
            "boundary_loss": cfg.model.boundary_loss,
            "MSEloss": cfg.model.mseloss, "direction": cfg.model.direction,
            "backbone": cfg.model.backbone,
            "pretrained": int(cfg.model.pretrained),
            "LossName": cfg.model.loss_name, "seed": cfg.train.seed,
            "early_stop": cfg.train.early_stop,
            "scheduler": cfg.train.scheduler, "step": cfg.train.step,
            "optimizer": cfg.train.optimizer, "lr": cfg.train.lr,
            "lr_decay": cfg.train.lr_decay,
            "validation": cfg.train.validation,
            "random_resize": int("random_resize" in tf),
            "random_color": int("random_color" in tf),
            "random_affine": int("random_affine" in tf),
            "horizontal_flip": int("horizontal_flip" in tf),
            "random_elastic": int("random_elastic" in tf),
            "random_rotation": int("random_rotation" in tf),
            "random_chooseAug": int("random_chooseAug" in tf),
            "random_crop": int("random_crop" in tf),
            "normalize": int("normalize" in tf)})

    logger.info(f"devices: {jax.devices()}")
    mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axis_names)
    model = choose_model(cfg)
    native_crop = 0
    if ns.native_loader:
        from cdnet_tpu.data import native_loader
        if not native_loader.available():
            logger.info("native loader requested but libcdnet_host.so not "
                        "built (make -C native); using its NumPy fallback")
        native_crop = cfg.train.input_size
        # raw tiles for the fused C++ path (it owns crop/flip/jitter)
        dataset = build_dataset(cfg, ns.synthetic, ns.label_postfix)
        dataset.data_transform = None
    else:
        dataset = build_dataset(cfg, ns.synthetic, ns.label_postfix)
    logger.info(f"dataset: {len(dataset)} samples")
    # epoch-granular schedulers need the real epoch length (torch steps them
    # once per epoch, utils.py:940-962; batches_of drops the last short batch)
    steps_per_epoch = max(1, len(dataset) // cfg.train.batch_size)
    opt = get_optimizer(cfg, steps_per_epoch)
    plateau = PlateauTracker(cfg.train.lr_decay, cfg.train.step) \
        if cfg.train.scheduler == "ReduceLROnPlateau" else None
    val_dataset = None
    if cfg.train.validation:
        val_dataset = build_val_dataset(cfg, ns.synthetic, ns.label_postfix)
        logger.info(f"val dataset: {len(val_dataset)} samples "
                    f"(sliding window {cfg.train.input_size}/"
                    f"{cfg.train.val_overlap})")

    data_rng = np.random.RandomState(cfg.train.seed)
    first = next(batches_of(dataset, cfg.train.batch_size, data_rng,
                            drop_last=False, native_crop=native_crop))
    state = init_state(cfg, model, jnp.asarray(first["image"]), opt,
                       cfg.train.seed,
                       reference_checkpoint=ns.reference_checkpoint)
    if ns.reference_checkpoint:
        logger.info(f"migrated reference checkpoint {ns.reference_checkpoint}")

    start_epoch = cfg.train.start_epoch
    resume_meta = {}
    if cfg.train.checkpoint:
        restored, epoch = load_checkpoint(cfg.train.checkpoint,
                                          jax.device_get(state))
        state = jax.tree.map(jnp.asarray, restored)
        # the meta records the last COMPLETED epoch; resume at the next one
        # (the reference stores epoch+1 for the same reason, train.py:423)
        start_epoch = epoch + 1
        # host-side scheduler/selection state travels in the meta JSON (the
        # reference's checkpoint dict carries best_iou + the torch
        # optimizer's reduced lr, train.py:293-306); without this a resumed
        # ReduceLROnPlateau run silently resets to the base learning rate
        resume_meta = load_meta(cfg.train.checkpoint)
        if plateau is not None and "plateau_best" in resume_meta:
            plateau.best = resume_meta["plateau_best"]
            plateau.num_bad = resume_meta["plateau_num_bad"]
            plateau.scale = resume_meta["plateau_scale"]
        logger.info(f"resumed from {cfg.train.checkpoint} at epoch {epoch}")

    state = replicate(state, mesh)
    train_step = make_train_step(model, cfg, opt, ns.max_instances)
    eval_step = make_sliding_eval_step(model, cfg, ns.max_instances,
                                       return_pred=ns.do_object_metric)
    stopper = make_stopper(cfg)

    best_iou = float(resume_meta.get("best_iou", 0.0))
    metric_keys = None
    for epoch in range(start_epoch, cfg.train.num_epochs):
        t0 = time.time()
        dev_sums = None
        n_seen = 0
        for it, batch in enumerate(batches_of(dataset, cfg.train.batch_size,
                                              data_rng,
                                              native_crop=native_crop)):
            state, metrics = train_step(state, shard_batch(batch, mesh))
            if metric_keys is None:
                metric_keys = sorted(metrics.keys())
            bs = batch["image"].shape[0]
            # accumulate metric sums ON DEVICE: fetching every scalar each
            # step blocks the host on the just-dispatched program (~35 ms
            # tunnel round-trip per fetch); sums are pulled only at log
            # points and epoch end, so dispatch stays pipelined
            if dev_sums is None:
                dev_sums = {k: metrics[k] * bs for k in metric_keys}
            else:
                dev_sums = {k: dev_sums[k] + metrics[k] * bs
                            for k in metric_keys}
            n_seen += bs
            if it % cfg.train.log_interval == 0:
                msg = "  ".join(f"{k}={float(dev_sums[k]) / n_seen:.4f}"
                                for k in metric_keys)
                logger.info(f"\tepoch {epoch} it {it}: {msg}")

        if dev_sums is None:
            raise RuntimeError(
                f"epoch {epoch} yielded no training batches: len(dataset)="
                f"{len(dataset)} with batch_size={cfg.train.batch_size} "
                f"(drop_last) — lower --batch-size or add data")
        train_avg = {k: float(dev_sums[k]) / n_seen for k in metric_keys}
        # validation=0 default: val metrics = train metrics (train.py:379-387)
        if cfg.train.validation:
            # held-out val images, batch 1, sliding-window forward
            # (reference train.py:259 + train_util_dam.validate:469-474)
            vmeter = AverageMeter(len(metric_keys))
            obj_meter = AverageMeter(7)
            for vi in range(len(val_dataset)):
                img, wmap, inst = val_dataset[vi]
                inst = _instance_ids(inst)
                batch = {"image": np.asarray(img, np.float32)[None],
                         "weight": np.asarray(wmap, np.float32)[None],
                         "instance": inst[None]}
                if ns.do_object_metric:
                    vm, pred, mask3c = eval_step(state, batch)
                    # reference do_object_metric (train_util_dam.py:589-605):
                    # fill holes, remove-small, CC-label, disk(radius) dilate,
                    # then greedy object matching vs the inside-class target
                    from cdnet_tpu.metrics.objects import \
                        nuclei_accuracy_object_level
                    from cdnet_tpu.ops.postproc import instances_from_pred
                    labeled = jax.vmap(
                        lambda p: instances_from_pred(
                            p, cfg.post.min_area, cfg.post.radius,
                            use_watershed=False)[0])(pred.astype(jnp.int32))
                    for lab, m3 in zip(np.asarray(labeled), np.asarray(mask3c)):
                        obj_meter.update(list(
                            nuclei_accuracy_object_level(lab, m3 == 1)))
                else:
                    vm = eval_step(state, batch)
                vmeter.update([float(vm.get(k, 0.0)) for k in metric_keys], 1)
            val_avg = dict(zip(metric_keys, vmeter.avg))
            if ns.do_object_metric:
                val_avg.update(zip(
                    ["obj_recall", "obj_precision", "obj_F1", "obj_dice",
                     "obj_iou", "obj_haus", "obj_AJI"], obj_meter.avg))
                logger.info("\t=> Val obj: " + "  ".join(
                    f"{k}={val_avg[k]:.4f}" for k in
                    ["obj_recall", "obj_precision", "obj_F1", "obj_dice",
                     "obj_iou", "obj_haus", "obj_AJI"]))
        else:
            val_avg = train_avg

        if plateau is not None:
            # torch steps ReduceLROnPlateau once per epoch on the val loss
            # (train.py:404-413; validation=0 falls back to train loss there)
            scale = plateau.step(val_avg.get("loss", 0.0))
            state = state.replace(
                opt_state=set_plateau_scale(state.opt_state, scale))
            logger.info(f"plateau: val_loss={val_avg.get('loss', 0.0):.4f} "
                        f"lr={cfg.train.lr * scale:.3e}")

        iou = val_avg.get("pixel_iou", 0.0)
        f1 = val_avg.get("pixel_F1", 0.0)
        is_best = iou > best_iou
        best_iou = max(best_iou, iou)
        extra_meta = {"best_iou": best_iou}
        if plateau is not None:
            extra_meta.update(plateau_best=plateau.best,
                              plateau_num_bad=plateau.num_bad,
                              plateau_scale=plateau.scale)
        save_checkpoint(ckpt_dir, jax.device_get(state), epoch, is_best,
                        cfg.train.num_epochs, cfg.train.checkpoint_freq,
                        extra_meta=extra_meta)
        logger_results.info(
            f"{epoch}\t" + "\t".join(f"{val_avg[k]:.4f}" for k in metric_keys))
        logger.info(f"epoch {epoch} done in {time.time() - t0:.1f}s  "
                    f"loss={val_avg.get('loss', 0):.4f} iou={iou:.4f} "
                    f"F1={f1:.4f} best_iou={best_iou:.4f}")
        if stopper is not None and stopper(-(f1 + iou), epoch):
            logger.info("early stopping")
            break
    logger.info("training complete")
    return state


if __name__ == "__main__":
    main(sys.argv[1:])
