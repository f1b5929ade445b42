"""Inference driver (reference `test_dam.py` parity, TPU-native execution).

CLI: ``python -m cdnet_tpu.infer [flags]``. Per test image the reference runs
8 serial TTA forwards, host-side DDM fusion, boundary enhancement, and
skimage post-processing (`/root/reference/test_dam.py:90-925`). Here the
whole per-image pipeline — TTA as a batch axis, sliding-window tiles as a
batch axis, DDM generation, boundary enhancement, CC/watershed instancing —
is ONE jit-compiled device program; only metrics and artifact PNG/TIFF
writing touch the host.
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
from cdnet_tpu import metrics as M
from cdnet_tpu.data.dataset import img_loader
from cdnet_tpu.models import choose_model
from cdnet_tpu.ops import tta as T
from cdnet_tpu.ops.ddm import generate_dd_maps_batch
from cdnet_tpu.ops.postproc import enhance_boundary_cf, instances_from_pred
from cdnet_tpu.ops.sliding_window import split_forward
from cdnet_tpu.utils import AverageMeter


def make_model_fn(model, mesh=None):
    """(variables, (B,H,W,C) images) -> {"prob", "point", "direction_cls"}.

    get_probmaps parity (test_dam.py:932-1035): softmax over mask; direction
    softmax with its background prob scaled by the mask's background prob
    before the argmax (test_dam.py:1011-1015). ``variables`` is an argument,
    not a closure — closed-over params get baked into the XLA program as
    constant literals (observed 81MB MLIR -> compile-helper crash).

    With ``mesh``, the batch axis (TTA views x sliding-window tiles — the
    natural shard axes, SURVEY.md §2.4) is sharded over the mesh's "data"
    axis; XLA partitions the convs and inserts any collectives.
    """
    def fn(variables, batch):
        # pallas-kernel routing under a >1-device mesh is gated by the
        # caller (build_pipeline wraps the whole _body in scoped_disable —
        # pallas_call carries no SPMD partitioning rule)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            batch = jax.lax.with_sharding_constraint(
                batch, NamedSharding(mesh, P("data", None, None, None)))
        out = model.apply(variables, batch, train=False)
        # Epilogue runs CHANNEL-FIRST (C, B, H, W): a (B,H,W,C) f32 map with
        # C in {1,3,9} is lane-padded C->128 on TPU (up to 42x physical
        # bytes), and the softmax/scale/argmax chain over such maps measured
        # ~100 ms/run at 8x1024^2. One transpose off the conv output, then
        # every pass touches dense (H,W)-minor tiles.
        mask = jnp.moveaxis(out["mask"], -1, 0)
        prob = jax.nn.softmax(mask, axis=0)          # (3, B, H, W)
        res = {"prob": prob}
        if "point" in out:
            res["point"] = out["point"][..., 0]      # (B, H, W)
        if "direction" in out:
            d = jnp.moveaxis(out["direction"], -1, 0)
            dprob = jax.nn.softmax(d, axis=0)        # (C, B, H, W)
            # scale class-0 prob by the mask bg prob (test_dam.py:1011-1015)
            c = dprob.shape[0]
            # argmax as an unrolled select chain (jnp.argmax lowered to an
            # iota-reduce with a transposed layout); class 0 enters with its
            # prob scaled by the mask background prob
            best = dprob[0] * prob[0]
            idx = jnp.zeros(best.shape, jnp.int32)
            for ci in range(1, c):
                take = dprob[ci] > best
                best = jnp.where(take, dprob[ci], best)
                idx = jnp.where(take, ci, idx)
            res["direction_cls"] = idx               # (B, H, W) int32
        return res
    return fn


def build_pipeline(model, variables, cfg, image_hw: tuple[int, int],
                   mesh=None, batch_tiles: int = 1):
    """Whole-image jit pipeline: (H,W,3) float image -> result dict.

    ``mesh``: optional jax.sharding.Mesh — shards the TTA/tile batch axis
    across devices (tile-parallel inference; BASELINE v5e-8 target).
    Fused Pallas convs (ops/pallas_conv) are smoke-compiled here and
    disabled process-wide on any Mosaic failure, so the pipeline degrades
    to XLA convs rather than erroring.

    ``batch_tiles`` > 1 returns a pipeline over an (N,H,W,3) stack of
    independent tiles -> result dict with a leading N axis on every entry
    (whole-slide throughput mode: one dispatch + one fetch per N tiles
    amortizes the ~35 ms host round-trip and fills device gaps). The batched
    program is a different XLA compilation than the single-tile one, so conv
    roundings differ at bf16/MXU precision — decision-boundary pixels (and
    with a weakly trained model, instance counts) can differ between modes;
    on CPU (true f32 convs) both modes match exactly
    (tests/test_e2e_goldens.py::test_batched_tiles_equal_single)."""
    from cdnet_tpu.ops import pallas_cc, pallas_conv
    pallas_conv.ensure_tpu_kernel_or_disable()
    pallas_cc.ensure_tpu_kernel_or_disable()
    # pin the variables on device ONCE: callers typically hold numpy trees
    # (checkpoint restore), and passing those to jit re-uploads the full
    # parameter set every call (measured 1.0s/call for the 82MB flagship
    # tree through the TPU tunnel — 3x the whole forward pass)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        variables = jax.device_put(variables, NamedSharding(mesh, P()))
    else:
        variables = jax.device_put(variables)
    # >1-device mesh with a tile batch -> tile-sharded shard_map mode (each
    # device runs the whole per-tile body locally; no sharding constraints
    # and no kernel disabling inside the body)
    mesh_multi = mesh is not None and getattr(mesh, "size", 1) > 1
    tile_sharded = mesh_multi and batch_tiles > 1
    model_fn = make_model_fn(model, None if tile_sharded else mesh)
    use_tta = cfg.test.tta
    if use_tta and image_hw[0] != image_hw[1]:
        # T.expand mixes rot90 views with flips in one stacked tensor, which
        # requires H == W; without this check a non-square image fails at
        # trace time with a cryptic broadcast error
        raise ValueError(
            f"TTA (tta=1) requires square images, got {image_hw}; pad/crop "
            f"the tile or run with --tta 0")
    patch, overlap = cfg.test.patch_size, cfg.test.overlap
    whole = cfg.test.all_img_test == 1
    dc = cfg.model.direction_classes

    def forward_views(v_vars, views):
        # tile each view if needed, else single batched forward; all outputs
        # carry the view axis at -3 and spatial dims last (channel-first for
        # prob — see make_model_fn layout note)
        if whole:
            return model_fn(v_vars, views)
        outs = [split_forward(lambda b: model_fn(v_vars, b), v, patch, overlap)
                for v in views]
        return {k: jnp.stack([o[k] for o in outs], axis=-3) for k in outs[0]}

    # disable EVERY pallas kernel (conv, DDM, CC fixpoint) inside a
    # >1-device GLOBAL-view mesh trace — pallas_call has no SPMD
    # partitioning rule (the tile-sharded shard_map mode below does NOT
    # need this: its body traces per-device local shapes)
    def _body(v_vars, image):
        from cdnet_tpu.ops.pallas_gate import scoped_disable as _sd
        with _sd(mesh_multi and not tile_sharded):
            return _body_inner(v_vars, image)

    def _body_inner(v_vars, image):
        views = T.expand(image) if use_tta else image[None]
        out = forward_views(v_vars, views)
        prob_v = T.invert_last2(out["prob"]) if use_tta else out["prob"]
        prob = jnp.mean(prob_v, axis=-3)               # (3, H, W)
        res = {}
        if "point" in out:
            pt_v = T.invert_last2(out["point"]) if use_tta else out["point"]
            point = jnp.mean(pt_v, axis=-3)            # (H, W)
            res["point"] = point
        if "direction_cls" in out:
            d_v = (T.invert_last2(out["direction_cls"]) if use_tta
                   else out["direction_cls"]).astype(jnp.int32)
            # dcm_combined=1: DDM per TTA view, then mean (test_dam.py:478-490)
            ddms = generate_dd_maps_batch(d_v, dc)
            ddm = jnp.mean(ddms, axis=0)
            res["ddm"] = ddm
            res["direction_cls"] = d_v[0]
            if "point" in out:
                res["prob"] = jnp.moveaxis(prob, 0, -1)
                prob = enhance_boundary_cf(prob, point, ddm)
                res["prob_enhanced"] = jnp.moveaxis(prob, 0, -1)
        # argmax over the 3 classes as two fused selects
        best, pred = prob[0], jnp.zeros(prob.shape[1:], jnp.int32)
        for ci in range(1, prob.shape[0]):
            take = prob[ci] > best
            best = jnp.where(take, prob[ci], best)
            pred = jnp.where(take, ci, pred)
        res.setdefault("prob", jnp.moveaxis(prob, 0, -1))
        res["pred"] = pred
        labels, pred2 = instances_from_pred(
            pred, min_area=cfg.post.min_area, radius=cfg.post.radius,
            use_watershed=bool(cfg.post.postproc),
            rescue_markerless=bool(cfg.post.ws_rescue))
        res["instances"] = labels
        res["pred2"] = pred2
        return res

    if mesh_multi and batch_tiles > 1:
        # tile-sharded serving (VERDICT r4 #8): whole tiles are independent,
        # so shard the tile batch over the mesh with shard_map — inside the
        # per-device body every array is device-local, pallas_call traces
        # local shapes, and NO kernel has to be disabled (the scoped_disable
        # guard exists only for kernels inside a >1-device GLOBAL-view
        # trace, where pallas_call has no SPMD partitioning rule). Each chip
        # runs the full fused pipeline — Pallas CC included — on its own
        # tiles; there is no cross-device communication at all.
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        if batch_tiles % mesh.size != 0:
            raise ValueError(
                f"batch_tiles={batch_tiles} must divide evenly over the "
                f"{mesh.size}-device mesh for tile-sharded inference")
        def local_body(v_vars, images):
            return jax.lax.map(lambda im: _body_inner(v_vars, im), images)
        _pipeline = jax.jit(shard_map(
            local_body, mesh=mesh, in_specs=(P(), P("data")),
            out_specs=P("data"), check_rep=False))
    elif batch_tiles > 1:
        # lax.map, not vmap: tiles run as a device-side loop over the
        # SINGLE-tile body — still one dispatch + one fetch per N tiles
        # (the point of batch mode), but peak activation memory stays at
        # one tile's. The vmap formulation let XLA overlap two 8-view
        # forwards and blew the v5e's 15.75 GB HBM at batch_tiles=2
        # (BENCH r5 batch leg). A device loop loses nothing on one chip —
        # execution is serial either way — and makes batched results
        # bit-identical to single-tile mode on every backend.
        def _batched(v_vars, images):
            return jax.lax.map(lambda im: _body(v_vars, im), images)
        _pipeline = jax.jit(_batched)
    else:
        _pipeline = jax.jit(_body)

    def pipeline(image):
        return _pipeline(variables, image)

    return pipeline


# the reference's per-image metric row (test_dam.py:583-669, header at :748-763)
REF_HEADER = ["pixel_acc", "pixel_IoU", "pixel_Recall", "pixel_Precision",
              "pixel_F1", "recall", "precision", "F1", "Dice", "IoU",
              "Hausdorff", "AJI", "AJI_h", "Dice_h", "Dice2_h", "dq", "sq",
              "pq", "Ana_FP", "Ana_FN", "Ana_less", "Ana_more"]


def evaluate_instances(pred_labels: np.ndarray, gt_instances: np.ndarray,
                       annotation_path: str | None = None,
                       compute_hausdorff: bool = True,
                       compute_dice2: bool = False) -> dict:
    """Full per-image metric bundle (test_dam.py:583-669), ordered like
    REF_HEADER:

    - pixel metrics on pred>0 vs gt>0 (test_dam.py:594-599)
    - object-level recall/precision/F1/dice/iou/Hausdorff/AJI via greedy
      matching (utils.py:250-330), or the XML-annotation variant when
      ``annotation_path`` is given (groundtruth=1, test_dam.py:600-604)
    - HoVer-Net AJI (+FP/FN/less/more decomposition), Dice, DQ/SQ/PQ — both
      maps re-labeled with measure.label first (test_dam.py:613-615; NOT
      plain remap, dilation can disconnect instances)
    """
    from cdnet_tpu.metrics.objects import (
        label_equal_values, nuclei_accuracy_annotation_object_level,
        nuclei_accuracy_object_level)

    pix = M.accuracy_pixel_level((pred_labels > 0)[None],
                                 (gt_instances > 0)[None])
    if annotation_path:
        obj = nuclei_accuracy_annotation_object_level(
            pred_labels, annotation_path, compute_hausdorff)
    else:
        obj = nuclei_accuracy_object_level(pred_labels, gt_instances,
                                           compute_hausdorff)
    pl = label_equal_values(pred_labels)
    gl = label_equal_values(gt_instances)
    aji_h, ana_fp, ana_fn, ana_less, ana_more = M.get_fast_aji(gl, pl)
    dice_h = M.get_dice_1(gl, pl)
    [dq, sq, pq], _ = M.get_fast_pq(gl, pl)
    # Dice2_h defaults to the reference's hardcoded 0.0 (its get_fast_dice_2
    # call is disabled, test_dam.py:619); --dice2 populates the column for
    # our own runs
    dice2_h = M.get_fast_dice_2(gl, pl) if compute_dice2 else 0.0
    row = [pix[0], pix[1], pix[2], pix[3], pix[4], *obj,
           aji_h, dice_h, dice2_h, dq, sq, pq,
           ana_fp, ana_fn, ana_less, ana_more]
    return dict(zip(REF_HEADER, (float(v) for v in row)))


def save_results(header, avg_results, all_results, filename, mode="w"):
    """result.txt / auto_saveLog format parity (test_dam.py:1059-1084)."""
    with open(filename, mode) as f:
        f.write("Metrics:\t" + "\t".join(header) + "\n")
        f.write("Average:\t" + "\t".join(f"{v:.4f}" for v in avg_results)
                + "\n\n")
        for key in sorted(all_results):
            f.write(key + ":" + "".join(f"\t{v:.4f}" for v in
                                        all_results[key]) + "\n")


def save_artifacts(save_dir: str, name: str, res: dict):
    """PNG/TIFF artifact parity (test_dam.py:673-695)."""
    from PIL import Image
    os.makedirs(save_dir, exist_ok=True)
    inst = np.asarray(res["instances"]).astype(np.uint16)
    Image.fromarray(inst).save(os.path.join(save_dir, f"{name}_seg.tiff"))
    prob = np.asarray(res["prob"])
    Image.fromarray((prob[..., 1] * 255).astype(np.uint8)).save(
        os.path.join(save_dir, f"{name}_prob_inside.png"))
    Image.fromarray((prob[..., 2] * 255).astype(np.uint8)).save(
        os.path.join(save_dir, f"{name}_prob_contour.png"))
    if "ddm" in res:
        Image.fromarray((np.asarray(res["ddm"]) * 255).astype(np.uint8)).save(
            os.path.join(save_dir, f"{name}_ddm.png"))
    if "point" in res:
        pt = np.asarray(res["point"])
        Image.fromarray(np.clip(pt, 0, 255).astype(np.uint8)).save(
            os.path.join(save_dir, f"{name}_point.png"))
    rng = np.random.RandomState(0)
    colors = rng.randint(0, 255, (int(inst.max()) + 1, 3)).astype(np.uint8)
    colors[0] = 0
    Image.fromarray(colors[inst]).save(
        os.path.join(save_dir, f"{name}_colored.png"))


def main(argv=None):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--image", type=str, default="",
                        help="single image to segment (else test dir)")
    parser.add_argument("--label", type=str, default="",
                        help="instance label for metrics (.npy/.mat/.png)")
    parser.add_argument("--use-mesh", action="store_true",
                        help="shard the TTA/tile batch over all devices")
    parser.add_argument("--no-hausdorff", action="store_true",
                        help="skip the (slow, host-side) Hausdorff metric")
    parser.add_argument("--dice2", action="store_true",
                        help="compute the Dice2_h column (the reference "
                             "hardcodes it to 0, test_dam.py:619; off by "
                             "default for parity)")
    parser.add_argument("--reference-checkpoint", type=str, default="",
                        help="migrate a reference-trained .pth.tar "
                             "(checkpoint_best.pth.tar from the original "
                             "CDNet repo) into this model and evaluate it")
    ns, rest = parser.parse_known_args(argv)
    cfg = C.parse_args(rest, is_train=False)

    model = choose_model(cfg)
    # init then restore
    sample = jnp.zeros((1, cfg.test.patch_size, cfg.test.patch_size,
                        cfg.model.in_c), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    if ns.reference_checkpoint:
        from cdnet_tpu.models.weights import import_reference_checkpoint
        variables = import_reference_checkpoint(ns.reference_checkpoint,
                                                variables)
        print(f"migrated reference checkpoint {ns.reference_checkpoint}")
    elif os.path.exists(cfg.test.model_path + ".msgpack") or \
            os.path.exists(cfg.test.model_path):
        target_params = jax.device_get(variables["params"])
        # ranger checkpoints store params as a LookaheadParams {fast, slow}
        # pair — peek at the raw tree and restore into the matching target,
        # evaluating the SLOW (averaged) weights like the reference
        path = cfg.test.model_path
        path = path if path.endswith(".msgpack") else path + ".msgpack"
        from flax import serialization
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        lookahead = isinstance(raw.get("params"), dict) and \
            set(raw["params"].keys()) == {"fast", "slow"}
        tgt = {"fast": target_params, "slow": target_params} if lookahead \
            else target_params
        # reuse the already-restored raw tree (from_bytes == msgpack_restore
        # + from_state_dict) — checkpoints are ~80 MB, don't parse twice
        state = serialization.from_state_dict({
            "params": tgt,
            "batch_stats": jax.device_get(variables.get("batch_stats", {}))},
            raw)
        params = state["params"]["slow"] if lookahead else state["params"]
        variables = {"params": params,
                     "batch_stats": state["batch_stats"]}
        print(f"loaded {cfg.test.model_path}"
              + (" (lookahead slow weights)" if lookahead else ""))
    else:
        print(f"WARNING: no checkpoint at {cfg.test.model_path}; random weights")

    if ns.image:
        items = [(ns.image, ns.label or None)]
    else:
        img_dir = cfg.test.img_dir
        label_dir = cfg.test.label_dir
        items = []
        for f in sorted(os.listdir(img_dir)):
            # skip strays (Thumbs.db, mean_std.npy, ...): one bad file would
            # abort the whole evaluation loop
            if not f.lower().endswith((".png", ".jpg", ".jpeg", ".tif",
                                       ".tiff", ".bmp", ".npy")):
                continue
            stem = os.path.splitext(f)[0]
            lbl = None
            for ext in (".npy", ".mat", ".png", ".xml"):
                p = os.path.join(label_dir, stem + ext)
                if os.path.exists(p):
                    lbl = p
                    break
            items.append((os.path.join(img_dir, f), lbl))

    mesh = None
    if ns.use_mesh:
        from cdnet_tpu.parallel import make_mesh
        mesh = make_mesh()

    # test-time Normalize parity (options.py:463-472): applied by DEFAULT
    # with mean_std.npy from the dataset dir; opt out by putting '_noNorm'
    # in the experiment/save-dir name, exactly like the reference
    from cdnet_tpu.data.transforms import load_mean_std
    mean_std = load_mean_std(cfg, test=True)

    os.makedirs(cfg.test.save_dir, exist_ok=True)
    meter = AverageMeter(len(REF_HEADER))
    all_results = {}
    ji_sum = 0.0
    count_pred, count_real = [], []
    pipeline = None
    for img_path, lbl_path in items:
        name = os.path.splitext(os.path.basename(img_path))[0]
        img = np.asarray(img_loader(img_path, cfg.model.in_c),
                         np.float32) / 255.0
        if img.ndim == 2:
            img = img[..., None]
        if mean_std is not None:
            img = (img - mean_std[0]) / mean_std[1]
        if pipeline is None:
            pipeline = build_pipeline(model, variables, cfg, img.shape[:2],
                                      mesh=mesh)
        t0 = time.time()
        res = pipeline(jnp.asarray(img))
        jax.block_until_ready(res)
        dt = time.time() - t0
        print(f"{name}: {dt:.3f}s")
        if cfg.test.save_flag:
            save_artifacts(cfg.test.save_dir, name, res)
        if lbl_path:
            is_xml = lbl_path.endswith(".xml")
            # groundtruth=1 (reference test_dam.py:600-604): object metrics
            # from the XML annotation. If the paired label isn't the XML
            # itself, look it up next to the labels / in annotation_dir —
            # never feed a .npy/.mat path to the XML parser.
            ann_path = lbl_path if is_xml else None
            if cfg.test.groundtruth == 1 and not is_xml:
                stem = os.path.splitext(os.path.basename(lbl_path))[0]
                for d in (cfg.test.annotation_dir,
                          os.path.dirname(lbl_path) or "."):
                    cand = os.path.join(d, stem + ".xml") if d else ""
                    if cand and os.path.exists(cand):
                        ann_path = cand
                        break
                if ann_path is None:
                    print(f"WARNING: groundtruth=1 but no {stem}.xml found; "
                          f"using the instance label file for object metrics")
            if is_xml:
                from cdnet_tpu.metrics.objects import read_annotation_xml
                gt = read_annotation_xml(lbl_path, img.shape[:2])
            elif lbl_path.endswith(".png"):
                # open WITHOUT an RGB convert: 16/32-bit instance-id PNGs
                # would have every id above 255 clipped, merging hundreds
                # of GT nuclei and corrupting AJI/Dice/PQ silently
                from PIL import Image
                gt = np.asarray(Image.open(lbl_path))
                if gt.ndim == 3:
                    gt = gt[..., 0]
            else:
                gt = np.asarray(img_loader(lbl_path))
                if gt.ndim == 3:
                    gt = gt[..., 0]
            pred_inst = np.asarray(res["instances"])
            # point-count estimate (test_dam.py:506-515): sum(point)/255 vs
            # len(unique(inst_label)) — reference counts bg, keep faithful
            if "point" in res:
                count_pred.append(float(np.sum(np.asarray(res["point"])) / 255.0))
                count_real.append(len(np.unique(gt)))
            m = evaluate_instances(
                pred_inst, gt, annotation_path=ann_path,
                compute_hausdorff=not ns.no_hausdorff,
                compute_dice2=ns.dice2)
            # sklearn 'samples' jaccard on the BINARY maps (test_dam.py:583)
            from cdnet_tpu.metrics.pixel import jaccard_samples
            ji_sum += jaccard_samples(
                np.asarray(res["pred2"]).astype(np.uint8) * 255,
                (gt > 0).astype(np.uint8) * 255)
            row = [m[k] for k in REF_HEADER]
            all_results[name] = row
            meter.update(row)
            print("  " + "  ".join(
                f"{k}={v:.4f}" for k, v in zip(REF_HEADER, row)))

    if count_pred:
        print(f"count_pred_list = {count_pred}")
        print(f"count_label_list = {count_real}")
    if all_results:
        avg = list(meter.avg)
        summary = dict(zip(REF_HEADER, avg))
        aji_sklearn = ji_sum / len(all_results)
        summary["AJI_sklearn"] = aji_sklearn
        # {imgdir}_result.txt + appended auto_saveLog (test_dam.py:765-777)
        strs = os.path.basename(os.path.normpath(cfg.test.img_dir or "test"))
        save_results(REF_HEADER, avg, all_results,
                     os.path.join(cfg.test.save_dir, f"{strs}_result.txt"))
        log_dir = os.path.join("experiments", cfg.dataset)
        os.makedirs(log_dir, exist_ok=True)
        save_results(REF_HEADER, avg, all_results,
                     os.path.join(log_dir, "auto_saveLog_gpu0.txt"), mode="a+")
        # logExl write-back (test_dam.py:777-925): hyperparam columns + the
        # full t1_*/t2_* metric set, named as the reference's 84-column CSV
        # (metrics land in the t2_ block when evaluating the second test set,
        # test_dam.py:778 `opt.test['filename'] != 'test2'`)
        from cdnet_tpu.utils import ExperimentCSV
        tp = "t2" if cfg.test.filename == "test2" else "t1"
        t1 = {f"{tp}_{k}": round(float(v), 7) for k, v in zip(
            ["pixel_acc", "pixel_IoU", "pixel_recall", "pixel_precision",
             "pixel_F1", "recall", "precision", "F1", "Dice", "IoU",
             "Hausdorff", "AJI", "AJI_h", "Dice_h", "Dice2_h", "dq", "sq",
             "pq", "ana_FP", "ana_FN", "P_less", "P_more"], avg)}
        t1[f"{tp}_AJI_sklearn"] = round(aji_sklearn, 7)
        t1.update({"Model": cfg.model.model_name,
                   "MSEloss": cfg.model.mseloss,
                   "direction": cfg.model.direction,
                   "backbone": cfg.model.backbone,
                   "postproc": cfg.post.postproc,
                   "min_area": cfg.post.min_area,
                   "radius": cfg.post.radius,
                   "groundtruth": cfg.test.groundtruth,
                   "AllImgTest": cfg.test.all_img_test})
        # append a NEW row when this tp block is already filled (repeated
        # test runs at different epochs are all preserved — the reference's
        # Test_epoch branch, test_dam.py:778-785 / advisor round-2 finding)
        ExperimentCSV(os.path.join("experiments",
                                   f"logExl_{cfg.dataset}.csv")).upsert(
            cfg.exp_filename(), t1,
            append_if_set=(f"{tp}_pixel_acc", f"{tp}_Dice", f"{tp}_AJI"))
        print("AVG: " + "  ".join(f"{k}={v:.4f}" for k, v in summary.items()))
        return summary
    return None


if __name__ == "__main__":
    main(sys.argv[1:])
