"""End-to-end benchmark: 1000x1000-tile CDNet inference + post-processing.

Measures the BASELINE.json headline: full test_dam.py-equivalent inference —
8-way TTA forward (as one batch), DDM fusion, boundary enhancement, argmax,
fill-holes, small-object removal, connected-component OR watershed
instancing, dilation — as ONE jit-compiled TPU program per tile; masks never
leave the device.

The model is smoke-trained on synthetic H&E-like tiles at first run (cached
to experiments/bench_ckpt.msgpack) so every timed tile carries a NON-TRIVIAL
instancing load: the CC/watershed fixpoint loops iterate over real component
geometry, not an empty argmax. Every timed run asserts instances > 0.

Prints the HEADLINE JSON line the moment the core number exists:
  {"metric": ..., "value": N, "unit": "tiles/sec", "vs_baseline": N,
   "cc_tiles_per_sec": N, "instances": N, ...}
then runs the optional legs (watershed, stage ledger, batch sweep, HRNet,
mesh8) each under its own budget guard and prints a SECOND, extended JSON
line that is a superset of the headline. A driver that parses either the
first or the last JSON line gets a valid record even if the process is
killed mid-leg (VERDICT r3 #1: round 3 timed out in the optional legs and
recorded no number at all).

value / headline = the reference-default path (postproc=0, CC instancing,
options.py:151); the watershed path (postproc=1) is timed separately.

vs_baseline: the reference repo publishes no timing (SURVEY.md §6). The
denominator 0.15 tiles/sec is our measured-order estimate of the reference
pipeline on a modern GPU+CPU (8 serial forwards + host NumPy DDM loops +
scipy/skimage post-proc, several seconds per 1000x1000 tile); it is recorded
here for transparency, not as a published number.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REFERENCE_EST_TILES_PER_SEC = 0.15
CKPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "experiments", "bench_ckpt.msgpack")


def get_trained_variables(cfg, model, ckpt: str = CKPT):
    """Flagship variables with non-trivial segmentation behavior.

    Loads the cached smoke-trained checkpoint at ``ckpt`` if present;
    otherwise trains ~150 steps on synthetic tiles (easy blob data — enough
    for the 3-class / point / direction heads to produce real instances) and
    caches the result. Training time is NOT part of the timed benchmark.
    """
    import jax
    import jax.numpy as jnp
    from cdnet_tpu.utils.checkpoint import load_checkpoint
    from flax import serialization

    x0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    target = {"params": jax.device_get(variables["params"]),
              "batch_stats": jax.device_get(variables.get("batch_stats", {}))}
    if os.path.exists(ckpt):
        state, _ = load_checkpoint(ckpt, target)
        print(f"loaded cached bench checkpoint {ckpt}", file=sys.stderr)
        return {"params": state["params"], "batch_stats": state["batch_stats"]}

    print("smoke-training bench checkpoint (first run only)...", file=sys.stderr)
    from cdnet_tpu.data.synthetic import synthetic_tile
    from cdnet_tpu.optimizers import get_optimizer, init_params_for
    from cdnet_tpu.parallel import TrainState, make_train_step

    opt = get_optimizer(cfg)
    params = init_params_for(cfg.train.optimizer, variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=opt.init(params))
    step = make_train_step(model, cfg, opt, max_instances=48)

    rng = np.random.RandomState(0)
    tiles = [synthetic_tile(rng, 192) for _ in range(16)]
    imgs = np.stack([t[0] for t in tiles]).astype(np.float32) / 255.0
    insts = np.stack([t[1] for t in tiles]).astype(np.int32)
    wmaps = np.stack([t[2] for t in tiles]).astype(np.float32)
    t0 = time.time()
    f1 = 0.0
    for i in range(150):
        sel = rng.randint(0, len(tiles), 4)
        batch = {"image": jnp.asarray(imgs[sel]),
                 "weight": jnp.asarray(wmaps[sel]),
                 "instance": jnp.asarray(insts[sel])}
        state, m = step(state, batch)
        if i % 30 == 0 or i == 149:
            f1 = float(m["pixel_F1"])
            print(f"  step {i}: loss={float(m['loss']):.4f} F1={f1:.4f}",
                  file=sys.stderr)
    print(f"smoke-train done in {time.time() - t0:.1f}s (final F1={f1:.3f})",
          file=sys.stderr)
    out = {"params": jax.device_get(state.params),
           "batch_stats": jax.device_get(state.batch_stats)}
    os.makedirs(os.path.dirname(ckpt), exist_ok=True)
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(out))
    return out


def time_pipeline(pipeline, img, label: str, iters: int = 10):
    """Compile, verify non-trivial instancing, and time the pipeline.

    Returns (pipelined tiles/sec, serialized tiles/sec, instance count)."""
    import jax
    import jax.numpy as jnp

    def run_once(x):
        # the axon remote backend is fire-and-forget under block_until_ready;
        # fetching a scalar forces end-to-end completion
        return int(jax.device_get(jnp.max(pipeline(x)["instances"])))

    t0 = time.time()
    n_inst = run_once(img)
    print(f"[{label}] compile+first run: {time.time() - t0:.1f}s "
          f"instances={n_inst}", file=sys.stderr)
    assert n_inst > 0, (
        f"[{label}] zero instances — the timed workload is trivial; the "
        f"smoke-trained checkpoint failed to segment the synthetic tile")
    for _ in range(2):
        run_once(img)

    # serialized latency (fetch each tile before dispatching the next)
    t0 = time.time()
    for _ in range(iters):
        n = run_once(img)
        assert n > 0
    ser = iters / (time.time() - t0)

    # pipelined throughput: dispatch all tiles, then drain — each tile still
    # runs the full pipeline; device-side queueing overlaps host round-trips
    t0 = time.time()
    maxes = [jnp.max(pipeline(img)["instances"]) for _ in range(iters)]
    counts = [int(jax.device_get(m)) for m in maxes]
    pip = iters / (time.time() - t0)
    assert all(c > 0 for c in counts)
    print(f"[{label}] serialized={ser:.3f} pipelined={pip:.3f} tiles/s "
          f"instances={counts[-1]}", file=sys.stderr)
    return pip, ser, counts[-1]


def measure_dispatch_floor():
    """Per-call host<->device round-trip floor (the axon tunnel costs ~35 ms
    per scalar fetch; stage times subtract it so they reflect device time)."""
    import jax
    import jax.numpy as jnp

    tiny = jnp.zeros((8,), jnp.float32)
    f = jax.jit(jnp.max)
    int(jax.device_get(f(tiny)))
    t0 = time.time()
    for _ in range(10):
        int(jax.device_get(f(tiny)))
    return (time.time() - t0) / 10


def stage_timings(model, variables, cfg, img, floor_s: float,
                  e2e_serialized_tps: float = 0.0) -> dict:
    """Per-stage device-time ledger (VERDICT r2 Missing #5).

    The post-proc stages (DDM+enhancement, CC, watershed) are measured as
    standalone jit programs over the same tensors, serialized (one in-jit
    reduced scalar fetch per run) minus the dispatch floor; their standalone
    times are consistent with the fused pipeline's CC-vs-watershed delta.

    The 8-view forward is NOT honestly measurable standalone: the identical
    forward graph compiled as its own program runs ~470-530 ms while the
    fused pipeline CONTAINING it completes in ~324 ms (verified with
    identical in-jit-reduction methodology, pipelined == serialized, so it
    is a compile-time difference, not a measurement artifact — see
    experiments/PERF.md §5). The ledger therefore reports
      forward_tta8_ms = fused_e2e_ms - cc_ms - ddm_ms   (in-context), and
      forward_standalone_ms                              (the receipt).
    MFU uses the in-context figure. Roofline lower bound for the same
    forward: 69 ms (experiments/roofline.py).
    """
    import jax
    import jax.numpy as jnp
    from cdnet_tpu.infer import make_model_fn
    from cdnet_tpu.ops import tta as T
    from cdnet_tpu.ops.ddm import generate_dd_maps_batch
    from cdnet_tpu.ops.postproc import enhance_boundary_cf, instances_from_pred

    # pin the variables on device ONCE (same trap build_pipeline documents:
    # passing the numpy checkpoint tree to jit re-uploads all 82MB through
    # the tunnel EVERY call — first ledger run measured forward_tta8 at
    # 2062 ms when the fused e2e was 327 ms/tile, i.e. ~1.8 s of that was
    # parameter re-upload, not forward compute)
    variables = jax.device_put(variables)
    dc = cfg.model.direction_classes
    model_fn = make_model_fn(model)

    @jax.jit
    def forward(v, image):
        out = model_fn(v, T.expand(image))
        return {"prob": T.invert_last2(out["prob"]),
                "point": T.invert_last2(out["point"]),
                "dcls": T.invert_last2(out["direction_cls"]).astype(jnp.int32)}

    @jax.jit
    def ddm_enhance(prob_v, point_v, d_v):
        prob = jnp.mean(prob_v, axis=-3)
        point = jnp.mean(point_v, axis=-3)
        ddm = jnp.mean(generate_dd_maps_batch(d_v, dc), axis=0)
        prob = enhance_boundary_cf(prob, point, ddm)
        best, pred = prob[0], jnp.zeros(prob.shape[1:], jnp.int32)
        for ci in range(1, prob.shape[0]):
            take = prob[ci] > best
            best = jnp.where(take, prob[ci], best)
            pred = jnp.where(take, ci, pred)
        return pred

    @jax.jit
    def cc_stage(pred):
        return instances_from_pred(pred, min_area=cfg.post.min_area,
                                   radius=cfg.post.radius,
                                   use_watershed=False)[0]

    @jax.jit
    def ws_stage(pred):
        return instances_from_pred(pred, min_area=cfg.post.min_area,
                                   radius=cfg.post.radius,
                                   use_watershed=True)[0]

    def timed(fn, *args, iters=8):
        out = fn(*args)  # handoff value for the next stage (also compiles fn)

        # Timing twin: reduce EVERY output leaf to one scalar INSIDE the jit
        # program — one dispatch + one scalar fetch per iteration, and no
        # big-array output materialization. (The first ledger design fetched
        # an eager jnp.max of a (3,8,1024,1024) output per call; together
        # with the forced output relayouts that measured the 8-view forward
        # at 531 ms when the FUSED end-to-end program — which contains the
        # same forward as a subgraph — completes in ~296 ms.)
        def reduced(*a):
            leaves = jax.tree_util.tree_leaves(fn(*a))
            return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

        red = jax.jit(reduced)
        float(jax.device_get(red(*args)))  # compile+run
        t0 = time.time()
        for _ in range(iters):
            float(jax.device_get(red(*args)))
        return max((time.time() - t0) / iters - floor_s, 0.0) * 1e3, out

    fwd_alone_ms, fwd_out = timed(forward, variables, img)
    ddm_ms, pred = timed(ddm_enhance, fwd_out["prob"], fwd_out["point"],
                         fwd_out["dcls"])
    cc_ms, _ = timed(cc_stage, pred)
    ws_ms, _ = timed(ws_stage, pred)

    # in-context forward = fused e2e minus the post-proc stages (PERF.md §2)
    fwd_ms = fwd_alone_ms
    e2e_ms = 0.0
    if e2e_serialized_tps > 0:
        e2e_ms = max(1e3 / e2e_serialized_tps - floor_s * 1e3, 0.0)
        fwd_ms = max(e2e_ms - cc_ms - ddm_ms, 0.0)

    # forward FLOPs -> MFU: XLA's own cost analysis of the compiled 8-view
    # forward; peak = 197 TFLOP/s bf16 on TPU v5e (v5 lite) per chip
    mfu = flops = None
    try:
        cost = jax.jit(forward).lower(variables, img).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
        if flops and fwd_ms:
            mfu = (flops / (fwd_ms / 1e3)) / 197e12
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        print(f"[stages] cost_analysis unavailable: {e}", file=sys.stderr)

    ledger = {"fused_e2e_ms": round(e2e_ms, 1),
              "forward_tta8_ms": round(fwd_ms, 1),
              "forward_standalone_ms": round(fwd_alone_ms, 1),
              "ddm_enhance_ms": round(ddm_ms, 1),
              "cc_instancing_ms": round(cc_ms, 1),
              "watershed_instancing_ms": round(ws_ms, 1)}
    if flops:
        ledger["forward_gflops"] = round(flops / 1e9, 1)
        if mfu:
            ledger["mfu_forward_bf16"] = round(mfu, 4)
    try:
        # analytic speed-of-light for THIS model/shape (abstract trace only)
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "cdnet_roofline", os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "experiments", "roofline.py"))
        rl = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(rl)
        sol = rl.analyze(forward, variables, img)
        ledger["forward_roofline_sol_ms"] = round(sol["sol_ms"], 1)
    except Exception as e:  # noqa: BLE001 — SOL is best-effort reporting
        print(f"[stages] roofline unavailable: {e}", file=sys.stderr)
    print(f"[stages] {ledger}", file=sys.stderr)
    return ledger


# optional legs (HRNet row, virtual-mesh sanity) are skipped when the core
# bench already consumed this much wall-clock — the headline JSON line must
# print within the driver's budget even on a cold compile cache
BUDGET_S = float(os.environ.get("CDNET_BENCH_BUDGET_S", "2400"))
_T_START = time.time()


def over_budget(leg: str) -> bool:
    used = time.time() - _T_START
    if used > BUDGET_S:
        print(f"[{leg}] skipped: {used:.0f}s elapsed > budget {BUDGET_S:.0f}s "
              f"(set CDNET_BENCH_BUDGET_S to raise)", file=sys.stderr)
        return True
    return False


def bench_hrnet(img):
    """Throughput for the CDNet paper flagship HRNet18_rev1
    (seg_hrnet_rev1.py:289-568) through the same TTA8+DDM+CC pipeline.
    Builds its own Config (fresh CC-path settings, independent of whatever
    main() mutated); time_pipeline reports raw wall-clock like the main
    rows, no floor subtraction."""
    from cdnet_tpu.config import Config
    from cdnet_tpu.infer import build_pipeline
    from cdnet_tpu.models import choose_model

    cfg = Config()
    cfg.model.model_name = "HRNet18_rev1"
    cfg.test.tta = True
    cfg.test.all_img_test = 1
    cfg.post.postproc = 0
    ckpt = CKPT.replace("bench_ckpt", "bench_ckpt_hrnet")
    # the HRNet smoke-train is ~30 min on this box (150 steps of the
    # multi-branch trunk) — only affordable when its checkpoint is cached
    if not os.path.exists(ckpt) and time.time() - _T_START > BUDGET_S / 2:
        print("[hrnet] skipped: no cached checkpoint and not enough budget "
              "left for its smoke-train", file=sys.stderr)
        return {"hrnet_tiles_per_sec": 0.0}
    try:
        model = choose_model(cfg)
        variables = get_trained_variables(cfg, model, ckpt)
        pipeline = build_pipeline(model, variables, cfg, img.shape[:2])
        pip, ser, n = time_pipeline(pipeline, img, "hrnet", iters=6)
        return {"hrnet_tiles_per_sec": round(pip, 4),
                "hrnet_serialized_tiles_per_sec": round(ser, 4)}
    except Exception as e:  # noqa: BLE001 — report, don't sink the bench
        print(f"[hrnet] skipped: {type(e).__name__}: {e}", file=sys.stderr)
        return {"hrnet_tiles_per_sec": 0.0}


def bench_mesh1_tpu(model, variables, cfg, img, n_tiles: int = 2):
    """Sharded-program overhead on the REAL chip (VERDICT r3 #6 tail): the
    same batched pipeline built over a 1-device TPU mesh (the sharded
    program XLA compiles for --use-mesh) vs the plain vmap build. On one
    chip the two must run at the same rate — any gap is partitioning
    overhead, which this leg makes visible."""
    import jax
    import jax.numpy as jnp
    from cdnet_tpu.infer import build_pipeline
    from cdnet_tpu.parallel import make_mesh

    try:
        mesh = make_mesh(devices=jax.devices()[:1])
        mpipe = build_pipeline(model, variables, cfg, img.shape[:2],
                               mesh=mesh, batch_tiles=n_tiles)
        imgs = jnp.stack([img] * n_tiles)
        t0 = time.time()
        n = int(jax.device_get(jnp.max(mpipe(imgs)["instances"])))
        print(f"[mesh1] compile+first: {time.time() - t0:.1f}s "
              f"instances={n}", file=sys.stderr)
        assert n > 0
        iters = 4
        t0 = time.time()
        maxes = [jnp.max(mpipe(imgs)["instances"]) for _ in range(iters)]
        counts = [int(jax.device_get(m)) for m in maxes]
        tps = n_tiles * iters / (time.time() - t0)
        assert all(c > 0 for c in counts)
        print(f"[mesh1] pipelined={tps:.3f} tiles/s", file=sys.stderr)
        return {f"cc_mesh1_batch{n_tiles}_tiles_per_sec": round(tps, 4)}
    except Exception as e:  # noqa: BLE001 — report, don't sink the bench
        print(f"[mesh1] skipped: {type(e).__name__}: {e}", file=sys.stderr)
        return {}


def mesh_scaling_subprocess():
    """1-vs-8 virtual-CPU-mesh sanity number for the --use-mesh path
    (VERDICT r2 item 9): the sharded program must run and agree. Executed in
    a subprocess so the forced CPU platform doesn't disturb the TPU run.
    Virtual devices share this box's single physical core, so the number
    validates the SOFTWARE path (sharding compiles, executes, instances
    match), not hardware scaling."""
    import subprocess
    code = r"""
import os, sys, time, json
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.abspath(%r)))
import jax, jax.numpy as jnp
from cdnet_tpu.config import Config
from cdnet_tpu.infer import build_pipeline
from cdnet_tpu.models import choose_model
from cdnet_tpu.parallel import make_mesh
from cdnet_tpu.data.synthetic import synthetic_tile
cfg = Config(); cfg.test.tta = True; cfg.test.all_img_test = 1
cfg.model.compute_dtype = "float32"
model = choose_model(cfg)
x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
variables = model.init(jax.random.PRNGKey(0), x0, train=False)
rng = np.random.RandomState(0)
img = jnp.asarray(synthetic_tile(rng, 64, (3, 7))[0], jnp.float32) / 255.0
imgs = jnp.stack([img] * 8)
mesh = make_mesh()
p1 = build_pipeline(model, variables, cfg, (64, 64), batch_tiles=8)
pm = build_pipeline(model, variables, cfg, (64, 64), mesh=mesh,
                    batch_tiles=8)
def run(p):
    r = p(imgs); jax.block_until_ready(r)
    return np.asarray(r["pred"])
a = run(p1); t0 = time.time(); run(p1); t_un = time.time() - t0
b = run(pm); t0 = time.time(); run(pm); t_m = time.time() - t0
print(json.dumps({"equal": bool((a == b).all()), "unsharded_s": t_un,
                  "mesh8_s": t_m, "devices": len(jax.devices())}))
""" % os.path.abspath(__file__)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                          " --xla_force_host_platform_device_count=8"))
    try:
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=900)
        line = out.stdout.strip().splitlines()[-1]
        res = json.loads(line)
        print(f"[mesh8] {res}", file=sys.stderr)
        return {"mesh8_cpu_equal": res["equal"],
                "mesh8_cpu_devices": res["devices"]}
    except Exception as e:  # noqa: BLE001
        print(f"[mesh8] skipped: {type(e).__name__}: {e}", file=sys.stderr)
        return {}


def bench_batch_sweep(model, variables, cfg, img, sizes=(2, 4, 8)):
    """batch_tiles scaling curve (VERDICT r3 #6): N independent tiles per
    dispatch, pipelined tiles/s per N. An OOM/compile failure at some N is
    reported and recorded as 0.0 — that IS the HBM ceiling receipt."""
    import jax
    import jax.numpy as jnp
    from cdnet_tpu.infer import build_pipeline

    out = {}
    size = img.shape[0]
    for n_tiles in sizes:
        if over_budget(f"batch{n_tiles}"):
            break
        key = f"cc_batch{n_tiles}_tiles_per_sec"
        try:
            bpipe = build_pipeline(model, variables, cfg, (size, size),
                                   batch_tiles=n_tiles)
            imgs = jnp.stack([img] * n_tiles)
            t0 = time.time()
            n = int(jax.device_get(jnp.max(bpipe(imgs)["instances"])))
            print(f"[batch{n_tiles}] compile+first: {time.time() - t0:.1f}s "
                  f"instances={n}", file=sys.stderr)
            assert n > 0
            iters = max(2, 8 // n_tiles)
            t0 = time.time()
            maxes = [jnp.max(bpipe(imgs)["instances"]) for _ in range(iters)]
            counts = [int(jax.device_get(m)) for m in maxes]
            tps = n_tiles * iters / (time.time() - t0)
            assert all(c > 0 for c in counts)
            print(f"[batch{n_tiles}] pipelined={tps:.3f} tiles/s",
                  file=sys.stderr)
            out[key] = round(tps, 4)
        except Exception as e:  # noqa: BLE001 — OOM at large N is the receipt
            print(f"[batch{n_tiles}] failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
            out[key] = 0.0
            break  # larger N can only be worse
    return out


def main():
    import jax
    # persistent compile cache: the full pipeline takes minutes to compile
    # cold; repeat runs (the driver) hit the cache. The cache lives IN the
    # repo (and is committed) so a fresh driver checkout starts warm —
    # /tmp does not survive across driver runs (VERDICT r4 #1).
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "experiments", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from cdnet_tpu.config import Config
    from cdnet_tpu.data.synthetic import synthetic_tile
    from cdnet_tpu.infer import build_pipeline
    from cdnet_tpu.models import choose_model
    from cdnet_tpu.ops import packed_conv, pallas_cc, pallas_conv

    cfg = Config()
    cfg.test.tta = True
    cfg.test.all_img_test = 1
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    model = choose_model(cfg)
    variables = get_trained_variables(cfg, model)

    size = 1024  # 1000x1000 tiles padded to the 128-aligned TPU shape
    rng = np.random.RandomState(0)
    img8, _, _ = synthetic_tile(rng, size, n_nuclei=(160, 200))
    img = jnp.asarray(img8, jnp.float32) / 255.0

    floor_s = measure_dispatch_floor()
    print(f"dispatch floor: {floor_s * 1e3:.1f} ms", file=sys.stderr)

    # reference-default path: postproc=0 -> CC instancing (options.py:151)
    cfg.post.postproc = 0
    cc_pipeline = build_pipeline(model, variables, cfg, (size, size))
    cc_pip, cc_ser, n_inst = time_pipeline(cc_pipeline, img, "cc")

    # --- HEADLINE: printed the moment the core number exists (VERDICT r3
    # #1: round 3's bench hit the driver's wall-clock budget while running
    # the optional legs below and produced NO official number). Every
    # later leg only ever ADDS fields via the extended line.
    headline = {
        "metric": "cdnet_e2e_infer_1000px_tta8_ddm_postproc",
        "value": round(cc_pip, 4),
        "unit": "tiles/sec",
        "vs_baseline": round(cc_pip / REFERENCE_EST_TILES_PER_SEC, 2),
        "cc_tiles_per_sec": round(cc_pip, 4),
        "cc_serialized_tiles_per_sec": round(cc_ser, 4),
        "instances": n_inst,
        "dispatch_floor_ms": round(floor_s * 1e3, 1),
        # whether the Pallas/packed kernels were active for the numbers
        # above ("force" mode counts as active)
        "pallas_conv": pallas_conv.is_active(),
        "pallas_cc": pallas_cc.is_active(),
        "packed_conv": packed_conv.is_active(),
    }
    print(json.dumps(headline), flush=True)

    # Optional legs, ordered by evidence value (VERDICT r4 #1: three rounds
    # of implemented-but-unrecorded legs because the watershed leg's 190 s
    # cold compile ran first and the driver wall killed everything after
    # it). The cumulative extended JSON prints after EVERY leg so a mid-leg
    # kill keeps all completed results — the driver parses the LAST line.
    extra = {}

    def emit():
        print(json.dumps({**headline, **extra}), flush=True)

    # 1. whole-slide throughput: batch_tiles scaling curve {2,4,8}
    extra.update(bench_batch_sweep(model, variables, cfg, img))
    emit()

    # 2. HRNet paper-flagship row
    if not over_budget("hrnet"):
        extra.update(bench_hrnet(img))
        emit()

    # 3. sharded-program overhead on the real chip
    if not over_budget("mesh1"):
        extra.update(bench_mesh1_tpu(model, variables, cfg, img))
        emit()

    # 4. postproc=1 -> marker watershed (postproc_other.py:15-99)
    if not over_budget("watershed"):
        try:
            cfg.post.postproc = 1
            ws_pipeline = build_pipeline(model, variables, cfg, (size, size))
            ws_pip, ws_ser, _ = time_pipeline(ws_pipeline, img, "watershed")
            extra["watershed_tiles_per_sec"] = round(ws_pip, 4)
            extra["watershed_serialized_tiles_per_sec"] = round(ws_ser, 4)
        except Exception as e:  # noqa: BLE001
            print(f"[watershed] skipped: {type(e).__name__}: {e}",
                  file=sys.stderr)
        cfg.post.postproc = 0
        emit()

    # 5. per-stage ledger
    if not over_budget("stages"):
        try:
            extra["stage_ms"] = stage_timings(model, variables, cfg, img,
                                              floor_s,
                                              e2e_serialized_tps=cc_ser)
        except Exception as e:  # noqa: BLE001
            print(f"[stages] skipped: {type(e).__name__}: {e}",
                  file=sys.stderr)
        emit()

    # 6. virtual-CPU mesh sanity (subprocess)
    if not over_budget("mesh8"):
        extra.update(mesh_scaling_subprocess())
        emit()


if __name__ == "__main__":
    main()
