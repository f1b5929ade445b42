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

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "tiles/sec", "vs_baseline": N,
   "cc_tiles_per_sec": N, "watershed_tiles_per_sec": N, "instances": N}

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


def get_trained_variables(cfg, model):
    """Flagship variables with non-trivial segmentation behavior.

    Loads the cached smoke-trained checkpoint if present; otherwise trains
    ~150 steps on synthetic tiles (easy blob data — enough for the 3-class /
    point / direction heads to produce real instances) and caches the result.
    Training time is NOT part of the timed benchmark.
    """
    import jax
    import jax.numpy as jnp
    from cdnet_tpu.utils.checkpoint import load_checkpoint
    from flax import serialization

    x0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    target = {"params": jax.device_get(variables["params"]),
              "batch_stats": jax.device_get(variables.get("batch_stats", {}))}
    if os.path.exists(CKPT):
        state, _ = load_checkpoint(CKPT, target)
        print("loaded cached bench checkpoint", file=sys.stderr)
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
    os.makedirs(os.path.dirname(CKPT), exist_ok=True)
    with open(CKPT, "wb") as f:
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


def main():
    import jax
    # persistent compile cache: the full pipeline takes minutes to compile
    # cold; repeat runs (the driver) hit the cache
    jax.config.update("jax_compilation_cache_dir", "/tmp/cdnet_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from cdnet_tpu.config import Config
    from cdnet_tpu.data.synthetic import synthetic_tile
    from cdnet_tpu.infer import build_pipeline
    from cdnet_tpu.models import choose_model

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

    # reference-default path: postproc=0 -> CC instancing (options.py:151)
    cfg.post.postproc = 0
    cc_pipeline = build_pipeline(model, variables, cfg, (size, size))
    cc_pip, cc_ser, n_inst = time_pipeline(cc_pipeline, img, "cc")

    # postproc=1 -> marker watershed (postproc_other.py:15-99)
    cfg.post.postproc = 1
    ws_pipeline = build_pipeline(model, variables, cfg, (size, size))
    ws_pip, ws_ser, _ = time_pipeline(ws_pipeline, img, "watershed")

    # whole-slide throughput mode: 2 tiles per dispatch (amortizes the host
    # round-trip and fills device gaps); falls back gracefully if the 2-tile
    # TTA batch does not fit HBM
    batch2 = 0.0
    try:
        cfg.post.postproc = 0
        bpipe = build_pipeline(model, variables, cfg, (size, size),
                               batch_tiles=2)
        img2 = jnp.stack([img, img])
        t0 = time.time()
        n = int(jax.device_get(jnp.max(bpipe(img2)["instances"])))
        print(f"[batch2] compile+first: {time.time() - t0:.1f}s "
              f"instances={n}", file=sys.stderr)
        assert n > 0
        iters = 6
        t0 = time.time()
        maxes = [jnp.max(bpipe(img2)["instances"]) for _ in range(iters)]
        counts = [int(jax.device_get(m)) for m in maxes]
        batch2 = 2 * iters / (time.time() - t0)
        assert all(c > 0 for c in counts)
        print(f"[batch2] pipelined={batch2:.3f} tiles/s", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 - OOM/compile fallback is reported
        print(f"[batch2] skipped: {type(e).__name__}: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "cdnet_e2e_infer_1000px_tta8_ddm_postproc",
        "value": round(cc_pip, 4),
        "unit": "tiles/sec",
        "vs_baseline": round(cc_pip / REFERENCE_EST_TILES_PER_SEC, 2),
        "cc_tiles_per_sec": round(cc_pip, 4),
        "cc_serialized_tiles_per_sec": round(cc_ser, 4),
        "watershed_tiles_per_sec": round(ws_pip, 4),
        "watershed_serialized_tiles_per_sec": round(ws_ser, 4),
        "cc_batch2_tiles_per_sec": round(batch2, 4),
        "instances": n_inst,
    }))


if __name__ == "__main__":
    main()
