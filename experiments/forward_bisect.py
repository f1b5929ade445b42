"""Forward-pass bisection: where do 250 ms go? (VERDICT r3 #3 / PERF.md §3)

The fused pipeline spends ~77% of its ~324 ms/tile inside the 8-view TTA
forward while the roofline SOL is 69 ms. jax.profiler does not work through
the axon tunnel (the trace call hangs), so this script attributes time by
CUMULATIVE PREFIX programs: each program runs the pipeline from the input
up to stage K and reduces every output leaf to one scalar in-jit (the same
methodology as bench.stage_timings). The difference between consecutive
prefixes is the in-context cost of that stage — the compilation scope grows
monotonically, so each increment is measured inside (a prefix of) the real
program, sidestepping the standalone-vs-fused compile anomaly (PERF.md §6).

Stages:
  expand    : T.expand -> 8 views                       (relayout cost)
  backbone  : VGG16-BN encoder on the 8-view batch
  decoder   : 5 UpsampleBlocks back to full res (16ch)
  dam       : DAM head chain (3 ResidualUnits + gates)
  epilogue  : softmax/argmax channel-first + T.invert_last2
  (+ the full pipeline incl. DDM+CC for the e2e anchor)

Run on the TPU box:  python experiments/forward_bisect.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_reduced(fn, args, floor_s, iters=8):
    import jax
    import jax.numpy as jnp

    def reduced(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    red = jax.jit(reduced)
    t0 = time.time()
    float(jax.device_get(red(*args)))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        float(jax.device_get(red(*args)))
    dt = max((time.time() - t0) / iters - floor_s, 0.0) * 1e3
    return dt, compile_s


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "experiments", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import bench
    from cdnet_tpu.config import Config
    from cdnet_tpu.data.synthetic import synthetic_tile
    from cdnet_tpu.models import choose_model
    from cdnet_tpu.models.layers import DAMHead, UpsampleBlock
    from cdnet_tpu.models.vgg_unet import VGG16Backbone
    from cdnet_tpu.ops import tta as T

    cfg = Config()
    cfg.test.tta = True
    cfg.test.all_img_test = 1
    model = choose_model(cfg)
    variables = jax.device_put(bench.get_trained_variables(cfg, model))
    from cdnet_tpu.ops import pallas_conv
    pallas_conv.ensure_tpu_kernel_or_disable()

    size = 1024
    rng = np.random.RandomState(0)
    img8, _, _ = synthetic_tile(rng, size, n_nuclei=(160, 200))
    img = jnp.asarray(img8, jnp.float32) / 255.0

    floor_s = bench.measure_dispatch_floor()
    print(f"dispatch floor: {floor_s * 1e3:.1f} ms", file=sys.stderr)

    p = variables["params"]
    bs = variables.get("batch_stats", {})
    dt = model.dtype

    def expand(v, image):
        return T.expand(image)

    def backbone(v, image):
        views = T.expand(image).astype(dt)
        return VGG16Backbone(dtype=dt).apply(
            {"params": v["params"]["backbone"],
             "batch_stats": v["batch_stats"]["backbone"]}, views, False)

    def run_decoder(v, bottom, skips):
        x = bottom
        for i, (feats, skip) in enumerate(zip((256, 128, 64, 32, 16),
                                              reversed(skips))):
            x = UpsampleBlock(feats, dtype=dt).apply(
                {"params": v["params"][f"UpsampleBlock_{i}"],
                 "batch_stats": v["batch_stats"][f"UpsampleBlock_{i}"]},
                x, skip, False)
        return x

    def decoder(v, image):
        bottom, skips = backbone(v, image)
        return run_decoder(v, bottom, skips)

    def dam(v, image):
        x = decoder(v, image)
        return DAMHead(dtype=dt).apply(
            {"params": v["params"]["dam"],
             "batch_stats": v["batch_stats"]["dam"]}, x, False)

    def epilogue(v, image):
        out = dam(v, image)
        mask = jnp.moveaxis(out["mask"], -1, 0)
        prob = jax.nn.softmax(mask, axis=0)
        point = out["point"][..., 0]
        d = jnp.moveaxis(out["direction"], -1, 0)
        dprob = jax.nn.softmax(d, axis=0)
        best = dprob[0] * prob[0]
        idx = jnp.zeros(best.shape, jnp.int32)
        for ci in range(1, dprob.shape[0]):
            take = dprob[ci] > best
            best = jnp.where(take, dprob[ci], best)
            idx = jnp.where(take, ci, idx)
        return {"prob": T.invert_last2(prob), "point": T.invert_last2(point),
                "dcls": T.invert_last2(idx.astype(jnp.int32))}

    stages = [("expand", expand), ("backbone", backbone),
              ("decoder", decoder), ("dam", dam), ("epilogue", epilogue)]
    rows = {}
    prev = 0.0
    for name, fn in stages:
        ms, comp = timed_reduced(fn, (variables, img), floor_s)
        rows[name] = {"cum_ms": round(ms, 1), "delta_ms": round(ms - prev, 1),
                      "compile_s": round(comp, 1)}
        print(f"{name:9s} cum={ms:7.1f} ms  delta={ms - prev:7.1f} ms  "
              f"(compile {comp:.1f}s)", file=sys.stderr)
        prev = ms

    # e2e anchor: the real fused pipeline (same as the bench CC leg)
    from cdnet_tpu.infer import build_pipeline
    cfg.post.postproc = 0
    pipe = build_pipeline(model, variables, cfg, (size, size))
    ms, comp = timed_reduced(lambda v, im: pipe(im), (variables, img),
                             floor_s, iters=6)
    rows["full_pipeline"] = {"cum_ms": round(ms, 1),
                             "delta_ms": round(ms - prev, 1),
                             "compile_s": round(comp, 1)}
    print(f"full_pipeline cum={ms:.1f} ms (delta {ms - prev:.1f})",
          file=sys.stderr)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
