"""HRNet18_rev1 stage bisection: where do its ~1060 ms/tile go?

Same cumulative-prefix methodology as forward_bisect.py (in-jit scalar
reduction per prefix, dispatch floor subtracted): times the 8-view TTA
forward truncated at stem / stage1 / stage2 / stage3 / stage4 / cat / dam
via the model's ``stop_at`` probe, plus the full fused pipeline anchor.
Reference geometry: seg_hrnet_rev1.py:289-568 (stride-1 stem keeps branch 0
at FULL resolution; channels 18/36/72/144).

Run on the TPU box:  python experiments/hrnet_bisect.py
Optional env: HRNET_BISECT_SIZE (default 1024).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "experiments", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import bench
    from cdnet_tpu.config import Config
    from cdnet_tpu.data.synthetic import synthetic_tile
    from cdnet_tpu.models import choose_model
    from cdnet_tpu.ops import tta as T

    cfg = Config()
    cfg.model.model_name = "HRNet18_rev1"
    cfg.test.tta = True
    cfg.test.all_img_test = 1
    model = choose_model(cfg)
    ckpt = bench.CKPT.replace("bench_ckpt", "bench_ckpt_hrnet")
    variables = jax.device_put(bench.get_trained_variables(cfg, model, ckpt))
    from cdnet_tpu.ops import pallas_conv
    pallas_conv.ensure_tpu_kernel_or_disable()

    size = int(os.environ.get("HRNET_BISECT_SIZE", "1024"))
    rng = np.random.RandomState(0)
    img8, _, _ = synthetic_tile(rng, size, n_nuclei=(160, 200))
    img = jnp.asarray(img8, jnp.float32) / 255.0

    floor_s = bench.measure_dispatch_floor()
    print(f"dispatch floor: {floor_s * 1e3:.1f} ms", file=sys.stderr)

    def timed(fn, iters=6):
        def reduced(v, im):
            leaves = jax.tree_util.tree_leaves(fn(v, im))
            return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        red = jax.jit(reduced)
        t0 = time.time()
        float(jax.device_get(red(variables, img)))
        comp = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            float(jax.device_get(red(variables, img)))
        return (max((time.time() - t0) / iters - floor_s, 0.0) * 1e3, comp)

    def prefix(stop):
        def fn(v, im):
            views = T.expand(im).astype(model.dtype)
            return model.apply(v, views, stop_at=stop)
        return fn

    rows, prev = {}, 0.0
    for stop in ("stem", "stage1", "stage2", "stage3", "stage4", "cat", None):
        name = stop or "dam"
        ms, comp = timed(prefix(stop))
        rows[name] = {"cum_ms": round(ms, 1), "delta_ms": round(ms - prev, 1),
                      "compile_s": round(comp, 1)}
        print(f"{name:7s} cum={ms:7.1f} ms  delta={ms - prev:7.1f} ms  "
              f"(compile {comp:.1f}s)", file=sys.stderr)
        prev = ms

    from cdnet_tpu.infer import build_pipeline
    cfg.post.postproc = 0
    pipe = build_pipeline(model, variables, cfg, (size, size))
    ms, comp = timed(lambda v, im: pipe(im))
    rows["full_pipeline"] = {"cum_ms": round(ms, 1),
                             "delta_ms": round(ms - prev, 1),
                             "compile_s": round(comp, 1)}
    print(f"full_pipeline cum={ms:.1f} ms", file=sys.stderr)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
