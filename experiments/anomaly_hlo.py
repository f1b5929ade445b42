"""Standalone-vs-fused compile anomaly: HLO-level diagnosis (PERF.md §6).

The same forward(+epilogue) graph times at ~530 ms as its own program but
~266 ms as a subgraph of the full pipeline (experiments/forward_bisect.py,
2026-08-19: epilogue prefix cum=528.6 ms vs full_pipeline cum=266.2 ms).
jax.profiler cannot trace through the axon tunnel, so this script
attributes the difference statically: it AOT-compiles both programs,
walks the optimized HLO, and buckets per-op bytes/FLOPs by opcode —
convolution counts, fusion counts, `copy`/`transpose`/`convert`
materializations, and the total bytes written by non-conv ops. The
hypothesis under test: the standalone program materializes full-res
f32 intermediates (layout/`convert` copies) that the fused program's
consumers (DDM + CC) let XLA elide or re-layout more cheaply.

Additionally sub-bisects the epilogue: softmax-only, +bg-scale+argmax,
+invert_last2, each as a cumulative prefix (same methodology as
forward_bisect.py), to locate WHICH epilogue op triggers the slow
compilation scope.

Run on the TPU box (compile-only legs run through the AOT tunnel but
execute nothing):  python experiments/anomaly_hlo.py [--time]
"""
from __future__ import annotations

import collections
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hlo_summary(compiled) -> dict:
    """Bucket the optimized HLO by opcode: counts and output bytes."""
    txt = compiled.as_text()
    counts = collections.Counter()
    out_bytes = collections.Counter()
    dtype_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                   "s8": 1, "u8": 1, "f16": 2, "s16": 2, "u16": 2}
    op_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?[\w.-]+\s*=\s*(\w+)\[([\d,]*)\][^=]*?\s(\w+)\(")
    for line in txt.splitlines():
        m = op_re.match(line)
        if not m:
            continue
        dt, shape_s, opcode = m.groups()
        if opcode in ("parameter", "constant"):
            continue
        n = 1
        for d in shape_s.split(","):
            if d.strip().isdigit():
                n *= int(d)
        counts[opcode] += 1
        out_bytes[opcode] += n * dtype_bytes.get(dt, 4)
    return {"op_counts": dict(counts.most_common(20)),
            "op_out_gb": {k: round(v / 1e9, 3)
                          for k, v in out_bytes.most_common(20)}}


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "experiments", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import bench
    from cdnet_tpu.config import Config
    from cdnet_tpu.data.synthetic import synthetic_tile
    from cdnet_tpu.infer import build_pipeline, make_model_fn
    from cdnet_tpu.models import choose_model
    from cdnet_tpu.ops import tta as T

    do_time = "--time" in sys.argv

    cfg = Config()
    cfg.test.tta = True
    cfg.test.all_img_test = 1
    cfg.post.postproc = 0
    model = choose_model(cfg)
    variables = jax.device_put(bench.get_trained_variables(cfg, model))
    from cdnet_tpu.ops import pallas_conv
    pallas_conv.ensure_tpu_kernel_or_disable()

    size = 1024
    rng = np.random.RandomState(0)
    img8, _, _ = synthetic_tile(rng, size, n_nuclei=(160, 200))
    img = jnp.asarray(img8, jnp.float32) / 255.0

    model_fn = make_model_fn(model, None)

    def reduced(fn):
        def f(v, im):
            leaves = jax.tree_util.tree_leaves(fn(v, im))
            return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        return f

    # ---- program A: the standalone 8-view forward + epilogue (slow) ----
    def standalone(v, im):
        views = T.expand(im)
        out = model_fn(v, views)
        return {k: T.invert_last2(x) for k, x in out.items()}

    # ---- program B: the full fused pipeline (fast) ----
    pipe = build_pipeline(model, variables, cfg, (size, size))

    results = {}
    floor_s = bench.measure_dispatch_floor() if do_time else 0.0
    for name, fn, args in [
            ("standalone_fwd", jax.jit(reduced(standalone)), (variables, img)),
            ("full_pipeline", jax.jit(lambda v, im: jnp.max(pipe(im)["instances"])),
             (variables, img))]:
        t0 = time.time()
        lowered = fn.lower(*args)
        compiled = lowered.compile()
        results[name] = {"compile_s": round(time.time() - t0, 1),
                         **hlo_summary(compiled)}
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            results[name]["cost"] = {k: round(float(v), 3) for k, v in ca.items()
                                     if k in ("flops", "bytes accessed",
                                              "transcendentals")}
        except Exception as e:  # cost_analysis is best-effort through the tunnel
            results[name]["cost"] = f"unavailable: {type(e).__name__}"
        if do_time:
            t0 = time.time()
            float(jax.device_get(fn(*args)))
            first = time.time() - t0
            t0 = time.time()
            for _ in range(6):
                float(jax.device_get(fn(*args)))
            ms = max((time.time() - t0) / 6 - floor_s, 0.0) * 1e3
            results[name]["run_ms"] = round(ms, 1)
            results[name]["first_run_s"] = round(first, 1)
        print(f"[{name}] {json.dumps(results[name])[:400]}", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
