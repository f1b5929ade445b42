"""Time ONLY the HRNet full fused pipeline (serialized + pipelined).

The stage-prefix bisection (hrnet_bisect.py) is §6-anomalous for routing
decisions — prefix programs materialize branch tensors as outputs, which
changes XLA's fusion/layout choices per routing. This harness times the
one §6-clean number, the full pipeline, for routing A/Bs:

  python experiments/hrnet_e2e_time.py                      # current policy
  CDNET_PACKED_CONV=off python experiments/hrnet_e2e_time.py
  CDNET_PACKED_MIN_CIN=64 python experiments/hrnet_e2e_time.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "experiments", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import bench
    from cdnet_tpu.config import Config
    from cdnet_tpu.data.synthetic import synthetic_tile
    from cdnet_tpu.infer import build_pipeline
    from cdnet_tpu.models import choose_model
    from cdnet_tpu.ops import packed_conv, pallas_conv

    cfg = Config()
    cfg.model.model_name = "HRNet18_rev1"
    cfg.test.tta = True
    cfg.test.all_img_test = 1
    cfg.post.postproc = 0
    model = choose_model(cfg)
    ckpt = bench.CKPT.replace("bench_ckpt", "bench_ckpt_hrnet")
    variables = bench.get_trained_variables(cfg, model, ckpt)

    size = 1024
    rng = np.random.RandomState(0)
    img8, _, _ = synthetic_tile(rng, size, n_nuclei=(160, 200))
    img = jnp.asarray(img8, jnp.float32) / 255.0

    print(f"policy: packed MODE={packed_conv.MODE} "
          f"MIN_CIN={packed_conv._MIN_CIN} pallas MODE={pallas_conv.MODE}")
    pipeline = build_pipeline(model, variables, cfg, (size, size))
    pip, ser, n = bench.time_pipeline(pipeline, img, "hrnet-e2e", iters=6)
    print(f"RESULT serialized={ser:.3f} pipelined={pip:.3f} tiles/s "
          f"({1e3 / ser:.0f} ms/tile serialized-incl-floor)")


if __name__ == "__main__":
    main()
