"""Smoke-train and cache the HRNet18_rev1 bench checkpoint.

bench.py's HRNet leg and experiments/hrnet_bisect.py both need
experiments/bench_ckpt_hrnet.msgpack; training it inline blows the bench's
wall-clock budget (the multi-branch trunk's train step is a long compile),
so this script produces the cache up front. Same recipe as
bench.get_trained_variables (150 steps on synthetic tiles).

Run on the TPU box:  python experiments/train_hrnet_ckpt.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "experiments", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import bench
    from cdnet_tpu.config import Config
    from cdnet_tpu.models import choose_model

    cfg = Config()
    cfg.model.model_name = "HRNet18_rev1"
    model = choose_model(cfg)
    ckpt = bench.CKPT.replace("bench_ckpt", "bench_ckpt_hrnet")
    bench.get_trained_variables(cfg, model, ckpt)
    print(f"cached {ckpt}")


if __name__ == "__main__":
    main()
