"""Mesh construction and sharded train/infer steps (SPMD over ICI)."""
from cdnet_tpu.parallel.mesh import make_mesh, shard_batch, replicate  # noqa: F401
from cdnet_tpu.parallel.train_step import (TrainState, make_train_step,  # noqa: F401
                                           make_eval_step,
                                           make_sliding_eval_step)
