"""Mesh construction and sharded train/infer steps (SPMD over ICI)."""
from cdnet_tpu.parallel.mesh import make_mesh, shard_batch, replicate  # noqa: F401
from cdnet_tpu.parallel.train_step import TrainState, make_train_step, make_eval_step  # noqa: F401
