"""Runtime utilities: checkpointing, logging, early stopping, meters."""
from cdnet_tpu.utils.checkpoint import (load_checkpoint, load_meta,  # noqa: F401
                                        save_checkpoint)
from cdnet_tpu.utils.logging import AverageMeter, ExperimentCSV, setup_logging  # noqa: F401
from cdnet_tpu.utils.early_stop import EarlyStopping  # noqa: F401
