"""Early stopping (parity with `/root/reference/utils.py:992-1033`).

Patience counter on a monitored score (the reference monitors
``-(val_F1 + val_iou)``, train.py:444) that only starts counting after
``min_epoch`` (the reference hardcodes epoch >= 100, utils.py:1022).
"""
from __future__ import annotations

import numpy as np


class EarlyStopping:
    def __init__(self, patience: int = 7, verbose: bool = False,
                 delta: float = 0.0, min_epoch: int = 100):
        self.patience = patience
        self.verbose = verbose
        self.delta = delta
        self.min_epoch = min_epoch
        self.counter = 0
        self.best_score = None
        self.early_stop = False

    def __call__(self, val_loss: float, epoch: int = 0) -> bool:
        # reference branch order (utils.py:1016-1027): a score EQUAL to the
        # best (score < best + delta false at delta=0) counts as an
        # improvement and RESETS the counter; the counter accrues at every
        # non-improving epoch but only triggers the stop once
        # epoch >= min_epoch
        score = -val_loss
        if self.best_score is not None and score < self.best_score + self.delta:
            self.counter += 1
            if self.counter >= self.patience and epoch >= self.min_epoch:
                self.early_stop = True
        else:
            self.best_score = score
            self.counter = 0
        return self.early_stop
