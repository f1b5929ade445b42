"""Logging + experiment tracking.

Parity with the reference's observability surface (SURVEY.md §5):
- `setup_logging`: console + train.log logger and a bare epoch_results.txt
  TSV of per-epoch scalars (`/root/reference/train.py:482-518`)
- `AverageMeter`: vector-valued running average (`utils.py:755-774`)
- `ExperimentCSV`: the wide "logExl" per-experiment CSV row, appended at train
  start and filled in by the test driver (`train.py:106-173`,
  `test_dam.py:777-925`) — stored as honest CSV, not parsed back from paths.
"""
from __future__ import annotations

import csv
import logging
import os

import numpy as np


class AverageMeter:
    """Vector running average (reference utils.py:755-774)."""

    def __init__(self, shape: int = 1):
        self.shape = shape
        self.reset()

    def reset(self):
        self.val = np.zeros(self.shape)
        self.avg = np.zeros(self.shape)
        self.sum = np.zeros(self.shape)
        self.count = 0

    def update(self, val, n: int = 1):
        val = np.asarray(val, dtype=np.float64)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def setup_logging(save_dir: str, mode: str = "a"):
    """Console + {save_dir}/train.log logger and epoch-results TSV
    (reference train.py:482-518). Returns (logger, logger_results)."""
    os.makedirs(save_dir, exist_ok=True)
    logger = logging.getLogger("cdnet_tpu")
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()
    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    console.setFormatter(logging.Formatter("%(message)s"))
    fileh = logging.FileHandler(os.path.join(save_dir, "train.log"), mode=mode)
    fileh.setLevel(logging.DEBUG)
    fileh.setFormatter(logging.Formatter("%(asctime)s\t%(message)s", "%Y-%m-%d %H:%M"))
    logger.addHandler(console)
    logger.addHandler(fileh)

    logger_results = logging.getLogger("cdnet_tpu_results")
    logger_results.setLevel(logging.DEBUG)
    logger_results.handlers.clear()
    rfile = logging.FileHandler(os.path.join(save_dir, "epoch_results.txt"), mode=mode)
    rfile.setFormatter(logging.Formatter("%(message)s"))
    logger_results.addHandler(rfile)
    return logger, logger_results


class ExperimentCSV:
    """Append/update one row per experiment in a wide CSV (logExl parity)."""

    def __init__(self, path: str, key_field: str = "exp_filename"):
        self.path = path
        self.key_field = key_field

    def _read(self):
        if not os.path.exists(self.path):
            return [], []
        with open(self.path, newline="") as f:
            reader = csv.DictReader(f)
            return list(reader.fieldnames or []), list(reader)

    def append(self, key: str, values: dict):
        """Always add a NEW row — the reference appends a fresh
        hyperparameter row at EVERY train start (train.py:169-171
        ``logExl.loc[logExl_number] = log_eachItem``), so retraining an
        experiment never touches earlier rows' test metrics."""
        fields, rows = self._read()
        values = {self.key_field: key, **{k: str(v) for k, v in values.items()}}
        for k in values:
            if k not in fields:
                fields.append(k)
        rows.append(values)
        self._write(fields, rows)

    def upsert(self, key: str, values: dict, append_if_set: tuple = ()):
        """Fill the experiment's LAST row in place — unless any column named
        in ``append_if_set`` is already filled on that row, in which case a
        NEW row is appended (hyperparameter columns copied over). This is the
        reference's test write-back (test_dam.py:778-835): the test fills the
        freshest train row's metric block if it is still unfilled, else each
        further test run at a different epoch keeps its own row."""
        fields, rows = self._read()
        values = {self.key_field: key, **{k: str(v) for k, v in values.items()}}
        for k in values:
            if k not in fields:
                fields.append(k)
        matches = [r for r in rows if r.get(self.key_field) == key]
        if not matches:
            rows.append(values)
        else:
            row = matches[-1]
            if any(row.get(c) not in (None, "") for c in append_if_set):
                new_row = dict(row)
                new_row.update(values)
                rows.append(new_row)
            else:
                row.update(values)
        self._write(fields, rows)

    def _write(self, fields, rows):
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=fields, restval="")
            writer.writeheader()
            for row in rows:
                writer.writerow(row)
