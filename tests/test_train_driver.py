"""Train-driver wiring tests (the round-2 VERDICT's Weak #1/#2): the shipped
driver must pass the real ``steps_per_epoch`` into the optimizer factory
(reference steps schedulers per EPOCH, utils.py:940-962) and ``validation=1``
must evaluate HELD-OUT tiles, not the training set
(reference train.py:216-259 builds a separate val DataFolder).
"""
import numpy as np
import pytest

import cdnet_tpu.train as T
from cdnet_tpu.config import Config


def _args(tmp_path, extra=()):
    # batch 8 = the test mesh's device count (conftest forces 8 virtual CPU
    # devices; the driver shards the batch over them)
    # input 64 == the synthetic val tile size, so the sliding eval is a
    # single whole-tile forward (32 made it a 3x3 tile grid — slower)
    return ["--synthetic", "16", "--model-name", "UNet", "--direction", "0",
            "--mseloss", "0", "--epochs", "1", "--batch-size", "8",
            "--input-size", "64", "--save-dir", str(tmp_path / "run"),
            *extra]


def test_val_dataset_disjoint_from_train():
    """Synthetic val tiles come from a disjoint seed stream: no val tile may
    byte-match any train tile."""
    cfg = Config()
    cfg.train.input_size = 64
    train_ds = T.build_dataset(cfg, synthetic=8)
    val_ds = T.build_val_dataset(cfg, synthetic=8)
    assert len(val_ds) >= 2
    train_imgs = [np.asarray(train_ds[i][0]) for i in range(len(train_ds))]
    for j in range(len(val_ds)):
        v = np.asarray(val_ds[j][0])
        assert not any(v.shape == t.shape and np.array_equal(v, t)
                       for t in train_imgs), f"val tile {j} is a train tile"


@pytest.mark.slow
@pytest.mark.slowtrain
def test_driver_passes_real_steps_per_epoch(tmp_path, monkeypatch):
    """train.py must call get_optimizer with len(dataset)//batch_size — the
    round-2 bug was the default steps_per_epoch=1 making epoch schedulers
    decay per STEP."""
    seen = {}
    real = T.get_optimizer

    def spy(cfg, steps_per_epoch=1):
        seen["steps_per_epoch"] = steps_per_epoch
        return real(cfg, steps_per_epoch)

    monkeypatch.setattr(T, "get_optimizer", spy)
    # the driver appends experiments/logExl_<dataset>.csv relative to cwd
    # (reference train.py:106-173 semantics) — keep it out of the repo tree
    monkeypatch.chdir(tmp_path)
    T.main(_args(tmp_path))
    assert seen["steps_per_epoch"] == 16 // 8


@pytest.mark.slow
@pytest.mark.slowtrain
def test_validation_evaluates_held_out_tiles(tmp_path, monkeypatch):
    """validation=1: the driver's eval step must consume val-dataset tiles
    (never train tiles) and drive the plateau tracker with the val loss."""
    eval_images = []
    real_make = T.make_sliding_eval_step

    def wrap_make(*a, **k):
        step = real_make(*a, **k)

        def wrapped(state, batch):
            eval_images.append(np.asarray(batch["image"]))
            return step(state, batch)
        return wrapped

    monkeypatch.setattr(T, "make_sliding_eval_step", wrap_make)
    monkeypatch.chdir(tmp_path)  # logExl CSV goes under tmp, not the repo
    T.main(_args(tmp_path, ["--validation", "1",
                            "--scheduler", "ReduceLROnPlateau"]))
    assert eval_images, "validation=1 never ran the eval step"

    cfg = Config()
    cfg.train.input_size = 64
    train_ds = T.build_dataset(cfg, synthetic=16)
    train_imgs = [np.asarray(train_ds[i][0]) for i in range(len(train_ds))]
    for img in eval_images:
        assert not any(np.array_equal(img[0], t) for t in train_imgs), \
            "validation evaluated a training tile"


def test_early_stop_zero_disables_stopper():
    """early_stop=0 must DISABLE early stopping (reference train.py:308,442
    gates on early_stop > 0). The round-3 race run regressed: patience=0
    stopped at the first non-improving epoch past min_epoch=100."""
    cfg = Config()
    cfg.train.early_stop = 0
    assert T.make_stopper(cfg) is None

    cfg.train.early_stop = 7
    stopper = T.make_stopper(cfg)
    assert stopper is not None
    # patience=7 never fires on 6 flat epochs past min_epoch
    assert not any(stopper(1.0, epoch=100 + i) for i in range(7))
