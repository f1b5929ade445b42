"""CPM17 end-to-end path (BASELINE config 4, VERDICT r2 item 8).

CPM17 differs from MoNuSeg only in the label container: instance maps live
in MATLAB ``.mat`` files (train: ``<name>_label.mat`` in labels_instance/,
test: ``labels/test_ins/<name>.mat`` with key ``inst_map`` — reference
test_dam.py:227-228 / train.py:233-238). This test builds a synthetic
dataset in that layout, trains one epoch through the real train driver,
runs the real inference driver with .mat ground truth, and checks the full
22-metric row comes out finite and non-trivial.
"""
import os

import numpy as np
import pytest
import scipy.io as sio
from PIL import Image

import cdnet_tpu.infer as I
import cdnet_tpu.train as T
from cdnet_tpu.data.synthetic import synthetic_tile

pytestmark = pytest.mark.slow


def _make_cpm17(root):
    data = os.path.join(root, "data", "CPM17")
    for d in ("images/train", "weight_maps/train", "labels_instance/train",
              "images/test", "labels/test"):
        os.makedirs(os.path.join(data, d), exist_ok=True)
    for i in range(8):
        rng = np.random.RandomState(100 + i)
        img, inst, wmap = synthetic_tile(rng, 64, (3, 7))
        name = f"image_{i:02d}"
        Image.fromarray(img).save(
            os.path.join(data, "images", "train", name + ".png"))
        Image.fromarray(wmap).save(
            os.path.join(data, "weight_maps", "train", name + "_weight.png"))
        sio.savemat(
            os.path.join(data, "labels_instance", "train",
                         name + "_label.mat"),
            {"inst_map": inst.astype(np.float64)})
    for i in range(2):
        rng = np.random.RandomState(900 + i)
        img, inst, _ = synthetic_tile(rng, 64, (3, 7))
        name = f"test_{i:02d}"
        Image.fromarray(img).save(
            os.path.join(data, "images", "test", name + ".png"))
        sio.savemat(os.path.join(data, "labels", "test", name + ".mat"),
                    {"inst_map": inst.astype(np.float64)})
    return data


def test_cpm17_mat_train_infer_metrics(tmp_path, capsys, monkeypatch):
    # the drivers write experiments/logExl_<dataset>.csv relative to cwd
    # (reference train.py:106-173 semantics) — keep that out of the repo tree
    monkeypatch.chdir(tmp_path)
    data = _make_cpm17(str(tmp_path))
    save = str(tmp_path / "run_noNorm")  # _noNorm: no mean_std.npy fixture
    common = ["--dataset", "CPM17", "--data-dir", data,
              "--model-name", "UNet", "--direction", "0", "--mseloss", "0",
              "--input-size", "64", "--compute-dtype", "float32"]
    T.main(["--label-postfix", "label.mat", "--epochs", "1",
            "--batch-size", "8", "--train-save-dir", save,
            "--weight-map-dir", os.path.join(data, "weight_maps"), *common])
    assert os.path.exists(os.path.join(save, "checkpoints",
                                       "checkpoint_best.msgpack"))

    I.main(["--train-save-dir", save, "--test-filename", "test",
            "--epoch", "best", "--patch-size", "64", "--postproc", "0",
            "--test-save-dir", str(tmp_path / "out"), "--no-hausdorff",
            *common])
    out = capsys.readouterr().out
    # the AVG row of the reference's 22-metric bundle, .mat ground truth
    avg = [ln for ln in out.splitlines() if ln.startswith("AVG:")]
    assert avg, out
    vals = dict(kv.split("=") for kv in avg[0][4:].split())
    assert float(vals["pixel_acc"]) > 0.5
    for k in ("AJI", "pq", "Dice"):
        assert np.isfinite(float(vals[k])), (k, avg[0])
    # result.txt artifact written (test_dam.py:1059-1084 parity)
    results = [f for f in os.listdir(tmp_path / "out")
               if f.endswith("_result.txt")]
    assert results
