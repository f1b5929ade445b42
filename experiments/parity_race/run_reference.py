"""Run the REFERENCE pipeline (torch CPU) on the shared race dataset.

Drives `/root/reference`'s OWN drivers — `train.py:main()` and
`test_dam.py:main()` — under the test-only dependency shims from
`tests/reference_oracle.py` (skimage/numba/torchvision substitutes). The
reference code computes every number; this file only provides:

- the shims + a working `skimage.io.imread/imsave` (the oracle module stubs
  them out; test_dam reads label PNGs through io.imread)
- an `os.chdir` no-op (the reference hardcodes a Windows path at module
  import, `/root/reference/train.py:29-30`)
- `workers=0` (the box has 1 CPU core; the reference has no --workers flag;
  worker count does not affect numerics)
- a content-hash cache around LabelEncoding.__call__ — a DETERMINISTIC
  function of its input tuple, so caching is numerics-neutral; with only
  vertical_flip active each tile has 2 variants and the pure-python
  get_centerpoint2 fallback (numba is absent) would otherwise dominate the
  epoch time ~100x

Race configuration (same on both sides, see PARITY.md):
  model UNet2RevA1_vgg16 (random init: no pretrained weights offline),
  multi_class 3c + point MSE + direction 9-class (reference defaults),
  adam lr 1e-3 wd 1e-4, scheduler None, batch 4, seed 2022,
  transforms = vertical_flip + label_encoding + to_tensor (no normalize:
  exp_filename carries _noNorm so train AND test skip it consistently),
  input 128x128 train tiles, 256x256 test tiles, all_img_test=1, postproc 0.

Usage:  python run_reference.py train --epochs N
        python run_reference.py test
(cwd is forced to ref_ws so the reference's ./data and ./experiments
relative paths resolve there.)
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REF_WS = os.path.join(HERE, "ref_ws")
EXP_FILENAME = "_3c_race_noNorm"

sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")


def install_shims():
    import numpy as np
    from PIL import Image

    import reference_oracle
    reference_oracle.install()

    # real imread/imsave (the oracle stubs them; test_dam.py needs both)
    import skimage.io as sio

    def imread(path):
        return np.asarray(Image.open(path))

    def imsave(path, arr, **_k):
        arr = np.asarray(arr)
        if arr.dtype in (np.float32, np.float64):
            arr = np.clip(arr, 0, 255).astype(np.uint8)
        if arr.dtype == np.int64 or arr.dtype == np.int32:
            arr = arr.astype(np.uint16)
            Image.fromarray(arr, mode="I;16").save(path)
            return
        Image.fromarray(arr).save(path)

    sio.imread = imread
    sio.imsave = imsave

    os.chdir = lambda *_a, **_k: None  # train.py:29-30 hardcoded Windows path

    # the reference saves checkpoints with numpy scalars inside; modern torch
    # defaults weights_only=True and refuses them — restore the old default
    import torch
    _orig_load = torch.load

    def _load(*a, **k):
        k.setdefault("weights_only", False)
        return _orig_load(*a, **k)

    torch.load = _load


def patch_workers_and_cache():
    """workers=0 + LabelEncoding content-hash cache (numerics-neutral)."""
    import numpy as np

    import options as ref_options

    orig_parse = ref_options.Options.parse

    def parse(self, *a, **k):
        out = orig_parse(self, *a, **k)
        if self.isTrain:
            self.train["workers"] = 0
        return out

    ref_options.Options.parse = parse

    import my_transforms_direction as mtd

    orig_le = mtd.LabelEncoding.__call__
    cache: dict[tuple, tuple] = {}

    def cached_le(self, imgs):
        key_parts = [self.out_c, self.radius, self.do_direction]
        for x in imgs:
            a = np.asarray(x)
            key_parts.append(hashlib.md5(
                a.tobytes() + str(a.shape).encode()).hexdigest())
        key = tuple(key_parts)
        if key not in cache:
            cache[key] = orig_le(self, imgs)
        hit = cache[key]
        # items [0:2] are the untouched (img, weight) inputs; label-derived
        # outputs are never mutated downstream (ToTensor copies)
        return (imgs[0], imgs[1]) + tuple(hit[2:])

    mtd.LabelEncoding.__call__ = cached_le


TRAIN_ARGS = [
    "--dataset", "MoNuSeg_oridata",
    "--model-name", "UNet2RevA1_vgg16",
    "--exp-filename", EXP_FILENAME,
    "--batch-size", "4",
    "--input-size", "128",
    "--seed", "2022",
    "--optimizer", "adam",
    "--lr", "0.001",
    "--scheduler", "None",
    "--validation", "0",
    "--early_stop", "0",
    "--log-interval", "2",
    "--transform-train", "_noRRe_noRCo_noHF_noRA_noRE_noRRo_noRCr_noCAu_isLE_noNorm",
]

TEST_ARGS = [
    "--dataset", "MoNuSeg_oridata",
    "--model-name", "UNet2RevA1_vgg16",
    "--exp-filename", EXP_FILENAME,
    "--test-filename", "test",
    "--epoch", "best",
    "--all_img_test", "1",
    "--postproc", "0",
    "--groundtruth", "0",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["train", "test"])
    ap.add_argument("--epochs", type=int, default=40)
    ns = ap.parse_args()

    os.makedirs(REF_WS, exist_ok=True)
    os.chdir(REF_WS)  # before install_shims() no-ops chdir
    install_shims()
    sys.path.insert(0, "/root/reference")
    patch_workers_and_cache()

    t0 = time.time()
    if ns.phase == "train":
        sys.argv = ["train.py"] + TRAIN_ARGS + ["--epochs", str(ns.epochs)]
        import train as ref_train
        ref_train.main()
    else:
        sys.argv = ["test_dam.py"] + TEST_ARGS
        import test_dam as ref_test
        ref_test.main()
    print(f"[race] reference {ns.phase} done in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
