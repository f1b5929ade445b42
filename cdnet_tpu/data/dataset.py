"""Dataset: image/weight/label triplet pairing by filename postfix.

Parity with the reference's `DataFolder` (`/root/reference/data_folder.py`):
- `img_loader` handles .png/.jpg (PIL), .npy (numpy), .mat (scipy.io; takes
  the last key, data_folder.py:29-37)
- `get_imgs_list` pairs ``img.ext`` with ``img_{postfix}`` files across dirs
  (data_folder.py:45-73)
- `DataFolder.__getitem__` loads a tuple and applies the joint transform,
  retrying while the label crop has <= 1 unique value (empty-crop guard,
  data_folder.py:103-105)

No torch: items are NumPy arrays; batching happens in the training driver
which assembles device arrays directly.
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image


def img_loader(path: str, num_channels: int = 3):
    """Load .png/.jpg/.npy/.mat into a NumPy array (data_folder.py:20-41)."""
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".mat"):
        import scipy.io as sio
        mat = sio.loadmat(path)
        keys = [k for k in mat.keys() if not k.startswith("__")]
        return np.asarray(mat[keys[-1]])
    img = Image.open(path)
    if num_channels == 1:
        return img.convert("L")
    return img.convert("RGB")


def get_imgs_list(dir_list: list[str], post_fix: list[str]):
    """Pair files: [(img.ext, img_weight.png, img_label.npy), ...]
    (data_folder.py:45-73). dir_list[0] holds the raw images; each postfix i
    must exist in dir_list[i+1] for the tuple to be kept."""
    img_list = []
    if not dir_list:
        return img_list
    img_filename_list = [sorted(os.listdir(d)) for d in dir_list]
    for img in img_filename_list[0]:
        item = [os.path.join(dir_list[0], img)]
        stem = os.path.splitext(img)[0]
        ok = True
        for i, pf in enumerate(post_fix):
            want = f"{stem}_{pf}"
            if want in img_filename_list[i + 1]:
                item.append(os.path.join(dir_list[i + 1], want))
            else:
                ok = False
                break
        if ok and len(item) == len(dir_list):
            img_list.append(tuple(item))
    return img_list


class DataFolder:
    """Reference `DataFolder(dir_list, post_fix, num_channels, transform)`.

    ``data_transform``: callable taking a tuple of PIL/ndarray items and
    returning a tuple of arrays (see cdnet_tpu.data.transforms).
    """

    def __init__(self, dir_list, post_fix, num_channels=3, data_transform=None,
                 max_retries=10):
        assert len(dir_list) == len(post_fix) + 1, "invalid dir and postfix"
        self.img_list = get_imgs_list(dir_list, post_fix)
        if not self.img_list:
            raise RuntimeError(f"no images paired under {dir_list}")
        self.data_transform = data_transform
        # per-directory channel counts, like the reference's
        # num_channels=[3, 1, 3] (train.py:283: image RGB, weight map GRAY,
        # label 3-channel); a scalar applies to the image with weight=1,
        # label=3 defaults
        if isinstance(num_channels, int):
            num_channels = [num_channels, 1, 3][:len(dir_list)]
        assert len(num_channels) == len(dir_list), "one channel count per dir"
        self.num_channels = list(num_channels)
        self.max_retries = max_retries

    def __len__(self):
        return len(self.img_list)

    def __getitem__(self, index):
        paths = self.img_list[index]
        sample = tuple(img_loader(p, c)
                       for p, c in zip(paths, self.num_channels))
        if self.data_transform is None:
            return sample
        # empty-crop retry guard (data_folder.py:103-105): retry while the
        # transformed label has <= 1 unique value
        for _ in range(self.max_retries):
            out = self.data_transform(sample)
            # the label is the LAST item (2-dir configs have no weight map)
            label = np.asarray(out[-1])
            if len(np.unique(label)) > 1:
                return out
        return out
