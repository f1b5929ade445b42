"""Synthetic H&E-like nuclei tiles (for smoke training, tests, benchmarks).

The reference assumes MoNuSeg/CPM17 on disk; this generator produces
structurally similar data — elliptical nuclei instances over a pinkish
stroma, purple-ish nuclei fill, instance label maps and UNet-style weight
maps — so every pipeline stage can run end-to-end without the datasets.
Not part of the reference surface; clearly an addition.
"""
from __future__ import annotations

import numpy as np


def synthetic_tile(rng: np.random.RandomState, size: int = 256,
                   n_nuclei: tuple[int, int] = (8, 24),
                   radii: tuple[int, int] = (4, 11)):
    """Returns (image uint8 HWC, instance int32 HW, weight uint8 HW).

    ``radii``: half-axis range of the elliptical nuclei — small tiles
    (e.g. the multichip dryrun's 64 px) use smaller radii so many
    instances fit without touching."""
    h = w = size
    inst = np.zeros((h, w), np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    n = rng.randint(*n_nuclei)
    k = 0
    for _ in range(n):
        cy, cx = rng.randint(8, h - 8), rng.randint(8, w - 8)
        a, b = rng.randint(*radii), rng.randint(*radii)
        theta = rng.rand() * np.pi
        ct, st = np.cos(theta), np.sin(theta)
        u = (yy - cy) * ct + (xx - cx) * st
        v = -(yy - cy) * st + (xx - cx) * ct
        m = (u / a) ** 2 + (v / b) ** 2 <= 1.0
        if (inst[m] > 0).mean() > 0.3 if m.any() else True:
            continue
        k += 1
        inst[m & (inst == 0)] = k

    # H&E-ish rendering: eosin stroma + hematoxylin nuclei + noise
    img = np.empty((h, w, 3), np.float32)
    img[..., 0] = 230; img[..., 1] = 200; img[..., 2] = 220
    nucleus = inst > 0
    img[nucleus] = (110, 80, 160)
    img += rng.randn(h, w, 3) * 12
    # weight map: boundary-emphasized (UNet-style), scaled to ~[20, 255]
    from scipy.ndimage import distance_transform_edt
    d = distance_transform_edt(~nucleus) + distance_transform_edt(nucleus)
    wmap = 20 + 235 * np.exp(-(d ** 2) / (2 * 25.0))
    return (np.clip(img, 0, 255).astype(np.uint8), inst,
            np.clip(wmap, 0, 255).astype(np.uint8))


class SyntheticDataset:
    """Drop-in for DataFolder: yields (image, weight, instance) tuples."""

    def __init__(self, n_samples: int = 64, size: int = 256, seed: int = 2022,
                 data_transform=None):
        self.n = n_samples
        self.size = size
        self.seed = seed
        self.data_transform = data_transform

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState((self.seed * 100003 + i) % (2 ** 32))
        img, inst, wmap = synthetic_tile(rng, self.size)
        sample = (img, wmap, inst)
        if self.data_transform is not None:
            sample = self.data_transform(sample)
        return sample
