"""Reinhard LAB-space stain normalization + batch style transfer.

Parity with `/root/reference/utils.py:1040-1107` (`Reinhard_normalizer`,
`style_transfer`), without skimage: RGB<->LAB conversion (D65, CIE standard —
identical formulas to skimage.color.rgb2lab) implemented in NumPy/JAX.
"""
from __future__ import annotations

import numpy as np

# sRGB -> XYZ (D65)
_RGB2XYZ = np.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
], dtype=np.float64)
_XYZ2RGB = np.linalg.inv(_RGB2XYZ)
_WHITE = np.array([0.95047, 1.0, 1.08883])  # D65


def _srgb_to_linear(rgb):
    rgb = np.asarray(rgb, np.float64)
    return np.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)


def _linear_to_srgb(lin):
    lin = np.clip(lin, 0, 1)
    return np.where(lin > 0.0031308, 1.055 * lin ** (1 / 2.4) - 0.055,
                    12.92 * lin)


def rgb2lab(rgb_uint8: np.ndarray) -> np.ndarray:
    """(H,W,3) uint8 (or [0,1] float) -> CIE LAB float64 (skimage parity).

    Scaling is decided by DTYPE, like skimage's img_as_float: integer input
    is always /255, float input is assumed [0,1]. (A content heuristic
    'max > 1' treated a near-black uint8 tile — max channel <= 1 — as
    already-normalized float, mapping pixel value 1 to L~100 instead of
    L~0.3 and corrupting the fitted Reinhard statistics.)"""
    arr = np.asarray(rgb_uint8)
    rgb = arr.astype(np.float64)
    if np.issubdtype(arr.dtype, np.integer):
        rgb = rgb / 255.0
    xyz = _srgb_to_linear(rgb) @ _RGB2XYZ.T
    xyz = xyz / _WHITE

    def f(t):
        return np.where(t > 0.008856, np.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(xyz[..., 0]), f(xyz[..., 1]), f(xyz[..., 2])
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return np.stack([L, a, b], axis=-1)


def lab2rgb(lab: np.ndarray) -> np.ndarray:
    """CIE LAB -> (H,W,3) float in [0,1] (skimage parity)."""
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(t):
        t3 = t ** 3
        return np.where(t3 > 0.008856, t3, (t - 16.0 / 116.0) / 7.787)

    xyz = np.stack([finv(fx), finv(fy), finv(fz)], axis=-1) * _WHITE
    lin = xyz @ _XYZ2RGB.T
    return _linear_to_srgb(lin)


class ReinhardNormalizer:
    """Reference `Reinhard_normalizer` (utils.py:1040-1092)."""

    def __init__(self):
        self.target_means = None
        self.target_stds = None

    @staticmethod
    def _stats(img):
        lab = rgb2lab(img)
        return lab.mean(axis=(0, 1)), lab.std(axis=(0, 1))

    def fit(self, target):
        self.target_means, self.target_stds = self._stats(target)

    def transform(self, img):
        lab = rgb2lab(img)
        means, stds = lab.mean(axis=(0, 1)), lab.std(axis=(0, 1))
        norm = (lab - means) * (self.target_stds / np.maximum(stds, 1e-8)) \
            + self.target_means
        return (lab2rgb(norm) * 255).astype(np.uint8)


def style_transfer(ori_batch: np.ndarray, style_batch: np.ndarray,
                   transfer_rate: float) -> np.ndarray:
    """Reference `style_transfer` (utils.py:1094-1107) minus the debug saves."""
    out = np.array(ori_batch)
    batch = out.shape[0]
    start = int(batch * (1 - transfer_rate))
    for i in range(start, batch):
        norm = ReinhardNormalizer()
        norm.fit(style_batch[i])
        out[i] = norm.transform(out[i])
    return out
