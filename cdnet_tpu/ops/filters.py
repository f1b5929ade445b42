"""Separable Gaussian filtering with scipy numerics parity.

The reference builds the point-heatmap target with
``scipy.ndimage.gaussian_filter(label_point, sigma=2, order=0)``
(`/root/reference/my_transforms_direction.py:846`). scipy uses a truncated
Gaussian (truncate=4.0 -> radius round(truncate*sigma)) with 'reflect'
boundary mode; both are replicated here as two 1-D convolutions on device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    """scipy.ndimage._gaussian_kernel1d: normalized exp(-0.5 x^2 / sigma^2)."""
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x ** 2)
    return (phi / phi.sum()).astype(np.float32)


def gaussian_filter(image: jnp.ndarray, sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """2-D Gaussian blur of (..., H, W), scipy 'reflect' boundary semantics."""
    radius = int(truncate * sigma + 0.5)
    k = jnp.asarray(_gaussian_kernel1d(sigma, radius))

    def conv1d(x, axis):
        # reflect padding (scipy 'reflect' == numpy 'symmetric')
        pad = [(0, 0)] * x.ndim
        pad[axis] = (radius, radius)
        xp = jnp.pad(x, pad, mode="symmetric")
        xp = jnp.moveaxis(xp, axis, -1)
        shape = xp.shape
        xp = xp.reshape(-1, 1, shape[-1])
        out = jax.lax.conv_general_dilated(
            xp, k.reshape(1, 1, -1), window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))
        out = out.reshape(shape[:-1] + (out.shape[-1],))
        return jnp.moveaxis(out, -1, axis)

    x = jnp.asarray(image, dtype=jnp.float32)
    x = conv1d(x, x.ndim - 2)
    x = conv1d(x, x.ndim - 1)
    return x
