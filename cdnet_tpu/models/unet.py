"""Vanilla U-Net (semantics of `/root/reference/models/unet.py:53-117`).

4 encoder stages 64->512 + 1024 bottleneck, transposed-conv decoder with skip
concatenation, 1x1 head. NHWC / bfloat16 compute; returns {"mask": logits}.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from cdnet_tpu.models.layers import ConvBN


class _DoubleConv(nn.Module):
    features: int
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.features, dtype=self.dtype)(x, train)
        x = ConvBN(self.features, dtype=self.dtype)(x, train)
        return x


class UNet(nn.Module):
    """Reference `UNet(num_classes)` (models/unet.py:53-117)."""
    num_classes: int = 3
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        skips = []
        for feats in (64, 128, 256, 512):
            x = _DoubleConv(feats, dtype=self.dtype)(x, train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _DoubleConv(1024, dtype=self.dtype)(x, train)
        for feats, skip in zip((512, 256, 128, 64), reversed(skips)):
            x = nn.ConvTranspose(feats, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, param_dtype=jnp.float32)(x)
            dh = skip.shape[1] - x.shape[1]
            dw = skip.shape[2] - x.shape[2]
            if dh or dw:
                x = jnp.pad(x, ((0, 0), (dh // 2, dh - dh // 2),
                                (dw // 2, dw - dw // 2), (0, 0)))
            x = jnp.concatenate([skip, x], axis=-1)
            x = _DoubleConv(feats, dtype=self.dtype)(x, train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32)(x.astype(jnp.float32))
        return {"mask": logits}
