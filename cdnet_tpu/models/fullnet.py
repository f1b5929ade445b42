"""FullNet: dense blocks with hybrid dilations at full resolution.

Semantics of `/root/reference/models/FullNet.py:90-193`: conv -> 7 dense
blocks (each followed by a 1x1 compression "trans" layer) -> 3x3 head. No
pooling anywhere — receptive field grows through the hybrid dilation schedule
(HD_dict, FullNet.py:67-76). Reference layer order inside ConvLayer is
conv -> LeakyReLU -> BN (FullNet.py:14-21), replicated here.

FCN_pooling (FullNet.py:141-193) is the pool/upsample variant.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

_HD_DICT = {
    (1, 4): (1, 1, 1, 1), (2, 4): (1, 2, 3, 2), (4, 4): (1, 2, 5, 9),
    (8, 4): (3, 7, 10, 13), (16, 4): (13, 15, 17, 19),
    (1, 6): (1, 1, 1, 1, 1, 1), (2, 6): (1, 2, 3, 1, 2, 3),
    (4, 6): (1, 2, 3, 5, 6, 7), (8, 6): (2, 5, 7, 9, 11, 14),
    (16, 6): (10, 13, 16, 17, 19, 21),
}


def hybrid_dilations(n_layers: int, schedule, is_hybrid: bool):
    """choose_hybrid_dilations (FullNet.py:64-88)."""
    return [
        _HD_DICT[(d, n_layers)] if is_hybrid else (d,) * n_layers
        for d in schedule
    ]


class _ConvLayer(nn.Module):
    """conv -> leaky_relu -> batchnorm (reference ConvLayer order)."""
    features: int
    kernel: tuple[int, int] = (3, 3)
    dilation: int = 1
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, use_bias=False,
                    kernel_dilation=(self.dilation, self.dilation),
                    padding="SAME", dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
        return x


class _DenseBlock(nn.Module):
    growth_rate: int
    drop_rate: float
    dilations: tuple[int, ...]
    layer_type: str = "basic"
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        for d in self.dilations:
            if self.layer_type == "basic":
                out = _ConvLayer(self.growth_rate, dilation=int(d),
                                 dtype=self.dtype)(x, train)
            else:  # bottleneck
                out = _ConvLayer(self.growth_rate * 4, kernel=(1, 1),
                                 dtype=self.dtype)(x, train)
                out = _ConvLayer(self.growth_rate, dilation=int(d),
                                 dtype=self.dtype)(out, train)
            if self.drop_rate > 0:
                out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
            x = jnp.concatenate([x, out], axis=-1)
        return x


class FullNet(nn.Module):
    """Reference `FullNet` (FullNet.py:90-138); returns {"mask": logits}."""
    output_channels: int = 3
    n_layers: int = 6
    growth_rate: int = 24
    compress_ratio: float = 0.5
    drop_rate: float = 0.1
    dilations: tuple[int, ...] = (1, 2, 4, 8, 16, 4, 1)
    is_hybrid: bool = True
    layer_type: str = "basic"
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        in_ch = 24
        x = _ConvLayer(in_ch, dtype=self.dtype)(x, train)
        for dil in hybrid_dilations(self.n_layers, self.dilations, self.is_hybrid):
            x = _DenseBlock(self.growth_rate, self.drop_rate, tuple(dil),
                            self.layer_type, dtype=self.dtype)(x, train)
            num_in = in_ch + self.n_layers * self.growth_rate
            in_ch = int(math.floor(num_in * self.compress_ratio))
            x = _ConvLayer(in_ch, kernel=(1, 1), dtype=self.dtype)(x, train)
        logits = nn.Conv(self.output_channels, (3, 3), use_bias=False,
                         padding="SAME", dtype=jnp.float32,
                         param_dtype=jnp.float32)(x.astype(jnp.float32))
        return {"mask": logits}


class FCNPooling(nn.Module):
    """`FCN_pooling` (FullNet.py:140-193): FullNet body with a 2x2 max-pool
    AFTER blocks 1-4 (blocks run at 1x, 1/2, 1/4, 1/8, 1/16 resolution) and
    a 4x bilinear upsample after blocks 5 and 6 (block 7 and the final conv
    run at full resolution). torch's UpsamplingBilinear2d is
    align_corners=True; jax.image.resize uses half-pixel centers — a
    documented sub-pixel divergence (no reference weight-import path exists
    for this model)."""
    output_channels: int = 3
    n_layers: int = 6
    growth_rate: int = 24
    compress_ratio: float = 0.5
    drop_rate: float = 0.1
    dilations: tuple[int, ...] = (1, 2, 4, 8, 16, 4, 1)
    is_hybrid: bool = True
    layer_type: str = "basic"
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        from cdnet_tpu.models.layers import resize_bilinear
        x = x.astype(self.dtype)
        h, w = x.shape[1], x.shape[2]
        in_ch = 24
        x = _ConvLayer(in_ch, dtype=self.dtype)(x, train)
        dil_list = hybrid_dilations(self.n_layers, self.dilations, self.is_hybrid)
        n = len(dil_list)
        for i, dil in enumerate(dil_list):
            x = _DenseBlock(self.growth_rate, self.drop_rate, tuple(dil),
                            self.layer_type, dtype=self.dtype)(x, train)
            num_in = in_ch + self.n_layers * self.growth_rate
            in_ch = int(math.floor(num_in * self.compress_ratio))
            x = _ConvLayer(in_ch, kernel=(1, 1), dtype=self.dtype)(x, train)
            if i < 4:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif i < 6:
                x = resize_bilinear(x, x.shape[1] * 4, x.shape[2] * 4)
        if x.shape[1] != h or x.shape[2] != w:
            # inputs not divisible by 16: pooling floors, so snap back
            x = resize_bilinear(x, h, w)
        logits = nn.Conv(self.output_channels, (3, 3), use_bias=False,
                         padding="SAME", dtype=jnp.float32,
                         param_dtype=jnp.float32)(x.astype(jnp.float32))
        return {"mask": logits}
