"""ResNet backbones + ResNet-UNet variants (`UNet_resnet50/101`).

Re-design of the reference's torchvision-backbone UNet
(`/root/reference/models/model_unet.py:133-273`) over flax ResNets:
skips at [None, relu, layer1, layer2, layer3], bottleneck at layer4,
five parametric UpsampleBlocks with filters (256,128,64,32,16) — the first
block has no skip (ResNets have no full-resolution feature).

Layer naming mirrors torchvision (conv1/bn1/layerN_M.conv...) so pretrained
state dicts map 1:1 (see models/weights.py).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from cdnet_tpu.models.layers import ConvBN, UpsampleBlock

_RESNET_BLOCKS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


class _BasicBlock(nn.Module):
    features: int
    strides: tuple[int, int] = (1, 1)
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBN(self.features, strides=self.strides,
                     padding=((1, 1), (1, 1)), dtype=self.dtype,
                     name="conv1")(x, train)
        out = ConvBN(self.features, act=None, padding=((1, 1), (1, 1)),
                     dtype=self.dtype, name="conv2")(out, train)
        if residual.shape != out.shape:
            residual = ConvBN(self.features, kernel=(1, 1),
                              strides=self.strides, act=None,
                              dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + residual)


class _Bottleneck(nn.Module):
    features: int
    strides: tuple[int, int] = (1, 1)
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * 4
        residual = x
        out = ConvBN(self.features, kernel=(1, 1), dtype=self.dtype,
                     name="conv1")(x, train)
        out = ConvBN(self.features, strides=self.strides,
                     padding=((1, 1), (1, 1)), dtype=self.dtype,
                     name="conv2")(out, train)
        out = ConvBN(out_ch, kernel=(1, 1), act=None, dtype=self.dtype,
                     name="conv3")(out, train)
        if residual.shape != out.shape:
            residual = ConvBN(out_ch, kernel=(1, 1), strides=self.strides,
                              act=None, dtype=self.dtype,
                              name="downsample")(x, train)
        return nn.relu(out + residual)


class ResNetBackbone(nn.Module):
    """torchvision-layout ResNet; returns (bottleneck, [skip_relu, l1, l2, l3])."""
    variant: str = "resnet50"
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        kind, blocks = _RESNET_BLOCKS[self.variant]
        block_cls = _Bottleneck if kind == "bottleneck" else _BasicBlock
        # torch pad=3 stride-2 semantics (SAME would pad (2,3) on even
        # sizes and shift the sample grid by one pixel)
        x = ConvBN(64, kernel=(7, 7), strides=(2, 2),
                   padding=((3, 3), (3, 3)), dtype=self.dtype,
                   name="stem")(x, train)
        skips = [x]  # 'relu'
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for li, (feats, n) in enumerate(zip((64, 128, 256, 512), blocks)):
            for b in range(n):
                strides = (2, 2) if (b == 0 and li > 0) else (1, 1)
                x = block_cls(feats, strides=strides, dtype=self.dtype,
                              name=f"layer{li + 1}_{b}")(x, train)
            if li < 3:
                skips.append(x)
        return x, skips


class UNetResNet(nn.Module):
    """`UNet_resnet50` / `UNet_resnet101` (model_unet.py semantics)."""
    out_c: int = 3
    variant: str = "resnet50"
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x, skips = ResNetBackbone(self.variant, dtype=self.dtype,
                                  name="backbone")(x, train)
        # skip order: [relu, layer1, layer2, layer3] -> reversed; first
        # upsample block has NO skip (feature_names start with None)
        skip_list = [skips[3], skips[2], skips[1], skips[0], None]
        for feats, skip in zip((256, 128, 64, 32, 16), skip_list):
            x = UpsampleBlock(feats, dtype=self.dtype)(x, skip, train)
        logits = nn.Conv(self.out_c, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32,
                         name="final_conv")(x).astype(jnp.float32)
        return {"mask": logits}
