"""Backbone U-Nets with the DAM head — including the default CDNet model.

Re-design of `/root/reference/models/dam/model_unet_rev1.py:180-320` (and the
MandD* variants, `model_unet_MandD*.py`) on a flax VGG16-BN backbone:

- VGG16-BN encoder (torchvision `features` layout) with skips at the five
  pre-pool ReLUs (torchvision indices 5,12,22,32,42; model_unet_rev1.py:66-67)
- decoder: five parametric UpsampleBlocks with filters (256,128,64,32,16)
- DAM head chain (point -> gated direction -> gated mask), §3.4 of SURVEY.md

`UNetVGG16(with_dam=False)` is the plain `UNet_vgg16` single-head variant
(`/root/reference/models/model_unet.py:133-273`). Pretrained ImageNet weights
import through :mod:`cdnet_tpu.models.weights`.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from cdnet_tpu.models.layers import ConvBN, DAMHead, UpsampleBlock
from cdnet_tpu.ops import pallas_conv

# VGG16 conv plan: (block, channels); skips taken after each block's last relu
_VGG16_BLOCKS = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class VGG16Backbone(nn.Module):
    """torchvision vgg16_bn.features in NHWC; returns (bottom, [skip1..skip5]).

    Layer names mirror torchvision indices (conv_0, conv_3, ...) so pretrained
    state dicts map 1:1 (see models/weights.py).
    """
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        idx = 0
        for n_convs, ch in _VGG16_BLOCKS:
            for _ in range(n_convs):
                conv = nn.Conv(ch, (3, 3), padding="SAME", use_bias=True,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name=f"conv_{idx}")
                norm = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype,
                                    param_dtype=jnp.float32,
                                    name=f"bn_{idx + 1}")
                if (x.shape[-1] == ch and pallas_conv.fused_conv_applicable(
                        train=train, kernel=(3, 3), strides=(1, 1),
                        dilation=(1, 1), padding="SAME", cout=ch,
                        dtype=self.dtype)):
                    # block-1's full-resolution 64->64 conv: route through
                    # the fused supertile kernel (see ConvBN docstring)
                    x = pallas_conv.route_fused(
                        self, conv, norm, x, features=ch, use_bias=True,
                        relu=True, conv_name=f"conv_{idx}",
                        bn_name=f"bn_{idx + 1}")
                elif not train:
                    # BN affine pre-folded into the conv kernel (see
                    # layers.fold_conv_bn: XLA can't fold runtime params)
                    from cdnet_tpu.models.layers import fold_conv_bn
                    x = fold_conv_bn(
                        self, conv, norm, x, features=ch, use_bias=True,
                        act=nn.relu, dtype=self.dtype,
                        conv_name=f"conv_{idx}", bn_name=f"bn_{idx + 1}")
                else:
                    x = nn.relu(norm(conv(x)))
                idx += 3  # conv, bn, relu
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            idx += 1  # pool
        return x, skips


class UNetVGG16(nn.Module):
    """`UNet2RevA1_vgg16` (with_dam=True, the default CDNet-on-UNet model) or
    plain `UNet_vgg16` (with_dam=False)."""
    out_c: int = 3
    direction_classes: int = 9
    with_dam: bool = True
    with_point: bool = True
    with_direction: bool = True
    use_attention: bool = True
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x, skips = VGG16Backbone(dtype=self.dtype, name="backbone")(x, train)
        for feats, skip in zip((256, 128, 64, 32, 16), reversed(skips)):
            x = UpsampleBlock(feats, dtype=self.dtype)(x, skip, train)
        if not self.with_dam:
            # 1x1 projection in self.dtype, small-channel output cast to f32
            # (avoids a full-res f32 input copy; see DAMHead layout note)
            logits = nn.Conv(self.out_c, (1, 1), dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name="final_conv")(x).astype(jnp.float32)
            return {"mask": logits}
        return DAMHead(out_c=self.out_c,
                       direction_classes=self.direction_classes,
                       with_point=self.with_point,
                       with_direction=self.with_direction,
                       use_attention=self.use_attention,
                       dtype=self.dtype, name="dam")(x, train)


def make_vgg_variant(model_name: str, out_c: int = 3, direction_classes: int = 9,
                     dtype=jnp.bfloat16) -> nn.Module:
    """Factory for the reference's VGG-backbone model names
    (`/root/reference/utils.py:816-886`)."""
    name = model_name
    if name == "UNet_vgg16":
        return UNetVGG16(out_c=out_c, with_dam=False, dtype=dtype)
    if name == "UNet2RevA1_vgg16":
        return UNetVGG16(out_c=out_c, direction_classes=direction_classes,
                         dtype=dtype)
    if name == "model_unet_MandD":
        return UNetVGG16(out_c=out_c, direction_classes=9, with_point=False,
                         use_attention=False, dtype=dtype)
    if name == "model_unet_MandD4":
        return UNetVGG16(out_c=out_c, direction_classes=5, with_point=False,
                         use_attention=False, dtype=dtype)
    if name == "model_unet_MandD16":
        return UNetVGG16(out_c=out_c, direction_classes=17, with_point=False,
                         use_attention=False, dtype=dtype)
    if name == "model_unet_MandDandP":
        return UNetVGG16(out_c=out_c, direction_classes=9,
                         use_attention=False, dtype=dtype)
    raise ValueError(f"unknown vgg variant {model_name}")
