"""Model zoo + factory (parity with `/root/reference/utils.py:816-886` chooseModel)."""
from __future__ import annotations

import jax.numpy as jnp

from cdnet_tpu.models.fullnet import FCNPooling, FullNet
from cdnet_tpu.models.hrnet import HRNet18DAM
from cdnet_tpu.models.legacy import (FCN8, DeepLabV3Plus, PSPDenseNet,
                                     PSPNet, SegNet, SegResNet)
from cdnet_tpu.models.resnet import ResNetBackbone, UNetResNet
from cdnet_tpu.models.unet import UNet
from cdnet_tpu.models.vgg_unet import UNetVGG16, make_vgg_variant

_VGG_NAMES = (
    "UNet_vgg16", "UNet2RevA1_vgg16", "model_unet_MandD", "model_unet_MandD4",
    "model_unet_MandD16", "model_unet_MandDandP",
)


def choose_model(cfg):
    """`utils.chooseModel(opt)` parity: model-name string -> flax module.

    Accepts a :class:`cdnet_tpu.config.Config` (uses cfg.model.*).
    """
    # arm the fused-conv fallback eagerly, before any model.init can trace
    # the Pallas kernel (a Mosaic failure then degrades to XLA convs
    # instead of crashing the first compile that touches it)
    from cdnet_tpu.ops import pallas_cc, pallas_conv
    pallas_conv.ensure_tpu_kernel_or_disable()
    pallas_cc.ensure_tpu_kernel_or_disable()
    m = cfg.model
    dtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else jnp.float32
    name = m.model_name
    if name == "UNet":
        return UNet(num_classes=m.out_c, dtype=dtype)
    if name == "FullNet":
        return FullNet(output_channels=m.out_c, n_layers=m.n_layers,
                       growth_rate=m.growth_rate, compress_ratio=m.compress_ratio,
                       drop_rate=m.drop_rate, dilations=tuple(m.dilations),
                       is_hybrid=m.is_hybrid, layer_type=m.layer_type, dtype=dtype)
    if name == "FCN_pooling":
        return FCNPooling(output_channels=m.out_c, n_layers=m.n_layers,
                          growth_rate=m.growth_rate, compress_ratio=m.compress_ratio,
                          drop_rate=m.drop_rate, dilations=tuple(m.dilations),
                          is_hybrid=m.is_hybrid, layer_type=m.layer_type, dtype=dtype)
    if name in _VGG_NAMES:
        return make_vgg_variant(name, out_c=m.out_c,
                                direction_classes=m.direction_classes, dtype=dtype)
    if name == "HRNet18_rev1":
        return HRNet18DAM(out_c=m.out_c, direction_classes=m.direction_classes,
                          dtype=dtype)
    if name == "HRNet18":  # plain HRNet head (seg_hrnet.py)
        return HRNet18DAM(out_c=m.out_c, with_dam=False, dtype=dtype)
    if name in ("UNet_resnet50", "UNet_resnet101"):
        return UNetResNet(out_c=m.out_c, variant=name.split("_")[1], dtype=dtype)
    if name == "SegNet":
        return SegNet(num_classes=m.out_c, dtype=dtype)
    if name == "PSPNet":
        return PSPNet(num_classes=m.out_c, dtype=dtype)
    if name == "PSPDenseNet":
        return PSPDenseNet(num_classes=m.out_c, dtype=dtype)
    if name == "SegResNet":
        return SegResNet(num_classes=m.out_c, dtype=dtype)
    if name == "DeepLab":
        # reference default backbone is xception (deeplabv3_plus.py:337)
        bb = m.backbone if m.backbone not in ("None", "") else "xception"
        return DeepLabV3Plus(num_classes=m.out_c, backbone=bb, dtype=dtype)
    if name == "FCN8":
        return FCN8(num_classes=m.out_c, dtype=dtype)
    raise ValueError(f"unknown modelName: {name}")


__all__ = ["UNet", "FullNet", "FCNPooling", "UNetVGG16", "HRNet18DAM",
           "make_vgg_variant", "choose_model"]
