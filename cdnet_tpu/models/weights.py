"""Pretrained torch-weight import (torchvision layout -> flax trees).

The reference loads ImageNet-pretrained torchvision backbones
(`/root/reference/models/model_unet_rev1.py:29-41`). This module converts a
torchvision ``state_dict`` (a .pth file the user provides — this environment
has no egress to download one) into the parameter/batch-stats pytrees of
:class:`cdnet_tpu.models.vgg_unet.VGG16Backbone` and
:class:`cdnet_tpu.models.resnet.ResNetBackbone` (SURVEY.md §7 hard part (c)).

Conventions: torch conv kernels are OIHW -> flax HWIO; BatchNorm
weight/bias/running_mean/running_var -> scale/bias/mean/var.
"""
from __future__ import annotations

import numpy as np

from cdnet_tpu.models.resnet import _RESNET_BLOCKS
from cdnet_tpu.models.vgg_unet import _VGG16_BLOCKS


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a .pth state dict into numpy (torch stays host-side)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def _conv(sd, key):
    return np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))


def _bn(sd, key):
    return (
        {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]},
        {"mean": sd[f"{key}.running_mean"], "var": sd[f"{key}.running_var"]},
    )


def import_vgg16_bn(state_dict: dict[str, np.ndarray], prefix: str = ""):
    """torchvision ``vgg16_bn.features`` -> (params, batch_stats) for
    VGG16Backbone. ``prefix``: strip e.g. "features." from torch keys."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    params: dict = {}
    stats: dict = {}
    idx = 0
    for n_convs, _ch in _VGG16_BLOCKS:
        for _ in range(n_convs):
            params[f"conv_{idx}"] = {
                "kernel": _conv(sd, str(idx)),
                "bias": sd[f"{idx}.bias"],
            }
            bn_p, bn_s = _bn(sd, str(idx + 1))
            params[f"bn_{idx + 1}"] = bn_p
            stats[f"bn_{idx + 1}"] = bn_s
            idx += 3
        idx += 1  # pool
    return params, stats


def _convbn(sd, conv_key, bn_key):
    """torch conv(+bn) pair -> our ConvBN submodule tree."""
    p = {"Conv_0": {"kernel": _conv(sd, conv_key)}}
    bn_p, bn_s = _bn(sd, bn_key)
    return ({**p, "BatchNorm_0": bn_p}, {"BatchNorm_0": bn_s})


def import_resnet(state_dict: dict[str, np.ndarray], variant: str = "resnet50"):
    """torchvision resnet -> (params, batch_stats) for ResNetBackbone."""
    sd = state_dict
    kind, blocks = _RESNET_BLOCKS[variant]
    params: dict = {}
    stats: dict = {}
    params["stem"], stats["stem"] = _convbn(sd, "conv1", "bn1")
    n_convs = 3 if kind == "bottleneck" else 2
    for li, n in enumerate(blocks):
        for b in range(n):
            t = f"layer{li + 1}.{b}"
            name = f"layer{li + 1}_{b}"
            bp: dict = {}
            bs: dict = {}
            for ci in range(n_convs):
                sub_p, sub_s = _convbn(sd, f"{t}.conv{ci + 1}", f"{t}.bn{ci + 1}")
                bp[f"conv{ci + 1}"] = sub_p
                bs[f"conv{ci + 1}"] = sub_s
            if f"{t}.downsample.0.weight" in sd:
                sub_p, sub_s = _convbn(sd, f"{t}.downsample.0", f"{t}.downsample.1")
                bp["downsample"] = sub_p
                bs["downsample"] = sub_s
            params[name] = bp
            stats[name] = bs
    return params, stats


def graft_backbone(variables: dict, backbone_params: dict,
                   backbone_stats: dict, backbone_name: str = "backbone"):
    """Replace the backbone subtree of a model's variables in-place-style.

    Returns new ``{"params", "batch_stats"}`` with the imported backbone.
    Shapes are validated leaf-by-leaf against the initialized tree.
    """
    import jax

    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))

    def check(tree_new, tree_old, path=""):
        for k, v in tree_new.items():
            if isinstance(v, dict):
                check(v, tree_old[k], f"{path}/{k}")
            else:
                old = tree_old[k]
                assert tuple(v.shape) == tuple(np.shape(old)), (
                    f"shape mismatch at {path}/{k}: {v.shape} vs {np.shape(old)}")

    check(backbone_params, params[backbone_name])
    params[backbone_name] = jax.tree.map(np.asarray, backbone_params)
    if backbone_name in stats:
        check(backbone_stats, stats[backbone_name])
        stats[backbone_name] = jax.tree.map(np.asarray, backbone_stats)
    return {"params": params, "batch_stats": stats}
