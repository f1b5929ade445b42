"""Shared model building blocks (flax.linen, NHWC, MXU-friendly dtypes).

TPU-native re-expressions of the reference's torch blocks:
- ResidualUnit / revAttention / DAM head chain
  (`/root/reference/models/dam/model_unet_rev1.py:8-17,150-170,224-266`)
- UpsampleBlock (`model_unet_rev1.py:86-143`)

Conventions: all tensors NHWC; ``dtype`` is the activation/compute dtype
(bfloat16 by default at call sites — conv/matmul hit the MXU), parameters and
batch-norm statistics stay float32.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cdnet_tpu.ops import packed_conv, pallas_conv

Dtype = Any


class ConvBN(nn.Module):
    """Conv -> BatchNorm -> (optional) activation; the XLA-fused workhorse.

    At inference on TPU, stride-1 SAME 3x3 convs with 16/18 output channels
    route through the fused Pallas supertile kernel
    (:mod:`cdnet_tpu.ops.pallas_conv`): XLA runs such lane-starved convs at
    2-9 TF/s (measured A/B, experiments/PERF.md §5) — the decoder tail and
    HRNet's branch-0 shapes.
    The BN affine and ReLU fold into the kernel's f32 epilogue, so the
    whole block is one HBM round-trip. Training and all other shapes keep
    the XLA path (same parameters either way — checkpoint layout is
    unchanged)."""
    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = False
    act: Callable | None = nn.relu
    bn: bool = True
    bn_momentum: float = 0.9
    dtype: Dtype = jnp.bfloat16
    dilation: tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = nn.Conv(self.features, self.kernel, strides=self.strides,
                       padding=self.padding, use_bias=self.use_bias,
                       kernel_dilation=self.dilation, name="Conv_0",
                       dtype=self.dtype, param_dtype=jnp.float32)
        norm = nn.BatchNorm(use_running_average=not train,
                            momentum=self.bn_momentum, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name="BatchNorm_0") if self.bn else None
        if (packed_conv.packed_conv_applicable(
                train=train, kernel=self.kernel, strides=self.strides,
                dilation=self.dilation, padding=self.padding,
                cout=self.features, dtype=self.dtype)
                and self.act in (nn.relu, None)):
            # width-packed XLA conv: beats both XLA-native and the Pallas
            # supertile kernel at HRNet's Cout=18 (packed_conv docstring)
            return packed_conv.route_packed(
                self, conv, norm, x, features=self.features,
                use_bias=self.use_bias, relu=self.act is nn.relu)
        if (pallas_conv.fused_conv_applicable(
                train=train, kernel=self.kernel, strides=self.strides,
                dilation=self.dilation, padding=self.padding,
                cout=self.features, dtype=self.dtype)
                and self.act in (nn.relu, None)):
            return pallas_conv.route_fused(
                self, conv, norm, x, features=self.features,
                use_bias=self.use_bias, relu=self.act is nn.relu)
        x = conv(x)
        if norm is not None:
            x = norm(x)
        if self.act is not None:
            x = self.act(x)
        return x


class ResidualUnit(nn.Module):
    """conv3x3-bn-relu-conv3x3-bn + 1x1 shortcut, relu (model_unet_rev1.py:150-170)."""
    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = nn.Conv(self.features, (1, 1), use_bias=True,
                           dtype=self.dtype, param_dtype=jnp.float32)(x)
        out = ConvBN(self.features, dtype=self.dtype)(x, train)
        out = ConvBN(self.features, act=None, dtype=self.dtype)(out, train)
        return nn.relu(out + residual)


class RevAttention(nn.Module):
    """U * (1 + sigmoid(conv1x1(V))) gating (model_unet_rev1.py:8-17)."""
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, u, v):
        q = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(v)
        return u * (1.0 + jax.nn.sigmoid(q))


class DAMHead(nn.Module):
    """Direction-Aware Module head (model_unet_rev1.py:224-266; §3.4 SURVEY).

    x -> F1 = ResidualUnit(.->64)        (mask feature)
      -> F2 = ResidualUnit(64->64)       (direction feature)
      -> F3 = ResidualUnit(64->64)       (point feature)
    point     = conv1x1(F3)                                     -> 1ch
    direction = conv1x1( F2 * (1+sigma(conv1x1(point))) )       -> 9ch
    mask      = conv1x1( F1 * (1+sigma(conv1x1(direction))) )   -> 3ch

    ``use_attention=False`` + ``with_point=False`` gives the MandD variants
    (model_unet_MandD.py:258-266); ``direction_classes`` covers MandD4/16.
    Heads cast to float32 so logits/losses stay full precision.
    """
    out_c: int = 3
    direction_classes: int = 9
    with_point: bool = True
    with_direction: bool = True
    use_attention: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # The 1x1 projections run in self.dtype and cast their (1/9/3-channel)
        # OUTPUT to f32: the previous input-side `.astype(f32)` materialized a
        # full-resolution 64-channel f32 copy per head (2.1 GB/view-batch at
        # 8x1024^2 — pure HBM traffic). The MXU accumulates in f32 either way;
        # only the logits' final rounding changes (bf16-grade, well inside the
        # 2e-3 torch-parity band). With dtype=float32 nothing changes.
        f32 = jnp.float32
        x_f1 = ResidualUnit(64, dtype=self.dtype, name="mask_feature")(x, train)
        outputs = {}
        x_direction = None
        if self.with_direction or self.with_point:
            x_f2 = ResidualUnit(64, dtype=self.dtype, name="direction_feature")(x_f1, train)
        if self.with_point:
            x_f3 = ResidualUnit(64, dtype=self.dtype, name="point_feature")(x_f2, train)
            x_point = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=f32,
                              name="point_conv")(x_f3).astype(f32)
            outputs["point"] = x_point
        if self.with_direction:
            feat = x_f2
            if self.use_attention and self.with_point:
                feat = RevAttention(dtype=self.dtype, name="directionAtt")(
                    x_f2, x_point.astype(self.dtype))
            x_direction = nn.Conv(self.direction_classes, (1, 1),
                                  dtype=self.dtype, param_dtype=f32,
                                  name="direction_conv")(feat).astype(f32)
            outputs["direction"] = x_direction
        feat1 = x_f1
        if self.use_attention and self.with_direction:
            feat1 = RevAttention(dtype=self.dtype, name="maskAtt")(
                x_f1, x_direction.astype(self.dtype))
        outputs["mask"] = nn.Conv(self.out_c, (1, 1), dtype=self.dtype,
                                  param_dtype=f32,
                                  name="mask_conv")(feat1).astype(f32)
        return outputs


class UpsampleBlock(nn.Module):
    """Transposed-conv 2x upsample + skip concat + conv-bn-relu
    (model_unet_rev1.py:86-143, parametric mode)."""
    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        convt = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=False,
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name="ConvTranspose_0")
        norm = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="BatchNorm_0")
        if pallas_conv.phase_convt_applicable(train=train):
            # convT(4,4,s2)+BN+ReLU == phase-decomposed 3x3 XLA conv +
            # folded affine + depth-to-space (2-4x over XLA's native
            # conv_transpose at the up5 shape — PERF.md §5)
            x = pallas_conv.route_fused_convt(self, convt, norm, x,
                                              features=self.features)
        else:
            x = nn.relu(norm(convt(x)))
        if skip is not None:
            dh = skip.shape[1] - x.shape[1]
            dw = skip.shape[2] - x.shape[2]
            if dh or dw:
                x = jnp.pad(x, ((0, 0), (dh // 2, dh - dh // 2),
                                (dw // 2, dw - dw // 2), (0, 0)))
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = ConvBN(self.features, dtype=self.dtype)(x, train)
        return x


def resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize (half-pixel centers == torch align_corners=False).

    Integer upscales (HRNet's 2/4/8x branch-fusion exchanges) route through
    the phase-blend formulation instead of jax.image.resize's per-axis
    dense-dot lowering — see :mod:`cdnet_tpu.ops.upsample`."""
    from cdnet_tpu.ops.upsample import resize_bilinear_fast
    return resize_bilinear_fast(x, h, w)
