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
                cout=self.features, dtype=self.dtype, cin=x.shape[-1])
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
        if norm is not None and not train:
            return fold_conv_bn(self, conv, norm, x, features=self.features,
                                use_bias=self.use_bias, act=self.act,
                                strides=self.strides, padding=self.padding,
                                dilation=self.dilation, dtype=self.dtype)
        x = conv(x)
        if norm is not None:
            x = norm(x)
        if self.act is not None:
            x = self.act(x)
        return x


def fold_conv_bn(parent, conv, norm, x, *, features, use_bias, act,
                 strides=(1, 1), padding="SAME", dilation=(1, 1),
                 dtype=jnp.bfloat16, conv_name="Conv_0",
                 bn_name="BatchNorm_0"):
    """Inference Conv+BN(+act) with the BN affine PRE-FOLDED into the conv
    kernel: conv(x, k*scale) + offset.

    XLA cannot do this fold itself (kernel and BN affine are both runtime
    parameters, not constants), and the post-conv mul+add only partially
    fuses — measured +1.71 ms per 64ch full-res ConvBN vs the bare conv on
    v5e, of which pre-folding recovers 0.65 ms (experiments/dam_head_ab.py).
    Binds the identical parameter tree via dead calls (same recipe as
    pallas_conv.route_fused). Exact math up to bf16 kernel rounding."""
    y = conv(x[:1, :1, :1, :])
    norm(y)
    p = parent.variables["params"]
    scale, offset = pallas_conv.fold_affine(
        features, p[conv_name]["bias"] if use_bias else None,
        p[bn_name], parent.variables["batch_stats"][bn_name])
    k = (p[conv_name]["kernel"].astype(jnp.float32) * scale).astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k, strides, padding, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = (y + offset).astype(dtype)
    return act(y) if act is not None else y


class ResidualUnit(nn.Module):
    """conv3x3-bn-relu-conv3x3-bn + 1x1 shortcut, relu (model_unet_rev1.py:150-170).

    ``x`` may also be a LIST of NHWC tensors at dyadically coarser
    resolutions (HRNet's four branch outputs, seg_hrnet_rev1.py:527-533):
    the unit then behaves exactly as if called on
    ``concat([x0, up(x1), ..])`` but never materializes the concatenated
    tensor — the 3x3 conv and the 1x1 shortcut are linear in the input, so
    their kernels split along Cin into per-branch blocks whose partial
    results are summed in f32. The 270-channel full-res concat is
    lane-padded to 384 on TPU (a ~40% HBM tax on a 4.5 GB tensor at
    8x1024^2) and its relayout dominated the r4 HRNet bisection's `cat`
    stage (159 ms vs ~6 ms SOL, PERF.md §7); the split path avoids both
    the pad and the concat round-trip. Inference only (BN uses running
    stats); parameter tree is IDENTICAL to the dense path.
    """
    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = nn.Conv(self.features, (1, 1), use_bias=True,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="Conv_0")
        cbn1 = ConvBN(self.features, dtype=self.dtype, name="ConvBN_0")
        cbn2 = ConvBN(self.features, act=None, dtype=self.dtype,
                      name="ConvBN_1")
        if isinstance(x, (list, tuple)) and not train:
            branches = [t.astype(self.dtype) for t in x]
            cin = sum(t.shape[-1] for t in branches)
            # bind the identical param tree via dead 1x1-spatial calls
            dummy = jnp.zeros((1, 1, 1, cin), self.dtype)
            shortcut(dummy)
            cbn1(dummy, train)
            p = self.variables["params"]
            bs = self.variables.get("batch_stats", {})
            out = _split_conv3x3_bn_relu(
                branches, p["ConvBN_0"]["Conv_0"]["kernel"],
                p["ConvBN_0"]["BatchNorm_0"],
                bs["ConvBN_0"]["BatchNorm_0"], self.dtype)
            residual = _split_conv1x1(
                branches, p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
                self.dtype)
        else:
            if isinstance(x, (list, tuple)):  # train: dense fallback
                x = _materialized_concat(x, self.dtype)
            residual = shortcut(x)
            out = cbn1(x, train)
        out = cbn2(out, train)
        return nn.relu(out + residual)


def _upsampled_branches(branches, dtype):
    """Branches [x0, x1, ..] -> each bilinearly upsampled to x0's res.

    Exactly the per-branch tensors whose concat HRNet's head consumes
    (seg_hrnet_rev1.py:527-533) — kept separate so consumers can split
    linear ops over them instead of materializing the concat."""
    h, w = branches[0].shape[1], branches[0].shape[2]
    return [branches[0].astype(dtype)] + [
        resize_bilinear(t.astype(dtype), h, w) for t in branches[1:]]


def _materialized_concat(branches, dtype):
    return jnp.concatenate(_upsampled_branches(branches, dtype), axis=-1)


def _channel_offsets(ups):
    offs = [0]
    for t in ups:
        offs.append(offs[-1] + t.shape[-1])
    return offs


def _int_scale(t, h, w):
    """Integer (sh == sw) upsample factor from t's resolution to (h, w),
    or None when the resize isn't an integer upscale."""
    th, tw = t.shape[1], t.shape[2]
    if th and tw and h % th == 0 and w % tw == 0 and h // th == w // tw:
        return h // th
    return None


def _split_conv3x3_bn_relu(branches, kernel, bn_params, bn_stats, dtype):
    """relu(BN(conv3x3(concat(upsampled branches), kernel))) without the
    concat OR the upsamples: the conv is linear in Cin, so
    kernel[:, :, lo:hi, :] blocks serve each branch, and for integer
    upsample factors conv3x3(up_s(t)) collapses into one LOW-resolution
    composite conv (ops/upconv.py) — s^2*Cout dense output lanes on an
    s^2-smaller grid, no 0.6-2.4 GB upsampled branch tensors in HBM.

    Partials are cast to ``dtype`` before the sum: four live full-res f32
    partials (2.1 GB each at 8x1024^2x64) OOM'd the 16 GB v5e in the r5
    HRNet bisection. Each conv still accumulates in f32 internally
    (preferred_element_type); only the 4-term cross-branch sum rounds at
    ``dtype`` — in f32 mode nothing changes."""
    from cdnet_tpu.ops import upconv
    h, w = branches[0].shape[1], branches[0].shape[2]
    offs = _channel_offsets(branches)
    cout = kernel.shape[-1]
    # width-pack factor of the ACCUMULATOR: partial sums live at dense
    # lane occupancy ((B,H,W/4,4*64) is 1.0 GB physical where the dense
    # 64-ch twin is 2.0 GB lane-padded — packed accumulation halved the
    # head-merge peak that OOM'd the 16 GB v5e in r5)
    S = branches[0].s if isinstance(branches[0], packed_conv.PackedArray) \
        else (4 if w % 4 == 0 else 1)
    scales = [_int_scale(t, h, w) for t in branches]
    if S == 1 or any(s is None for s in scales):
        return _split_conv3x3_bn_relu_dense(branches, kernel, bn_params,
                                            bn_stats, dtype)
    ones = jnp.ones((cout,), jnp.float32)
    zero = jnp.zeros((cout,), jnp.float32)
    acc = None
    corr = None
    for i, t in enumerate(branches):
        ki = kernel[:, :, offs[i]:offs[i + 1], :].astype(dtype)
        if isinstance(t, packed_conv.PackedArray) \
                and t.shape[1:3] == (h, w) and t.s == S:
            # packed branch AT target res (HRNet branch 0): conv packed
            # (dense s*Cout lanes; 1.19 vs 5.38 ms native at 18->64)
            yi = packed_conv.packed_conv3x3_pre(
                t.data, ki, ones, zero, relu=False, s=S)
        else:
            td = t.unpack() if isinstance(t, packed_conv.PackedArray) else t
            s = _int_scale(td, h, w)
            if s == 1:  # same-res dense branch: direct conv, packed out
                yi = packed_conv.pack(jax.lax.conv_general_dilated(
                    td, ki, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(dtype), S)
            else:
                yi, ci = upconv.conv3x3_of_upsampled_packed(td, ki, s, S)
                corr = ci if corr is None else jax.tree_util.tree_map(
                    jnp.add, corr, ci)
        acc = yi if acc is None else acc + yi
    if corr is not None:
        acc = upconv.apply_border_corrections_packed(acc, corr, cout, S)
    scale, offset = pallas_conv.fold_affine(
        kernel.shape[-1], None, bn_params, bn_stats)
    out = jnp.maximum(acc.astype(jnp.float32) * jnp.tile(scale, S)
                      + jnp.tile(offset, S), 0.0).astype(dtype)
    return packed_conv.unpack(out, S)


def _split_conv3x3_bn_relu_dense(branches, kernel, bn_params, bn_stats,
                                 dtype):
    """Dense fallback (non-integer resize ratios or odd widths)."""
    from cdnet_tpu.ops.upconv import conv3x3_of_upsampled
    h, w = branches[0].shape[1], branches[0].shape[2]
    offs = _channel_offsets(branches)
    acc = None
    for i, t in enumerate(branches):
        ki = kernel[:, :, offs[i]:offs[i + 1], :].astype(dtype)
        if isinstance(t, packed_conv.PackedArray):
            t = t.unpack()
        s = _int_scale(t, h, w)
        if s is not None:
            yi = conv3x3_of_upsampled(t, ki, s)
        else:  # non-integer ratio: materialize the resize
            yi = jax.lax.conv_general_dilated(
                resize_bilinear(t, h, w), ki, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(dtype)
        acc = yi if acc is None else acc + yi
    scale, offset = pallas_conv.fold_affine(
        kernel.shape[-1], None, bn_params, bn_stats)
    return jnp.maximum(acc.astype(jnp.float32) * scale + offset,
                       0.0).astype(dtype)


def _split_conv1x1(branches, kernel, bias, dtype):
    """conv1x1(concat(upsampled branches)) + bias, with each 1x1 conv run
    at the branch's OWN resolution: a pointwise conv commutes exactly with
    bilinear interpolation (up acts per channel, conv per pixel), so
    conv1x1(up(t)) == up(conv1x1(t)) — the upsample then moves 64 output
    channels instead of the branch's input channels. Partials accumulate
    WIDTH-PACKED (dense lanes; memory — see _split_conv3x3_bn_relu) and
    cast to ``dtype`` before the sum."""
    h, w = branches[0].shape[1], branches[0].shape[2]
    offs = _channel_offsets(branches)
    cout = kernel.shape[-1]
    S = branches[0].s if isinstance(branches[0], packed_conv.PackedArray) \
        else (4 if w % 4 == 0 else 1)
    acc = None
    for i, t in enumerate(branches):
        ki = kernel[:, :, offs[i]:offs[i + 1], :].astype(dtype)
        if isinstance(t, packed_conv.PackedArray) \
                and t.shape[1:3] == (h, w) and t.s == S:
            yi = packed_conv.packed_conv1x1(t.data, ki, S)
        else:
            td = t.unpack() if isinstance(t, packed_conv.PackedArray) else t
            yi = jax.lax.conv_general_dilated(
                td, ki, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(dtype)
            if yi.shape[1] != h or yi.shape[2] != w:
                yi = resize_bilinear(yi, h, w)
            if S > 1:
                yi = packed_conv.pack(yi, S)
        acc = yi if acc is None else acc + yi
    if S > 1:
        out = (acc.astype(jnp.float32)
               + jnp.tile(bias.astype(jnp.float32), S)).astype(dtype)
        return packed_conv.unpack(out, S)
    return (acc.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


class RevAttention(nn.Module):
    """U * (1 + sigmoid(conv1x1(V))) gating (model_unet_rev1.py:8-17).

    ``return_gate=True`` returns only the per-pixel scalar gate
    (1 + sigmoid(conv1x1(V))) — same parameters, no U read. The gate is a
    SCALAR per pixel, so it commutes through any following 1x1 conv:
    conv1x1(U * g) + b == g * conv1x1(U) + b == g * (conv1x1_b(U) - b) + b.
    DAMHead uses this at inference to apply the gate on the 9/3-channel
    projection OUTPUT instead of the 64-channel input (1.07 GB at
    8x1024^2 bf16) — measured 1.17x on the gate+projection pair
    (experiments/dam_head_ab.py), drift is bf16 rounding only."""
    dtype: Dtype = jnp.bfloat16
    return_gate: bool = False

    @nn.compact
    def __call__(self, u, v):
        q = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(v)
        gate = 1.0 + jax.nn.sigmoid(q)
        if self.return_gate:
            return gate
        return u * gate


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
        # At inference the revAttention gates commute through the 1x1
        # projections (they are per-pixel scalars — see RevAttention):
        # conv(U*g) + b == g*(conv_b(U) - b) + b, applied on the 9/3-channel
        # OUTPUT instead of the 64-channel input. Train keeps the reference
        # order (model_unet_rev1.py:259-263) so autodiff sees the same graph
        # shape the torch parity oracles pin.
        commute = not train
        if self.with_direction:
            dir_conv = nn.Conv(self.direction_classes, (1, 1),
                               dtype=self.dtype, param_dtype=f32,
                               name="direction_conv")
            gated = self.use_attention and self.with_point
            if gated and commute:
                g = RevAttention(dtype=self.dtype, name="directionAtt",
                                 return_gate=True)(
                    x_f2, x_point.astype(self.dtype))
                y = dir_conv(x_f2).astype(f32)
                b = self.variables["params"]["direction_conv"]["bias"]
                x_direction = g.astype(f32) * (y - b) + b
            else:
                feat = x_f2
                if gated:
                    feat = RevAttention(dtype=self.dtype,
                                        name="directionAtt")(
                        x_f2, x_point.astype(self.dtype))
                x_direction = dir_conv(feat).astype(f32)
            outputs["direction"] = x_direction
        mask_conv = nn.Conv(self.out_c, (1, 1), dtype=self.dtype,
                            param_dtype=f32, name="mask_conv")
        gated1 = self.use_attention and self.with_direction
        if gated1 and commute:
            g1 = RevAttention(dtype=self.dtype, name="maskAtt",
                              return_gate=True)(
                x_f1, x_direction.astype(self.dtype))
            y1 = mask_conv(x_f1).astype(f32)
            b1 = self.variables["params"]["mask_conv"]["bias"]
            outputs["mask"] = g1.astype(f32) * (y1 - b1) + b1
        else:
            feat1 = x_f1
            if gated1:
                feat1 = RevAttention(dtype=self.dtype, name="maskAtt")(
                    x_f1, x_direction.astype(self.dtype))
            outputs["mask"] = mask_conv(feat1).astype(f32)
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
