"""Legacy model zoo: SegNet, PSPNet, DeepLabV3+, FCN8 (SURVEY.md §2.2).

The reference carries these architectures (`/root/reference/models/segnet.py`,
`pspnet.py`, `deeplabv3_plus.py`, `fcn8.py`) even though `chooseModel` does
not route to them; re-implemented here as idiomatic flax modules so the
framework's zoo is complete. All return {"mask": logits} at input resolution.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from cdnet_tpu.models.layers import ConvBN, resize_bilinear
from cdnet_tpu.models.resnet import ResNetBackbone
from cdnet_tpu.models.vgg_unet import _VGG16_BLOCKS


def _pool_with_indices(x):
    """2x2 stride-2 max pool returning (pooled, argmax in {0..3} per window).

    Odd spatial dims floor like torch MaxPool2d(2,2): the trailing
    row/column is dropped before windowing (a bare reshape would raise a
    size-mismatch on e.g. 250x250 inputs)."""
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        x = x[:, :h - h % 2, :w - w % 2]
        h, w = x.shape[1], x.shape[2]
    xr = x.reshape(n, h // 2, 2, w // 2, 2, c)
    xr = xr.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4, c)
    idx = jnp.argmax(xr, axis=3)
    pooled = jnp.max(xr, axis=3)
    return pooled, idx


def _unpool_with_indices(x, idx):
    """Inverse of :func:`_pool_with_indices` (torch max_unpool2d semantics)."""
    n, h, w, c = x.shape
    onehot = jax.nn.one_hot(idx, 4, dtype=x.dtype, axis=3)  # (n,h,w,4,c)
    out = x[:, :, :, None, :] * onehot
    out = out.reshape(n, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(n, h * 2, w * 2, c)


class SegNet(nn.Module):
    """SegNet on a VGG16-BN encoder with max-unpooling decoder
    (segnet.py:9-64)."""
    num_classes: int = 3
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        indices = []
        for n_convs, ch in _VGG16_BLOCKS:
            for _ in range(n_convs):
                x = ConvBN(ch, dtype=self.dtype)(x, train)
            x, idx = _pool_with_indices(x)
            indices.append(idx)
        # mirrored decoder
        dec_plan = [(3, 512), (3, 512), (3, 256), (2, 128), (2, 64)]
        out_ch = [512, 256, 128, 64, 64]
        for (n_convs, ch), oc, idx in zip(dec_plan, out_ch, reversed(indices)):
            x = _unpool_with_indices(x, idx)
            for k in range(n_convs):
                feats = oc if k == n_convs - 1 else ch
                x = ConvBN(feats, dtype=self.dtype)(x, train)
        logits = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                         dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32))
        return {"mask": logits}


class _PSPModule(nn.Module):
    """Pyramid pooling (pspnet.py:11-39): bins (1,2,3,6), 1x1 conv, upsample,
    concat, 3x3 bottleneck."""
    out_features: int
    bins: tuple[int, ...] = (1, 2, 3, 6)
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        branch_ch = self.out_features // len(self.bins)
        pyramids = [x]
        for b in self.bins:
            # adaptive average pool to ~(b, b); window clamped for small maps
            ph, pw = max(h // b, 1), max(w // b, 1)
            p = nn.avg_pool(x, (ph, pw), strides=(ph, pw))
            p = ConvBN(branch_ch, kernel=(1, 1), dtype=self.dtype)(p, train)
            pyramids.append(resize_bilinear(p, h, w))
        x = jnp.concatenate(pyramids, axis=-1)
        return ConvBN(self.out_features, dtype=self.dtype)(x, train)


class PSPNet(nn.Module):
    """PSPNet over a ResNet backbone (pspnet.py:41-115)."""
    num_classes: int = 3
    backbone: str = "resnet50"
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        x = x.astype(self.dtype)
        feats, _ = ResNetBackbone(self.backbone, dtype=self.dtype,
                                  name="backbone")(x, train)
        psp = _PSPModule(feats.shape[-1] // 4, dtype=self.dtype)(feats, train)
        psp = nn.Dropout(0.3, deterministic=not train)(psp)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32)(psp.astype(jnp.float32))
        return {"mask": resize_bilinear(logits, h, w)}


class SegResNet(nn.Module):
    """SegNet variant on a ResNet-50 encoder (segnet.py:175-207): encoder
    stages -> bottleneck decoder blocks with 2x upsampling -> 3x3 head."""
    num_classes: int = 3
    backbone: str = "resnet50"
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        x = x.astype(self.dtype)
        feats, _ = ResNetBackbone(self.backbone, dtype=self.dtype,
                                  name="backbone")(x, train)
        ch = feats.shape[-1]
        out = feats
        # 5 decoder bottlenecks: conv1x1 down, conv3x3, upsample, conv1x1
        for _ in range(5):
            ch = max(ch // 2, 64)
            out = ConvBN(ch, kernel=(1, 1), dtype=self.dtype)(out, train)
            out = ConvBN(ch, dtype=self.dtype)(out, train)
            out = resize_bilinear(out, out.shape[1] * 2, out.shape[2] * 2)
        out = resize_bilinear(out, h, w)
        out = ConvBN(64, dtype=self.dtype)(out, train)
        logits = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                         dtype=jnp.float32, param_dtype=jnp.float32)(
            out.astype(jnp.float32))
        return {"mask": logits}


class _DenseBackbone(nn.Module):
    """Compact DenseNet-style encoder for PSPDenseNet (pspnet.py:118-180):
    stem + 4 dense blocks with transitions (stride-2 pooling)."""
    growth_rate: int = 24
    block_layers: tuple[int, ...] = (4, 6, 8, 6)
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        from cdnet_tpu.models.fullnet import _ConvLayer, _DenseBlock
        x = ConvBN(48, kernel=(7, 7), strides=(2, 2), dtype=self.dtype)(x, train)
        for i, n in enumerate(self.block_layers):
            x = _DenseBlock(self.growth_rate, 0.0, (1,) * n,
                            dtype=self.dtype)(x, train)
            x = _ConvLayer(x.shape[-1] // 2, kernel=(1, 1),
                           dtype=self.dtype)(x, train)
            if i < len(self.block_layers) - 1:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class PSPDenseNet(nn.Module):
    """`PSPDenseNet` (pspnet.py:118-180): PSP head over a DenseNet encoder."""
    num_classes: int = 3
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        x = x.astype(self.dtype)
        feats = _DenseBackbone(dtype=self.dtype, name="backbone")(x, train)
        psp = _PSPModule(max(feats.shape[-1] // 4, 64),
                         dtype=self.dtype)(feats, train)
        psp = nn.Dropout(0.3, deterministic=not train)(psp)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32)(psp.astype(jnp.float32))
        return {"mask": resize_bilinear(logits, h, w)}


class _ASPP(nn.Module):
    """Atrous spatial pyramid pooling (deeplabv3_plus.py ASSP block)."""
    features: int = 256
    rates: tuple[int, ...] = (1, 6, 12, 18)
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        branches = []
        for r in self.rates:
            k = (1, 1) if r == 1 else (3, 3)
            branches.append(ConvBN(self.features, kernel=k, dilation=(r, r),
                                   dtype=self.dtype)(x, train))
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = ConvBN(self.features, kernel=(1, 1), dtype=self.dtype)(gp, train)
        branches.append(jnp.broadcast_to(gp, (x.shape[0], h, w, self.features)))
        out = jnp.concatenate(branches, axis=-1)
        return ConvBN(self.features, kernel=(1, 1), dtype=self.dtype)(out, train)


class _SepConv(nn.Module):
    """Depthwise 3x3 -> BN -> pointwise 1x1, no activation
    (deeplabv3_plus.py:70-87 SeparableConv2d). Depthwise = grouped conv with
    feature_group_count=C; torch pad=max(1, dilation) kept symmetric."""
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        p = max(1, self.dilation)
        x = nn.Conv(c, (3, 3), strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=c, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       dtype=self.dtype, param_dtype=jnp.float32)(x)


class _XBlock(nn.Module):
    """Xception residual block of 3 separable convs (deeplabv3_plus.py:89-132).

    Channel plan [relu, sep, bn] x3: normal flow is in->out->out->out with the
    stride on the LAST sep; exit flow is in->in->out->out; ``use_1st_relu``
    False drops the leading relu (block1 only, fed by un-activated bn2)."""
    features: int
    stride: int = 1
    dilation: int = 1
    exit_flow: bool = False
    use_1st_relu: bool = True
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        chans = ([in_c, self.features, self.features] if self.exit_flow
                 else [self.features] * 3)
        out = x
        for i, c in enumerate(chans):
            if i > 0 or self.use_1st_relu:
                out = nn.relu(out)
            out = _SepConv(c, stride=self.stride if i == 2 else 1,
                           dilation=self.dilation, dtype=self.dtype)(out, train)
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               dtype=self.dtype, param_dtype=jnp.float32)(out)
        if in_c != self.features or self.stride != 1:
            skip = nn.Conv(self.features, (1, 1),
                           strides=(self.stride, self.stride), use_bias=False,
                           dtype=self.dtype, param_dtype=jnp.float32)(x)
            skip = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                dtype=self.dtype, param_dtype=jnp.float32)(skip)
        else:
            skip = x
        return out + skip


class XceptionBackbone(nn.Module):
    """Modified Xception-65 encoder (deeplabv3_plus.py:134-247): entry flow
    (stem + 3 strided blocks), 16 middle-flow blocks at 728ch, exit flow with
    dilated separable convs. Returns (stride-16 features 2048ch,
    low-level features 128ch at stride 4)."""
    output_stride: int = 16
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b3_s, mf_d, ef_d = ((2, 1, (1, 2)) if self.output_stride == 16
                            else (1, 2, (2, 4)))
        x = ConvBN(32, strides=(2, 2), padding=((1, 1), (1, 1)),
                   dtype=self.dtype)(x, train)
        # conv2+bn2 with NO relu: block1 starts with a sepconv directly
        x = ConvBN(64, padding=((1, 1), (1, 1)), act=None,
                   dtype=self.dtype)(x, train)
        x = _XBlock(128, stride=2, use_1st_relu=False,
                    dtype=self.dtype)(x, train)
        low = x  # low_level_features before relu (deeplabv3_plus.py:209)
        x = nn.relu(x)
        x = _XBlock(256, stride=2, dtype=self.dtype)(x, train)
        x = _XBlock(728, stride=b3_s, dtype=self.dtype)(x, train)
        for _ in range(16):  # middle flow, blocks 4..19
            x = _XBlock(728, dilation=mf_d, dtype=self.dtype)(x, train)
        x = _XBlock(1024, dilation=ef_d[0], exit_flow=True,
                    dtype=self.dtype)(x, train)
        for c in (1536, 1536, 2048):  # conv3/4/5 + bn + relu
            x = nn.relu(x)
            x = _SepConv(c, dilation=ef_d[1], dtype=self.dtype)(x, train)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, param_dtype=jnp.float32)(x)
        return nn.relu(x), low


class DeepLabV3Plus(nn.Module):
    """DeepLabV3+ (deeplabv3_plus.py:336+). ``backbone``: 'xception' (the
    reference default) or a ResNet name; low-level skip taken at stride 4."""
    num_classes: int = 3
    backbone: str = "resnet50"
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        x = x.astype(self.dtype)
        if "xception" in self.backbone:
            feats, low = XceptionBackbone(dtype=self.dtype,
                                          name="backbone")(x, train)
        else:
            feats, skips = ResNetBackbone(self.backbone, dtype=self.dtype,
                                          name="backbone")(x, train)
            low = skips[1]  # layer1 output (stride 4)
        aspp = _ASPP(dtype=self.dtype)(feats, train)
        aspp = resize_bilinear(aspp, low.shape[1], low.shape[2])
        low = ConvBN(48, kernel=(1, 1), dtype=self.dtype)(low, train)
        x = jnp.concatenate([aspp, low.astype(aspp.dtype)], axis=-1)
        x = ConvBN(256, dtype=self.dtype)(x, train)
        x = ConvBN(256, dtype=self.dtype)(x, train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32)(x.astype(jnp.float32))
        return {"mask": resize_bilinear(logits, h, w)}


class FCN8(nn.Module):
    """FCN-8s on VGG16 (fcn8.py:9+): score heads at pool3/pool4/conv7 fused
    with 2x upsampling, final 8x upsample."""
    num_classes: int = 3
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        x = x.astype(self.dtype)
        pools = []
        for n_convs, ch in _VGG16_BLOCKS:
            for _ in range(n_convs):
                x = ConvBN(ch, dtype=self.dtype)(x, train)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            pools.append(x)
        # conv6/conv7 (fc layers as convs)
        x = ConvBN(1024, kernel=(7, 7), dtype=self.dtype)(pools[4], train)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = ConvBN(1024, kernel=(1, 1), dtype=self.dtype)(x, train)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        f32 = jnp.float32
        score7 = nn.Conv(self.num_classes, (1, 1), dtype=f32,
                         param_dtype=f32)(x.astype(f32))
        score4 = nn.Conv(self.num_classes, (1, 1), dtype=f32,
                         param_dtype=f32)(pools[3].astype(f32))
        score3 = nn.Conv(self.num_classes, (1, 1), dtype=f32,
                         param_dtype=f32)(pools[2].astype(f32))
        up7 = resize_bilinear(score7, score4.shape[1], score4.shape[2])
        fuse4 = up7 + score4
        up4 = resize_bilinear(fuse4, score3.shape[1], score3.shape[2])
        fuse3 = up4 + score3
        return {"mask": resize_bilinear(fuse3, h, w)}
