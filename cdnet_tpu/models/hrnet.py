"""HRNet-W18-small with the DAM head — the CDNet paper model (`HRNet18_rev1`).

Re-design of `/root/reference/models/dam/seg_hrnet_rev1.py:289-568` with the
hardcoded config (seg_hrnet_rev1.py:292-325):

- stem: two stride-1 3x3 convs to 64ch (FULL resolution — no downsampling stem)
- stage1: 2 Bottleneck(64) blocks -> 256ch
- stage2: 1 module x 2 branches, BASIC x2, channels (18, 36)
- stage3: 3 modules x 3 branches, BASIC x2, channels (18, 36, 72)
- stage4: 2 modules x 4 branches, BASIC x2, channels (18, 36, 72, 144)
- head: bilinear-upsample branches 1..3 to branch-0 resolution, concat (270ch),
  then the same DAM chain as model_unet_rev1 (seg_hrnet_rev1.py:527-548)

Multi-branch fusion keeps every exchange as conv+resize on NHWC tensors so XLA
fuses the elementwise sums; bilinear resize uses half-pixel centers (torch
align_corners=False parity).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from cdnet_tpu.models.layers import ConvBN, DAMHead, resize_bilinear
from cdnet_tpu.ops import packed_conv as pc
from cdnet_tpu.ops import pallas_conv


def _folded_convbn(parent, subtree: str):
    """(kernel, scale, offset) of a bound ConvBN submodule — the packed
    primitives apply BN as a folded post-affine (fold_conv_bn math)."""
    p = parent.variables["params"][subtree]
    bs = parent.variables["batch_stats"][subtree]
    kernel = p["Conv_0"]["kernel"]
    scale, offset = pallas_conv.fold_affine(
        kernel.shape[-1], None, p["BatchNorm_0"], bs["BatchNorm_0"])
    return kernel, scale, offset


class BasicBlock(nn.Module):
    features: int
    strides: tuple[int, int] = (1, 1)
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, pc.PackedArray):
            # persistent-packed branch-0 path (inference): both ConvBNs run
            # packed-in -> packed-out; the residual add + relu stay packed,
            # so the dense lane-padded 18-ch map never exists. Bind the
            # identical param tree via dead dense calls (XLA DCEs them).
            cbn1 = ConvBN(self.features, strides=self.strides,
                          dtype=self.dtype)
            cbn2 = ConvBN(self.features, act=None, dtype=self.dtype)
            dummy = jnp.zeros((1, 4, 4, x.shape[-1]), self.dtype)
            cbn2(cbn1(dummy, train), train)
            k1, s1, o1 = _folded_convbn(self, "ConvBN_0")
            k2, s2, o2 = _folded_convbn(self, "ConvBN_1")
            out = pc.packed_conv3x3_pre(x.data, k1, s1, o1, relu=True, s=x.s)
            out = pc.packed_conv3x3_pre(out, k2, s2, o2, relu=False, s=x.s)
            return pc.PackedArray(jnp.maximum(out + x.data, 0.0), x.s)
        residual = x
        out = ConvBN(self.features, strides=self.strides, dtype=self.dtype)(x, train)
        out = ConvBN(self.features, act=None, dtype=self.dtype)(out, train)
        if residual.shape != out.shape:
            residual = ConvBN(self.features, kernel=(1, 1), strides=self.strides,
                              act=None, dtype=self.dtype)(x, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    features: int
    expansion: int = 4
    strides: tuple[int, int] = (1, 1)
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * self.expansion
        residual = x
        out = ConvBN(self.features, kernel=(1, 1), dtype=self.dtype)(x, train)
        out = ConvBN(self.features, strides=self.strides, dtype=self.dtype)(out, train)
        out = ConvBN(out_ch, kernel=(1, 1), act=None, dtype=self.dtype)(out, train)
        if residual.shape != out.shape:
            residual = ConvBN(out_ch, kernel=(1, 1), strides=self.strides,
                              act=None, dtype=self.dtype)(x, train)
        return nn.relu(out + residual)


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch blocks + full pairwise fusion
    (seg_hrnet_rev1.py:136-280)."""
    channels: Sequence[int]
    num_blocks: int = 2
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(self.channels)
        # branch blocks
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                x = BasicBlock(self.channels[i], dtype=self.dtype,
                               name=f"branch{i}_block{b}")(x, train)
            ys.append(x)
        if n == 1:
            return ys
        # fusion: out_i = relu(sum_j exchange(y_j -> res_i))
        outs = []
        for i in range(n):
            acc = ys[i]
            h, w = ys[i].shape[1], ys[i].shape[2]  # absolute (PackedArray
            # reports its logical unpacked shape)
            for j in range(n):
                if j == i:
                    continue
                if j > i:  # upsample: 1x1 conv to ch_i, bn, bilinear
                    src = ys[j].unpack() if isinstance(ys[j], pc.PackedArray) \
                        else ys[j]  # XLA CSEs repeated unpacks of one map
                    t = ConvBN(self.channels[i], kernel=(1, 1), act=None,
                               dtype=self.dtype, name=f"fuse{i}_{j}")(src, train)
                    t = resize_bilinear(t, h, w)
                else:  # downsample: (i-j) stride-2 3x3 convs
                    t = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        # torch pad=1 stride-2 semantics, NOT "SAME" (which
                        # pads (0,1) on even sizes and shifts the sample grid)
                        cbn = ConvBN(self.channels[i] if last else self.channels[j],
                                     strides=(2, 2), padding=((1, 1), (1, 1)),
                                     act=None if last else nn.relu,
                                     dtype=self.dtype,
                                     name=f"fuse{i}_{j}_down{k}")
                        if isinstance(t, pc.PackedArray):
                            # stride-2 conv straight off the packed map
                            # (identical pad=1 semantics); bind the param
                            # tree via a dead dense call
                            cbn(jnp.zeros((1, 4, 4, t.shape[-1]),
                                          self.dtype), train)
                            kk, sc, of = _folded_convbn(
                                self, f"fuse{i}_{j}_down{k}")
                            t = pc.packed_conv3x3_s2(
                                t.data, kk, sc, of, relu=not last, s=t.s)
                        else:
                            t = cbn(t, train)
                if isinstance(acc, pc.PackedArray):
                    # dense exchange results enter packed space as a pack
                    # reshape that composes with the producer's output
                    # write (the dense lane-padded map never lands in HBM)
                    td = t.data if isinstance(t, pc.PackedArray) \
                        else pc.pack(t, acc.s)
                    acc = pc.PackedArray(acc.data + td, acc.s)
                else:
                    acc = acc + (t.unpack() if isinstance(t, pc.PackedArray)
                                 else t)
            if isinstance(acc, pc.PackedArray):
                outs.append(pc.PackedArray(nn.relu(acc.data), acc.s))
            else:
                outs.append(nn.relu(acc))
        return outs


class _Transition(nn.Module):
    """Branch-count/channel transition between stages (seg_hrnet_rev1.py:410-444).

    ``pack_spec``: per-OUTPUT-branch width-pack factor (0 = dense). A
    channel-changing existing branch (transition1's 256->18) emits packed
    via the dense->packed conv ((3, s+2) kernel at width-stride s — 2x the
    true MACs vs 4x for packing the 256-wide input too, and 27% faster
    than the native conv in the r5 layout A/B); a NEW branch packs its
    stride-2 chain output with a reshape that composes into the conv's
    epilogue write. Downstream the whole branch chain stays packed."""
    in_channels: Sequence[int]
    out_channels: Sequence[int]
    dtype: object = jnp.bfloat16
    pack_spec: Sequence[int] = ()

    def _pack_s(self, i: int) -> int:
        return self.pack_spec[i] if i < len(self.pack_spec) else 0

    @nn.compact
    def __call__(self, xs, train: bool = False):
        outs = []
        for i, ch in enumerate(self.out_channels):
            s = 0 if train else self._pack_s(i)
            if i < len(self.in_channels):
                if self.in_channels[i] != ch:
                    cbn = ConvBN(ch, dtype=self.dtype, name=f"trans{i}")
                    if s:
                        cbn(jnp.zeros((1, 4, 4, xs[i].shape[-1]),
                                      self.dtype), train)
                        kk, sc, of = _folded_convbn(self, f"trans{i}")
                        outs.append(pc.PackedArray(
                            pc.dense_to_packed_conv3x3(
                                xs[i].astype(self.dtype), kk, sc, of,
                                relu=True, s=s), s))
                    else:
                        outs.append(cbn(xs[i], train))
                else:
                    outs.append(xs[i])
            else:  # new branch: stride-2 conv(s) from the last existing branch
                t = xs[-1]
                if isinstance(t, pc.PackedArray):
                    t = t.unpack()
                for j in range(i + 1 - len(self.in_channels)):
                    out_ch = ch if j == i - len(self.in_channels) else t.shape[-1]
                    t = ConvBN(out_ch, strides=(2, 2),
                               padding=((1, 1), (1, 1)), dtype=self.dtype,
                               name=f"trans{i}_down{j}")(t, train)
                if s:
                    t = pc.PackedArray(pc.pack(t, s), s)
                outs.append(t)
        return outs


class HRNet18DAM(nn.Module):
    """`HRNet18_rev1` (seg_hrnet_rev1.py:289-568): HRNet-W18-small + DAM."""
    out_c: int = 3
    direction_classes: int = 9
    with_dam: bool = True
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, stop_at: str | None = None):
        # ``stop_at``: truncate the forward after a named checkpoint and
        # return the intermediate — used by the stage-bisection perf harness
        # (experiments/hrnet_bisect.py); flax.apply tolerates the unused
        # parameter subtrees, so the full trained variables dict works.
        x = x.astype(self.dtype)
        # stem (stride 1 — full resolution; seg_hrnet_rev1.py:331-337)
        x = ConvBN(64, dtype=self.dtype, name="stem1")(x, train)
        x = ConvBN(64, dtype=self.dtype, name="stem2")(x, train)
        if stop_at == "stem":
            return x
        # stage 1: bottleneck x2 -> 256ch
        for b in range(2):
            x = Bottleneck(64, dtype=self.dtype, name=f"layer1_{b}")(x, train)
        if stop_at == "stage1":
            return x

        chs2, chs3, chs4 = (18, 36), (18, 36, 72), (18, 36, 72, 144)
        # persistent-packed branch 0 (inference, TPU/forced): the stride-1
        # stem keeps branch 0 at FULL resolution with 18 channels — dense
        # it is lane-padded 18->128 (~7x physical HBM bytes; a single relu
        # on it measured 5.0 ms, experiments/packed_layout_ab.py). Packing
        # width into channels once at transition1 and keeping every block,
        # fusion sum, and stride-2 exchange in packed space removes that
        # padding from the entire stage 2-4 chain. Math is exact (the
        # packed kernels re-index the same taps; tests/test_models.py).
        h0, w0 = x.shape[1], x.shape[2]
        pack0 = 4 if pc.persistent_pack_applicable(
            train=train, h=h0, w=w0, s=4, dtype=self.dtype) else 0
        # branch 1 (36ch @ half res, dense lane-padded 36->128 = ~3.5x)
        # packs at s=2 under the same gate, evaluated at ITS geometry
        pack1 = 2 if (pack0 and pc.persistent_pack_applicable(
            train=train, h=h0 // 2, w=w0 // 2, s=2,
            dtype=self.dtype)) else 0
        xs = _Transition((256,), chs2, dtype=self.dtype, name="transition1",
                         pack_spec=(pack0, pack1))([x], train)
        xs = HRModule(chs2, dtype=self.dtype, name="stage2_m0")(xs, train)
        if stop_at == "stage2":
            return xs

        xs = _Transition(chs2, chs3, dtype=self.dtype, name="transition2")(xs, train)
        for m in range(3):
            xs = HRModule(chs3, dtype=self.dtype, name=f"stage3_m{m}")(xs, train)
        if stop_at == "stage3":
            return xs

        xs = _Transition(chs3, chs4, dtype=self.dtype, name="transition3")(xs, train)
        for m in range(2):
            xs = HRModule(chs4, dtype=self.dtype, name=f"stage4_m{m}")(xs, train)
        if stop_at == "stage4":
            return xs

        # upsample + concat all branches (seg_hrnet_rev1.py:527-533). The
        # DAM inference path hands the BRANCH LIST to the head instead: its
        # first ResidualUnit splits the 3x3 conv + 1x1 shortcut along Cin
        # (conv is linear over the channel concat), so the 270-channel
        # full-res concat — lane-padded to 384 on TPU — never materializes
        # (PERF.md §7's `cat` stage). Exact same math, identical params.
        if self.with_dam and not train and stop_at is None:
            # packed branches flow straight into the head: its split first
            # unit convolves them packed (dense s*64 output lanes)
            return DAMHead(out_c=self.out_c,
                           direction_classes=self.direction_classes,
                           dtype=self.dtype, name="dam")(list(xs), train)
        # the dense concat/cat paths need dense branches
        xs = [t.unpack() if isinstance(t, pc.PackedArray) else t
              for t in xs]
        h, w = xs[0].shape[1], xs[0].shape[2]
        cat = jnp.concatenate(
            [xs[0]] + [resize_bilinear(t, h, w) for t in xs[1:]], axis=-1)
        if stop_at == "cat":
            return cat
        if not self.with_dam:
            x = ConvBN(cat.shape[-1], kernel=(1, 1), dtype=self.dtype,
                       name="last_layer")(cat, train)
            logits = nn.Conv(self.out_c, (1, 1), dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name="final_conv")(x).astype(jnp.float32)
            return {"mask": logits}
        return DAMHead(out_c=self.out_c,
                       direction_classes=self.direction_classes,
                       dtype=self.dtype, name="dam")(cat, train)
