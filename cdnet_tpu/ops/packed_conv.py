"""Width-packed dense conv: re-layout W into channels so lane-starved
small-Cout 3x3 convs run MXU-dense. Pure XLA — no Pallas/Mosaic risk.

HRNet's branch-0 convs (Cin=Cout=18, full 1024^2 resolution —
`/root/reference/models/dam/seg_hrnet_rev1.py:292-325`) leave the MXU at
18/128 lane occupancy; XLA runs them at 2-4 TF/s and the Pallas supertile
kernel at ~4.8 (experiments/PERF.md §5). Packing width into channels —
x (N,H,W,C) -> (N,H,W/s,s*C), a FREE row-major bitcast — turns the conv
into a dense 3x3 conv with Cin'=s*cin, Cout'=s*cout whose kernel is
structured-zero: packed output column u slot p (absolute column c=u*s+p)
tap at absolute column c+dj (dj in {-1,0,1}) reads input phase
q=(p+dj) mod s in packed column u+v, v=floor((p+dj)/s) in {-1,0,1} — so
every absolute tap lands inside the packed 3x3 window and SAME zero
padding in packed space equals SAME zero padding in absolute space.
Executed MACs = s x the true conv, but at full K/N occupancy.

Measured (experiments/packed_conv_ab.py three-way, TPU v5e, in-jit,
2026-08-20): hr18 @8x1024^2 XLA 11.15 ms / pallas supertile 10.64 /
packed s=4 **6.98 ms (1.60x XLA, 1.52x pallas)**; s=8 loses to s=4
(9.62). dec16 (80->16) stays with the pallas kernel (15.2 vs packed
18.7); hr36/dam64 are washes (0.87-1.07x) and keep native XLA.
Routing policy: packed serves Cout=18 at inference; see
:func:`packed_conv_applicable`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cdnet_tpu.ops.pallas_gate import scoped_off

# "auto": pack eligible convs on TPU at inference; "force": everywhere
# (CPU tests); "off": never. Pure XLA, so no smoke gate is needed.
# Env CDNET_PACKED_CONV overrides (A/B benching, like CDNET_PALLAS_CONV).
import os as _os

MODE = _os.environ.get("CDNET_PACKED_CONV", "auto")

# measured-best pack factor per Cout (experiments/packed_conv_ab.py)
_PACK_S = {18: 4}

# minimum Cin for auto/force packing (0 = pack every eligible Cout=18 conv)
_MIN_CIN = int(_os.environ.get("CDNET_PACKED_MIN_CIN", "0"))


def packed_kernel(kernel: jnp.ndarray, s: int) -> jnp.ndarray:
    """(3,3,cin,cout) HWIO -> (3,3,s*cin,s*cout) structured-dense kernel.

    Static ``s``; runs in-trace (weights may be donated/transformed).
    Block (q*cin:(q+1)*cin, p*cout:(p+1)*cout) of packed tap (di, v+1)
    holds original tap (di, dj+1) where q=(p+dj) mod s, v=(p+dj)//s.
    """
    _, _, cin, cout = kernel.shape
    out = jnp.zeros((3, 3, s * cin, s * cout), kernel.dtype)
    for p in range(s):
        for dj in (-1, 0, 1):
            q, v = (p + dj) % s, (p + dj) // s
            out = out.at[:, v + 1, q * cin:(q + 1) * cin,
                         p * cout:(p + 1) * cout].set(kernel[:, dj + 1])
    return out


def packed_conv3x3_affine_act(x: jnp.ndarray, kernel: jnp.ndarray,
                              scale: jnp.ndarray, offset: jnp.ndarray,
                              *, relu: bool, s: int) -> jnp.ndarray:
    """SAME stride-1 3x3 conv + per-channel f32 affine (+ReLU), computed
    width-packed. x: (N,H,W,Cin) bf16/f32; kernel: (3,3,Cin,Cout);
    scale/offset: (Cout,) f32. Returns (N,H,W,Cout) in x.dtype."""
    n, h, w, cin = x.shape
    cout = kernel.shape[3]
    wp = -(-w // s) * s
    if wp != w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
    xp = x.reshape(n, h, wp // s, s * cin)
    kp = packed_kernel(kernel.astype(x.dtype), s)
    y = jax.lax.conv_general_dilated(
        xp, kp, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y * jnp.tile(scale, s) + jnp.tile(offset, s)
    if relu:
        y = jnp.maximum(y, 0.0)
    y = y.astype(x.dtype).reshape(n, h, wp, cout)
    return y[:, :, :w] if wp != w else y


@jax.tree_util.register_pytree_node_class
class PackedArray:
    """An (N,H,W/s,s*C) tensor standing for a logical (N,H,W,C) map.

    Flows through HRNet's branch-0 inference path (models/hrnet.py) so the
    18-channel full-res map never exists in dense layout — dense it is
    lane-padded 18->128 on TPU (~7x physical bytes; measured 5.0 ms for a
    single relu at 8x1024^2x18 vs ~0 packed, experiments/packed_layout_ab).
    Registered as a pytree so jit/psum-free code can pass it around."""

    def __init__(self, data: jnp.ndarray, s: int):
        self.data = data
        self.s = s

    def tree_flatten(self):
        return (self.data,), self.s

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    @property
    def shape(self):
        """ABSOLUTE (unpacked) logical shape."""
        n, h, wc, sc = self.data.shape
        return (n, h, wc * self.s, sc // self.s)

    @property
    def dtype(self):
        return self.data.dtype

    def astype(self, dtype) -> "PackedArray":
        return PackedArray(self.data.astype(dtype), self.s)

    def unpack(self) -> jnp.ndarray:
        return unpack(self.data, self.s)


def pack(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(N,H,W,C) -> (N,H,W/s,s*C): row-major bitcast into packed layout.

    In packed layout the minor dim holds s*C channels, so TPU lane padding
    (C -> 128) shrinks s-fold: an 18-channel full-res bf16 tensor is
    physically ~7x its logical bytes (18 of 128 lanes used); packed s=4 it
    is ~1.8x. Every elementwise op on branch-0 tensors moves that physical
    footprint — the reason HRNet's branch 0 stays packed across whole
    stages (models/hrnet.py inference path)."""
    n, h, w, c = x.shape
    assert w % s == 0, (w, s)
    return x.reshape(n, h, w // s, s * c)


def unpack(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(N,H,W/s,s*C) -> (N,H,W,C): inverse of :func:`pack`."""
    n, h, wc, sc = x.shape
    return x.reshape(n, h, wc * s, sc // s)


def packed_conv3x3_pre(xp: jnp.ndarray, kernel: jnp.ndarray,
                       scale: jnp.ndarray, offset: jnp.ndarray,
                       *, relu: bool, s: int) -> jnp.ndarray:
    """Packed-in -> packed-out stride-1 SAME 3x3 conv + affine (+ReLU).

    ``xp`` is ALREADY packed (N,H,W/s,s*Cin); returns (N,H,W/s,s*Cout)
    still packed — the chain form of :func:`packed_conv3x3_affine_act`
    (which packs/unpacks around a single conv). Consecutive branch-0 convs
    chained through this never leave packed layout."""
    kp = packed_kernel(kernel.astype(xp.dtype), s)
    y = jax.lax.conv_general_dilated(
        xp, kp, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y * jnp.tile(scale, s) + jnp.tile(offset, s)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(xp.dtype)


def dense_to_packed_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                            scale: jnp.ndarray, offset: jnp.ndarray,
                            *, relu: bool, s: int) -> jnp.ndarray:
    """Dense-in -> packed-out stride-1 SAME 3x3 conv + affine (+ReLU).

    For convs with MANY input channels producing a packed small-Cout map
    (HRNet's transition1 256->18, seg_hrnet_rev1.py:410-444): packing the
    input too (packed_conv3x3_affine_act) executes s x the true MACs, but
    with a dense input only the OUTPUT needs packing — a (3, s+2) kernel at
    width-stride s writes each packed cell's s phases in one window, at
    (s+2)/3 x the true MACs (2.0x at s=4 vs 4x for full packing).

    Output cell u phase p reads absolute columns s*u + p + dj, dj in
    {-1,0,1} — the union over p is [s*u - 1, s*u + s], a width-(s+2)
    window at stride s; kernel column (p + dj + 1) of output slot p holds
    original tap dj. SAME zero padding = (1, 1) absolute columns.
    x: (N,H,W,Cin); returns (N,H,W/s,s*Cout) packed."""
    n, h, w, cin = x.shape
    cout = kernel.shape[3]
    assert w % s == 0, (w, s)
    kd = jnp.zeros((3, s + 2, cin, s * cout), x.dtype)
    k = kernel.astype(x.dtype)
    for p in range(s):
        for dj in (-1, 0, 1):
            kd = kd.at[:, p + dj + 1, :, p * cout:(p + 1) * cout].set(
                k[:, dj + 1])
    y = jax.lax.conv_general_dilated(
        x, kd, (1, s), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y * jnp.tile(scale, s) + jnp.tile(offset, s)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def packed_conv1x1(xp: jnp.ndarray, kernel: jnp.ndarray,
                   s: int) -> jnp.ndarray:
    """1x1 conv on a packed map, staying packed: the kernel becomes
    block-diagonal per phase ((1,1,s*Cin,s*Cout), s x the true MACs but
    dense lanes). xp: (N,H,W/s,s*Cin) -> (N,H,W/s,s*Cout)."""
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    k = kernel.reshape(cin, cout).astype(xp.dtype)
    kb = jnp.zeros((1, 1, s * cin, s * cout), xp.dtype)
    for p in range(s):
        kb = kb.at[0, 0, p * cin:(p + 1) * cin,
                   p * cout:(p + 1) * cout].set(k)
    return jax.lax.conv_general_dilated(
        xp, kb, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(xp.dtype)


def packed_conv3x3_s2(xp: jnp.ndarray, kernel: jnp.ndarray,
                      scale: jnp.ndarray, offset: jnp.ndarray,
                      *, relu: bool, s: int) -> jnp.ndarray:
    """Packed-in stride-2 3x3 conv (torch pad=1 semantics) -> DENSE output
    at half resolution.

    HRNet's fuse/transition downsample exchanges run stride-2 3x3 convs on
    the FULL-res branch-0 map (seg_hrnet_rev1.py:249-268) — lane-starved
    (Cin=18) and ineligible for the stride-1 packed route. With the input
    already packed, output column j reads absolute columns 2j + dj, which
    live in packed cells (2j + dj) // s with s//2-periodic phase patterns:
    output columns split into s//2 phase classes, each a width-stride-
    (s//2... ) — implemented via a packed-OUTPUT formulation: output is
    produced packed at factor s (cells of s output columns = 2s absolute
    input columns = 2 input cells), i.e. a stride-(2,2)-cells conv with a
    3x3 packed-cell kernel, then unpacked. Executed MACs = s x true (same
    as the stride-1 packed conv); K = 3*s*Cin dense.

    xp: (N,H,W/s,s*Cin) packed full-res; returns (N,H/2,W/2,Cout) dense.
    Requires (W/2) % s == 0."""
    n, h, wc, scin = xp.shape
    cin = scin // s
    cout = kernel.shape[3]
    w = wc * s
    assert (w // 2) % s == 0, (w, s)
    k = kernel.astype(xp.dtype)
    # output packed cell u' slot p' = absolute output column s*u' + p' =
    # absolute input column 2*(s*u' + p') + dj = s*(2u') + 2p' + dj:
    # input packed cell 2u' + v, v = (2p'+dj)//s, phase q = (2p'+dj) mod s
    kp = jnp.zeros((3, 3, s * cin, s * cout), xp.dtype)
    for p in range(s):
        for dj in (-1, 0, 1):
            t = 2 * p + dj
            q, v = t % s, t // s
            kp = kp.at[:, v + 1, q * cin:(q + 1) * cin,
                       p * cout:(p + 1) * cout].set(k[:, dj + 1])
    y = jax.lax.conv_general_dilated(
        xp, kp, (2, 2), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y * jnp.tile(scale, s) + jnp.tile(offset, s)
    if relu:
        y = jnp.maximum(y, 0.0)
    return unpack(y.astype(xp.dtype), s)


def packed_conv_applicable(*, train: bool, kernel: tuple, strides: tuple,
                           dilation: tuple, padding, cout: int,
                           dtype, cin: int | None = None) -> bool:
    """Whether ConvBN should lower through the width-packed conv.

    Auto policy (measured, module docstring): inference-mode stride-1 SAME
    3x3 bf16 convs with Cout=18 on TPU, subject to the ``cin`` floor
    CDNET_PACKED_MIN_CIN (default 0 = no floor). Checked BEFORE the Pallas
    supertile route in ConvBN, so eligible Cout=18 convs prefer packed
    while the rest fall through to the kernel/XLA. The floor exists for
    in-context A/B (hrnet_bisect full-pipeline: prefix stages suggested
    packing loses on 18->18 chains but wins on HRNet's 256->18 transition;
    the FULL-pipeline A/B — the only §6-clean number — decides)."""
    if MODE == "off":
        return False
    shape_ok = (not train and tuple(kernel) == (3, 3)
                and tuple(strides) == (1, 1) and tuple(dilation) == (1, 1)
                and padding == "SAME" and cout in _PACK_S
                and dtype == jnp.bfloat16
                and (cin is None or cin >= _MIN_CIN))
    if MODE == "force":
        return shape_ok
    return (shape_ok and not scoped_off()
            and jax.default_backend() == "tpu")


def pack_factor(cout: int) -> int:
    return _PACK_S[cout]


def persistent_pack_applicable(*, train: bool, h: int, w: int, s: int,
                               dtype) -> bool:
    """Whether HRNet's branch 0 should run the persistent-packed path
    (models/hrnet.py): inference, geometry divisible for the stride-2
    exchanges, and either forced (tests — any float dtype, the math is
    exact) or the production TPU bf16 case."""
    if MODE == "off" or train or h % 2 or w % (2 * s):
        return False
    if MODE == "force":
        return True
    return (dtype == jnp.bfloat16 and not scoped_off()
            and jax.default_backend() == "tpu")


def is_active() -> bool:
    """Bench JSON honesty: whether eligible convs would pack right now.

    Mirrors the applicability gate, including ``scoped_off()`` — inside a
    scoped_disable (multi-device mesh trace) eligible convs fall back to
    native XLA, so is_active must report False there too (ADVICE r4)."""
    if MODE == "force":
        return True
    return (MODE == "auto" and not scoped_off()
            and jax.default_backend() == "tpu")


def route_packed(parent, conv, norm, x, *, features: int, use_bias: bool,
                 relu: bool, conv_name: str = "Conv_0",
                 bn_name: str = "BatchNorm_0"):
    """Route a flax Conv[+BatchNorm][+ReLU] through the packed conv.

    Same parameter-binding recipe as :func:`pallas_conv.route_fused`:
    bind via a dead 1x1 call, fold BN inference affine + conv bias, then
    dispatch the packed lowering."""
    from cdnet_tpu.ops import pallas_conv
    y = conv(x[:1, :1, :1, :])
    if norm is not None:
        norm(y)
    params = parent.variables["params"]
    scale, offset = pallas_conv.fold_affine(
        features,
        params[conv_name]["bias"] if use_bias else None,
        params.get(bn_name) if norm is not None else None,
        parent.variables["batch_stats"][bn_name] if norm is not None
        else None)
    return packed_conv3x3_affine_act(
        x.astype(conv.dtype), params[conv_name]["kernel"], scale, offset,
        relu=relu, s=pack_factor(features))
