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
