"""Fused 3x3 conv + folded-BN + activation Pallas kernel for small channels.

Why this exists: XLA lowers a stride-1 3x3 conv with Cin=Cout=64 to nine
accumulating (K=64, N=64) MXU passes — 50% sublane x 50% lane occupancy,
measured ~48 TFLOP/s on the v5e (~1/4 of bf16 peak); Cout=16/32 is worse
still (12.5%/25% lane fill). The CDNet DAM head is six 64-channel convs at
FULL resolution over the 8 TTA views (~3.4 TFLOP of the 10.1 TFLOP forward;
experiments/PERF.md §3), so the flagship forward runs at ~20% MFU with
post-processing already off the critical path.

This kernel restructures the conv to feed the MXU properly:

- **vertical K-fold**: the three kernel rows are concatenated along channels
  (K = 3*Cin), turning the 9 taps into column taps only;
- **width-S supertile** (S = 128 // Cout): each output "column" is a group
  of S adjacent pixels, N = S*Cout = 128 — full lane occupancy. A group
  needs input columns dj in {-1..S}; tap dj contributes W[:, dj-p] to group
  slot p when |dj - p| <= 1, so the weights become S+2 blocks of
  (3*Cin, S*Cout), zero-filled where a slot doesn't use the tap:
  3*(S+2)/9*S... = (S+2)/S x the true MXU work (1.5x for S=2, 1.25x for
  S=8) at up to 8x the per-pass occupancy;
- the column mod-S split the supertile needs is FREE in HBM: the
  (N, H+2, W+2S, Cin) padded input is bitcast-reshaped to
  (N, H+2, (W+2S)/S, S*Cin) before the call, so each grid step DMAs a
  row-block whose lanes already hold the S column phases;
- BN (inference mode: a per-channel affine) and the activation are applied
  to the f32 accumulator in-VMEM, and a single bf16 result is written back —
  conv, BN and ReLU never round-trip HBM separately.

Numerics: MXU accumulates in f32 (preferred_element_type); the result
matches XLA's conv+BN+relu at bf16-rounding tolerance (tests pin it).

Used by :class:`cdnet_tpu.models.layers.ConvBN` at inference on TPU for
stride-1 SAME 3x3 convs with Cout in {16, 18} — the decoder tail
(model_unet_rev1.py:150-170) and HRNet's branch-0/transition convs
(seg_hrnet_rev1.py:292-325), the shapes where XLA's conv is lane-starved
(measured A/B: experiments/PERF.md §5); everything else keeps the XLA
conv, which wins at Cout >= 32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# "auto": use the kernel at inference on TPU for matching shapes;
# "off": never (XLA conv everywhere); "force": also on CPU via interpret
# mode (tests). Env CDNET_PALLAS_CONV overrides (A/B benching).
import os as _os

MODE = _os.environ.get("CDNET_PALLAS_CONV", "auto")


def _supertile_s(cout: int) -> int:
    """Supertile width: pack S output pixels to fill the 128 MXU lanes."""
    return max(1, 128 // cout)


def _supertile_weights(kernel: jnp.ndarray, s: int) -> jnp.ndarray:
    """(3, 3, Cin, Cout) HWIO -> (S+2, 3*Cin, S*Cout) per-dj weight blocks.

    Block dj, row k=(di, cin), col n=(p, cout) holds W[di, dj-p+1, cin, cout]
    when |dj - p| <= 1 and 0 otherwise (p in {0..S-1} is the group slot).
    """
    _, _, cin, cout = kernel.shape
    zeros = jnp.zeros((3, cin, cout), kernel.dtype)
    blocks = []
    for dj in range(-1, s + 1):
        slots = [kernel[:, dj - p + 1] if -1 <= dj - p <= 1 else zeros
                 for p in range(s)]
        # (3, Cin, S, Cout) -> (3*Cin, S*Cout); k is di-major over channels
        blocks.append(jnp.stack(slots, axis=2).reshape(3 * cin, s * cout))
    return jnp.stack(blocks)


def _conv_kernel(xp_ref, w_ref, s_ref, o_ref, out_ref, blk_ref, sem,
                 *, bh: int, t: int, s: int, cin: int, cout: int,
                 sc_pad: int, ncp: int, relu: bool, out_dtype):
    """One (bh, s*t, cout) output row-block.

    xp_ref: (N, H, T, s*cin) phase-merged UNPADDED input (HBM/ANY — the
    merge is a free bitcast in HBM, so the kernel costs zero pre-copies);
    blk_ref: (2, bh+2, t, s*cin) double-buffered VMEM scratch (1-row halo
    each side, DMA'd only away from the image borders and zero-filled at
    them — SAME-conv semantics without a padded HBM copy);
    w_ref: (s+2, 3*cin, s*cout); s_ref/o_ref: (1, s*cout) f32 affine.
    The NEXT row-block's DMAs are started before this block's compute so
    the copies ride under the MXU work (grid iterates row-major: r fastest,
    then n).
    """
    n = pl.program_id(0)
    r = pl.program_id(1)
    rows = pl.num_programs(1)
    step = n * rows + r

    def issue(slot, img, row):
        # main rows [row*bh, row*bh+bh) -> blk[1:bh+1]; the 1-row halos only
        # exist away from the image borders (borders are zero-filled below)
        pltpu.make_async_copy(
            xp_ref.at[img, pl.ds(row * bh, bh)],
            blk_ref.at[slot, 1:bh + 1], sem.at[slot, 0]).start()

        @pl.when(row > 0)
        def _():
            pltpu.make_async_copy(
                xp_ref.at[img, pl.ds(jnp.maximum(row * bh - 1, 0), 1)],
                blk_ref.at[slot, 0:1], sem.at[slot, 1]).start()

        @pl.when(row < rows - 1)
        def _():
            pltpu.make_async_copy(
                xp_ref.at[img, pl.ds(row * bh + bh, 1)],
                blk_ref.at[slot, bh + 1:bh + 2], sem.at[slot, 2]).start()

    def wait_for(slot, row):
        # reconstructed copy descriptors wait on the matching semaphores
        pltpu.make_async_copy(
            xp_ref.at[0, pl.ds(0, bh)],
            blk_ref.at[slot, 1:bh + 1], sem.at[slot, 0]).wait()

        @pl.when(row > 0)
        def _():
            pltpu.make_async_copy(
                xp_ref.at[0, pl.ds(0, 1)],
                blk_ref.at[slot, 0:1], sem.at[slot, 1]).wait()

        @pl.when(row < rows - 1)
        def _():
            pltpu.make_async_copy(
                xp_ref.at[0, pl.ds(0, 1)],
                blk_ref.at[slot, bh + 1:bh + 2], sem.at[slot, 2]).wait()

    @pl.when(step == 0)
    def _():
        issue(0, n, r)

    nxt_wraps = r + 1 == rows
    nxt_n = jnp.where(nxt_wraps, n + 1, n)
    nxt_r = jnp.where(nxt_wraps, 0, r + 1)

    @pl.when(step + 1 < pl.num_programs(0) * rows)
    def _():
        issue((step + 1) % 2, nxt_n, nxt_r)

    cur = step % 2
    wait_for(cur, r)

    @pl.when(r == 0)
    def _():
        blk_ref[cur, 0] = jnp.zeros((t, sc_pad), out_dtype)

    @pl.when(r == rows - 1)
    def _():
        blk_ref[cur, bh + 1] = jnp.zeros((t, sc_pad), out_dtype)

    blk = blk_ref[cur]  # (bh+2, t, s*cin): lanes = S column phases

    def bank(dj):
        # (bh, t, 3*cin): rows i-1,i,i+1 folded along lanes, columns at
        # input offset dj: phase dj%s shifted by dj//s supertiles, with the
        # out-of-image column zero-filled at the left/right borders
        q = dj % s
        sl = jnp.concatenate(
            [blk[di:di + bh, :, q * cin:(q + 1) * cin] for di in range(3)],
            axis=-1)
        if dj == -1:
            return jnp.pad(sl[:, :t - 1], ((0, 0), (1, 0), (0, 0)))
        if dj == s:
            return jnp.pad(sl[:, 1:], ((0, 0), (0, 1), (0, 0)))
        return sl

    # ncp = 128-lane-aligned S*Cout (S*Cout itself for the pow2 channel
    # counts; padded for e.g. HRNet's S=7 x Cout=18 = 126 — a 126-lane VMEM
    # output block violates Mosaic's tiling and was the "S=7 reshape
    # failure" that kept HRNet off this kernel, PERF.md §5)
    acc = jnp.zeros((bh, t, ncp), jnp.float32)
    for i, dj in enumerate(range(-1, s + 1)):
        acc = acc + jax.lax.dot_general(
            bank(dj), w_ref[i],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    y = acc * s_ref[0] + o_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    # keep the supertile packing (bh, t, s*cout): un-packing to
    # (bh, s*t, cout) here is a lane->sublane shuffle Mosaic rejects
    # ("unsupported shape cast"); row-major it is the SAME bytes, so the
    # caller reshapes the HBM result for free instead
    out_ref[0] = y.astype(out_dtype)


def _pick_bh(t: int, s: int, cin: int, cout: int, itemsize: int) -> int:
    """Largest row-block in {8, 4, 2} whose VMEM working set fits a ~10 MB
    budget (16 MB VMEM minus Mosaic temporaries/slack).

    Estimate: double-buffered input block 2*(bh+2) rows + ~3 live K-folded
    banks + the f32 accumulator + Mosaic's double-buffered output block.
    At t=512 (1024-wide tiles, cin=cout=64) bh=8 lands ~15 MB — over; bh=4
    fits with ~1.5x halo read amplification (6/4 rows), which is noise
    against the MXU work per step."""
    for bh in (8, 4, 2):
        est = (2 * (bh + 2) * t * s * cin * itemsize      # input blocks
               + 3 * bh * t * 3 * cin * itemsize          # live banks
               + bh * t * s * cout * 4                    # f32 accumulator
               + 2 * bh * t * s * cout * itemsize)        # output blocks
        if est <= 10 * 1024 * 1024:
            return bh
    return 2


@functools.partial(jax.jit, static_argnames=("relu", "interpret", "bh"))
def conv3x3_affine_act(x: jnp.ndarray, kernel: jnp.ndarray,
                       scale: jnp.ndarray, offset: jnp.ndarray,
                       *, relu: bool = True, interpret: bool = False,
                       bh: int = 0) -> jnp.ndarray:
    """Fused stride-1 SAME 3x3 conv + per-channel affine + optional ReLU.

    x: (N, H, W, Cin); kernel: (3, 3, Cin, Cout) — computed at x.dtype
    (bf16 on TPU) with f32 MXU accumulation; scale/offset: (Cout,) f32,
    y = conv(x) * scale + offset (BN folded by the caller; identity scale
    and a bias give a plain conv+bias). Returns (N, H, W, Cout) in x.dtype.

    vmap-safe: extra leading batch dims fold into N (each image's conv is
    independent), so the batched-tiles inference pipeline can vmap over it.
    """
    return _make_op(relu, interpret, bh)(x, kernel, scale, offset)


@functools.lru_cache(maxsize=None)
def _make_op(relu: bool, interpret: bool, bh: int):
    @jax.custom_batching.custom_vmap
    def op(x, kernel, scale, offset):
        return _conv_impl(x, kernel, scale, offset, relu, interpret, bh)

    @op.def_vmap
    def _op_vmap(axis_size, in_batched, x, kernel, scale, offset):
        assert in_batched[0] and not any(in_batched[1:]), (
            "pallas conv vmap: only the image operand may be batched")
        b = x.shape[0]
        flat = op(x.reshape((-1,) + x.shape[2:]), kernel, scale, offset)
        return flat.reshape((b, -1) + flat.shape[1:]), True

    return op


def _conv_impl(x, kernel, scale, offset, relu: bool, interpret: bool,
               bh: int) -> jnp.ndarray:
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, cin), kernel.shape
    s = _supertile_s(cout)
    # lane-aligned merged channel dim (see the pad below) drives VMEM use
    _sc_pad = -(-(s * cin) // 128) * 128
    if bh == 0:  # auto: largest row-block whose working set fits VMEM
        bh = _pick_bh(-(-w // s), s, _sc_pad // s, cout, x.dtype.itemsize)
    # geometry: rows blocked by bh, width supertiled by S. At the common
    # sizes (1024/512/256/64: s | W and bh | H) the input needs NO padded
    # copy at all — boundary halos are zero-filled in-kernel; ragged sizes
    # pad up with zeros (still SAME semantics: the pad is past the slice).
    hp = -(-h // bh) * bh
    # t (the supertiled width, a SUBLANE dim inside the kernel) must be
    # 8-aligned: the (bh, t, K) -> (bh*t, K) dot-operand collapse is a
    # tpu.reshape Mosaic rejects at misaligned t with non-128 lane counts
    # (HRNet's S=7 -> t=147 at W=1024 and t=3 at W=21 both failed; t=152/8
    # compile — the "Mosaic reshape failure" of PERF.md §5). <=3.4% padded
    # columns at production widths.
    t = -(-(-(-w // s)) // 8) * 8
    ws = t * s
    if hp != h or ws != w:
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, ws - w), (0, 0)))
    # column phase-merge is free in HBM: row-major (..., S*T, Cin) is
    # bit-identical to (..., T, S*Cin)
    xp2 = x.reshape(n, hp, t, s * cin)
    # Mosaic requires HBM memref slices to be 128-lane aligned: when
    # S*Cin < k*128 the halo DMAs fail to compile ("Slice shape along
    # dimension 3 must be aligned to tiling (128)"). Pad the merged dim up
    # to a lane multiple — phases stay at q*cin, the pad region is DMA'd
    # but never read by the banks. One extra HBM copy of the input
    # (~0.5 ms at up5's 128 MB), amortized by the 2.5x kernel win.
    sc_pad = _sc_pad
    if sc_pad != s * cin:
        xp2 = jnp.pad(xp2, ((0, 0), (0, 0), (0, 0), (0, sc_pad - s * cin)))

    w_blocks = _supertile_weights(kernel.astype(x.dtype), s)
    s2 = jnp.tile(scale.astype(jnp.float32), s)[None]   # (1, S*Cout)
    o2 = jnp.tile(offset.astype(jnp.float32), s)[None]
    # 128-lane-align the packed output channels (S*Cout = 126 for HRNet's
    # Cout=18/S=7, 108 for Cout=36/S=3): Mosaic rejects misaligned VMEM
    # output blocks. Weights/affines get zero pad lanes; the pad output
    # columns are sliced off in HBM below.
    nc = s * cout
    ncp = -(-nc // 128) * 128
    if ncp != nc:
        w_blocks = jnp.pad(w_blocks, ((0, 0), (0, 0), (0, ncp - nc)))
        s2 = jnp.pad(s2, ((0, 0), (0, ncp - nc)))
        o2 = jnp.pad(o2, ((0, 0), (0, ncp - nc)))

    out = pl.pallas_call(
        functools.partial(_conv_kernel, bh=bh, t=t, s=s, cin=cin, cout=cout,
                          sc_pad=sc_pad, ncp=ncp, relu=relu,
                          out_dtype=x.dtype),
        grid=(n, hp // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((s + 2, 3 * cin, ncp), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncp), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncp), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, t, ncp),
                               lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, t, ncp), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, bh + 2, t, sc_pad), x.dtype),
                        pltpu.SemaphoreType.DMA((2, 3))],
        interpret=interpret,
    )(xp2, w_blocks, s2, o2)
    if ncp != nc:
        out = out[..., :nc]
    # un-supertile in HBM: (t, s*cout) -> (s*t, cout) is a row-major bitcast
    # (col s*u+p, channel co lives at flat u*s*cout + p*cout + co both ways)
    out = out.reshape(n, hp, s * t, cout)
    return out[:, :h, :w, :]


def fold_affine(features: int, conv_bias, bn_params, bn_stats,
                eps: float = 1e-5):
    """(scale, offset) f32 per-channel affine equivalent to
    [+bias] -> BatchNorm(inference). Pass bn_params/bn_stats=None for a
    plain conv (+bias)."""
    scale = jnp.ones((features,), jnp.float32)
    offset = (conv_bias.astype(jnp.float32) if conv_bias is not None
              else jnp.zeros((features,), jnp.float32))
    if bn_params is not None:
        inv = bn_params["scale"] * jax.lax.rsqrt(bn_stats["var"] + eps)
        offset = bn_params["bias"] + (offset - bn_stats["mean"]) * inv
        scale = inv
    return scale, offset


_TPU_SMOKE: bool | None = None

# trace-scoped disable (multi-device mesh pipelines) — shared by every
# Pallas kernel; re-exported here for the model-layer call sites
from cdnet_tpu.ops.pallas_gate import scoped_disable, scoped_off  # noqa: E402


def is_active() -> bool:
    """Whether eligible convs would route through the kernel right now
    (bench JSON honesty: "force" counts as active)."""
    if MODE == "force":
        return True
    return (MODE == "auto" and jax.default_backend() == "tpu"
            and _TPU_SMOKE is True)


def ensure_tpu_kernel_or_disable() -> bool:
    """Compile-and-run a tiny fused conv on the TPU once per process; on ANY
    failure flip MODE to "off" so jit programs fall back to the XLA conv.

    Call before tracing a big inference program (build_pipeline / bench do):
    the kernel is exercised in interpret mode by the test suite, but the
    Mosaic compile only happens on real hardware — a compile regression must
    degrade to the XLA path, not take down an inference run."""
    global _TPU_SMOKE, MODE
    if MODE != "auto" or jax.default_backend() != "tpu":
        return MODE != "off"
    if _TPU_SMOKE is None:
        try:
            import numpy as np
            rng = np.random.RandomState(0)
            # the routed geometries: the decoder tail's 80->16 and 16->16
            # supertile convs, plus the WIDE geometry (w=1024 -> t=128)
            # whose VMEM working set and bh choice differ, one lane-pad
            # case (s*cin not a 128 multiple), and HRNet's 18->18 at both
            # narrow and wide (S=7, S*Cout=126 lane-pad, 8-aligned-t)
            # geometries. A Mosaic regression in ANY of them must disable
            # the kernel, not crash the first big pipeline compile.
            for cin, cout, w in ((80, 16, 16), (16, 16, 16), (24, 16, 16),
                                 (80, 16, 1024), (18, 18, 21),
                                 (18, 18, 1024)):
                x = jnp.asarray(rng.randn(1, 16, w, cin), jnp.bfloat16)
                k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1,
                                jnp.bfloat16)
                s = jnp.asarray(rng.rand(cout) + 0.5, jnp.float32)
                o = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
                got = np.asarray(conv3x3_affine_act(x, k, s, o), np.float32)
                ref = jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32) * s + o
                ref = np.asarray(jnp.maximum(ref, 0), np.float32)
                err = float(np.max(np.abs(got - ref)))
                if err > 0.1:
                    raise ValueError(f"fused conv numerics off on TPU "
                                     f"(cout={cout}): max_err={err}")
            _TPU_SMOKE = True
        except Exception as e:  # Mosaic compile/runtime/numerics failure
            from cdnet_tpu.ops.pallas_gate import backend_alive
            if not backend_alive():
                # the BACKEND is down, not the kernel: every program fails.
                # Leave the smoke undecided (a later call retries) and
                # surface the outage instead of silently degrading.
                _TPU_SMOKE = None
                raise
            import warnings
            warnings.warn(f"pallas fused conv disabled: {type(e).__name__}: "
                          f"{e}; falling back to XLA convs")
            _TPU_SMOKE = False
            MODE = "off"
    return _TPU_SMOKE


def route_fused(parent, conv, norm, x, *, features: int, use_bias: bool,
                relu: bool, conv_name: str = "Conv_0",
                bn_name: str = "BatchNorm_0"):
    """Route a flax Conv[+BatchNorm][+ReLU] through the fused kernel.

    Binds the submodules' parameters with a dead 1x1 dummy call (XLA
    removes it; the parameter tree is identical to the XLA path), folds
    the BN inference affine and conv bias via :func:`fold_affine`, and
    dispatches :func:`conv3x3_affine_act`. Shared by ConvBN and the VGG
    backbone so the routing recipe evolves in one place."""
    y = conv(x[:1, :1, :1, :])
    if norm is not None:
        norm(y)
    params = parent.variables["params"]
    scale, offset = fold_affine(
        features,
        params[conv_name]["bias"] if use_bias else None,
        params.get(bn_name) if norm is not None else None,
        parent.variables["batch_stats"][bn_name] if norm is not None
        else None)
    return conv3x3_affine_act(
        x.astype(conv.dtype), params[conv_name]["kernel"], scale, offset,
        relu=relu, interpret=jax.default_backend() != "tpu")


def convt_phase_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(4,4,Cin,Cout) stride-2 SAME ConvTranspose kernel -> the equivalent
    (3,3,Cin,4*Cout) stride-1 conv kernel over the 4 output phases.

    flax's ConvTranspose((4,4), strides=2, SAME) satisfies
    out[o] = sum_k x[(o+1-k)/2] * K[::-1,::-1][k] over k with o+1-k even
    (derived and pinned by tests). Per output phase a=o%2 that is two taps
    along each axis, embedded in a 3x3 window: a=0 uses (di=0 -> k=3,
    di=1 -> k=1), a=1 uses (di=1 -> k=2, di=2 -> k=0). The dense 3x3 conv
    does 9/4 = 2.25x the true MACs but runs at 4-16x the lane occupancy
    (Cout -> 4*Cout), and the supertile kernel takes it from there."""
    k = kernel[::-1, ::-1]
    cin, cout = kernel.shape[2], kernel.shape[3]
    taps = {0: {0: 3, 1: 1}, 1: {1: 2, 2: 0}}
    k3 = jnp.zeros((3, 3, cin, 2, 2, cout), kernel.dtype)
    for a in (0, 1):
        for di, ki in taps[a].items():
            for b in (0, 1):
                for dj, kj in taps[b].items():
                    k3 = k3.at[di, dj, :, a, b, :].set(k[ki, kj])
    return k3.reshape(3, 3, cin, 4 * cout)


def depth_to_space2(y: jnp.ndarray, cout: int) -> jnp.ndarray:
    """(N, H, W, 4*Cout) phase-major channels -> (N, 2H, 2W, Cout)."""
    n, h, w, _ = y.shape
    return y.reshape(n, h, w, 2, 2, cout).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, cout)


def phase_convt_applicable(*, train: bool) -> bool:
    """Whether UpsampleBlock should lower ConvTranspose via the phase
    decomposition. Pure XLA (no Mosaic risk), so the only gates are
    inference mode and backend (TPU, or "force" so CPU tests cover it).
    Measured (experiments/conv_kernel_ab A/B, v5e, batch-8 decoder shapes):
    XLA's native conv_transpose lowering runs ~9-10 ms at the 32->16@512
    up-block vs ~1.5-2.4 ms for the phase-decomposed 3x3 conv (4-6x across
    runs; the 2026-08-19 run in experiments/PERF.md §5 — the table of
    record — measured 9.78 -> 2.42 ms = 4.04x), and the deeper blocks drop
    below the dispatch floor; the pallas supertile variant of the same
    decomposition measured 2.75 ms — XLA wins once the conv is
    phase-dense, so this path uses the XLA conv."""
    if MODE == "force":
        return not train
    return (MODE != "off" and not train and not scoped_off()
            and jax.default_backend() == "tpu")


def route_fused_convt(parent, convt, norm, x, *, features: int,
                      convt_name: str = "ConvTranspose_0",
                      bn_name: str = "BatchNorm_0"):
    """Lower ConvTranspose(4,4,s2) + BatchNorm + ReLU as a phase-decomposed
    stride-1 3x3 XLA conv + folded affine + ReLU + depth-to-space.
    Caller must have checked phase_convt_applicable()."""
    y = convt(x[:1, :1, :1, :])
    if norm is not None:
        norm(y)
    params = parent.variables["params"]
    k3 = convt_phase_kernel(params[convt_name]["kernel"])
    scale, offset = fold_affine(
        features, None,
        params.get(bn_name) if norm is not None else None,
        parent.variables["batch_stats"][bn_name] if norm is not None
        else None)
    y3 = jax.lax.conv_general_dilated(
        x.astype(convt.dtype), k3.astype(convt.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y3 = y3 * jnp.tile(scale, 4) + jnp.tile(offset, 4)
    y3 = jnp.maximum(y3, 0.0).astype(x.dtype)
    return depth_to_space2(y3, features)


def fused_conv_applicable(*, train: bool, kernel: tuple, strides: tuple,
                          dilation: tuple, padding, cout: int,
                          dtype) -> bool:
    """Whether ConvBN should route through the Pallas kernel.

    In auto mode on TPU this also arms the smoke-check fallback, so EVERY
    trace that could reach the kernel (model.init, training validation,
    bench stage programs — not just build_pipeline) degrades to XLA convs
    on a Mosaic failure instead of crashing."""
    if MODE == "off" or scoped_off():
        return False
    shape_ok = (not train and tuple(kernel) == (3, 3)
                and tuple(strides) == (1, 1) and tuple(dilation) == (1, 1)
                and padding == "SAME" and cout in (16, 18, 32, 36, 64)
                and dtype == jnp.bfloat16)
    if MODE == "force":
        return shape_ok
    # Measured routing policy (experiments/conv_kernel_ab.py, v5e, in-jit
    # floor-amortized; run-to-run variance ~5-10%, the 2026-08-19 runs in
    # experiments/PERF.md §5 are the table of record): the kernel wins
    # where XLA is badly lane-starved — Cout=16 (XLA ~9 TF/s vs pallas
    # ~13-15, 1.56-1.66x) and HRNet's Cout=18 @ S=7 (XLA 2.4 TF/s vs 4.8,
    # 1.96x; unlocked by the 8-aligned-t fix). Cout=32/36 (~0.6-0.9x) and
    # Cout=64 lose: the width-S supertile's (S+2)/S = 2x MXU overhead at
    # S=2 measured 0.67x, and a column-pair variant (N=2*Cout=128 lanes,
    # only 12/9 executed MACs) still measured 0.74x — both it and XLA's
    # conv plateau at ~60 TF/s raw on this layout, so the 1.33x MAC
    # overhead can't be bought back; the variant was removed. "force"
    # keeps the full supported set so tests exercise every geometry.
    if not (shape_ok and cout in (16, 18)
            and jax.default_backend() == "tpu"):
        return False
    if _TPU_SMOKE is None:
        # the smoke runs the kernel eagerly — skip the decision inside a
        # trace (jitted init); the next eager applicability check decides
        try:
            from jax._src.core import trace_state_clean
            if not trace_state_clean():
                return True
        except ImportError:
            pass
    return ensure_tpu_kernel_or_disable()
