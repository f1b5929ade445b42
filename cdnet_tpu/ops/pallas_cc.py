"""VMEM-resident min-propagation fixpoint for CC labeling / flood fill.

The post-processing block runs three label-propagation fixpoints per tile
(binary_fill_holes' border flood + a 4-connected CC + an 8-connected CC,
ops/postproc.py:75-105). The XLA implementation (ops/connected.py) is
correct but dispatch-bound: each sweep is ~300 small fused ops (two
bidirectional segmented associative_scans + neighbor mins + the while_loop
plumbing), measured ~1.6 ms/sweep at (8,256,256) with per-op fixed costs
dominating — ~70 ms/tile total for the instancing block (22% of e2e,
experiments/PERF.md §2).

This kernel keeps the whole map in VMEM and runs the SAME algorithm —
bidirectional segmented min-scans along rows and columns (Hillis-Steele
with reset flags, log2(W) steps) + a neighbor-min, _K_SWEEPS rounds per
launch with an outer XLA while_loop re-launching until the exact fixpoint
— with zero per-op dispatch between scan steps. Semantics identical to
:func:`cdnet_tpu.ops.connected.label`'s propagation (the raster relabel
tail stays in XLA); :func:`flood from seeds <cdnet_tpu.ops.morphology.
flood_reach>` is the same primitive with seed values 0.

Guarded like ops/pallas_conv: routed only on TPU (or MODE="force" with
interpret on CPU), smoke-verified at both a small and the largest routed
geometry (_MAX_PIXELS), and disabled process-wide on any Mosaic failure.
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MODE = _os.environ.get("CDNET_PALLAS_CC", "auto")

_INF = 2 ** 30  # python int: jnp scalars would be captured consts in the kernel
# Whole-map kernel VMEM model, recalibrated against the measured r3 failure
# (BENCH_r03: 78.11 MB scoped alloc at 512x896 s32 = 1.75 MB/array -> ~45
# live buffers: with the log-steps UNROLLED as pure SSA values, Mosaic's
# stack allocator gave every step's roll result its own slot and the 16 MB
# default scoped limit rejected it). Two fixes: (a) the Hillis-Steele scan
# state (sv, sr) lives in two explicit VMEM scratch REFS that every
# unrolled step loads from and stores back to, so the step temporaries die
# at each store and the live set stays ~a dozen arrays. (A fori_loop with
# a DYNAMIC pltpu.roll shift also fixes the footprint — measured compiling
# fine at 512x896 — but tpu.dynamic_rotate lowers to something linear in
# the shift: 1359 ms/run at 64x128 vs single-digit-ms with static shifts,
# so the steps stay unrolled with static shifts.) (b) the pallas_call
# raises the scoped limit to _VMEM_LIMIT (v5e has 128 MB physical VMEM;
# the 16 MB default just leaves headroom for XLA). The on-TPU smoke
# (ensure_tpu_kernel_or_disable) verifies the allocator actually accepts
# _MAX_PIXELS = 1024x1024 (the padded 1000^2 inference tile) before
# anything routes.
_MAX_PIXELS = 1024 * 1024
_VMEM_LIMIT = 110 * 1024 * 1024


def _log_steps(n: int) -> list[int]:
    steps, d = [], 1
    while d < n:
        steps.append(d)
        d *= 2
    return steps


def _fixpoint_kernel(v_ref, reset_ref, out_ref, sv_ref, sr_ref, *, h: int,
                     w: int, connectivity: int, use_refs: bool,
                     k_sweeps: int):
    """``k_sweeps`` rounds of segmented min-propagation over one (h, w)
    map in VMEM. The exact-fixpoint loop lives OUTSIDE the kernel as an
    XLA while_loop over this launch: an in-kernel lax.while_loop made
    Mosaic's compile ~50x slower (64x128: 88.9 s vs 1.6 s for the fixed-
    sweep body) and the outer loop's cost is one HBM round-trip of the map
    per K sweeps (~15 us at 1024^2) plus a launch, amortized by K.

    ``sv_ref``/``sr_ref``: (h, w) int32 VMEM scratch holding the running
    scan state. With ``use_refs`` (the compiled path) every unrolled
    Hillis-Steele step loads from and stores back to these two refs, so
    Mosaic reuses two buffers instead of leaving one live SSA value per
    step (the r3 VMEM-OOM; see the module-level VMEM-model note). The
    interpret path keeps SSA values — ref stores cost a full-array copy
    per step in the interpreter (measured 80 s/test vs seconds) and the
    interpreter has no VMEM to economize."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # reset flags stay int32 (0/1) throughout: Mosaic cannot lower
    # tpu.dynamic_rotate (pltpu.roll) on i1 vectors — rolling a bool state
    # here fails remote compile on real v5e hardware ("unsupported shape/
    # type"), which silently demoted the whole kernel to the XLA path
    reset_i = reset_ref[...]
    mask = reset_i == 0

    def seg_scan(v, axis):
        """Bidirectional segmented min-scan along ``axis`` (Hillis-Steele:
        value INF / reset 1 flow in at the segment borders). Static roll
        shifts only — tpu.dynamic_rotate runs ~100x slower."""
        n = w if axis == 1 else h
        pos = cols if axis == 1 else rows
        for rev in (False, True):
            if use_refs:
                sv_ref[...] = v
                sr_ref[...] = reset_i
                get = lambda: (sv_ref[...], sr_ref[...])  # noqa: E731

                def put(nsv, nsr):
                    sv_ref[...] = nsv
                    sr_ref[...] = nsr
            else:
                state = [v, reset_i]
                get = lambda: tuple(state)  # noqa: E731

                def put(nsv, nsr, state=state):
                    state[0], state[1] = nsv, nsr
            for d in _log_steps(n):
                # neighbor at distance d BEHIND the scan direction
                shift = (n - d) if rev else d
                sv, sr = get()
                edge = pos > (n - 1) - d if rev else pos < d
                nv = jnp.where(edge, _INF, pltpu.roll(sv, shift, axis))
                nr = jnp.where(edge, 1, pltpu.roll(sr, shift, axis))
                put(jnp.where(sr != 0, sv, jnp.minimum(sv, nv)), sr | nr)
            v = jnp.minimum(v, get()[0])
        return jnp.where(mask, v, _INF)

    def axis_min3(v, axis):
        """min(v, v shifted +-1 along axis) with INF at the image edge."""
        n = h if axis == 0 else w
        pos = rows if axis == 0 else cols
        up = jnp.where(pos >= n - 1, _INF, pltpu.roll(v, n - 1, axis))
        dn = jnp.where(pos < 1, _INF, pltpu.roll(v, 1, axis))
        return jnp.minimum(v, jnp.minimum(up, dn))

    def neighbor_min(v):
        # min over the neighborhood INCLUDING self (self is free: the
        # fixpoint is monotone). conn=2: 3x3 box = row-min3 then col-min3
        # (4 rolls, vs 12 for the naive 8-offset form — fewer live VMEM
        # temporaries, see the module VMEM-model note). conn=1: cross =
        # min(row-min3(v), col-min3(v)).
        if connectivity == 2:
            out = axis_min3(axis_min3(v, 1), 0)
        else:
            out = jnp.minimum(axis_min3(v, 1), axis_min3(v, 0))
        return jnp.where(mask, out, _INF)

    def sweep(v):
        v = seg_scan(v, axis=1)
        v = seg_scan(v, axis=0)
        return neighbor_min(v)

    v = jnp.where(mask, v_ref[...], _INF)
    for _ in range(k_sweeps):
        v = sweep(v)
    out_ref[...] = v


def min_fixpoint(vals: jnp.ndarray, mask: jnp.ndarray,
                 connectivity: int = 2, interpret: bool | None = None):
    """Propagate per-segment minima of ``vals`` over the True pixels of
    ``mask`` to the exact fixpoint. Pixels outside ``mask`` return _INF.

    ``interpret`` defaults from the backend (interpret off-TPU) so callers
    carry no routing logic. vmap-safe: batched calls run one whole-VMEM
    kernel per map via lax.map (each map's fixpoint is independent; the
    kernel is single-block) — callers with WIDE batch axes should prefer
    the XLA path (see pallas_gate.scoped_disable call sites)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _make_fp(connectivity, interpret)(vals, mask)


# sweeps per kernel launch: each launch pays one HBM round-trip of the map
# and a dispatch (~tens of us), so larger K amortizes those — but Mosaic's
# stack allocator charges VMEM per UNROLLED step, and K=2 measured 118 MB
# scoped at 1000x1024 (over even the raised limit). K=1 keeps the body at
# one sweep (~60 MB at 1024^2); convergence costs a few more cheap launches.
_K_SWEEPS = 1


@functools.lru_cache(maxsize=None)
def _make_fp(connectivity: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def op(vals, mask):
        h, w = vals.shape
        # align to the (8, 128) int32 tiling (real tiles are e.g. 1000x1000);
        # pad pixels enter as reset/background, so semantics are unchanged
        # and the in-kernel rolls see an exact tile grid
        hp = -(-h // 8) * 8
        wp = -(-w // 128) * 128
        vals = vals.astype(jnp.int32)
        reset = (~mask.astype(bool)).astype(jnp.int32)
        if (hp, wp) != (h, w):
            vals = jnp.pad(vals, ((0, hp - h), (0, wp - w)),
                           constant_values=_INF)
            reset = jnp.pad(reset, ((0, hp - h), (0, wp - w)),
                            constant_values=1)

        launch = pl.pallas_call(
            functools.partial(_fixpoint_kernel, h=hp, w=wp,
                              connectivity=connectivity,
                              use_refs=not interpret,
                              k_sweeps=_K_SWEEPS),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            scratch_shapes=[pltpu.VMEM((hp, wp), jnp.int32),
                            pltpu.VMEM((hp, wp), jnp.int32)],
            # raise the 16 MB default scoped-VMEM limit: the whole-map
            # fixpoint legitimately holds ~a dozen full-map s32 buffers
            # (~50 MB at 1024^2); v5e has 128 MB physical VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )

        # exact fixpoint: re-launch K more sweeps until nothing changes
        def cond(state):
            return state[1]

        def body(state):
            v, _ = state
            nv = launch(v, reset)
            return nv, jnp.any(nv != v)

        out, _ = jax.lax.while_loop(cond, body,
                                    (launch(vals, reset), jnp.bool_(True)))
        return out[:h, :w]

    @op.def_vmap
    def _op_vmap(axis_size, in_batched, vals, mask):
        if not in_batched[0]:
            vals = jnp.broadcast_to(vals, (axis_size,) + vals.shape)
        if not in_batched[1]:
            mask = jnp.broadcast_to(mask, (axis_size,) + mask.shape)
        out = jax.lax.map(lambda vm: op(vm[0], vm[1]), (vals, mask))
        return out, True

    return op


_TPU_SMOKE: bool | None = None


@functools.lru_cache(maxsize=None)
def _smoke_program(h: int, w: int, connectivity: int):
    """One jit program that runs the kernel AND the XLA scan fixpoint on a
    deterministic on-device pattern and returns their exact equality.

    Everything stays on device: the old smoke built numpy inputs eagerly
    and fetched full maps, and the tunnel's eager transfers run at
    ~25 us/BYTE (measured: a 3.5 MB eager upload cost ~95 s/call), so a
    1024^2 smoke took ~10 minutes. Here nothing is uploaded and ONE bool
    comes back. Both fixpoints propagate the same seed minima, so the
    results must be bit-equal — stronger than the old per-component
    consistency check."""
    from cdnet_tpu.ops import connected as C

    def prog():
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        # structured blobs + a sparse deterministic lattice of noise
        # pixels: converges in a few sweeps in BOTH implementations (a
        # 50%-density noise mask percolates at this size and its giant
        # component costs seconds in the dispatch-bound XLA oracle)
        m = ((rows % 64 < 40) & (cols % 64 < 40)) | \
            ((rows * 7919 + cols * 104729) % 97 == 0)
        v = jnp.where(m, rows * w + cols, _INF)
        got = min_fixpoint(v, m, connectivity)

        def sweep(x):
            x = C._segmented_min_scan(x, m, axis=1)
            x = C._segmented_min_scan(x, m, axis=0)
            return C._neighbor_min(x, m, connectivity)

        def cond(state):
            return state[1]

        def body(state):
            nv = sweep(state[0])
            return nv, jnp.any(nv != state[0])

        want, _ = jax.lax.while_loop(cond, body,
                                     (sweep(v), jnp.bool_(True)))
        want = jnp.where(m, want, _INF)
        return jnp.all(got == want)

    return jax.jit(prog)


def ensure_tpu_kernel_or_disable() -> bool:
    """Compile + numerics-check the fixpoint kernel on TPU once per process
    (small AND the largest routed geometry); disable on any failure."""
    global _TPU_SMOKE, MODE
    if MODE != "auto" or jax.default_backend() != "tpu":
        return MODE != "off"
    if _TPU_SMOKE is None:
        _TPU_SMOKE = False  # provisional: no re-entry while smoking
        try:
            # small + the largest geometry the router will ever send
            # (_MAX_PIXELS = 1024x1024, the padded 1000^2 inference tile);
            # anything bigger stays on the XLA scans
            for h, w in ((64, 128), (1024, 1024)):
                if not bool(_smoke_program(h, w, 2)()):
                    raise ValueError(
                        f"kernel/XLA fixpoint mismatch at {h}x{w}")
            _TPU_SMOKE = True
        except Exception as e:
            from cdnet_tpu.ops.pallas_gate import backend_alive
            if not backend_alive():
                # the BACKEND is down, not the kernel: every program fails.
                # Leave the smoke undecided (a later call retries) and
                # surface the outage instead of silently degrading.
                _TPU_SMOKE = None
                raise
            import warnings
            warnings.warn(f"pallas CC fixpoint disabled: "
                          f"{type(e).__name__}: {e}; using XLA scans")
            _TPU_SMOKE = False
            MODE = "off"
    return _TPU_SMOKE


def is_active() -> bool:
    """Whether eligible maps would route through the kernel right now
    (bench JSON honesty: "force" counts as active)."""
    if MODE == "force":
        return True
    return (MODE == "auto" and jax.default_backend() == "tpu"
            and _TPU_SMOKE is True)


def fixpoint_applicable(h: int, w: int) -> bool:
    """Route connected.label / flood_reach through the kernel?"""
    from cdnet_tpu.ops.pallas_gate import scoped_off
    if MODE == "off" or scoped_off():
        return False
    # VMEM cap on the PADDED map (the op aligns to the (8,128) tiling)
    ok = (-(-h // 8) * 8) * (-(-w // 128) * 128) <= _MAX_PIXELS
    if MODE == "force":
        return ok
    if not (ok and jax.default_backend() == "tpu"):
        return False
    if _TPU_SMOKE is None:
        # the smoke runs the kernel + the XLA oracle eagerly — skip the
        # decision inside a trace; the next eager check decides (the
        # choose_model / build_pipeline chokepoints arm it eagerly)
        try:
            from jax._src.core import trace_state_clean
            if not trace_state_clean():
                return True
        except ImportError:
            pass
    return ensure_tpu_kernel_or_disable()
