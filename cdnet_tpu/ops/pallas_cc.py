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
with reset flags, log2(W) steps) + a neighbor-min, iterated to the exact
fixpoint by an in-kernel while_loop — with zero HBM round-trips and zero
per-op dispatch between sweeps. Semantics identical to
:func:`cdnet_tpu.ops.connected.label`'s propagation (the raster relabel
tail stays in XLA); :func:`flood from seeds <cdnet_tpu.ops.morphology.
flood_reach>` is the same primitive with seed values 0.

Guarded like ops/pallas_conv: routed only on TPU (or MODE="force" with
interpret on CPU), smoke-verified at both a small and the largest routed
geometry (_MAX_PIXELS), and disabled process-wide on any Mosaic failure.
Maps past _MAX_PIXELS (e.g. the 1000^2 inference tiles) keep the XLA scan
path: the whole-map fixpoint's ~9 live s32 arrays exceed the v5e's ~16 MB
VMEM there (measured: Mosaic's allocator rejects the 1024^2 geometry).
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
# whole-map kernel: the fixpoint keeps ~9 live (h, w) s32 arrays in VMEM
# (v/reset/out + the scan state sv/sr/nv/nr + the iotas), so the map must
# fit ~16 MB / 9 ≈ 1.8 MB -> 512x896 s32 max. Measured on real v5e: the
# 1024^2 geometry is REJECTED by Mosaic's VMEM allocator (scoped allocs
# exceed capacity), so large maps keep the XLA scan path until a
# block-grid + boundary-merge variant exists.
_MAX_PIXELS = 512 * 896


def _log_steps(n: int) -> list[int]:
    steps, d = [], 1
    while d < n:
        steps.append(d)
        d *= 2
    return steps


def _fixpoint_kernel(v_ref, reset_ref, out_ref, *, h: int, w: int,
                     connectivity: int):
    """Segmented min-propagation to fixpoint over one (h, w) map in VMEM."""
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
        value INF / reset 1 flow in at the segment borders)."""
        n = w if axis == 1 else h
        pos = cols if axis == 1 else rows
        for rev in (False, True):
            sv, sr = v, reset_i
            for d in _log_steps(n):
                # neighbor at distance d BEHIND the scan direction
                shift = (-d) % n if rev else d
                nv = pltpu.roll(sv, shift, axis)
                nr = pltpu.roll(sr, shift, axis)
                edge = pos > n - 1 - d if rev else pos < d
                nv = jnp.where(edge, _INF, nv)
                nr = jnp.where(edge, 1, nr)
                sv = jnp.where(sr != 0, sv, jnp.minimum(sv, nv))
                sr = sr | nr
            v = jnp.minimum(v, sv)
        return jnp.where(mask, v, _INF)

    def neighbor_min(v):
        out = v
        offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if connectivity == 2:
            offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        for dy, dx in offs:
            nv = v
            if dy:
                nv = pltpu.roll(nv, (-dy) % h, 0)
                edge = rows >= h - dy if dy > 0 else rows < -dy
                nv = jnp.where(edge, _INF, nv)
            if dx:
                nv = pltpu.roll(nv, (-dx) % w, 1)
                edge = cols >= w - dx if dx > 0 else cols < -dx
                nv = jnp.where(edge, _INF, nv)
            out = jnp.minimum(out, nv)
        return jnp.where(mask, out, _INF)

    def sweep(v):
        v = seg_scan(v, axis=1)
        v = seg_scan(v, axis=0)
        return neighbor_min(v)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        v, _ = state
        nv = sweep(v)
        return nv, jnp.any(nv != v)

    v0 = jnp.where(mask, v_ref[...], _INF)
    v, _ = jax.lax.while_loop(cond, body, (sweep(v0), jnp.bool_(True)))
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
        out = pl.pallas_call(
            functools.partial(_fixpoint_kernel, h=hp, w=wp,
                              connectivity=connectivity),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            interpret=interpret,
        )(vals, reset)
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


def ensure_tpu_kernel_or_disable() -> bool:
    """Compile + numerics-check the fixpoint kernel on TPU once per process
    (small AND full-size geometry); disable on any failure."""
    global _TPU_SMOKE, MODE
    if MODE != "auto" or jax.default_backend() != "tpu":
        return MODE != "off"
    if _TPU_SMOKE is None:
        # provisional False: the smoke's oracle call (connected.label)
        # consults fixpoint_applicable and must take the XLA path, not
        # recurse back into this smoke
        _TPU_SMOKE = False
        try:
            import numpy as np
            rng = np.random.RandomState(0)
            # small + the largest geometry the router will ever send
            # (_MAX_PIXELS); anything bigger stays on the XLA scans
            for h, w in ((64, 128), (512, 896)):
                # structured blobs + sparse noise: converges in a few
                # sweeps in BOTH implementations (a 50%-density noise mask
                # percolates at 1024^2 and its giant component costs
                # seconds of startup in the dispatch-bound XLA oracle)
                yy, xx = np.mgrid[:h, :w]
                m = ((yy % 64 < 40) & (xx % 64 < 40)) | (rng.rand(h, w) > .97)
                v = jnp.where(jnp.asarray(m),
                              jnp.arange(h * w, dtype=jnp.int32
                                         ).reshape(h, w), _INF)
                got = np.asarray(min_fixpoint(v, jnp.asarray(m), 2))
                from cdnet_tpu.ops import connected
                want_lab, _ = connected.label(jnp.asarray(m), 2)
                if not (((got != int(_INF)) == m).all()):
                    raise ValueError("fixpoint mask mismatch")
                # per-XLA-component the propagated min must be one constant,
                # and distinct components must get distinct values
                lab = np.asarray(want_lab)[m]
                g = got[m]
                n_lab = int(lab.max()) if lab.size else 0
                lo = np.full(n_lab + 1, np.iinfo(np.int64).max)
                hi = np.full(n_lab + 1, np.iinfo(np.int64).min)
                np.minimum.at(lo, lab, g)
                np.maximum.at(hi, lab, g)
                if n_lab and not (lo[1:] == hi[1:]).all():
                    raise ValueError("fixpoint split a component")
                if n_lab and np.unique(lo[1:]).size != n_lab:
                    raise ValueError("fixpoint merged distinct components")
            _TPU_SMOKE = True
        except Exception as e:
            import warnings
            warnings.warn(f"pallas CC fixpoint disabled: "
                          f"{type(e).__name__}: {e}; using XLA scans")
            _TPU_SMOKE = False
            MODE = "off"
    return _TPU_SMOKE


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
