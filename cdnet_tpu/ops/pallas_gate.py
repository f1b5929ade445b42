"""Trace-scoped disable gate shared by every Pallas kernel.

pallas_call carries no SPMD partitioning rule, so a kernel traced inside a
>1-device mesh program would fail to partition (or force replication).
``scoped_disable(True)`` is entered at TRACE time around such program
bodies (build_pipeline's _body, the sharded eval steps), and each kernel's
``*_applicable`` check consults :func:`scoped_off` — scoping the fallback
to the sharded trace instead of flipping any process-global mode.
"""
from __future__ import annotations

_SCOPED_OFF: list[bool] = []


def backend_alive() -> bool:
    """Whether a PLAIN XLA program runs on the default backend right now.

    The kernel smokes (`ensure_tpu_kernel_or_disable`) must distinguish "the
    Pallas kernel regressed" (degrade to XLA, keep going) from "the TPU
    backend/tunnel is down" (EVERY program fails — observed as
    FAILED_PRECONDITION storms when the axon remote restarts). Disabling the
    kernels on the latter would silently record a no-pallas benchmark run;
    instead the smoke re-raises so the caller sees the real outage."""
    import jax
    import jax.numpy as jnp
    try:
        return bool(jax.jit(jnp.sum)(jnp.ones((8,), jnp.float32)) == 8.0)
    except Exception:  # noqa: BLE001 — any failure means "down"
        return False


def scoped_off() -> bool:
    """True while inside a scoped_disable(True) block (trace time)."""
    return bool(_SCOPED_OFF)


class scoped_disable:
    """Context manager: disable Pallas kernel routing for traces inside the
    block when ``flag`` is true (no-op otherwise)."""

    def __init__(self, flag: bool):
        self.flag = flag

    def __enter__(self):
        if self.flag:
            _SCOPED_OFF.append(True)
        return self

    def __exit__(self, *exc):
        if self.flag:
            _SCOPED_OFF.pop()
        return False
