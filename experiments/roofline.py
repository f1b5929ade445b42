"""Analytic roofline for the flagship inference forward (VERDICT r3 item:
"speed-of-light" must be a number, not a slogan).

Walks the jaxpr of the 8-view TTA forward (no compile, no device) and
extracts every conv_general_dilated / dot_general with its operand shapes.
For each op it computes

  flops      = 2 * N*H*W * Cin*Cout * kh*kw / (sh*sw)
  hbm bytes  = input + output + weights (activation dtype width; weights f32)
  t_sol      = max(flops / PEAK_FLOPS, bytes / PEAK_BW)

and sums. The per-op max() is the roofline: an op is compute-bound when its
arithmetic intensity flops/bytes exceeds PEAK_FLOPS/PEAK_BW (~240 flop/byte
on v5e bf16), else HBM-bound. The sum is a LOWER bound on device time — it
assumes perfect overlap of everything else (elementwise epilogues fused, no
relayouts, pooling/upsample traffic free), so measured/SOL is an MFU-style
"fraction of speed-of-light" that is strictly conservative.

TPU v5e (v5 lite) single chip: 197 TFLOP/s bf16, 819 GB/s HBM.

Usage: python experiments/roofline.py  (prints per-layer table + totals)
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_FLOPS = 197e12   # bf16 MXU, TPU v5e
PEAK_BW = 819e9       # HBM GB/s, TPU v5e


def conv_cost(eqn):
    """(flops, bytes) for one conv_general_dilated eqn."""
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    # output spatial elements x per-element dot length (Cin * prod(k))
    out_spatial = int(np.prod([out.shape[i] for i in dn.out_spec[2:]]))
    n = out.shape[dn.out_spec[0]]
    cout = out.shape[dn.out_spec[1]]
    cin = lhs.shape[dn.lhs_spec[1]]
    ksp = [rhs.shape[i] for i in dn.rhs_spec[2:]]
    groups = eqn.params.get("feature_group_count", 1)
    flops = 2.0 * n * out_spatial * cout * (cin // groups) * np.prod(ksp)
    bytes_ = (lhs.size * lhs.dtype.itemsize + out.size * out.dtype.itemsize
              + rhs.size * rhs.dtype.itemsize)
    return flops, bytes_, (tuple(lhs.shape), tuple(rhs.shape), tuple(out.shape))


def dot_cost(eqn):
    a, b = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
    contract = int(np.prod([a.shape[i] for i in lc]))
    flops = 2.0 * out.size * contract
    bytes_ = (a.size * a.dtype.itemsize + b.size * b.dtype.itemsize
              + out.size * out.dtype.itemsize)
    return flops, bytes_, (tuple(a.shape), tuple(b.shape), tuple(out.shape))


def walk(jaxpr, rows):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            rows.append(("conv",) + conv_cost(eqn))
        elif eqn.primitive.name == "dot_general":
            rows.append(("dot",) + dot_cost(eqn))
        for sub in jax.core.jaxprs_in_params(eqn.params) \
                if hasattr(jax.core, "jaxprs_in_params") else []:
            walk(sub, rows)
        # recurse into call/scan/while bodies
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):           # ClosedJaxpr
                walk(v.jaxpr, rows)
            elif isinstance(v, (list, tuple)):
                for u in v:
                    if hasattr(u, "jaxpr"):
                        walk(u.jaxpr, rows)


def analyze(fn, *abstract_args) -> dict:
    """Roofline totals for ``fn(*abstract_args)`` (abstract trace, no
    compile, no device). Returns {tflop, gb, t_compute_ms, t_hbm_ms,
    sol_ms, rows}. Importable by bench.py so the reported speed-of-light
    always matches the benched model/shape instead of a stale constant."""
    jaxpr = jax.make_jaxpr(fn)(*abstract_args)
    rows = []
    walk(jaxpr.jaxpr, rows)
    tot_f = tot_b = t_comp = t_bw = t_sol = 0.0
    for _, f, b, _ in rows:
        tc, tb = f / PEAK_FLOPS, b / PEAK_BW
        tot_f += f; tot_b += b; t_comp += tc; t_bw += tb; t_sol += max(tc, tb)
    return {"tflop": tot_f / 1e12, "gb": tot_b / 1e9,
            "t_compute_ms": t_comp * 1e3, "t_hbm_ms": t_bw * 1e3,
            "sol_ms": t_sol * 1e3, "rows": rows}


def main():
    from cdnet_tpu.config import Config
    from cdnet_tpu.infer import make_model_fn
    from cdnet_tpu.models import choose_model
    from cdnet_tpu.ops import tta as T

    size = int(os.environ.get("ROOFLINE_SIZE", "1024"))
    cfg = Config()
    # ROOFLINE_MODEL=HRNet18_rev1 prices the paper flagship instead of the
    # default UNet2RevA1_vgg16 (VERDICT r3 #4 receipt)
    cfg.model.model_name = os.environ.get("ROOFLINE_MODEL",
                                          cfg.model.model_name)
    model = choose_model(cfg)   # bf16 compute
    model_fn = make_model_fn(model)

    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda k: model.init(k, x0, train=False), jax.random.PRNGKey(0))
    img = jax.ShapeDtypeStruct((size, size, 3), jnp.float32)

    def forward(v, image):
        return model_fn(v, T.expand(image))

    res = analyze(forward, variables, img)
    print(f"{'op':5} {'GFLOP':>9} {'MB':>8} {'int.':>7} {'bound':>7} "
          f"{'t_sol ms':>9}  shapes")
    for kind, f, b, shapes in res["rows"]:
        ai = f / b
        tc, tb = f / PEAK_FLOPS, b / PEAK_BW
        print(f"{kind:5} {f/1e9:9.1f} {b/1e6:8.1f} {ai:7.1f} "
              f"{'MXU' if tc >= tb else 'HBM':>7} {max(tc, tb)*1e3:9.3f}  "
              f"{shapes[0]}x{shapes[1]}->{shapes[2]}")
    print(f"\nTOTAL {len(res['rows'])} matmul/conv ops: "
          f"{res['tflop']:.2f} TFLOP, {res['gb']:.2f} GB touched")
    print(f"  pure-compute time : {res['t_compute_ms']:7.1f} ms "
          f"({PEAK_FLOPS/1e12:.0f} TF/s)")
    print(f"  pure-HBM time     : {res['t_hbm_ms']:7.1f} ms "
          f"({PEAK_BW/1e9:.0f} GB/s)")
    print(f"  roofline (SOL)    : {res['sol_ms']:7.1f} ms  "
          f"-> {1e3/res['sol_ms']:.1f} tiles/s forward-only ceiling")


if __name__ == "__main__":
    main()
