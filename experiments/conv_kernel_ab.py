"""TPU microbench: XLA conv3x3 vs pallas supertile kernel at DAM shapes.

Methodology per memory notes: in-jit scalar reduction fetched per iteration
(block_until_ready is fire-and-forget through the axon tunnel), subtract the
measured dispatch floor.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp

print(jax.devices(), flush=True)

from cdnet_tpu.ops.pallas_conv import conv3x3_affine_act


def floor_s():
    tiny = jnp.zeros((8,), jnp.float32)
    f = jax.jit(jnp.max)
    float(jax.device_get(f(tiny)))
    t0 = time.time()
    for _ in range(10):
        float(jax.device_get(f(tiny)))
    return (time.time() - t0) / 10


FLOOR = floor_s()
print(f"floor {FLOOR*1e3:.1f} ms", flush=True)


def bench(f, *args, iters=6):
    g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
    float(jax.device_get(g(*args)))  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        float(jax.device_get(g(*args)))
    return (time.time() - t0) / iters - FLOOR


rng = np.random.RandomState(0)
CASES = [
    ("dam64", (8, 1024, 1024, 64), 64),
    ("dec16", (8, 1024, 1024, 80), 16),
    ("dec32", (8, 512, 512, 96), 32),
    # hr18 is EXPERIMENTAL: cout=18 (S=7) is a geometry the router never
    # enables and the smoke never verifies — this row decides whether to
    # whitelist the HRNet channel counts, and may legitimately fail
    ("hr18", (8, 256, 256, 18), 18),
]
for name, xshape, cout in CASES:
    cin = xshape[-1]
    x = jnp.asarray(rng.randn(*xshape), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.bfloat16)
    s = jnp.asarray(rng.rand(cout) + 0.5, jnp.float32)
    o = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)

    def xla_conv(x, k, s, o):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(y * s + o, 0.0).astype(jnp.bfloat16)

    gflop = 2 * 9 * np.prod(xshape[:3]) * cin * cout / 1e9
    try:
        t_x = bench(xla_conv, x, k, s, o)
        t_p = bench(lambda x, k, s, o: conv3x3_affine_act(
            x, k, s, o, relu=True), x, k, s, o)
        # numerics check
        a = np.asarray(conv3x3_affine_act(x, k, s, o, relu=True), np.float32)
        b = np.asarray(xla_conv(x, k, s, o), np.float32)
        err = float(np.max(np.abs(a - b)))
        print(f"{name}: xla {t_x*1e3:7.2f} ms ({gflop/t_x/1e3:6.1f} TF/s) | "
              f"pallas {t_p*1e3:7.2f} ms ({gflop/t_p/1e3:6.1f} TF/s) | "
              f"speedup {t_x/t_p:4.2f}x | max_err {err:.4f}", flush=True)
    except Exception as e:  # experimental geometries may fail Mosaic
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


# --- ConvTranspose phase-decomposition A/B (up5 shape) ---
from cdnet_tpu.ops.pallas_conv import convt_phase_kernel, depth_to_space2

cin, cout = 32, 16
x = jnp.asarray(rng.randn(8, 512, 512, cin), jnp.bfloat16)
kt = jnp.asarray(rng.randn(4, 4, cin, cout) * 0.1, jnp.bfloat16)
s = jnp.asarray(rng.rand(cout) + 0.5, jnp.float32)
o = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)

def xla_convt(x, kt, s, o):
    y = jax.lax.conv_transpose(
        x, kt, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=False)
    return jnp.maximum(y.astype(jnp.float32) * s + o, 0).astype(jnp.bfloat16)

def fused_convt(x, kt, s, o):
    y3 = conv3x3_affine_act(x, convt_phase_kernel(kt), jnp.tile(s, 4),
                            jnp.tile(o, 4), relu=True)
    return depth_to_space2(y3, cout)

t_x = bench(xla_convt, x, kt, s, o)
t_p = bench(fused_convt, x, kt, s, o)
print(f"convT up5: xla {t_x*1e3:7.2f} ms | fused {t_p*1e3:7.2f} ms | "
      f"speedup {t_x/t_p:4.2f}x", flush=True)
