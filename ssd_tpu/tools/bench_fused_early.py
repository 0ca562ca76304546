"""Micro-benchmark: ops/fused_early.py vs XLA's own ds1+ds2 fusions.

Run from the repo root on a real chip. Reproduces the honest-negatives
row in BENCHMARKS.md ("packed fused early-block kernel"): the scanned
single-jit loop with a final scalar fetch is the only trustworthy
measurement through the relay.
"""
import time
import jax, jax.numpy as jnp
import numpy as np
from ssd_tpu.constants import BATCH_NORM_EPSILON
from ssd_tpu.models.layers import DepthwiseSeparable
from ssd_tpu.models.mobilenet import MobileNetV1
from ssd_tpu.ops import fused_early

rng = np.random.default_rng(0)
m = MobileNetV1(1.0, "bfloat16")
variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
params = jax.device_get(variables["params"])
stats = jax.device_get(variables["batch_stats"])
folded = fused_early.fold_early_params(
    {"params": {"backbone": params}, "batch_stats": {"backbone": stats}},
    BATCH_NORM_EPSILON, w_img=320)

N, H, W, C1 = 32, 320, 320, 32
x = jnp.asarray(rng.normal(0, 1, (N, H, W, C1)), jnp.bfloat16)

def ref_fn(x):
    y = DepthwiseSeparable(64, compute_dtype="bfloat16").apply(
        {"params": params["ds1"], "batch_stats": stats["ds1"]}, x, False)
    return DepthwiseSeparable(128, strides=2, compute_dtype="bfloat16").apply(
        {"params": params["ds2"], "batch_stats": stats["ds2"]}, y, False)

def fused_fn(x):
    return fused_early.fused_ds1_ds2(x, folded)

def run(name, fn, iters=20):
    @jax.jit
    def loop(x0):
        def body(c, _):
            o = fn(c)
            # feed a slice of the output back so iterations serialize
            c = c.at[:, :160, :160, :32].add(o[..., :32] * jnp.bfloat16(1e-6))
            return c, ()
        xN, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(xN.astype(jnp.float32))
    v = float(loop(x))
    t0 = time.perf_counter()
    v = float(loop(x))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms/iter (v={v:.1f})")

# correctness on chip
a = np.asarray(jax.jit(ref_fn)(x), np.float32)
bq = np.asarray(jax.jit(fused_fn)(x), np.float32)
print("max abs diff:", np.abs(a - bq).max(), "mean:", np.abs(a - bq).mean())
run("xla  ", ref_fn)
run("fused", fused_fn)
