"""f32 VPU roofline probes for the RNS kernel (v6 tuning).

Measures chained f32 fma / mul / floor / Barrett-red / digit-split rates at
kernel-realistic shapes, to compute the true headroom of the RNS Poseidon
kernel (which ablations show is VPU-bound, not MXU-bound).
"""

import time

import jax
if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, W = 48, 2048


def _time(build, lo=2000, hi=30000, reps=3):
    f_lo, f_hi = build(lo), build(hi)
    np.asarray(f_lo()); np.asarray(f_hi())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f_lo())
        t1 = time.perf_counter(); np.asarray(f_hi())
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (hi - lo))
    return best


def _wrap(body, rows=ROWS):
    def build(iters):
        def kernel(x_ref, c_ref, o_ref):
            c = c_ref[...]
            x = jax.lax.fori_loop(
                0, iters, lambda i, x: body(x, c), x_ref[...]
            )
            o_ref[...] = jnp.sum(x, axis=0, keepdims=True)

        x0 = jnp.full((rows, W), 1.5, jnp.float32)
        c0 = jnp.full((rows, 1), 0.999, jnp.float32)

        @jax.jit
        def run():
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x0, c0)

        return run

    return build


def report(name, body, ops_per_iter, rows=ROWS):
    s = _time(_wrap(body, rows))
    lane_ops = rows * W * ops_per_iter
    print(f"{name:28s} {s*1e9:8.1f} ns/iter  {lane_ops/s/1e12:6.2f} Tlane-op/s", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    # 1 fma per element per iter (loop-carried)
    report("fma chain", lambda x, c: x * c + c, 1)
    # plain mul
    report("mul chain", lambda x, c: x * c, 1)
    # floor
    report("floor+mul", lambda x, c: jnp.floor(x * c) + x, 2)
    # Barrett red: q=floor(x*inv); x - q*m  (3 "ops")
    report("barrett red", lambda x, c: x - jnp.floor(x * c) * c + c, 3)
    # digit split: d1=floor(x*2^-6); d0=x-64*d1; recombine to keep carried
    def dsplit(x, c):
        d1 = jnp.floor(x * jnp.float32(2.0**-6))
        d0 = x - d1 * jnp.float32(64.0)
        return d0 + d1 * c
    report("digit split", dsplit, 3)
    # f32->bf16->f32 cast pair
    report("bf16 cast pair", lambda x, c: x.astype(jnp.bfloat16).astype(jnp.float32) * c, 2)
    # select / compare
    report("cmp+select", lambda x, c: jnp.where(x > c, x - c, x), 2)
    # 24-row ops (one base): same chain at half rows
    report("fma chain rows=24", lambda x, c: x * c + c, 1, rows=24)
    # tiny-row op (lambda rows)
    report("fma chain rows=1", lambda x, c: x * c + c, 1, rows=1)
