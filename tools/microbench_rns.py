"""Micro-benchmarks for RNS-Montgomery Poseidon kernel design (round 2).

Measures, on the real TPU chip, the per-op costs that decide the RNS kernel
structure (PERFORMANCE.md plan item 2):
  * u32 elementwise multiply throughput (is 32-bit mul full VPU rate?)
  * pseudo-Mersenne fold chain cost (x mod (2^14 - c))
  * small bf16 matmul call cost at RNS extension shapes (57,38)@(38,W)
  * int8 x int8 -> int32 matmul support + cost (v5e has 2x int8 MXU rate)
  * widths W in {1024, 2048, 4096}

Methodology: differential timing (see PERFORMANCE.md) — each measurement
runs the op-under-test `iters` times inside a fori_loop in ONE Pallas
kernel, with a loop-carried dependency so Mosaic cannot hoist or dedup;
cost = (t(K2) - t(K1)) / (K2 - K1).  A tiny f32 sum is fetched to force
execution (block_until_ready does not sync under the axon tunnel).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time_kernel(build, iters_lo=50, iters_hi=250, reps=3):
    f_lo = build(iters_lo)
    f_hi = build(iters_hi)
    # warmup/compile
    np.asarray(f_lo())
    np.asarray(f_hi())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f_lo()
        np.asarray(r)
        t1 = time.perf_counter()
        r = f_hi()
        np.asarray(r)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (iters_hi - iters_lo))
    return best  # seconds per iteration


def _wrap(kernel_body, shapes_u32, W):
    """Build a pallas_call running kernel_body iters times on u32 state."""

    def build(iters):
        def kernel(x_ref, o_ref):
            def body(i, x):
                return kernel_body(i, x)

            x = jax.lax.fori_loop(0, iters, body, x_ref[...])
            o_ref[...] = jnp.sum(x.astype(jnp.int32).astype(jnp.float32), axis=0, keepdims=True)

        rows = shapes_u32
        x0 = jnp.ones((rows, W), jnp.uint32)

        @jax.jit
        def run():
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x0)

        return run

    return build


def bench_u32_mul(rows, W):
    """rows*W u32 multiplies per iteration (loop-carried)."""

    def body(i, x):
        return (x * (x | jnp.uint32(1))) & jnp.uint32(0x7FFF)

    t = _time_kernel(_wrap(body, rows, W))
    return t, rows * W  # time per iter, muls per iter


def bench_u32_add(rows, W):
    def body(i, x):
        return (x + (x ^ jnp.uint32(3))) & jnp.uint32(0xFFFF)

    t = _time_kernel(_wrap(body, rows, W))
    return t, rows * W


def bench_fold(rows, W):
    """One pseudo-Mersenne fold: (x & MASK14) + c*(x >> 14)."""

    def body(i, x):
        return ((x & jnp.uint32(0x3FFF)) + jnp.uint32(37) * (x >> 14)) & jnp.uint32(
            0xFFFFFF
        )

    t = _time_kernel(_wrap(body, rows, W))
    return t, rows * W


def bench_matmul_bf16(K_rows, K_cols, W, pad_to=None):
    """(K_rows, K_cols) @ (K_cols, W) bf16 matmul with f32 accum."""
    M = np.random.randint(0, 100, (K_rows, K_cols)).astype(np.float32)

    def build(iters):
        def kernel(m_ref, x_ref, o_ref):
            m = m_ref[...]

            def body(i, x):
                y = jax.lax.dot(m, x, preferred_element_type=jnp.float32)
                # cheap dependency: cast back to bf16 rows matching K_cols
                return y[:K_cols].astype(jnp.bfloat16)

            x = jax.lax.fori_loop(0, iters, body, x_ref[...])
            o_ref[...] = jnp.sum(x.astype(jnp.float32), axis=0, keepdims=True)

        x0 = jnp.ones((K_cols, W), jnp.bfloat16)
        m0 = jnp.asarray(M, jnp.bfloat16)

        @jax.jit
        def run():
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(m0, x0)

        return run

    return _time_kernel(build)


def bench_matmul_i8(K_rows, K_cols, W):
    """(K_rows, K_cols) @ (K_cols, W) int8 matmul with i32 accum."""
    M = np.random.randint(-100, 100, (K_rows, K_cols)).astype(np.int8)

    def build(iters):
        def kernel(m_ref, x_ref, o_ref):
            m = m_ref[...]

            def body(i, x):
                y = jax.lax.dot(m, x, preferred_element_type=jnp.int32)
                return (y[:K_cols] & 127).astype(jnp.int8)

            x = jax.lax.fori_loop(0, iters, body, x_ref[...])
            o_ref[...] = jnp.sum(x.astype(jnp.float32), axis=0, keepdims=True)

        x0 = jnp.ones((K_cols, W), jnp.int8)
        m0 = jnp.asarray(M)

        @jax.jit
        def run():
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(m0, x0)

        return run

    return _time_kernel(build)


def bench_cast_u32_bf16(rows, W):
    """u32 -> bf16 (via i32/f32) and back, the matmul staging cost."""

    def body(i, x):
        b = x.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        return b.astype(jnp.float32).astype(jnp.int32).astype(jnp.uint32) & jnp.uint32(
            0xFF
        )

    t = _time_kernel(_wrap(body, rows, W))
    return t, rows * W


def main():
    print(f"devices: {jax.devices()}")
    results = {}
    for W in (1024, 2048):
        t, n = bench_u32_mul(38, W)
        results[f"u32_mul_38x{W}"] = (t, f"{n / t / 1e12:.2f} Tmul/s")
        t, n = bench_u32_add(38, W)
        results[f"u32_add_38x{W}"] = (t, f"{n / t / 1e12:.2f} Tadd/s")
        t, n = bench_fold(38, W)
        results[f"fold_38x{W}"] = (t, f"{n / t / 1e12:.2f} Tfold/s")
        t, n = bench_cast_u32_bf16(38, W)
        results[f"cast_rt_38x{W}"] = (t, f"{n / t / 1e12:.2f} Tcast-rt/s")
    for W in (1024, 2048, 4096):
        t = bench_matmul_bf16(57, 38, W)
        results[f"mm_bf16_57x38x{W}"] = (t, f"{t * 1e6:.3f} us/call")
        t = bench_matmul_bf16(128, 128, W)
        results[f"mm_bf16_128x128x{W}"] = (t, f"{t * 1e6:.3f} us/call")
        t = bench_matmul_bf16(171, 114, W)
        results[f"mm_bf16_171x114x{W}"] = (t, f"{t * 1e6:.3f} us/call")
        try:
            t = bench_matmul_i8(57, 38, W)
            results[f"mm_i8_57x38x{W}"] = (t, f"{t * 1e6:.3f} us/call")
            t = bench_matmul_i8(128, 128, W)
            results[f"mm_i8_128x128x{W}"] = (t, f"{t * 1e6:.3f} us/call")
        except Exception as e:  # noqa: BLE001
            results[f"mm_i8_{W}"] = (None, f"UNSUPPORTED: {type(e).__name__}: {e}")

    for k, (t, desc) in results.items():
        print(f"{k:28s} {desc}")


if __name__ == "__main__":
    main()
