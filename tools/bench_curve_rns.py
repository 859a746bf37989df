"""Curve-op kernel sweep on the real TPU: RNS vs limb device tiers.

Measures, with differential timing (K-delta of chained ops inside one
jit, tiny reduced fetch — the axon tunnel does not sync), the workloads
behind benches/{crh,comm,signature}.py:

  * te_add throughput (the HWCD complete addition), RNS vs limb
  * Pedersen conditional-sum MSM: grouped (w) vs per-bit vs limb
  * fixed-base and windowed variable-base scalar mul

Usage: python tools/bench_curve_rns.py [B ...]
"""

import sys
import time

import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.ops import curve as cv
from crypto_primitives_tpu.ops import curve_rns as cr
from crypto_primitives_tpu.ops.curves_known import JUBJUB
import random


def timed(f, *args, reps=3):
    r = f(*args)
    np.asarray(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_te_add(B):
    rng = random.Random(0)
    pts = [JUBJUB.rand_point(rng) for _ in range(4)]
    d_rns = jnp.broadcast_to(
        jnp.asarray(cr.pack_points_rns(JUBJUB, pts))[:1], (B, 4, 48)
    )
    d_limb = jnp.broadcast_to(
        jnp.asarray(JUBJUB.pack_points(pts))[:1], (B, 4, 16)
    )
    K0, K1 = 4, 20

    def chain_rns(k):
        def fn(p):
            return jax.lax.fori_loop(
                0, k, lambda i, a: cr.te_add_rns(JUBJUB, a, a), p
            ).astype(jnp.float32).sum()
        return jax.jit(fn)

    def chain_limb(k):
        def fn(p):
            return jax.lax.fori_loop(
                0, k, lambda i, a: cv.te_add(JUBJUB, a, a), p
            ).astype(jnp.float32).sum()
        return jax.jit(fn)

    for name, mk, d in (("rns ", chain_rns, d_rns), ("limb", chain_limb, d_limb)):
        # Adaptive K: widen the chain until the K-delta clears tunnel
        # timing noise (~5 ms), else the rate is an artifact.
        k0, k1 = K0, K1
        t0 = timed(mk(k0), d)
        for _ in range(6):
            t1 = timed(mk(k1), d)
            if t1 - t0 > 5e-3:
                break
            # k1's timing becomes the next iteration's k0 measurement —
            # don't re-time the identical chain length
            k0, k1, t0 = k1, 4 * k1, t1
        else:
            print(f"te_add {name} B={B:6d}: delta below noise, skipped",
                  flush=True)
            continue
        rate = B * (k1 - k0) / (t1 - t0)
        print(f"te_add {name} B={B:6d}: {rate/1e6:8.2f}e6 add/s  (K={k0}->{k1})",
              flush=True)


def bench_pedersen(B, nbits=2000, w=3, kernel_ws=(3, 4, 5)):
    from crypto_primitives_tpu.ops import msm_rns_pallas as mk

    rng = random.Random(1)
    pts = [JUBJUB.rand_point(rng) for _ in range(nbits)]
    bits = jnp.asarray(
        np.random.default_rng(0).integers(0, 2, (B, nbits), dtype=np.uint8)
    )
    combos = jnp.asarray(cr.pack_table_grouped(JUBJUB, pts, w))
    t_rns = jnp.asarray(cr.pack_points_rns(JUBJUB, pts))
    t_limb = jnp.asarray(JUBJUB.pack_points(pts))

    fns = []
    interp = jax.default_backend() != "tpu"
    if interp:
        kernel_ws = ()  # interpreter at bench scale is pointless off-TPU
    for kw in kernel_ws:
        ck = jnp.asarray(mk.pack_combos_kernel(JUBJUB, pts, kw))
        fns.append(
            (
                f"pallas-kernel w={kw}",
                jax.jit(
                    lambda b, ck=ck, kw=kw: mk.grouped_msm_pallas(
                        JUBJUB, ck, b, kw, interpret=interp
                    )[..., 0, :].sum()
                ),
            )
        )
    fns += [
        (f"xla-grouped  w={w}", jax.jit(lambda b: cr.te_conditional_sum_grouped_rns(JUBJUB, combos, b, w)[..., 0, :].sum())),
        ("xla-per-bit rns ", jax.jit(lambda b: cr.te_conditional_sum_rns(JUBJUB, t_rns, b)[..., 0, :].sum())),
        ("limb            ", jax.jit(lambda b: cv.te_conditional_sum(JUBJUB, t_limb, b)[..., 0, :].astype(jnp.float32).sum())),
    ]
    for name, f in fns:
        try:
            t = timed(f, bits)
            print(f"pedersen-msm {name} B={B:5d}: {B/t:9.1f} hashes/s", flush=True)
        except Exception as e:
            print(f"pedersen-msm {name} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    Bs = [int(a) for a in sys.argv[1:]] or [1024]
    for B in Bs:
        bench_te_add(B)
        bench_pedersen(max(B // 8, 32))
