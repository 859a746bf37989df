"""Fused SW MSM kernel rates with in-run value verification.

K-delta chained calls (the axon tunnel does not sync; single-call wall
times measure dispatch, not kernels) with a host-oracle check of the
first rows in the same run — the methodology behind the PERFORMANCE.md
"fused-vs-XLA SW MSM" table.

Run: python tools/bench_sw_msm_kernel.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, time
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, random
import jax.numpy as jnp
from crypto_primitives_tpu.ops import curve_sw_rns as sw
from crypto_primitives_tpu.ops import msm_sw_rns_pallas as mk
from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1 as G1, PALLAS

rng = random.Random(0)
w = 3
npts = 2000

def bench(curve, name, chunk):
    pts = [curve.rand_point(rng) for _ in range(64)]
    pts = (pts * ((npts + 63) // 64))[:npts]
    ck = jnp.asarray(mk.pack_combos_sw_kernel(curve, pts, w))
    B = 256
    bits_np = np.asarray([[rng.randrange(2) for _ in range(npts)] for _ in range(B)], np.uint8)
    bits = jnp.asarray(bits_np)
    fn = lambda b: mk.grouped_msm_sw_pallas(curve, ck, b, w, block_b=256, chunk=chunk)
    # VALUE CHECK on 3 rows vs host oracle
    out = fn(bits)
    got = sw.unpack_affine_rns(curve, np.asarray(out[:3]))
    for r in range(3):
        exp = None
        for j in range(npts):
            if bits_np[r, j]:
                exp = pts[j] if exp is None else curve.add_host(exp, pts[j])
        assert got[r] == exp, (name, r)
    print(f"{name} chunk={chunk}: values OK", flush=True)
    def many(k):
        def body(i, carry):
            o = fn(jnp.roll(bits, i, axis=0))
            return carry + jnp.sum(o)
        return jax.jit(lambda: jax.lax.fori_loop(0, k, body, jnp.float32(0)))
    def timed(f):
        np.asarray(f())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(f()); best = min(best, time.perf_counter()-t0)
        return best
    t2, t6 = timed(many(2)), timed(many(6))
    r = 4 / (t6 - t2)
    print(f"{name} chunk={chunk}: {r:8.2f} calls/s  {1000/r:7.2f} ms/call  {r*B:10.0f} msm/s", flush=True)

bench(PALLAS, "pallas", 8)
bench(G1, "g1", 8)
bench(G1, "g1", 4)
