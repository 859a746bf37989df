"""msm_many amortization demo (round-4 verdict weak #3 done-gate).

A consumer issuing N small back-to-back MSMs pays the ~26 ms axon
dispatch floor N times; `msm_many` dispatches the same N jobs as ONE
device program.  This script measures both on the real TPU and prints
the speedup (gate: >= 10x for small per-call work).

Run: python tools/bench_msm_many.py [N_JOBS] [BATCH]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window
from crypto_primitives_tpu.ops.curve_rns_any import rns_mod
from crypto_primitives_tpu.ops.curves_known import JUBJUB


def main():
    n_jobs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = random.Random(0)
    curve = JUBJUB
    mod = rns_mod(curve)
    # the reference's criterion workload shape: window 250x8 = 128-byte
    # input (crypto-primitives/benches/crh.rs:12-35)
    crh = PedersenCRH(curve, Window(8, 250))
    params = crh.setup(rng)
    inputs = [
        jnp.asarray(
            np.asarray(
                [[rng.randrange(256) for _ in range(128)] for _ in range(B)],
                np.uint8,
            )
        )
        for _ in range(n_jobs)
    ]

    # warm both paths (compile)
    np.asarray(crh.evaluate_batch_rns(params, inputs[0]))
    outs = crh.evaluate_batch_rns_many([params] * n_jobs, inputs)
    np.asarray(outs[-1])

    def timed(f, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        return best

    def singles_pipelined():
        # best case for per-call dispatch: nothing synchronizes until the
        # end, so the runtime pipelines the N submissions
        res = [crh.evaluate_batch_rns(params, x) for x in inputs]
        np.asarray(res[-1])  # sync

    def singles_synced():
        # the per-op consumer pattern (each result consumed before the
        # next call): every job pays a full submit+compute+fetch round
        # trip through the tunnel
        for x in inputs:
            np.asarray(crh.evaluate_batch_rns(params, x))

    def many():
        res = crh.evaluate_batch_rns_many([params] * n_jobs, inputs)
        np.asarray(res[-1])

    singles_synced()  # warm the fetch path
    t_single = timed(singles_pipelined)
    t_synced = timed(singles_synced)
    t_many = timed(many)
    # value parity spot check
    a = mod.unpack_affine_rns(curve, np.asarray(crh.evaluate_batch_rns(params, inputs[0])))
    b = mod.unpack_affine_rns(curve, np.asarray(crh.evaluate_batch_rns_many([params], [inputs[0]])[0]))
    assert list(a) == list(b)
    print(f"backend={jax.default_backend()} jobs={n_jobs} B={B}")
    print(f"single calls, pipelined (sync at end) : {t_single*1e3:9.2f} ms  ({t_single/n_jobs*1e3:6.2f} ms/job)")
    print(f"single calls, sync per result         : {t_synced*1e3:9.2f} ms  ({t_synced/n_jobs*1e3:6.2f} ms/job)")
    print(f"msm_many (one program)                : {t_many*1e3:9.2f} ms  ({t_many/n_jobs*1e3:6.2f} ms/job)")
    print(f"speedup vs pipelined / vs synced      : {t_single/t_many:5.2f}x / {t_synced/t_many:5.2f}x")


if __name__ == "__main__":
    main()
