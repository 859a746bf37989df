"""Ablation timing for the RNS Poseidon kernel (v5) on the real TPU.

Each variant stubs one stage (results are WRONG; timing only).  Differential
timing (K0 vs K1 chained permutes in one jit), tiny reduced fetch.
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

from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.ops import rns
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.ops.poseidon_rns_pallas import _build_rns_permute


def measure(ablate, block_b=2048, B=65536, K0=4, K1=20):
    cfg = get_default_poseidon_parameters(FR, 2, False)
    plan = rns.build_plan(FR.p)
    perm = _build_rns_permute(plan, cfg, block_b, False, ablate)
    state = jnp.zeros((B, cfg.t, 2 * rns.K), jnp.float32)

    def many(k):
        def fn(s):
            s = jax.lax.fori_loop(0, k, lambda i, s: perm(s), s)
            return jnp.sum(s)
        return jax.jit(fn)

    def timed(f):
        np.asarray(f(state))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(state))
            best = min(best, time.perf_counter() - t0)
        return best

    t0, t1 = timed(many(K0)), timed(many(K1))
    pps = B * (K1 - K0) / max(t1 - t0, 1e-9)
    print(f"{ablate or 'baseline':20s} {pps/1e6:7.2f}e6 perm/s", flush=True)
    return pps


if __name__ == "__main__":
    variants = sys.argv[1:] or [
        "", "nomxu", "nored", "nosig", "nosbox", "nomds", "nomxu,nored,nosig"
    ]
    for v in variants:
        try:
            measure(v)
        except Exception as e:
            print(f"{v}: FAILED {type(e).__name__}: {e}", flush=True)
