"""Block-size / batch sweep for the RNS Poseidon kernel on the real TPU.

Differential timing (K0 vs K1 chained permutations inside one jit), tiny
reduced fetch — see PERFORMANCE.md for why (axon tunnel does not sync).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

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


def sweep(block_b, B, K0=4, K1=20, sparse=False, twisted=None):
    cfg = get_default_poseidon_parameters(FR, 2, False)
    plan = rns.build_plan(FR.p)
    if twisted is None:
        twisted = plan.sqrt_sigma is not None
    perm = _build_rns_permute(
        plan, cfg, block_b, False, sparse=sparse, twisted=twisted
    )
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
    tag = ("sparse" if sparse else "dense ") + ("+tw" if twisted else "   ")
    print(f"{tag} block={block_b:5d} B={B:6d}  {pps/1e6:7.2f}e6 perm/s", flush=True)
    return pps


if __name__ == "__main__":
    combos = [
        (512, 32768),
        (1024, 32768),
        (2048, 32768),
        (4096, 32768),
        (8192, 32768),
        (2048, 65536),
        (4096, 65536),
        (8192, 65536),
        (8192, 131072),
        (16384, 131072),
    ]
    args = [a for a in sys.argv[1:] if "," in a]
    if args:
        combos = [tuple(map(int, a.split(","))) for a in args]
    modes = (
        [True] if "--sparse" in sys.argv
        else [False] if "--dense" in sys.argv
        else [False, True]  # v6.4 dense vs v6.5 sparse side by side
    )
    twisted = False if "--notwist" in sys.argv else None
    for sparse in modes:
        best = 0.0
        for blk, B in combos:
            try:
                best = max(best, sweep(blk, B, sparse=sparse, twisted=twisted))
            except Exception as e:
                print(f"block={blk} B={B} sparse={sparse} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)
        print(f"best {'sparse' if sparse else 'dense'}: {best/1e6:.2f}e6 perm/s")
