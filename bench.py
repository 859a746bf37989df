"""Headline benchmark: Poseidon permutations/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the BASELINE.json north-star target of 1e7 permutations/s/chip
(the reference publishes no numbers of its own — BASELINE.md).
Runs on whatever the default JAX platform provides (the real TPU chip under
the driver; CPU elsewhere).
"""

import json
import time

import jax
import jax.numpy as jnp

# Persistent cache only for TPU executables: XLA:CPU AOT entries are
# machine-feature-pinned and reloading them on a different host risks
# SIGILL (observed on this box).
if jax.default_backend() != "cpu":
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.models.sponge.poseidon import permute as permute_xla
from crypto_primitives_tpu.ops import field as ff
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR


def main():
    cfg = get_default_poseidon_parameters(FR, 2, False)
    packed = cfg.packed()
    on_tpu = jax.default_backend() == "tpu"
    perm_variants = None
    if on_tpu:
        # RNS-Montgomery kernel (ops/poseidon_rns_pallas.py): measure the
        # v6.4 dense and v6.5 sparse-partial-round variants, report the
        # faster (both are bit-exact vs the host oracle —
        # tests/test_poseidon_rns.py and .drive_rns.py on real hardware)
        from crypto_primitives_tpu.ops import rns
        from crypto_primitives_tpu.ops.poseidon_rns_pallas import (
            _build_rns_permute,
        )

        plan = rns.build_plan(FR.p)
        # v6.6: run in the sqrt-sigma twisted domain when the plan carries
        # a pinned QR base (bit-exact; tests/test_poseidon_rns.py)
        tw = plan.sqrt_sigma is not None
        perm_variants = [
            ("dense", _build_rns_permute(plan, cfg, 2048, False, twisted=tw)),
            ("sparse", _build_rns_permute(
                plan, cfg, 2048, False, sparse=True, twisted=tw)),
        ]
        perm = perm_variants[0][1]
    else:
        perm = lambda s: permute_xla(FR, packed, s)
    B = 65536 if on_tpu else 2048  # independent sponge states
    K = 8  # chained permutations per timed call

    # NOTE: timing is differential (K0 vs K1 chained permutations inside one
    # jit) with a tiny reduced output fetched via np.asarray — under the axon
    # tunnel, block_until_ready does not actually synchronize, and fetching
    # large outputs is transfer-bound; the K1-K0 delta isolates pure compute.
    import numpy as np

    K0, K1 = K, 5 * K

    def many(k, p=None):
        p = p if p is not None else perm
        def fn(s):
            s = jax.lax.fori_loop(0, k, lambda i, s: p(s), s)
            return jnp.sum(s.astype(jnp.float32))
        return jax.jit(fn)

    if on_tpu:
        state = jnp.zeros((B, cfg.t, 2 * rns.K), jnp.float32)
    else:
        state = ff.zeros(FR, (B, cfg.t))

    def timed(f):
        r = f(state)
        np.asarray(r)  # compile + sync
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(state))
            best = min(best, time.perf_counter() - t0)
        return best

    if perm_variants is not None:
        perms_per_s = 0.0
        for _name, pv in perm_variants:
            try:
                t0, t1 = timed(many(K0, pv)), timed(many(K1, pv))
                perms_per_s = max(
                    perms_per_s, B * (K1 - K0) / max(t1 - t0, 1e-9)
                )
            except Exception:
                continue  # a variant failing to compile must not sink the bench
    else:
        t0, t1 = timed(many(K0)), timed(many(K1))
        perms_per_s = B * (K1 - K0) / max(t1 - t0, 1e-9)
    target = 1e7
    print(
        json.dumps(
            {
                "metric": "poseidon_permutations_per_s_per_chip",
                "value": round(perms_per_s, 1),
                "unit": "perm/s",
                "vs_baseline": round(perms_per_s / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
