"""Measure the generic device-tier Poseidon (PoseidonSpongeBatch RNS rep)
against the raw RNS kernel on the real chip.

VERDICT round-2 item 1 gate: generic compress_batch must land within
~20-30% of the raw kernel permutation rate (its extra work is the two
limb->RNS absorb conversions plus one RNS->limb squeeze conversion).

K-delta timing (bench.py methodology: block_until_ready does not sync
under the axon tunnel; time chained iterations with a reduced output).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

if jax.default_backend() != "cpu":
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from crypto_primitives_tpu.models.crh.poseidon import PoseidonTwoToOneCRH
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.ops import rns
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.ops.poseidon_rns_pallas import permute_rns


def timed(f, *args):
    r = f(*args)
    np.asarray(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def rate(fn_builder, state, K0=4, K1=20):
    t0 = timed(fn_builder(K0), state)
    t1 = timed(fn_builder(K1), state)
    B = state[0].shape[0] if isinstance(state, tuple) else state.shape[0]
    return B * (K1 - K0) / max(t1 - t0, 1e-9)


def main():
    cfg = get_default_poseidon_parameters(FR, 2, False)
    plan = rns.build_plan(FR.p)
    B = 65536
    blk = 2048

    # raw kernel permutation rate
    def raw(k):
        def fn(s):
            s = jax.lax.fori_loop(
                0, k, lambda i, s: permute_rns(plan, cfg, s, block_b=blk), s
            )
            return jnp.sum(s.astype(jnp.float32))

        return jax.jit(fn)

    st = jnp.zeros((B, cfg.t, 2 * rns.K), jnp.float32)
    r_raw = rate(raw, st)
    print(f"raw kernel permute: {r_raw:.3e} perm/s")

    # generic compress_batch (limbs in, limbs out; sponge picks RNS rep)
    two = PoseidonTwoToOneCRH(FR)

    def gen(k):
        def fn(args):
            l, r = args

            def body(i, l):
                return two.compress_batch(cfg, l, r)

            l = jax.lax.fori_loop(0, k, body, l)
            return jnp.sum(l.astype(jnp.float32))

        return jax.jit(fn)

    import random

    rr = random.Random(0)
    l = jnp.asarray(FR.pack([[rr.randrange(FR.p)] for _ in range(B)]))[:, 0, :]
    r = jnp.asarray(FR.pack([[rr.randrange(FR.p)] for _ in range(B)]))[:, 0, :]

    def gen_rate(k):
        def fn(lr):
            ll, rrr = lr

            def body(i, ll):
                return two.compress_batch(cfg, ll, rrr)

            ll = jax.lax.fori_loop(0, k, body, ll)
            return jnp.sum(ll.astype(jnp.float32))

        return jax.jit(fn)

    t0 = timed(gen_rate(4), (l, r))
    t1 = timed(gen_rate(20), (l, r))
    r_gen = B * 16 / max(t1 - t0, 1e-9)
    print(f"generic compress_batch (limb API): {r_gen:.3e} compress/s")
    print(f"ratio generic/raw: {r_gen / r_raw:.3f}")

    # RNS-resident compress (sponge squeeze_native_rns path): no limb
    # boundary conversions, the device-tree regime
    from crypto_primitives_tpu.models.sponge.poseidon import PoseidonSpongeBatch

    def rns_compress(l, r):
        sp = PoseidonSpongeBatch(cfg, batch_shape=(l.shape[0],), rep="rns")
        sp.absorb(l[:, None, :])
        sp.absorb(r[:, None, :])
        return sp.squeeze_native_rns(1)[:, 0, :]

    lr_ = jnp.zeros((B, 2 * rns.K), jnp.float32)

    def rns_rate(k):
        def fn(ll):
            def body(i, ll):
                return rns_compress(ll, lr_)

            ll = jax.lax.fori_loop(0, k, body, ll)
            return jnp.sum(ll)

        return jax.jit(fn)

    t0 = timed(rns_rate(4), lr_)
    t1 = timed(rns_rate(20), lr_)
    r_rns = B * 16 / max(t1 - t0, 1e-9)
    print(f"sponge compress, RNS-resident: {r_rns:.3e} compress/s")
    print(f"ratio rns-resident/raw: {r_rns / r_raw:.3f}")


if __name__ == "__main__":
    main()
