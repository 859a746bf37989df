"""Vectorized-vs-scalar R1CS synthesis throughput (round-2 verdict item 5
gate: >100x constraints/s over scalar python synthesis at N >= 1024).

Workload: the Poseidon two-to-one Merkle compress circuit (270
constraints/instance).  The batched tier's whole witness computation is a
pure array program, so it JITs: structure recording happens once at trace
time; every later synthesis of the same circuit shape is one compiled
device program over the input columns (measured amortized over 8 calls —
single-call timing under the axon tunnel is sync-noise-bound).
"""

import random
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
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.r1cs.batch import BatchConstraintSystem
from crypto_primitives_tpu.r1cs.cs import ConstraintSystem
from crypto_primitives_tpu.r1cs.gadgets.poseidon import PoseidonTwoToOneCRHGadget
from crypto_primitives_tpu.r1cs.vars import FpVar


def main():
    rng = random.Random(0)
    cfg = get_default_poseidon_parameters(FR, 2, False)
    g = PoseidonTwoToOneCRHGadget(cfg)
    NMAX = 4096
    ls = [rng.randrange(FR.p) for _ in range(NMAX)]
    rs = [rng.randrange(FR.p) for _ in range(NMAX)]

    N_s = 32
    t0 = time.perf_counter()
    for i in range(N_s):
        scs = ConstraintSystem(FR)
        g.compress(
            scs, FpVar.new_witness(scs, ls[i]), FpVar.new_witness(scs, rs[i])
        )
    t_scalar = (time.perf_counter() - t0) / N_s
    nc = scs.num_constraints
    print(
        f"scalar synthesis: {nc / t_scalar:,.0f} constraints/s "
        f"({t_scalar * 1e3:.2f} ms/instance, {nc} constraints)"
    )

    for N in (1024, 4096):
        lcol = jnp.asarray(FR.pack([[x] for x in ls[:N]]))[:, 0, :]
        rcol = jnp.asarray(FR.pack([[x] for x in rs[:N]]))[:, 0, :]

        def synth(lc, rc, N=N):
            bcs = BatchConstraintSystem(FR, N)
            g.compress(
                bcs, FpVar.new_witness(bcs, lc), FpVar.new_witness(bcs, rc)
            )
            return bcs.stack_assignments()

        js = jax.jit(synth)
        np.asarray(jnp.sum(js(lcol, rcol)))  # warm: trace + compile + upload
        R = 8
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(R):
            acc = acc + jnp.sum(js(lcol, rcol))
        np.asarray(acc)
        dt = (time.perf_counter() - t0) / R
        print(
            f"batched synthesis N={N}: {nc * N / dt:,.0f} constraints/s "
            f"({dt * 1e3:.1f} ms) = {t_scalar * N / dt:,.0f}x scalar"
        )

    # byte-circuit tier (round-3 verdict item 3): Blake2s one-block PRF,
    # 21792 constraints/instance.  The SmallWord value plane is
    # host-resident numpy, so this path measures wall synthesis time (it
    # does not jit); the win over per-instance scalar python synthesis is
    # the vectorization of every bit/word value op across N.
    import hashlib

    from crypto_primitives_tpu.r1cs.gadgets.blake2s import Blake2sPRFGadget
    from crypto_primitives_tpu.r1cs.vars import bytes_to_uint8s

    seed1 = bytes(range(32))
    msg1 = bytes(range(32, 64))
    t0 = time.perf_counter()
    scs = ConstraintSystem(FR)
    Blake2sPRFGadget.evaluate(
        scs,
        Blake2sPRFGadget.new_seed(scs, seed1),
        bytes_to_uint8s(scs, msg1),
    )
    tb_scalar = time.perf_counter() - t0
    nb = scs.num_constraints
    print(
        f"blake2s scalar synthesis: {nb / tb_scalar:,.0f} constraints/s "
        f"({tb_scalar * 1e3:.1f} ms/instance, {nb} constraints)"
    )
    for N in (256, 1024):
        seeds = np.asarray(
            [[(i * 7 + j) % 256 for j in range(32)] for i in range(N)],
            np.uint8,
        )
        msgs = np.asarray(
            [[(i * 13 + j + 1) % 256 for j in range(32)] for i in range(N)],
            np.uint8,
        )
        t0 = time.perf_counter()
        bcs = BatchConstraintSystem(FR, N)
        out = Blake2sPRFGadget.evaluate(
            bcs,
            Blake2sPRFGadget.new_seed(bcs, seeds),
            bytes_to_uint8s(bcs, msgs),
        )
        dt = time.perf_counter() - t0
        assert bcs.num_constraints == nb
        got = out.value
        assert (
            got[0].tobytes()
            == hashlib.blake2s(seeds[0].tobytes() + msgs[0].tobytes()).digest()
        )
        print(
            f"blake2s batched synthesis N={N}: {nb * N / dt:,.0f} "
            f"constraints/s ({dt * 1e3:.0f} ms) = "
            f"{tb_scalar * N / dt:,.0f}x scalar"
        )
    if jax.default_backend() != "cpu":
        t0 = time.perf_counter()
        ok = bool(bcs.is_satisfied())
        print(
            f"blake2s batched device check (N={N}, {nb * N} rows): {ok} "
            f"in {time.perf_counter() - t0:.2f}s"
        )

    # batched device satisfaction check at N=1024
    N = 1024
    bcs = BatchConstraintSystem(FR, N)
    g.compress(
        bcs,
        FpVar.new_witness(bcs, jnp.asarray(FR.pack([[x] for x in ls[:N]]))[:, 0, :]),
        FpVar.new_witness(bcs, jnp.asarray(FR.pack([[x] for x in rs[:N]]))[:, 0, :]),
    )
    ok = bool(bcs.is_satisfied())  # warm
    t0 = time.perf_counter()
    ok = bool(bcs.is_satisfied())
    print(
        f"batched device check (N={N}, {nc * N} rows): {ok} "
        f"in {time.perf_counter() - t0:.2f}s"
    )


if __name__ == "__main__":
    main()
