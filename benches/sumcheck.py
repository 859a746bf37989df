"""Batched multilinear sumcheck prover throughput (the protocol
showcase, models/protocols/sumcheck.py): B instances of a 2^m-point
table proven end-to-end in residues — transcript permutes, half-table
sum trees, and challenge folds all on the fast tier."""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benches._util import emit
from crypto_primitives_tpu.models.protocols import sumcheck_prove_rns
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.models.sponge.fiat_shamir import FiatShamirRns
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR


def main():
    import time

    rng = random.Random(0)
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B = int(os.environ.get("BENCH_BATCH", "4096"))
    m = int(os.environ.get("BENCH_M", "10"))
    rep = None if jax.default_backend() == "tpu" else "rns"
    f = FiatShamirRns(cfg, batch_shape=(B,), rep=rep).field
    table = np.asarray(
        [[rng.randrange(FR.p) for _ in range(1 << m)] for _ in range(B)],
        dtype=object,
    )
    t_rns = jnp.asarray(f.pack(table))

    def prove(t):
        s, rounds, fin = sumcheck_prove_rns(cfg, t, rep=rep)
        acc = jnp.sum(s) + jnp.sum(fin)
        for p0, p1 in rounds:
            acc = acc + jnp.sum(p0) + jnp.sum(p1)
        return acc

    jp = jax.jit(prove)
    np.asarray(jp(t_rns))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jp(t_rns))
        best = min(best, time.perf_counter() - t0)
    emit("sumcheck_prover_instances", B / best, "proofs/s")
    # dominant compute: 2 residue muls per surviving table row per round
    muls = B * 2 * ((1 << m) - 1)
    emit("sumcheck_fold_mul_rate", muls / best, "mul/s")


if __name__ == "__main__":
    main()
