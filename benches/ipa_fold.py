"""IPA folding-argument prover throughput (round-4 verdict task 8).

B instances of an n-generator Pedersen-opening folding proof in one
array program on the curve tier; the host verifier replays one instance
as a correctness gate.
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches._util import emit
from crypto_primitives_tpu.models.protocols.ipa_fold import (
    ipa_fold_prove_rns,
    ipa_fold_verify_host,
)
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.ops.curves_known import JUBJUB
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR


def main():
    rng = random.Random(0)
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B = int(os.environ.get("BENCH_BATCH", "1024"))
    n = int(os.environ.get("BENCH_GENS", "8"))
    gens = [JUBJUB.rand_point(rng) for _ in range(n)]
    scalars = [
        [rng.randrange(JUBJUB.scalar.p) for _ in range(n)] for _ in range(B)
    ]
    proof = ipa_fold_prove_rns(JUBJUB, cfg, gens, scalars)  # warm
    t0 = time.perf_counter()
    proof = ipa_fold_prove_rns(JUBJUB, cfg, gens, scalars)
    t = time.perf_counter() - t0
    rounds0 = [
        (
            tuple(int(v) for v in proof["rounds"][j][0][0]),
            tuple(int(v) for v in proof["rounds"][j][1][0]),
        )
        for j in range(len(proof["rounds"]))
    ]
    assert ipa_fold_verify_host(
        JUBJUB, cfg, gens, proof["commitment"][0], rounds0,
        proof["a_star"][0],
    )
    emit("ipa_fold_prove_throughput", B / t, "proofs/s")


if __name__ == "__main__":
    main()
