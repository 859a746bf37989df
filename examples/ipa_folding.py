"""A log-round folding argument on the curve tier: IPA-style Pedersen
opening proof.

The reference ships vector Pedersen commitments
(src/commitment/pedersen/mod.rs:62-105) and the sponge/Fiat-Shamir layer
(src/sponge/mod.rs:101-154) but no protocol composing them; this example
runs the TPU-native composition end-to-end: B instances of
``C = <a, G>`` proven in one array program — cross commitments L/R as
device MSMs on the RNS curve tier, challenges from the RNS-resident
transcript, scalar and generator tables folded on device — then checked
by a fully independent python-int verifier, which also rejects a forged
folded scalar.

Run: python examples/ipa_folding.py   (a few minutes on CPU: the curve
tier runs its Pallas kernels in interpret mode off-TPU)
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_primitives_tpu.models.protocols.ipa_fold import (
    ipa_fold_prove_rns,
    ipa_fold_verify_host,
)
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.ops import BLS12_381_FR as FR
from crypto_primitives_tpu.ops.curves_known import JUBJUB


def main():
    rng = random.Random(7)
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B, n = 2, 4  # two instances over 4 generators (2 folding rounds)
    gens = [JUBJUB.rand_point(rng) for _ in range(n)]
    scalars = [
        [rng.randrange(JUBJUB.scalar.p) for _ in range(n)] for _ in range(B)
    ]

    proof = ipa_fold_prove_rns(JUBJUB, cfg, gens, scalars)
    print(
        f"proved {B} openings of <a, G> over {n} generators "
        f"({n.bit_length() - 1} folding rounds) on the device tier"
    )

    p_s = JUBJUB.scalar.p
    for b in range(B):
        rounds_b = [
            (
                tuple(int(v) for v in proof["rounds"][j][0][b]),
                tuple(int(v) for v in proof["rounds"][j][1][b]),
            )
            for j in range(len(proof["rounds"]))
        ]
        C_b, a_b = proof["commitment"][b], proof["a_star"][b]
        assert ipa_fold_verify_host(JUBJUB, cfg, gens, C_b, rounds_b, a_b)
        assert not ipa_fold_verify_host(
            JUBJUB, cfg, gens, C_b, rounds_b, (a_b + 1) % p_s
        )
    print(
        f"host verifier accepted all {B} transcripts; "
        "forged folded scalars rejected"
    )


if __name__ == "__main__":
    main()
