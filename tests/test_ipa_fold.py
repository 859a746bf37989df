"""IPA-style folding argument (models/protocols/ipa_fold.py) — the
curve-tier protocol showcase (round-4 verdict task 8).

Gates: the device prover's transcript (commitment, L/R rounds, folded
scalar) is BIT-equal to the python-int host prover; the independent
host verifier accepts it and rejects a forged folded scalar, a tampered
round message, and a wrong commitment.
"""

import random

import numpy as np
import pytest

from crypto_primitives_tpu.models.protocols.ipa_fold import (
    ipa_fold_prove_host,
    ipa_fold_prove_rns,
    ipa_fold_verify_host,
)
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.ops.curves_known import JUBJUB
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR


def _proof_rounds_for(proof, b):
    return [
        (
            tuple(int(v) for v in proof["rounds"][j][0][b]),
            tuple(int(v) for v in proof["rounds"][j][1][b]),
        )
        for j in range(len(proof["rounds"]))
    ]


@pytest.mark.slow
def test_ipa_fold_device_vs_host_and_soundness(rng):
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B, n = 2, 8
    gens = [JUBJUB.rand_point(rng) for _ in range(n)]
    scalars = [
        [rng.randrange(JUBJUB.scalar.p) for _ in range(n)] for _ in range(B)
    ]
    proof = ipa_fold_prove_rns(JUBJUB, cfg, gens, scalars)
    hosts = ipa_fold_prove_host(JUBJUB, cfg, gens, scalars)
    p_s = JUBJUB.scalar.p
    for b in range(B):
        # transcript bit-parity, message by message
        assert (
            tuple(int(v) for v in proof["commitment"][b])
            == hosts[b]["commitment"]
        )
        for j, (L, R) in enumerate(hosts[b]["rounds"]):
            Ld, Rd = proof["rounds"][j]
            assert tuple(int(v) for v in Ld[b]) == L, (b, j)
            assert tuple(int(v) for v in Rd[b]) == R, (b, j)
        assert proof["a_star"][b] == hosts[b]["a_star"], b
        # verifier accepts
        rounds_b = _proof_rounds_for(proof, b)
        C_b = proof["commitment"][b]
        a_b = proof["a_star"][b]
        assert ipa_fold_verify_host(JUBJUB, cfg, gens, C_b, rounds_b, a_b)
        # forged folded scalar rejected
        assert not ipa_fold_verify_host(
            JUBJUB, cfg, gens, C_b, rounds_b, (a_b + 1) % p_s
        )
        # tampered round message rejected (transcript-binding)
        bad = [list(r) for r in rounds_b]
        L0 = bad[0][0]
        bad[0][0] = JUBJUB.add_host(L0, JUBJUB.generator)
        bad = [tuple(r) for r in bad]
        assert not ipa_fold_verify_host(JUBJUB, cfg, gens, C_b, bad, a_b)
        # wrong commitment rejected
        C_bad = JUBJUB.add_host(tuple(int(v) for v in C_b), JUBJUB.generator)
        assert not ipa_fold_verify_host(
            JUBJUB, cfg, gens, C_bad, rounds_b, a_b
        )


def test_ipa_fold_single_round(rng):
    """Smallest instance (n = 2, one round) — fast non-slow coverage."""
    cfg = get_default_poseidon_parameters(FR, 2, False)
    gens = [JUBJUB.rand_point(rng) for _ in range(2)]
    scalars = [[rng.randrange(JUBJUB.scalar.p) for _ in range(2)]]
    proof = ipa_fold_prove_rns(JUBJUB, cfg, gens, scalars)
    rounds_b = _proof_rounds_for(proof, 0)
    assert ipa_fold_verify_host(
        JUBJUB, cfg, gens, proof["commitment"][0], rounds_b,
        proof["a_star"][0],
    )
