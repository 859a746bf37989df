"""Adversarial fuzz for the RNS residue-bound bookkeeping (round-4
verdict task 9).

The sumcheck/fold bound arithmetic (models/protocols/sumcheck.py
_NORM_AT, the fold's post-mul bounds) is static reasoning that a
refactor can silently break; these tests sweep table sizes, round
counts, and INPUT VALUE BOUNDS to the plan's M1//p budget edge and
assert bit-parity against the python-int host oracle at every point —
plus the trace-time guard firing exactly one step past the edge.
Pattern: the reference's cross-model sponge fuzz
(crypto-primitives/src/sponge/poseidon/tests.rs:68-240).
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.models.protocols.sumcheck import (
    _NORM_AT,
    _tree_sum,
    sumcheck_prove_host,
    sumcheck_prove_rns,
    sumcheck_verify_host,
)
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.models.sponge.fiat_shamir import FiatShamirRns
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR


def _cfg():
    return get_default_poseidon_parameters(FR, 2, False)


def _field(B):
    return FiatShamirRns(_cfg(), batch_shape=(B,)).field


def _elevated_rows(f, vals, bound):
    """Pack plain values then raise the VALUE bound to `bound` by
    repeated residue addition (represented value becomes bound*x, still
    < bound*p).  Returns (rows, host_values_of_bound*x)."""
    p = f.plan.p
    base = jnp.asarray(f.pack(np.asarray(vals, dtype=object)))
    rows, b = base, 1
    while b < bound:
        rows, b = f.add(rows, b, base, 1)
    host = [int(v) * bound % p for v in np.asarray(vals, dtype=object).reshape(-1)]
    return rows, b, np.asarray(host, dtype=object).reshape(np.asarray(vals, dtype=object).shape)


def test_tree_sum_bound_sweep(rng):
    """_tree_sum parity vs host over sizes x input bounds; its returned
    bound never exceeds the normalize threshold's doubling headroom."""
    B = 2
    f = _field(B)
    for m in (1, 2, 4, 5):
        n = 1 << m
        for bound in (1, 2, 3, 7, 12):
            vals = np.asarray(
                [[rng.randrange(FR.p) for _ in range(n)] for _ in range(B)],
                dtype=object,
            )
            rows, b, host = _elevated_rows(f, vals, bound)
            s, sb = _tree_sum(f, rows, b)
            assert sb <= 2 * _NORM_AT
            got = f.unpack(np.asarray(s))
            for i in range(B):
                want = sum(int(v) for v in host[i]) % FR.p
                assert int(got[i]) == want, (m, bound, i)


@pytest.mark.slow
def test_sumcheck_bound_sweep_parity(rng):
    """Full prover parity vs the host oracle across table sizes x input
    bounds up to the M1//p admission edge (bound*4 <= 66 for the pinned
    Fr plan -> bound <= 16), host verifier accepting every transcript."""
    cfg = _cfg()
    B = 2
    f = _field(B)
    edge = f.max_prod // 4  # challenge/1-r rows carry bound 4
    for m, bound in ((1, 1), (2, 3), (3, 7), (2, 12), (1, edge)):
        n = 1 << m
        vals = np.asarray(
            [[rng.randrange(FR.p) for _ in range(n)] for _ in range(B)],
            dtype=object,
        )
        rows, b, host = _elevated_rows(f, vals, bound)
        s_row, rounds, fin = sumcheck_prove_rns(cfg, rows, bound=b)
        sums, rounds_h, _, finals = sumcheck_prove_host(cfg, host)
        s_got = f.unpack(np.asarray(s_row))
        f_got = f.unpack(np.asarray(fin))
        for i in range(B):
            assert int(s_got[i]) == sums[i], (m, bound)
            assert int(f_got[i]) == finals[i], (m, bound)
            msgs = [
                (
                    int(f.unpack(np.asarray(p0))[i]),
                    int(f.unpack(np.asarray(p1))[i]),
                )
                for p0, p1 in rounds
            ]
            assert msgs == rounds_h[i], (m, bound)
            assert sumcheck_verify_host(cfg, sums[i], msgs, finals[i])


def test_sumcheck_bound_edge_guard(rng):
    """One step past the admission edge the trace-time Montgomery-domain
    guard fires (instead of silently corrupting residues)."""
    cfg = _cfg()
    B, n = 1, 2
    f = _field(B)
    edge = f.max_prod // 4
    vals = np.asarray([[1, 2]], dtype=object)
    rows, b, _ = _elevated_rows(f, vals, edge + 1)
    with pytest.raises(AssertionError, match="RNS mul domain overflow"):
        sumcheck_prove_rns(cfg, rows, bound=b)


def test_normalize_restores_budget(rng):
    """f.normalize at any admissible bound returns bound MUL_OUT and
    preserves the represented value — the primitive every static ledger
    in the package leans on."""
    B = 4
    f = _field(B)
    vals = np.asarray([rng.randrange(FR.p) for _ in range(B)], dtype=object)
    for bound in (1, 2, 5, 12, f.max_prod):
        rows, b, host = _elevated_rows(f, vals, bound)
        norm, nb = f.normalize(rows, b)
        assert nb == f.MUL_OUT
        got = f.unpack(np.asarray(norm))
        for i in range(B):
            assert int(got[i]) == int(host[i]), bound
