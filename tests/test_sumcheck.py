"""Multilinear sumcheck over the RNS-resident transcript
(models/protocols/sumcheck.py): bit-parity between the batched residue
prover and the host-oracle twin, host verification, and soundness
rejections."""

import numpy as np
import pytest

from crypto_primitives_tpu.models.protocols import (
    sumcheck_prove_host,
    sumcheck_prove_rns,
    sumcheck_verify_host,
)
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.models.sponge.fiat_shamir import FiatShamirRns
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR


@pytest.mark.slow
def test_sumcheck_rns_vs_host_and_verify(rng):
    import jax.numpy as jnp

    cfg = get_default_poseidon_parameters(FR, 2, False)
    B, m = 4, 4
    table = np.asarray(
        [[rng.randrange(FR.p) for _ in range(1 << m)] for _ in range(B)],
        dtype=object,
    )
    f = FiatShamirRns(cfg, batch_shape=(B,), rep="rns").field
    t_rns = jnp.asarray(f.pack(table))
    s_row, rounds, final_row = sumcheck_prove_rns(cfg, t_rns, rep="rns")

    sums_h, rounds_h, chals_h, finals_h = sumcheck_prove_host(cfg, table)

    s_got = f.unpack(np.asarray(s_row))
    fin_got = f.unpack(np.asarray(final_row))
    for b in range(B):
        assert int(s_got[b]) == sums_h[b], b
        assert int(fin_got[b]) == finals_h[b], b
        got_rounds = [
            (
                int(f.unpack(np.asarray(p0))[b]),
                int(f.unpack(np.asarray(p1))[b]),
            )
            for p0, p1 in rounds
        ]
        assert got_rounds == rounds_h[b], b
        # the host verifier accepts the residue-prover's transcript
        assert sumcheck_verify_host(
            cfg, sums_h[b], got_rounds, finals_h[b]
        ), b

    # soundness: wrong claimed sum, tampered round, wrong oracle value
    b = 0
    good = rounds_h[b]
    assert not sumcheck_verify_host(
        cfg, (sums_h[b] + 1) % FR.p, good, finals_h[b]
    )
    bad = list(good)
    bad[1] = ((bad[1][0] + 1) % FR.p, bad[1][1])
    assert not sumcheck_verify_host(cfg, sums_h[b], bad, finals_h[b])
    assert not sumcheck_verify_host(
        cfg, sums_h[b], good, (finals_h[b] + 1) % FR.p
    )


@pytest.mark.slow
def test_sumcheck_small_known_instance():
    """m=1 by hand: g(0)=a, g(1)=b -> S=a+b, p(0)=a, p(1)=b,
    g(r) = a(1-r)+br."""
    cfg = get_default_poseidon_parameters(FR, 2, False)
    table = np.asarray([[5, 9]], dtype=object)
    sums, rounds, chals, finals = sumcheck_prove_host(cfg, table)
    assert sums[0] == 14
    assert rounds[0] == [(5, 9)]
    r = chals[0][0]
    assert finals[0] == (5 * (1 - r) + 9 * r) % FR.p
    assert sumcheck_verify_host(cfg, 14, rounds[0], finals[0])


@pytest.mark.slow
def test_sumcheck_sharded(rng):
    """The batched prover under shard_map (instances data-parallel,
    zero collectives): identical transcript outputs on a D-device mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from crypto_primitives_tpu.parallel import make_mesh

    D = 8
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B, m = 2 * D, 3
    table = np.asarray(
        [[rng.randrange(FR.p) for _ in range(1 << m)] for _ in range(B)],
        dtype=object,
    )
    f = FiatShamirRns(cfg, batch_shape=(B,), rep="rns").field
    t_rns = jnp.asarray(f.pack(table))

    def prove(t):
        s, rounds, fin = sumcheck_prove_rns(cfg, t, rep="rns")
        return s, jnp.stack([jnp.stack(r) for r in rounds]), fin

    sharded = jax.shard_map(
        prove,
        mesh=make_mesh(D),
        in_specs=P("data", None, None),
        out_specs=(P("data", None), P(None, None, "data", None), P("data", None)),
        check_vma=False,
    )
    gs, gr, gf = sharded(t_rns)
    ws, wr, wf = prove(t_rns)
    assert np.array_equal(np.asarray(gs), np.asarray(ws))
    assert np.array_equal(np.asarray(gr), np.asarray(wr))
    assert np.array_equal(np.asarray(gf), np.asarray(wf))
