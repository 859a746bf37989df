"""RNS-resident Fiat-Shamir transcript parity (round-3 verdict item 9).

The residues-end-to-end transcript (models/sponge/fiat_shamir.py) must
reproduce the host-oracle transcript bit-for-bit: same challenges, same
folded response, same tag.  Runs the forced-RNS sponge tier (interpret
kernel on CPU, compiled on TPU).
"""

import numpy as np
import pytest

from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.models.sponge.fiat_shamir import (
    FiatShamirRns,
    fold_argument_host,
    fold_argument_rns,
)
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR


@pytest.mark.slow
def test_fold_argument_parity(rng):
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B, R = 8, 4
    coms = np.asarray(
        [[rng.randrange(FR.p) for _ in range(R)] for _ in range(B)],
        dtype=object,
    )
    tag_limbs, z_rns, bz = fold_argument_rns(cfg, coms, rep="rns")
    tags_host, zs_host = fold_argument_host(cfg, coms)

    t = FiatShamirRns(cfg, batch_shape=(B,), rep="rns")
    got_z = t.field.unpack(np.asarray(z_rns))
    got_tags = FR.unpack(np.asarray(tag_limbs[:, 0, :]))
    for b in range(B):
        assert int(got_z[b]) == zs_host[b], b
        assert int(np.atleast_1d(got_tags)[b]) == tags_host[b], b


@pytest.mark.slow
def test_small_batch_default_rep(rng):
    """Round-4 verdict weak #2: the transcript must self-select the RNS
    tier at ANY batch size with NO rep argument (the generic sponge's
    auto-tier picks "limb" below batch 64, which used to trip the
    constructor assert on a natural small-batch call)."""
    from crypto_primitives_tpu.models.protocols.sumcheck import (
        sumcheck_prove_host,
        sumcheck_prove_rns,
        sumcheck_verify_host,
    )

    cfg = get_default_poseidon_parameters(FR, 2, False)
    B, R = 8, 2
    t = FiatShamirRns(cfg, batch_shape=(B,))  # no rep anywhere
    assert t.sponge.rep == "rns"
    coms = np.asarray(
        [[rng.randrange(FR.p) for _ in range(R)] for _ in range(B)],
        dtype=object,
    )
    tag_limbs, z_rns, _ = fold_argument_rns(cfg, coms)
    tags_host, zs_host = fold_argument_host(cfg, coms)
    got_z = t.field.unpack(np.asarray(z_rns))
    got_tags = FR.unpack(np.asarray(tag_limbs[:, 0, :]))
    for b in range(B):
        assert int(got_z[b]) == zs_host[b], b
        assert int(np.atleast_1d(got_tags)[b]) == tags_host[b], b

    # sumcheck at B < 64 with no rep: prover runs, host verifier accepts
    import jax.numpy as jnp

    tbl_host = [[rng.randrange(FR.p) for _ in range(4)] for _ in range(B)]
    f = t.field
    tbl = jnp.asarray(
        np.stack([f.pack(np.asarray(r, dtype=object)) for r in tbl_host])
    )
    s_row, rounds, fin = sumcheck_prove_rns(cfg, tbl)
    s_host = f.unpack(np.asarray(s_row))
    fin_host = f.unpack(np.asarray(fin))
    for b in range(B):
        msgs = [
            (
                int(f.unpack(np.asarray(p0))[b]),
                int(f.unpack(np.asarray(p1))[b]),
            )
            for p0, p1 in rounds
        ]
        assert sumcheck_verify_host(
            cfg, int(s_host[b]), msgs, int(fin_host[b])
        ), b


@pytest.mark.slow
def test_transcript_challenges_match_host(rng):
    """Challenge-by-challenge equality along the transcript, including
    the renormalizing absorb path (bound > 3)."""
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B = 4
    vals = [rng.randrange(FR.p) for _ in range(B)]
    t = FiatShamirRns(cfg, batch_shape=(B,), rep="rns")
    f = t.field
    row = np.asarray(f.pack(np.asarray(vals, dtype=object)))
    import jax.numpy as jnp

    r = jnp.asarray(row)
    # bound-4 rows exercise the normalize-before-absorb path
    quad, bq = f.add(*f.add(r, 1, r, 1), r, 1)
    t.absorb(quad[:, None, :], bound=bq)
    c1, _ = t.challenge()
    t.absorb(c1[:, None, :], bound=3)
    c2, _ = t.challenge()

    from crypto_primitives_tpu.models.sponge.poseidon import PoseidonSponge

    got1 = f.unpack(np.asarray(c1))
    got2 = f.unpack(np.asarray(c2))
    for b in range(B):
        s = PoseidonSponge(cfg)
        s.absorb_elements([3 * vals[b] % FR.p])
        w1 = s.squeeze_native_field_elements(1)[0]
        s.absorb_elements([w1])
        w2 = s.squeeze_native_field_elements(1)[0]
        assert int(got1[b]) == w1, b
        assert int(got2[b]) == w2, b


@pytest.mark.slow
def test_sharded_fold_argument(rng):
    """The RNS-resident transcript under shard_map (data-parallel over
    instances, zero collectives): tags and responses bit-equal to the
    unsharded run on a D-device mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from crypto_primitives_tpu.ops import rns
    from crypto_primitives_tpu.parallel import make_mesh

    D = 8
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B, R = 2 * D, 3
    coms = np.asarray(
        [[rng.randrange(FR.p) for _ in range(R)] for _ in range(B)],
        dtype=object,
    )
    t0 = FiatShamirRns(cfg, batch_shape=(B,), rep="rns")
    f = t0.field
    com_rows = jnp.asarray(
        np.stack([f.pack(coms[:, r]) for r in range(R)], axis=0)
    )  # (R, B, 2K)

    def transcript(rows):
        t = FiatShamirRns(cfg, batch_shape=(rows.shape[1],), rep="rns")
        z, bz = None, 0
        for r in range(R):
            row = rows[r]
            t.absorb(row[:, None, :], bound=1)
            c, bc = t.challenge()
            if r == 0:
                z, bz = row, 1
            else:
                z, bz = t.field.mul(z, bz, c, bc)
                z, bz = t.field.add(z, bz, row, 1)
        z, bz = t.field.normalize(z, bz)
        t.absorb(z[:, None, :], bound=bz)
        return t.finalize(1)

    mesh = make_mesh(D)
    sharded = jax.shard_map(
        transcript,
        mesh=mesh,
        in_specs=P(None, "data", None),
        out_specs=P("data", None, None),
        check_vma=False,
    )
    got = np.asarray(sharded(com_rows))
    want = np.asarray(transcript(com_rows))
    assert np.array_equal(got, want)
