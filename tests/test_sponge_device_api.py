"""Device-tier sponge byte/bit/fork API (PoseidonSpongeBatch) vs the host
oracle across interleaved schedules — closing the CryptographicSponge
surface (reference src/sponge/mod.rs:57-154)."""

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.models.sponge import (
    FieldElementSize,
    PoseidonSponge,
    PoseidonSpongeBatch,
    get_default_poseidon_parameters,
)
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR, JUBJUB_FR


@pytest.fixture(params=["limb", "rns"])
def pair(rng, request, monkeypatch):
    # run every schedule under BOTH state representations: "rns" forces the
    # fused RNS-kernel tier (pallas interpreter on CPU), which must be
    # bit-identical to the limb tier and the host oracle
    monkeypatch.setenv(
        "CPT_SPONGE_RNS", "1" if request.param == "rns" else "0"
    )
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B = 3
    vals = [[rng.randrange(FR.p) for _ in range(4)] for _ in range(B)]
    hosts = []
    for row in vals:
        s = PoseidonSponge(cfg)
        s.absorb_elements(row)
        hosts.append(s)
    dev = PoseidonSpongeBatch(cfg, batch_shape=(B,))
    assert dev.rep == request.param
    dev.absorb(jnp.asarray(FR.pack(vals)))
    return cfg, hosts, dev


def test_squeeze_bytes_matches_oracle(pair):
    cfg, hosts, dev = pair
    got = np.asarray(dev.squeeze_bytes(70))
    for i, h in enumerate(hosts):
        assert bytes(got[i]) == h.squeeze_bytes(70)


def test_squeeze_bits_matches_oracle(pair):
    cfg, hosts, dev = pair
    got = np.asarray(dev.squeeze_bits(300))
    for i, h in enumerate(hosts):
        assert got[i].tolist() == h.squeeze_bits(300)


def test_squeeze_with_sizes_cross_field(pair):
    cfg, hosts, dev = pair
    sizes = [
        FieldElementSize.FULL,
        FieldElementSize.Truncated(128),
        FieldElementSize.FULL,
    ]
    got = np.asarray(dev.squeeze_field_elements_with_sizes(JUBJUB_FR, sizes))
    for i, h in enumerate(hosts):
        want = h.squeeze_field_elements_with_sizes(JUBJUB_FR, sizes)
        have = [int(v) for v in JUBJUB_FR.unpack(got[i])]
        assert have == want


def test_fork_matches_oracle(pair):
    cfg, hosts, dev = pair
    dev_f = dev.fork(b"proto-v1")
    got = np.asarray(dev_f.squeeze_native_field_elements(2))
    for i, h in enumerate(hosts):
        want = h.fork(b"proto-v1").squeeze_native_field_elements(2)
        assert [int(v) for v in FR.unpack(got[i])] == want
    # original device sponge unaffected (fork clones)
    got0 = np.asarray(dev.squeeze_native_field_elements(1))
    for i, h in enumerate(hosts):
        assert [int(v) for v in FR.unpack(got0[i])] == h.squeeze_native_field_elements(1)


def test_interleaved_schedule_bytes_then_absorb_then_bits(pair):
    """Mode-switch schedule: squeeze_bytes -> absorb -> squeeze_bits must
    track the oracle's duplex bookkeeping exactly."""
    cfg, hosts, dev = pair
    b1 = np.asarray(dev.squeeze_bytes(10))
    dev.absorb(jnp.asarray(FR.pack([[7]] * 3)))
    b2 = np.asarray(dev.squeeze_bits(17))
    for i, h in enumerate(hosts):
        assert bytes(b1[i]) == h.squeeze_bytes(10)
        h.absorb_elements([7])
        assert b2[i].tolist() == h.squeeze_bits(17)


def test_multi_dim_batch_shape_matches_flat(rng):
    """(B1, B2) batch shapes produce the same squeeze as flattened (B1*B2,)
    — the Pallas dispatch flattens internally (models/sponge/poseidon.py
    _permute), so multi-dim batches must not silently diverge."""
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B1, B2 = 2, 3
    vals = [[rng.randrange(FR.p) for _ in range(3)] for _ in range(B1 * B2)]
    flat = PoseidonSpongeBatch(cfg, batch_shape=(B1 * B2,))
    flat.absorb(jnp.asarray(FR.pack(vals)))
    nested = PoseidonSpongeBatch(cfg, batch_shape=(B1, B2))
    nested.absorb(
        jnp.asarray(FR.pack(vals)).reshape((B1, B2) + (3, FR.num_limbs))
    )
    got_f = np.asarray(flat.squeeze_native_field_elements(2))
    got_n = np.asarray(nested.squeeze_native_field_elements(2))
    assert got_n.reshape(got_f.shape).tolist() == got_f.tolist()


def test_rns_spongeext_roundtrip_mid_schedule(rng, monkeypatch):
    """SpongeExt on the RNS tier: export/import mid-schedule (pending
    absorbs not yet permuted) must resume bit-identically, including the
    static bound bookkeeping carried through into_state."""
    monkeypatch.setenv("CPT_SPONGE_RNS", "1")
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B = 2
    v1 = [[rng.randrange(FR.p)] for _ in range(B)]
    v2 = [[rng.randrange(FR.p) for _ in range(2)] for _ in range(B)]
    a = PoseidonSpongeBatch(cfg, batch_shape=(B,))
    a.absorb(jnp.asarray(FR.pack(v1)))  # one pending rate slot
    b = PoseidonSpongeBatch.from_state(a.into_state(), cfg)
    assert b.rep == "rns" and b._bounds == a._bounds
    for s in (a, b):
        s.absorb(jnp.asarray(FR.pack(v2)))
    ga = np.asarray(a.squeeze_native_field_elements(2))
    gb = np.asarray(b.squeeze_native_field_elements(2))
    assert ga.tolist() == gb.tolist()
    # and both match the host oracle
    for i in range(B):
        h = PoseidonSponge(cfg)
        h.absorb_elements(v1[i])
        h.absorb_elements(v2[i])
        assert [int(v) for v in FR.unpack(ga[i])] == (
            h.squeeze_native_field_elements(2)
        )


def test_poseidon_crh_batch_rns_vs_limb_bitexact(rng, monkeypatch):
    """The generic CRH batch APIs (models/crh/poseidon.py) must return
    bit-identical Montgomery limbs on both sponge tiers, and match the
    host evaluate (reference crh/poseidon/mod.rs:30-79 semantics)."""
    from crypto_primitives_tpu.models.crh.poseidon import (
        PoseidonCRH,
        PoseidonTwoToOneCRH,
    )

    cfg = get_default_poseidon_parameters(FR, 2, False)
    crh, two = PoseidonCRH(FR), PoseidonTwoToOneCRH(FR)
    B = 3
    ins = [[rng.randrange(FR.p) for _ in range(3)] for _ in range(B)]
    ls = [rng.randrange(FR.p) for _ in range(B)]
    rs = [rng.randrange(FR.p) for _ in range(B)]
    inp = jnp.asarray(FR.pack(ins))
    l = jnp.asarray(FR.pack([[x] for x in ls]))[:, 0, :]
    r = jnp.asarray(FR.pack([[x] for x in rs]))[:, 0, :]
    outs = {}
    for rep in ("0", "1"):
        monkeypatch.setenv("CPT_SPONGE_RNS", rep)
        outs[rep] = (
            np.asarray(crh.evaluate_batch(cfg, inp)),
            np.asarray(two.compress_batch(cfg, l, r)),
        )
    assert outs["0"][0].tolist() == outs["1"][0].tolist()
    assert outs["0"][1].tolist() == outs["1"][1].tolist()
    for i in range(B):
        assert int(FR.unpack(outs["1"][0][i])) == crh.evaluate(cfg, ins[i])
        assert int(FR.unpack(outs["1"][1][i])) == two.compress(
            cfg, ls[i], rs[i]
        )


def test_squeeze_native_rns_matches_limb_output(rng, monkeypatch):
    """squeeze_native_rns rows, converted through to_mont_limbs, equal the
    squeeze_native_field_elements limbs of an identical schedule."""
    from crypto_primitives_tpu.ops import rns, rns_xla

    monkeypatch.setenv("CPT_SPONGE_RNS", "1")
    cfg = get_default_poseidon_parameters(FR, 2, False)
    plan = rns.build_plan(FR.p)
    B = 2
    vals = [[rng.randrange(FR.p) for _ in range(3)] for _ in range(B)]
    a = PoseidonSpongeBatch(cfg, batch_shape=(B,))
    a.absorb(jnp.asarray(FR.pack(vals)))
    b = PoseidonSpongeBatch.from_state(a.into_state(), cfg)
    rows = a.squeeze_native_rns(2)
    limbs = b.squeeze_native_field_elements(2)
    conv = rns_xla.to_mont_limbs(plan, FR, rows, bound=3)
    assert np.asarray(conv).tolist() == np.asarray(limbs).tolist()
