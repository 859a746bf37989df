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


@pytest.fixture()
def pair(rng):
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B = 3
    vals = [[rng.randrange(FR.p) for _ in range(4)] for _ in range(B)]
    hosts = []
    for row in vals:
        s = PoseidonSponge(cfg)
        s.absorb_elements(row)
        hosts.append(s)
    dev = PoseidonSpongeBatch(cfg, batch_shape=(B,))
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
