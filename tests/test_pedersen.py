"""Pedersen / Bowe-Hopwood CRHs and commitments: device vs host oracle,
mirroring the reference native<->gadget consistency pattern (SURVEY §4.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.models.commitment.blake2s import Blake2sCommitment
from crypto_primitives_tpu.models.commitment.injective_map import (
    PedersenCommitmentCompressor,
)
from crypto_primitives_tpu.models.commitment.pedersen import PedersenCommitment
from crypto_primitives_tpu.models.crh.bowe_hopwood import (
    BoweHopwoodCRH,
    BoweHopwoodTwoToOneCRH,
    max_chunks_per_segment,
)
from crypto_primitives_tpu.models.crh.injective_map import (
    PedersenCRHCompressor,
    PedersenTwoToOneCRHCompressor,
)
from crypto_primitives_tpu.models.crh.pedersen import (
    PedersenCRH,
    PedersenTwoToOneCRH,
    Window,
)
from crypto_primitives_tpu.ops.curves_known import JUBJUB

pytestmark = pytest.mark.slow  # device-oracle fuzz tier (run_tests.sh)

W = Window(window_size=4, num_windows=16)  # 64-bit input, small & fast


def test_pedersen_crh_device_vs_host(rng):
    crh = PedersenCRH(JUBJUB, W)
    params = crh.setup(rng)
    msgs = [bytes(rng.randrange(256) for _ in range(8)) for _ in range(3)]
    dev = jnp.asarray(np.frombuffer(b"".join(msgs), dtype=np.uint8).reshape(3, 8))
    out = np.asarray(crh.evaluate_batch(params, dev))
    for i, m in enumerate(msgs):
        expect = crh.evaluate(params, m)
        x = int(JUBJUB.base.unpack(out[i][0]))
        y = int(JUBJUB.base.unpack(out[i][1]))
        assert (x, y) == expect


def test_pedersen_crh_short_input_padded(rng):
    crh = PedersenCRH(JUBJUB, W)
    params = crh.setup(rng)
    m = b"\x01\x02"
    assert crh.evaluate(params, m) == crh.evaluate(params, m + b"\x00" * 6)
    with pytest.raises(ValueError):
        crh.evaluate(params, b"\x00" * 9)  # too long


def test_pedersen_two_to_one_and_compress(rng):
    two = PedersenTwoToOneCRH(JUBJUB, Window(4, 256))  # 1024-bit input
    params = two.setup(rng)
    l = bytes(rng.randrange(256) for _ in range(32))
    r = bytes(rng.randrange(256) for _ in range(32))
    d = two.evaluate(params, l, r)
    assert JUBJUB.is_on_curve(d)
    # compress of two digests: serializes x||y (64 bytes each half)
    d2 = two.compress(params, d, d)
    assert JUBJUB.is_on_curve(d2)
    # device two-to-one agrees
    dev_l = jnp.asarray(np.frombuffer(l, dtype=np.uint8).reshape(1, 32))
    dev_r = jnp.asarray(np.frombuffer(r, dtype=np.uint8).reshape(1, 32))
    out = np.asarray(two.evaluate_batch(params, dev_l, dev_r))
    assert (int(JUBJUB.base.unpack(out[0][0])), int(JUBJUB.base.unpack(out[0][1]))) == d
    # device compress agrees
    dig = two.evaluate_batch(params, dev_l, dev_r)
    outc = np.asarray(two.compress_batch(params, dig, dig))
    assert (int(JUBJUB.base.unpack(outc[0][0])), int(JUBJUB.base.unpack(outc[0][1]))) == d2


def test_bowe_hopwood(rng):
    bh = BoweHopwoodCRH(JUBJUB, Window(window_size=8, num_windows=4))  # 96 bits
    params = bh.setup(rng)
    msgs = [bytes([1, 2, 3]), bytes(rng.randrange(256) for _ in range(12))]
    for m in msgs:
        x = bh.evaluate(params, m)
        dev = jnp.asarray(np.frombuffer(m, dtype=np.uint8).reshape(1, len(m)))
        out = np.asarray(bh.evaluate_batch(params, dev))
        assert int(JUBJUB.base.unpack(out[0])) == x
    # window-size guard (mod.rs:95-101)
    too_big = max_chunks_per_segment(JUBJUB.scalar.p) + 1
    with pytest.raises(ValueError):
        BoweHopwoodCRH(JUBJUB, Window(too_big, 1)).setup(rng)


def test_bowe_hopwood_two_to_one(rng):
    two = BoweHopwoodTwoToOneCRH(JUBJUB, Window(window_size=58, num_windows=6))
    params = two.setup(rng)
    l = bytes(rng.randrange(256) for _ in range(32))
    r = bytes(rng.randrange(256) for _ in range(32))
    d = two.evaluate(params, l, r)
    d2 = two.compress(params, d, d)
    assert 0 <= d < JUBJUB.base.p and 0 <= d2 < JUBJUB.base.p


def test_injective_map_compressors(rng):
    comp = PedersenCRHCompressor(JUBJUB, W)
    params = comp.setup(rng)
    m = bytes(rng.randrange(256) for _ in range(8))
    x = comp.evaluate(params, m)
    assert x == comp.crh.evaluate(params, m)[0]
    dev = jnp.asarray(np.frombuffer(m, dtype=np.uint8).reshape(1, 8))
    assert int(JUBJUB.base.unpack(np.asarray(comp.evaluate_batch(params, dev))[0])) == x
    two = PedersenTwoToOneCRHCompressor(JUBJUB, Window(4, 256))
    p2 = two.setup(rng)
    d = two.evaluate(p2, m + bytes(24), m + bytes(24))
    assert two.compress(p2, d, d) is not None


def test_pedersen_commitment(rng):
    comm = PedersenCommitment(JUBJUB, Window(4, 192))  # allows 96-byte input
    params = comm.setup(rng)
    m = bytes(rng.randrange(256) for _ in range(32))
    r = comm.rand_randomness(rng)
    c = comm.commit(params, m, r)
    assert JUBJUB.is_on_curve(c)
    # different randomness -> different commitment (hiding sanity)
    assert c != comm.commit(params, m, (r + 1) % JUBJUB.scalar.p)
    # device agrees with host
    dev = jnp.asarray(np.frombuffer(m, dtype=np.uint8).reshape(1, 32))
    rbits = jnp.asarray(comm.randomness_to_bits([r]))
    out = np.asarray(comm.commit_batch(params, dev, rbits))
    assert (int(JUBJUB.base.unpack(out[0][0])), int(JUBJUB.base.unpack(out[0][1]))) == c
    # compressor variant
    cc = PedersenCommitmentCompressor(JUBJUB, Window(4, 192))
    ccp = cc.setup(rng)
    assert cc.commit(ccp, m, r) == cc.inner.commit(ccp, m, r)[0]


def test_blake2s_commitment(rng):
    import hashlib

    comm = Blake2sCommitment()
    m = bytes(rng.randrange(256) for _ in range(20))
    r = comm.rand_randomness(rng)
    c = comm.commit(None, m, r)
    assert c == hashlib.blake2s(m + r).digest()
    dev_m = jnp.asarray(np.frombuffer(m, dtype=np.uint8).reshape(1, 20))
    dev_r = jnp.asarray(np.frombuffer(r, dtype=np.uint8).reshape(1, 32))
    out = np.asarray(comm.commit_batch(None, dev_m, dev_r))
    assert bytes(out[0]) == c
