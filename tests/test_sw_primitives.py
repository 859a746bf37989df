"""Primitive schemes over a Short-Weierstrass group (BLS12-381 G1).

The reference is generic over any ark-ec `CurveGroup` (Pedersen
commitment src/commitment/pedersen/mod.rs:33-43, Schnorr
src/signature/schnorr/mod.rs:36-47, ElGamal
src/encryption/elgamal/mod.rs:19-29); these tests pin that the repo's
duck-typed curve-spec interface gives the same genericity: every scheme
runs unchanged over `SWCurveSpec`, host tier vs batched device tier.
"""

import random

import numpy as np
import pytest

from crypto_primitives_tpu.models.commitment.pedersen import PedersenCommitment
from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window
from crypto_primitives_tpu.models.encryption.elgamal import ElGamal
from crypto_primitives_tpu.models.signature.schnorr import Schnorr
from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1 as G1


@pytest.fixture()
def rng():
    return random.Random(20260818)


@pytest.mark.slow
def test_pedersen_crh_sw_batch_vs_host(rng):
    window = Window(window_size=4, num_windows=8)  # 32-bit input
    crh = PedersenCRH(G1, window)
    params = crh.setup(rng)
    msgs = [bytes(rng.randrange(256) for _ in range(4)) for _ in range(3)]
    import jax.numpy as jnp

    batch = crh.evaluate_batch(params, jnp.asarray(np.frombuffer(b"".join(msgs), dtype=np.uint8).reshape(3, 4)))
    got = G1.base.unpack(np.asarray(batch))
    for i, m in enumerate(msgs):
        exp = crh.evaluate(params, m)
        if exp is None:
            assert (int(got[i][0]), int(got[i][1])) == (0, 0)
        else:
            assert (int(got[i][0]), int(got[i][1])) == exp


@pytest.mark.slow
def test_pedersen_commitment_sw_batch_vs_host(rng):
    window = Window(window_size=4, num_windows=8)
    comm = PedersenCommitment(G1, window)
    params = comm.setup(rng)
    msgs = [bytes(rng.randrange(256) for _ in range(4)) for _ in range(2)]
    rands = [comm.rand_randomness(rng) for _ in range(2)]
    import jax.numpy as jnp

    inputs = jnp.asarray(np.frombuffer(b"".join(msgs), dtype=np.uint8).reshape(2, 4))
    rbits = jnp.asarray(comm.randomness_to_bits(rands))
    batch = comm.commit_batch(params, inputs, rbits)
    got = G1.base.unpack(np.asarray(batch))
    for i in range(2):
        exp = comm.commit(params, msgs[i], rands[i])
        assert (int(got[i][0]), int(got[i][1])) == exp


def test_schnorr_sw_sign_verify(rng):
    sch = Schnorr(G1)
    params = sch.setup(rng)
    pk, sk = sch.keygen(params, rng)
    msg = b"sw schnorr message"
    sig = sch.sign(params, sk, msg, rng)
    assert sch.verify(params, pk, msg, sig)
    assert not sch.verify(params, pk, b"tampered", sig)


def test_schnorr_sw_randomize(rng):
    """randomize_public_key + randomize_signature keep verifying
    (mod.rs:150-214 contract, over SW)."""
    sch = Schnorr(G1)
    params = sch.setup(rng)
    pk, sk = sch.keygen(params, rng)
    msg = b"rerandomized"
    sig = sch.sign(params, sk, msg, rng)
    randomness = bytes(rng.randrange(256) for _ in range(32))
    pk2 = sch.randomize_public_key(params, pk, randomness)
    sig2 = sch.randomize_signature(params, sig, randomness)
    assert sch.verify(params, pk2, msg, sig2)
    assert not sch.verify(params, pk, msg, sig2)


@pytest.mark.slow
def test_schnorr_sw_batch_paths(rng):
    """keygen_batch / verify_batch run the SW device tier (255-step
    double-and-add scans) and match the host tier."""
    sch = Schnorr(G1)
    params = sch.setup(rng)
    pairs = sch.keygen_batch(params, rng, 2)
    for pk, sk in pairs:
        assert pk == G1.scalar_mul_host(params.generator, sk)
    msgs = [b"m0", b"m1"]
    sigs = [sch.sign(params, pairs[i][1], msgs[i], rng) for i in range(2)]
    pks = [p for p, _ in pairs]
    assert sch.verify_batch(params, pks, msgs, sigs) == [True, True]
    bad = [sigs[0], sigs[0]]  # sig 0 against pk 1 must fail
    assert sch.verify_batch(params, pks, msgs, bad) == [True, False]


def test_elgamal_sw_roundtrip(rng):
    eg = ElGamal(G1)
    params = eg.setup(rng)
    pk, sk = eg.keygen(params, rng)
    m = G1.rand_point(rng)
    r = eg.rand_randomness(rng)
    ct = eg.encrypt(params, pk, m, r)
    assert eg.decrypt(params, sk, ct) == m


@pytest.mark.slow
def test_te_limb_fallback_commit_batch(rng, monkeypatch):
    """CPT_DISABLE_RNS_CURVE forces the TE limb tier through the same
    generic dev_* shims the SW path uses; host parity must hold."""
    monkeypatch.setenv("CPT_DISABLE_RNS_CURVE", "1")
    from crypto_primitives_tpu.ops.curves_known import JUBJUB
    import jax.numpy as jnp

    window = Window(window_size=4, num_windows=8)
    comm = PedersenCommitment(JUBJUB, window)
    params = comm.setup(rng)
    msgs = [bytes(rng.randrange(256) for _ in range(4)) for _ in range(2)]
    rands = [comm.rand_randomness(rng) for _ in range(2)]
    inputs = jnp.asarray(np.frombuffer(b"".join(msgs), dtype=np.uint8).reshape(2, 4))
    rbits = jnp.asarray(comm.randomness_to_bits(rands))
    got = JUBJUB.base.unpack(np.asarray(comm.commit_batch(params, inputs, rbits)))
    for i in range(2):
        assert (int(got[i][0]), int(got[i][1])) == comm.commit(params, msgs[i], rands[i])


@pytest.mark.slow
def test_elgamal_sw_batch_vs_host(rng):
    eg = ElGamal(G1)
    params = eg.setup(rng)
    pk, sk = eg.keygen(params, rng)
    msgs = [G1.rand_point(rng) for _ in range(2)]
    rands = [eg.rand_randomness(rng) for _ in range(2)]
    cts = eg.encrypt_batch(params, pk, msgs, rands)
    for i in range(2):
        assert cts[i] == eg.encrypt(params, pk, msgs[i], rands[i])
    dec = eg.decrypt_batch(params, sk, cts)
    assert dec == [tuple(m) for m in msgs]
