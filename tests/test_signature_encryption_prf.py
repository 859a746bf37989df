"""Schnorr, ElGamal, and Blake2s PRF round trips (reference patterns:
sign/verify/reject/randomize at src/signature/mod.rs:60-105; ElGamal
enc/dec at src/encryption/elgamal/mod.rs:111-128)."""

import hashlib

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.models.encryption.elgamal import ElGamal
from crypto_primitives_tpu.models.prf.blake2s import Blake2sPRF, Blake2sWithParameterBlock
from crypto_primitives_tpu.models.signature.schnorr import Schnorr, _randomness_multiplier
from crypto_primitives_tpu.ops.curves_known import ED_ON_BLS12_377, JUBJUB


@pytest.mark.parametrize("curve", [JUBJUB, ED_ON_BLS12_377], ids=lambda c: c.name)
def test_schnorr_sign_verify(rng, curve):
    scheme = Schnorr(curve)
    params = scheme.setup(rng)
    pk, sk = scheme.keygen(params, rng)
    message = b"hello schnorr" * 9  # ~128 bytes like the reference bench
    sig = scheme.sign(params, sk, message, rng)
    assert scheme.verify(params, pk, message, sig)
    # wrong message rejected (mod.rs test: failed_verification)
    assert not scheme.verify(params, pk, b"bad message", sig)
    # tampered signature rejected
    from crypto_primitives_tpu.models.signature.schnorr import SchnorrSignature

    bad = SchnorrSignature(sig.prover_response, (sig.verifier_challenge + 1) % curve.scalar.p)
    assert not scheme.verify(params, pk, message, bad)


def test_schnorr_randomize(rng):
    """randomize_pk + randomize_sig keep verification consistent
    (src/signature/mod.rs randomize tests)."""
    scheme = Schnorr(JUBJUB)
    params = scheme.setup(rng)
    pk, sk = scheme.keygen(params, rng)
    message = b"rerandomize me"
    sig = scheme.sign(params, sk, message, rng)
    randomness = bytes(rng.randrange(256) for _ in range(32))
    pk_r = scheme.randomize_public_key(params, pk, randomness)
    sig_r = scheme.randomize_signature(params, sig, randomness)
    assert scheme.verify(params, pk_r, message, sig_r)
    assert not scheme.verify(params, pk, message, sig_r)


def test_schnorr_batch_verify(rng):
    scheme = Schnorr(JUBJUB)
    params = scheme.setup(rng)
    keys = [scheme.keygen(params, rng) for _ in range(4)]
    msgs = [bytes([i]) * 16 for i in range(4)]
    sigs = [scheme.sign(params, sk, m, rng) for (pk, sk), m in zip(keys, msgs)]
    oks = scheme.verify_batch(params, [pk for pk, _ in keys], msgs, sigs)
    assert oks == [True] * 4
    # corrupt one
    msgs[2] = b"corrupted!"
    oks = scheme.verify_batch(params, [pk for pk, _ in keys], msgs, sigs)
    assert oks == [True, True, False, True]


def test_randomness_multiplier_consistency():
    # pk-path (reversed double-and-add) == sig-path (2^i weights): both are
    # the integer with byte-MSB-first stream weights 2^position
    assert _randomness_multiplier(b"\x80") == 1
    assert _randomness_multiplier(b"\x01") == 128
    assert _randomness_multiplier(b"\x80\x00") == 1
    assert _randomness_multiplier(b"\x00\x80") == 256


@pytest.mark.parametrize("curve", [JUBJUB, ED_ON_BLS12_377], ids=lambda c: c.name)
def test_elgamal_round_trip(rng, curve):
    scheme = ElGamal(curve)
    params = scheme.setup(rng)
    pk, sk = scheme.keygen(params, rng)
    msg = curve.rand_point(rng)
    r = scheme.rand_randomness(rng)
    cipher = scheme.encrypt(params, pk, msg, r)
    assert scheme.decrypt(params, sk, cipher) == msg
    # decrypting with the wrong key gives a different point
    assert scheme.decrypt(params, (sk + 1) % curve.scalar.p, cipher) != msg


def test_elgamal_batch(rng):
    scheme = ElGamal(JUBJUB)
    params = scheme.setup(rng)
    pk, sk = scheme.keygen(params, rng)
    msgs = [JUBJUB.rand_point(rng) for _ in range(3)]
    rs = [scheme.rand_randomness(rng) for _ in range(3)]
    ciphers = scheme.encrypt_batch(params, pk, msgs, rs)
    for i in range(3):
        assert ciphers[i] == scheme.encrypt(params, pk, msgs[i], rs[i])
    dec = scheme.decrypt_batch(params, sk, ciphers)
    assert dec == msgs


def test_blake2s_prf(rng):
    seed = bytes(rng.randrange(256) for _ in range(32))
    inp = bytes(rng.randrange(256) for _ in range(32))
    out = Blake2sPRF.evaluate(seed, inp)
    assert out == hashlib.blake2s(seed + inp).digest()
    dev = Blake2sPRF.evaluate_batch(
        jnp.asarray(np.frombuffer(seed, np.uint8)[None, :]),
        jnp.asarray(np.frombuffer(inp, np.uint8)[None, :]),
    )
    assert bytes(np.asarray(dev)[0]) == out
    # parameter-block variant
    pb = Blake2sWithParameterBlock(salt=b"saltsalt", personalization=b"personal")
    msg = b"some input bytes"
    assert pb.evaluate(msg) == hashlib.blake2s(msg, salt=b"saltsalt", person=b"personal").digest()
    devpb = pb.evaluate_batch(jnp.asarray(np.frombuffer(msg, np.uint8)[None, :]))
    assert bytes(np.asarray(devpb)[0]) == pb.evaluate(msg)
