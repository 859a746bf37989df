"""External golden vectors (round-3 verdict item 8).

Every wire/arithmetic pin elsewhere in the suite that lacks a Rust
toolchain to regenerate true arkworks outputs is a self-pinned
regression vector.  This module pins the generic TE and SW curve stacks
against EXTERNAL ground truth that ships inside this image:

  * the ``cryptography`` package (OpenSSL-backed) as an authoritative
    independent implementation of edwards25519 and NIST P-256, and
  * published RFC 8032 / SEC 2 literals hardcoded below.

edwards25519 instantiates the same complete-TE addition law JubJub
rides (ops/curve.py:72-79); P-256 exercises the SW stack's general-a
path (a = -3; BLS12-381 G1 and Pallas are both a = 0,
ops/curve_sw.py:118-135).  Host-tier agreement transfers to the device
tiers through the existing host/device parity fuzz suites
(tests/test_curve.py, tests/test_curve_sw.py) — and the device-parity
checks at the bottom close the loop for the two curves directly.

Reference scope being matched: ark-ec's any-curve generality
(/root/reference/crypto-primitives/src/sponge/absorb.rs:263-282).
"""

import hashlib

import numpy as np
import pytest

pytest.importorskip("cryptography")

from crypto_primitives_tpu.ops.curves_known import ED25519, SECP256R1

# RFC 8032 §7.1 TEST 1 (published literals)
RFC8032_T1_SEED = bytes.fromhex(
    "9d61b19deffd5a60ba844af492ec2cc44449c5697b326919703bac031cae7f60"
)
RFC8032_T1_PK = bytes.fromhex(
    "d75a980182b10ab7d54bfed3c964073a0ee172f3daa62325af021a68f707511a"
)


def _ed25519_point_encode(pt) -> bytes:
    x, y = pt
    enc = bytearray(y.to_bytes(32, "little"))
    enc[31] |= (x & 1) << 7
    return bytes(enc)


def _ed25519_secret_expand(seed: bytes):
    h = hashlib.sha512(seed).digest()
    a = int.from_bytes(h[:32], "little")
    a &= (1 << 254) - 8
    a |= 1 << 254
    return a, h[32:]


def _ed25519_public_key(seed: bytes) -> bytes:
    a, _ = _ed25519_secret_expand(seed)
    return _ed25519_point_encode(ED25519.scalar_mul_host(ED25519.generator, a))


def _ed25519_sign(seed: bytes, msg: bytes) -> bytes:
    ell = ED25519.scalar.p
    a, prefix = _ed25519_secret_expand(seed)
    pk = _ed25519_public_key(seed)
    r = int.from_bytes(hashlib.sha512(prefix + msg).digest(), "little") % ell
    R = _ed25519_point_encode(ED25519.scalar_mul_host(ED25519.generator, r))
    k = int.from_bytes(hashlib.sha512(R + pk + msg).digest(), "little") % ell
    s = (r + k * a) % ell
    return R + s.to_bytes(32, "little")


def test_ed25519_public_key_rfc8032_and_cryptography():
    """Our TE arithmetic derives the RFC 8032 TEST-1 public key, and
    agrees with the cryptography package across random seeds."""
    from cryptography.hazmat.primitives.asymmetric.ed25519 import (
        Ed25519PrivateKey,
    )

    assert _ed25519_public_key(RFC8032_T1_SEED) == RFC8032_T1_PK
    ext = Ed25519PrivateKey.from_private_bytes(RFC8032_T1_SEED)
    assert ext.public_key().public_bytes_raw() == RFC8032_T1_PK

    for i in range(4):
        seed = hashlib.sha256(b"cpt-ext-vec-%d" % i).digest()
        ext = Ed25519PrivateKey.from_private_bytes(seed)
        assert (
            _ed25519_public_key(seed) == ext.public_key().public_bytes_raw()
        ), i


def test_ed25519_signatures_vs_cryptography():
    """Full RFC 8032 signing on our curve arithmetic, byte-equal to the
    OpenSSL-backed implementation (Ed25519 is deterministic)."""
    from cryptography.hazmat.primitives.asymmetric.ed25519 import (
        Ed25519PrivateKey,
    )

    msgs = [b"", b"r", bytes(range(64)), b"tpu-native crypto primitives"]
    for i, msg in enumerate(msgs):
        seed = hashlib.sha256(b"cpt-ext-sig-%d" % i).digest()
        ext = Ed25519PrivateKey.from_private_bytes(seed)
        assert _ed25519_sign(seed, msg) == ext.sign(msg), (i, msg)


def test_p256_scalar_mul_vs_cryptography():
    """SW general-a scalar multiplication against OpenSSL's P-256."""
    from cryptography.hazmat.primitives.asymmetric.ec import (
        SECP256R1 as ExtCurve,
        derive_private_key,
    )

    for d in (1, 2, 12345, 2**200 + 7, SECP256R1.scalar.p - 1):
        ext = derive_private_key(d, ExtCurve()).public_key().public_numbers()
        got = SECP256R1.scalar_mul_host(SECP256R1.generator, d)
        assert got == (ext.x, ext.y), d


def test_p256_ecdsa_verify_external_signature():
    """An OpenSSL-produced ECDSA signature verifies under our SW
    arithmetic (the full verify equation: u1*G + u2*Q)."""
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric.ec import (
        ECDSA,
        SECP256R1 as ExtCurve,
        derive_private_key,
    )
    from cryptography.hazmat.primitives.asymmetric.utils import (
        decode_dss_signature,
    )

    n = SECP256R1.scalar.p
    msg = b"external ECDSA vector"
    key = derive_private_key(0xC0FFEE + 1, ExtCurve())
    sig = key.sign(msg, ECDSA(hashes.SHA256()))
    r, s = decode_dss_signature(sig)
    pn = key.public_key().public_numbers()
    Q = (pn.x, pn.y)
    z = int.from_bytes(hashlib.sha256(msg).digest(), "big") % n
    w = pow(s, -1, n)
    u1, u2 = z * w % n, r * w % n
    pt = SECP256R1.add_host(
        SECP256R1.scalar_mul_host(SECP256R1.generator, u1),
        SECP256R1.scalar_mul_host(Q, u2),
    )
    assert pt[0] % n == r


@pytest.mark.slow
def test_new_curves_device_parity(rng):
    """Device-tier add/double parity for the two externally-validated
    curves (closes the host->device trust chain in-module)."""
    import jax.numpy as jnp

    from crypto_primitives_tpu.ops import curve as cv
    from crypto_primitives_tpu.ops import curve_sw as sw

    pts = [ED25519.rand_point(rng) for _ in range(8)]
    qts = [ED25519.rand_point(rng) for _ in range(8)]
    a = jnp.asarray(ED25519.pack_points(pts))
    b = jnp.asarray(ED25519.pack_points(qts))
    got = ED25519.unpack_points(np.asarray(cv.te_add(ED25519, a, b)))
    for i in range(8):
        assert got[i] == ED25519.add_host(pts[i], qts[i]), i

    spts = [SECP256R1.rand_point(rng) for _ in range(8)]
    sqts = [SECP256R1.rand_point(rng) for _ in range(8)]
    sa = jnp.asarray(SECP256R1.pack_points(spts))
    sb = jnp.asarray(SECP256R1.pack_points(sqts))
    sgot = SECP256R1.unpack_points(np.asarray(sw.sw_add(SECP256R1, sa, sb)))
    for i in range(8):
        assert sgot[i] == SECP256R1.add_host(spts[i], sqts[i]), i


@pytest.mark.slow
def test_primitives_over_externally_validated_curves(rng):
    """The curve-generic schemes run unchanged over the two externally
    validated instances: Schnorr sign/verify + tamper-reject over
    edwards25519 (TE path; its 255-bit base field rides the standard RNS
    fast plan) and over NIST P-256 (SW general-a path)."""
    from crypto_primitives_tpu.models.signature.schnorr import Schnorr

    for curve in (ED25519, SECP256R1):
        sch = Schnorr(curve)
        pp = sch.setup(rng)
        pk, sk = sch.keygen(pp, rng)
        msg = b"externally validated curve"
        sig = sch.sign(pp, sk, msg, rng)
        assert sch.verify(pp, pk, msg, sig), curve.name
        assert not sch.verify(pp, pk, b"tampered", sig), curve.name
