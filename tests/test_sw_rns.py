"""SW-curve RNS fast tier (ops/curve_sw_rns.py) and SW wire formats.

Round-2 verdict item 2: complete RCB addition over residues, grouped
tables, curve-generic primitive dispatch (Pallas, a 255-bit SW curve the
RNS plan covers), and ark-serialize SWFlags codecs with pinned vectors.
Oracles are the host affine tier (ops/curve_sw.py), itself pinned against
the reference semantics in test_curve_sw.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from crypto_primitives_tpu.ops import curve_sw_rns as sr
from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1, PALLAS
from crypto_primitives_tpu.ops.rns import K


def _bits(curve, scalars):
    nb = curve.scalar.nbits
    out = np.zeros((len(scalars), nb), np.uint8)
    for i, v in enumerate(scalars):
        for j in range(nb):
            out[i, j] = (v >> j) & 1
    return jnp.asarray(out)


def test_sw_add_rns_complete_vs_host(rng):
    pts = [PALLAS.rand_point(rng) for _ in range(8)]
    arr = jnp.asarray(sr.pack_points_rns(PALLAS, pts))
    got = sr.unpack_affine_rns(PALLAS, sr.sw_add_rns(PALLAS, arr[0::2], arr[1::2]))
    for i in range(4):
        assert got[i] == PALLAS.add_host(pts[2 * i], pts[2 * i + 1])
    # doubling through the same complete formula
    gd = sr.unpack_affine_rns(PALLAS, sr.sw_add_rns(PALLAS, arr, arr))
    for i in range(8):
        assert gd[i] == PALLAS.double_host(pts[i])
    # identity + P and P + (-P) -> infinity
    ident = sr.identity_rns(PALLAS, (2,))
    r = sr.unpack_affine_rns(PALLAS, sr.sw_add_rns(PALLAS, ident, arr[:2]))
    assert list(r) == pts[:2]
    z = sr.unpack_affine_rns(
        PALLAS, sr.sw_add_rns(PALLAS, arr[:2], sr.sw_neg_rns(PALLAS, arr[:2]))
    )
    assert list(z) == [None, None]


def test_sw_grouped_conditional_sum_vs_host(rng):
    pts = [PALLAS.rand_point(rng) for _ in range(8)]
    tbl = sr.pack_table_grouped(PALLAS, pts, 3)
    bits = np.asarray(
        [[rng.randrange(2) for _ in range(8)] for _ in range(3)], np.uint8
    )
    acc = sr.sw_conditional_sum_grouped_rns(
        PALLAS, jnp.asarray(tbl), jnp.asarray(bits), 3
    )
    got = sr.unpack_affine_rns(PALLAS, acc)
    for row in range(3):
        exp = None
        for j, pt in enumerate(pts):
            if bits[row, j]:
                exp = PALLAS.add_host(exp, pt)
        assert got[row] == exp


def test_sw_scalar_muls_vs_host(rng):
    sc = [rng.randrange(PALLAS.scalar.p) for _ in range(3)]
    bits = _bits(PALLAS, sc)
    fb = sr.unpack_affine_rns(
        PALLAS, sr.sw_fixed_base_mul_rns(PALLAS, PALLAS.generator, bits)
    )
    base = jnp.broadcast_to(
        jnp.asarray(sr.pack_points_rns(PALLAS, PALLAS.generator)),
        (3, 3, 2 * K),
    )
    vb = sr.unpack_affine_rns(
        PALLAS, sr.sw_scalar_mul_bits_windowed_rns(PALLAS, base, bits)
    )
    for i in range(3):
        exp = PALLAS.scalar_mul_host(PALLAS.generator, sc[i])
        assert fb[i] == exp and vb[i] == exp


@pytest.mark.slow
def test_schnorr_on_pallas_rns(rng):
    from crypto_primitives_tpu.models.signature.schnorr import Schnorr
    from crypto_primitives_tpu.ops.curve_rns_any import rns_mod

    # round 4: BLS12-381 G1 now ALSO rides the RNS tier (the big plan
    # geometry, tests/test_rns_big.py); both SW curves dispatch to sr
    assert rns_mod(PALLAS) is sr and rns_mod(BLS12_381_G1) is sr
    sch = Schnorr(PALLAS)
    params = sch.setup(rng)
    keys = sch.keygen_batch(params, rng, 4)
    msgs = [bytes([i] * 16) for i in range(4)]
    sigs = sch.sign_batch(params, [k[1] for k in keys], msgs, rng)
    for i in range(4):
        assert sch.verify(params, keys[i][0], msgs[i], sigs[i])
    oks = sch.verify_batch(params, [k[0] for k in keys], msgs, sigs)
    assert all(oks)
    bad = sch.verify_batch(
        params, [keys[1][0]] + [k[0] for k in keys[1:]], msgs, sigs
    )
    assert not bad[0] and all(bad[1:])


@pytest.mark.slow
def test_elgamal_on_pallas_rns(rng):
    from crypto_primitives_tpu.models.encryption.elgamal import ElGamal

    eg = ElGamal(PALLAS)
    ep = eg.setup(rng)
    pk, sk = eg.keygen(ep, rng)
    ms = [PALLAS.rand_point(rng) for _ in range(4)]
    rs = [eg.rand_randomness(rng) for _ in range(4)]
    cts = eg.encrypt_batch(ep, pk, ms, rs)
    for i in range(4):
        assert cts[i] == eg.encrypt(ep, pk, ms[i], rs[i])
    assert eg.decrypt_batch(ep, sk, cts) == ms


@pytest.mark.slow
def test_pedersen_crh_on_pallas_rns(rng):
    from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window

    crh = PedersenCRH(PALLAS, Window(window_size=4, num_windows=16))
    pp = crh.setup(rng)
    data = [bytes(rng.randrange(256) for _ in range(8)) for _ in range(3)]
    dev = crh.evaluate_batch(
        pp, jnp.asarray(np.frombuffer(b"".join(data), np.uint8).reshape(3, 8))
    )
    for i in range(3):
        xy = PALLAS.base.unpack(np.asarray(dev[i]))
        assert (int(xy[0]), int(xy[1])) == crh.evaluate(pp, data[i])


# ---------------------------------------------------------------------------
# SW wire formats (ark-serialize SWFlags)
# ---------------------------------------------------------------------------


def test_sw_flag_buffer_sizing():
    # buffer_byte_size(MODULUS_BIT_SIZE + 2): 255-bit Pallas -> 33 bytes
    # (the two flag bits MUST NOT collide with data bit 254); 381-bit
    # BLS12-381 Fq -> 48 (three spare bits)
    assert PALLAS.swflag_bytes == 33
    assert BLS12_381_G1.swflag_bytes == 48
    assert len(PALLAS.serialize_compressed(PALLAS.generator)) == 33
    assert len(PALLAS.to_uncompressed_bytes(PALLAS.generator)) == 32 + 33
    assert len(BLS12_381_G1.serialize_compressed(BLS12_381_G1.generator)) == 48


def test_sw_compressed_roundtrip_and_errors(rng):
    from crypto_primitives_tpu.errors import SerializationError
    from crypto_primitives_tpu.utils import canonical as c

    for curve in (PALLAS, BLS12_381_G1):
        pts = [curve.rand_point(rng) for _ in range(4)] + [None]
        for pt in pts:
            data = c.write_sw_compressed(curve, pt)
            r = c.Reader(data)
            assert c.read_sw_compressed(curve, r) == pt
            r.finish()
            data = c.write_sw_uncompressed(curve, pt)
            r = c.Reader(data)
            assert c.read_sw_uncompressed(curve, r) == pt
            r.finish()
    # error paths: both flags set, x off-curve, bad infinity
    good = bytearray(c.write_sw_compressed(PALLAS, PALLAS.generator))
    bad = bytearray(good)
    bad[-1] |= 0xC0
    with pytest.raises(SerializationError):
        c.read_sw_compressed(PALLAS, c.Reader(bytes(bad)))
    bad = bytearray(33)
    bad[0] = 200  # x=200 has no square-root rhs on Pallas? probe until found
    x = 4
    p = PALLAS.base.p
    while PALLAS.sqrt_host((x * x % p * x + PALLAS.b) % p) is not None:
        x += 1
    bad = bytearray(int(x).to_bytes(33, "little"))
    with pytest.raises(SerializationError):
        c.read_sw_compressed(PALLAS, c.Reader(bytes(bad)))
    bad = bytearray(int(5).to_bytes(33, "little"))
    bad[-1] |= 0x40  # infinity flag with x != 0
    with pytest.raises(SerializationError):
        c.read_sw_compressed(PALLAS, c.Reader(bytes(bad)))


def test_sw_pinned_wire_vectors():
    """Layout anchors (self-pinned regression vectors; the byte rules —
    LE bigint, flags in the top two bits of the last byte, infinity =
    zero bytes + 1<<6 — mirror ark-serialize 0.4 flags.rs/SWFlags)."""
    g = PALLAS.generator  # (-1, 2): y = 2 is "positive" (2 <= p - 2)
    comp = PALLAS.serialize_compressed(g)
    assert comp[:32] == (PALLAS.base.p - 1).to_bytes(32, "little")
    assert comp[32] == 0x00  # no flags: y positive
    neg = PALLAS.neg_host(g)  # y = p - 2 is "negative"
    comp_n = PALLAS.serialize_compressed(neg)
    assert comp_n[:32] == comp[:32] and comp_n[32] == 0x80
    inf = PALLAS.serialize_compressed(None)
    assert inf == bytes(32) + bytes([0x40])
    unc = PALLAS.to_uncompressed_bytes(g)
    assert unc[:32] == (PALLAS.base.p - 1).to_bytes(32, "little")
    assert unc[32:64] == (2).to_bytes(32, "little") and unc[64] == 0x00


def test_schnorr_codecs_on_sw_curve(rng):
    from crypto_primitives_tpu.models.signature.schnorr import Schnorr
    from crypto_primitives_tpu.utils import canonical as c

    sch = Schnorr(PALLAS)
    params = sch.setup(rng)
    pk, sk = sch.keygen(params, rng)
    sig = sch.sign(params, sk, b"msg", rng)
    p2 = c.deserialize_schnorr_params(
        PALLAS, c.serialize_schnorr_params(PALLAS, params)
    )
    assert p2.generator == params.generator and p2.salt == params.salt
    assert c.deserialize_public_key(PALLAS, c.serialize_public_key(PALLAS, pk)) == pk
    s2 = c.deserialize_schnorr_signature(
        PALLAS, c.serialize_schnorr_signature(PALLAS, sig)
    )
    assert (s2.prover_response, s2.verifier_challenge) == (
        sig.prover_response,
        sig.verifier_challenge,
    )
    assert sch.verify(p2, pk, b"msg", s2)
