"""Short-Weierstrass layer: complete RCB addition vs the affine host
oracle (incl. identity/doubling/inverse edge cases that the completeness
claim covers), fixed-base conditional sums, and ark-serialize SWFlags
round-trips (PointAtInfinity = 1<<6, YIsNegative = 1<<7)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.ops import curve_sw as sw
from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1 as G1


@pytest.fixture()
def rng():
    return random.Random(20260817)


def test_generator_and_subgroup(rng):
    g = G1.generator
    assert G1.is_on_curve(g)
    assert G1.scalar_mul_host(g, G1.scalar.p) is None  # r*G = infinity


def test_device_add_matches_host(rng):
    pts1 = [G1.rand_point(rng) for _ in range(6)]
    pts2 = [G1.rand_point(rng) for _ in range(6)]
    d1 = jnp.asarray(G1.pack_points(pts1))
    d2 = jnp.asarray(G1.pack_points(pts2))
    out = G1.unpack_points(np.asarray(sw.sw_add(G1, d1, d2)))
    for a, b, got in zip(pts1, pts2, out):
        assert got == G1.add_host(a, b)


def test_device_add_complete_edge_cases(rng):
    """Identity, doubling, and P + (-P) all flow through the single
    branch-free code path (RCB completeness)."""
    p = G1.rand_point(rng)
    cases1 = [None, p, p, G1.neg_host(p)]
    cases2 = [p, None, p, p]
    d1 = jnp.asarray(G1.pack_points(cases1))
    d2 = jnp.asarray(G1.pack_points(cases2))
    out = G1.unpack_points(np.asarray(sw.sw_add(G1, d1, d2)))
    assert out[0] == p  # 0 + P
    assert out[1] == p  # P + 0
    assert out[2] == G1.double_host(p)  # P + P
    assert out[3] is None  # -P + P


@pytest.mark.slow
def test_device_scalar_mul_matches_host(rng):
    g = G1.rand_point(rng)
    k = rng.randrange(G1.scalar.p)
    nb = G1.scalar.nbits
    bits = jnp.asarray([[(k >> i) & 1 for i in range(nb)]], dtype=jnp.uint8)
    base = jnp.asarray(G1.pack_points([g]))
    out = G1.unpack_points(np.asarray(sw.sw_scalar_mul_bits(G1, base, bits)))
    assert out[0] == G1.scalar_mul_host(g, k)


@pytest.mark.slow
def test_conditional_sum_matches_host(rng):
    n, B = 10, 3
    table_pts = [G1.rand_point(rng) for _ in range(n)]
    table = jnp.asarray(G1.pack_points(table_pts))
    bits_np = np.asarray(
        [[rng.randrange(2) for _ in range(n)] for _ in range(B)], dtype=np.uint8
    )
    out = G1.unpack_points(
        np.asarray(sw.sw_conditional_sum(G1, table, jnp.asarray(bits_np), chunk=4))
    )
    for b in range(B):
        acc = None
        for j in range(n):
            if bits_np[b, j]:
                acc = G1.add_host(acc, table_pts[j])
        assert out[b] == acc


def test_to_affine_and_eq(rng):
    p1 = G1.rand_point(rng)
    d = jnp.asarray(G1.pack_points([p1, None, p1]))
    aff = np.asarray(sw.sw_to_affine(G1, d))
    vals = G1.base.unpack(aff)
    assert (int(vals[0][0]), int(vals[0][1])) == p1
    eq = np.asarray(sw.sw_eq(G1, d, jnp.asarray(G1.pack_points([p1, None, None]))))
    assert eq.tolist() == [True, True, False]


def test_swflags_serialization_roundtrip(rng):
    p1 = G1.rand_point(rng)
    for pt in (p1, G1.neg_host(p1), None):
        data = G1.serialize_compressed(pt)
        assert len(data) == G1.base.bigint_bytes
        assert G1.deserialize_compressed(data) == pt
    # infinity carries the 1<<6 flag on an all-zero x
    inf = G1.serialize_compressed(None)
    assert inf[-1] == 0x40 and all(b == 0 for b in inf[:-1])
    # y-sign flag: exactly one of (y, -y) has bit 7 set
    a = G1.serialize_compressed(p1)[-1] & 0x80
    b = G1.serialize_compressed(G1.neg_host(p1))[-1] & 0x80
    assert {a, b} == {0, 0x80}


def test_uncompressed_bytes_layout(rng):
    pt = G1.rand_point(rng)
    data = G1.to_uncompressed_bytes(pt)
    nb = G1.base.bigint_bytes
    assert len(data) == 2 * nb
    assert int.from_bytes(data[:nb], "little") == pt[0]
    y_bytes = bytearray(data[nb:])
    y_bytes[-1] &= 0x3F
    assert int.from_bytes(bytes(y_bytes), "little") == pt[1]


@pytest.mark.slow
def test_pedersen_crh_over_sw(rng):
    """Pedersen CRH generic over the curve family: same scheme code
    (models/crh/pedersen.py) on BLS12-381 G1, host vs device batch
    (reference is generic over any CurveGroup, src/crh/pedersen/mod.rs:19)."""
    from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window

    crh = PedersenCRH(G1, Window(window_size=4, num_windows=8))  # 32-bit input
    params = crh.setup(rng)
    msgs = [bytes(rng.randrange(256) for _ in range(4)) for _ in range(3)]
    host = [crh.evaluate(params, m) for m in msgs]
    dev = crh.evaluate_batch(
        params, jnp.asarray(np.frombuffer(b"".join(msgs), np.uint8).reshape(3, 4))
    )
    vals = G1.base.unpack(np.asarray(dev))
    for i, h in enumerate(host):
        assert (int(vals[i][0]), int(vals[i][1])) == h
