"""TE curve ops vs python-int oracle (group laws, identity, batched kernels)."""

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.ops import curve as cv
from crypto_primitives_tpu.ops.curves_known import ED_ON_BLS12_377, JUBJUB


@pytest.mark.parametrize("curve", [JUBJUB, ED_ON_BLS12_377], ids=lambda c: c.name)
def test_host_group_laws(rng, curve):
    g = curve.rand_point(rng)
    h = curve.rand_point(rng)
    assert curve.is_on_curve(g) and curve.is_on_curve(h)
    # commutativity / associativity
    assert curve.add_host(g, h) == curve.add_host(h, g)
    k = curve.rand_point(rng)
    assert curve.add_host(curve.add_host(g, h), k) == curve.add_host(g, curve.add_host(h, k))
    # identity and inverse
    assert curve.add_host(g, (0, 1)) == g
    assert curve.add_host(g, curve.neg_host(g)) == (0, 1)
    # subgroup order
    assert curve.scalar_mul_host(g, curve.scalar.p) == (0, 1)


@pytest.mark.parametrize("curve", [JUBJUB, ED_ON_BLS12_377], ids=lambda c: c.name)
def test_device_add_vs_host(rng, curve):
    pts1 = [curve.rand_point(rng) for _ in range(5)]
    pts2 = [curve.rand_point(rng) for _ in range(5)]
    d1 = jnp.asarray(curve.pack_points(pts1))
    d2 = jnp.asarray(curve.pack_points(pts2))
    s = cv.te_add(curve, d1, d2)
    back = curve.unpack_points(np.asarray(s))
    for i in range(5):
        assert back[i] == curve.add_host(pts1[i], pts2[i])
    # doubling through the same unified law
    dd = curve.unpack_points(np.asarray(cv.te_double(curve, d1)))
    for i in range(5):
        assert dd[i] == curve.double_host(pts1[i])
    # identity handling (completeness)
    idp = cv.identity(curve, (5,))
    sid = curve.unpack_points(np.asarray(cv.te_add(curve, d1, idp)))
    for i in range(5):
        assert sid[i] == pts1[i]


@pytest.mark.slow
def test_device_scalar_mul_and_sum(rng):
    curve = JUBJUB
    g = curve.rand_point(rng)
    ks = [rng.randrange(curve.scalar.p) for _ in range(4)]
    bits = np.zeros((4, curve.scalar.nbits), dtype=np.uint8)
    for i, k in enumerate(ks):
        for j in range(curve.scalar.nbits):
            bits[i, j] = (k >> j) & 1
    base = jnp.asarray(curve.pack_points(g))
    res = cv.te_scalar_mul_bits(curve, jnp.broadcast_to(base, (4, 4, base.shape[-1])), jnp.asarray(bits))
    back = curve.unpack_points(np.asarray(res))
    for i, k in enumerate(ks):
        assert back[i] == curve.scalar_mul_host(g, k)
    # tree sum
    pts = [curve.rand_point(rng) for _ in range(7)]
    dev = jnp.asarray(curve.pack_points(pts))  # (7, 4, L)
    total = curve.unpack_points(np.asarray(cv.te_sum(curve, dev)))
    expect = (0, 1)
    for p in pts:
        expect = curve.add_host(expect, p)
    assert total == expect


def test_to_affine_and_eq(rng):
    curve = JUBJUB
    pts = [curve.rand_point(rng) for _ in range(3)]
    dev = jnp.asarray(curve.pack_points(pts))
    doubled = cv.te_add(curve, dev, dev)  # non-trivial Z
    aff = np.asarray(cv.te_to_affine(curve, doubled))
    for i in range(3):
        x = curve.base.unpack(aff[i][0])
        y = curve.base.unpack(aff[i][1])
        assert (int(x), int(y)) == curve.double_host(pts[i])
    assert bool(cv.te_eq(curve, doubled[0], cv.te_double(curve, dev[0])))
    assert not bool(cv.te_eq(curve, doubled[0], dev[0]))
