"""Field-arithmetic kernels vs the python-int oracle.

Mirrors the reference's reliance on `ark-ff`'s correctness plus its
cross-model test pattern (SURVEY.md §4.3): every device op is checked
against exact big-int arithmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.ops import field as ff
from crypto_primitives_tpu.ops.fields_known import ALL_FIELDS, BLS12_381_FR


def rand_elems(rng, spec, n):
    return [rng.randrange(spec.p) for _ in range(n)]


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_pack_roundtrip(rng, spec):
    xs = rand_elems(rng, spec, 7) + [0, 1, spec.p - 1]
    packed = spec.pack(xs)
    back = spec.unpack(packed)
    assert list(back) == [x % spec.p for x in xs]
    # standard-form packing too
    packed_std = spec.pack(xs, mont=False)
    back_std = spec.unpack(packed_std, mont=False)
    assert list(back_std) == [x % spec.p for x in xs]


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_add_sub_neg(rng, spec):
    n = 33
    xs = rand_elems(rng, spec, n) + [0, 0, spec.p - 1, spec.p - 1]
    ys = rand_elems(rng, spec, n) + [0, spec.p - 1, spec.p - 1, 1]
    a, b = jnp.asarray(spec.pack(xs)), jnp.asarray(spec.pack(ys))
    s = spec.unpack(np.asarray(ff.add(spec, a, b)))
    d = spec.unpack(np.asarray(ff.sub(spec, a, b)))
    ng = spec.unpack(np.asarray(ff.neg(spec, a)))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert s[i] == (x + y) % spec.p
        assert d[i] == (x - y) % spec.p
        assert ng[i] == (-x) % spec.p


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_mont_mul(rng, spec):
    n = 33
    xs = rand_elems(rng, spec, n) + [0, 1, spec.p - 1]
    ys = rand_elems(rng, spec, n) + [spec.p - 1, spec.p - 1, spec.p - 1]
    a, b = jnp.asarray(spec.pack(xs)), jnp.asarray(spec.pack(ys))
    m = spec.unpack(np.asarray(ff.mont_mul(spec, a, b)))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert m[i] == (x * y) % spec.p


def test_mont_mul_jit(rng):
    spec = BLS12_381_FR
    xs = rand_elems(rng, spec, 8)
    ys = rand_elems(rng, spec, 8)
    a, b = jnp.asarray(spec.pack(xs)), jnp.asarray(spec.pack(ys))
    f = jax.jit(lambda a, b: ff.mont_mul(spec, a, b))
    m = spec.unpack(np.asarray(f(a, b)))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert m[i] == (x * y) % spec.p


def test_mont_dot(rng):
    spec = BLS12_381_FR
    B, K = 5, 9
    xs = [[rng.randrange(spec.p) for _ in range(K)] for _ in range(B)]
    ys = [[rng.randrange(spec.p) for _ in range(K)] for _ in range(B)]
    a, b = jnp.asarray(spec.pack(xs)), jnp.asarray(spec.pack(ys))
    d = spec.unpack(np.asarray(ff.mont_dot(spec, a, b)))
    for i in range(B):
        expect = sum(x * y for x, y in zip(xs[i], ys[i])) % spec.p
        assert d[i] == expect


@pytest.mark.parametrize("e", [5, 17, 257])
def test_pow_const(rng, e):
    spec = BLS12_381_FR
    xs = rand_elems(rng, spec, 9) + [0, 1]
    a = jnp.asarray(spec.pack(xs))
    r = spec.unpack(np.asarray(ff.pow_const(spec, a, e)))
    for i, x in enumerate(xs):
        assert r[i] == pow(x, e, spec.p)


def test_inv_and_batch_inv(rng):
    spec = BLS12_381_FR
    xs = rand_elems(rng, spec, 6)
    xs = [x if x != 0 else 1 for x in xs]
    a = jnp.asarray(spec.pack(xs))
    r = spec.unpack(np.asarray(ff.inv(spec, a)))
    for i, x in enumerate(xs):
        assert r[i] == pow(x, -1, spec.p)
    rb = spec.unpack(np.asarray(ff.batch_inv(spec, a)))
    for i, x in enumerate(xs):
        assert rb[i] == pow(x, -1, spec.p)


def test_to_from_mont_device(rng):
    spec = BLS12_381_FR
    xs = rand_elems(rng, spec, 5)
    std = jnp.asarray(spec.pack(xs, mont=False))
    m = ff.to_mont_device(spec, std)
    assert list(spec.unpack(np.asarray(m))) == xs
    back = ff.from_mont_device(spec, m)
    assert list(spec.unpack(np.asarray(back), mont=False)) == xs


def test_eq_select_is_zero(rng):
    spec = BLS12_381_FR
    xs = [3, 0, 5]
    ys = [3, 0, 7]
    a, b = jnp.asarray(spec.pack(xs)), jnp.asarray(spec.pack(ys))
    assert list(np.asarray(ff.eq(spec, a, b))) == [True, True, False]
    assert list(np.asarray(ff.is_zero(spec, a))) == [False, True, False]
    sel = ff.select(jnp.asarray([True, False, True]), a, b)
    assert list(spec.unpack(np.asarray(sel))) == [3, 0, 5]


def test_vmap_and_broadcast(rng):
    spec = BLS12_381_FR
    xs = [[rng.randrange(spec.p) for _ in range(3)] for _ in range(4)]
    a = jnp.asarray(spec.pack(xs))  # (4, 3, L)
    doubled = ff.add(spec, a, a)
    v = jax.vmap(lambda row: ff.add(spec, row, row))(a)
    assert np.array_equal(np.asarray(doubled), np.asarray(v))
