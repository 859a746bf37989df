"""RNS-Montgomery curve path (ops/rns_xla.py + ops/curve_rns.py) parity.

Oracle = the host python-int tier (ops/curve.py host ops), the same oracle
the limb device tier is tested against; plus direct cross-checks against
the limb device path so the two device tiers agree bit-for-bit after
conversion.  Reference semantics: ark-ec TE projective arithmetic feeding
crh/pedersen (reference src/crh/pedersen/mod.rs:113-124).
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.ops import curve as cv
from crypto_primitives_tpu.ops import curve_rns as cr
from crypto_primitives_tpu.ops import rns, rns_xla
from crypto_primitives_tpu.ops.curves_known import ED_ON_BLS12_377, JUBJUB


pytestmark = pytest.mark.slow  # device-oracle fuzz tier (run_tests.sh)


@pytest.fixture(scope="module")
def rng():
    return random.Random(20260818)


def test_field_ops_random(rng):
    p = JUBJUB.base.p
    f = rns_xla.RnsField(rns.build_plan(p))
    xs = [rng.randrange(p) for _ in range(8)]
    ys = [rng.randrange(p) for _ in range(8)]
    a = jnp.asarray(f.pack(np.asarray(xs, dtype=object)))
    b = jnp.asarray(f.pack(np.asarray(ys, dtype=object)))
    got_mul, bm = f.mul(a, 1, b, 1)
    got_add, _ = f.add(a, 1, b, 1)
    got_sub, _ = f.sub(a, 1, b, 1)
    assert bm == 3
    mu = f.unpack(np.asarray(got_mul))
    ad = f.unpack(np.asarray(got_add))
    su = f.unpack(np.asarray(got_sub))
    for i in range(8):
        assert int(mu[i]) == xs[i] * ys[i] % p
        assert int(ad[i]) == (xs[i] + ys[i]) % p
        assert int(su[i]) == (xs[i] - ys[i]) % p


def test_mul_chain_stays_bounded(rng):
    """Repeated squaring through the checked API keeps values exact."""
    p = JUBJUB.base.p
    f = rns_xla.RnsField(rns.build_plan(p))
    x = rng.randrange(p)
    a = jnp.asarray(f.pack(x))
    b = 1
    expect = x
    for _ in range(12):
        a, b = f.mul(a, b, a, b)
        expect = expect * expect % p
    assert int(f.unpack(np.asarray(a))) == expect


@pytest.mark.parametrize("curve", [JUBJUB, ED_ON_BLS12_377], ids=lambda c: c.name)
def test_te_add_chain_vs_host(curve, rng):
    pts = [curve.rand_point(rng) for _ in range(6)]
    dev = jnp.asarray(cr.pack_points_rns(curve, pts))
    acc_dev = cr.identity_rns(curve)
    acc_host = curve.zero_host()
    for i in range(6):
        acc_dev = cr.te_add_rns(curve, acc_dev, dev[i])
        acc_host = curve.add_host(acc_host, pts[i])
        assert cr.unpack_points_rns(curve, np.asarray(acc_dev)) == acc_host


def test_te_add_identity_and_doubling(rng):
    curve = JUBJUB
    pt = curve.rand_point(rng)
    d = jnp.asarray(cr.pack_points_rns(curve, pt))
    ident = cr.identity_rns(curve)
    assert cr.unpack_points_rns(curve, np.asarray(cr.te_add_rns(curve, d, ident))) == pt
    dbl = cr.te_add_rns(curve, d, d)
    assert cr.unpack_points_rns(curve, np.asarray(dbl)) == curve.double_host(pt)
    # identity + identity
    z = cr.te_add_rns(curve, ident, ident)
    assert cr.unpack_points_rns(curve, np.asarray(z)) == curve.zero_host()


def test_conditional_sum_vs_limb_path(rng):
    curve = JUBJUB
    n, B = 37, 4
    pts = [curve.rand_point(rng) for _ in range(n)]
    bits_np = np.asarray(
        [[rng.randrange(2) for _ in range(n)] for _ in range(B)], np.uint8
    )
    bits = jnp.asarray(bits_np)
    table_rns = jnp.asarray(cr.pack_points_rns(curve, pts))
    got = cr.te_conditional_sum_rns(curve, table_rns, bits, chunk=16)
    got_aff = cr.unpack_points_rns(curve, np.asarray(got))
    # limb device path
    table_limb = jnp.asarray(curve.pack_points(pts))
    limb = cv.te_conditional_sum(curve, table_limb, bits, 16)
    limb_aff = curve.unpack_points(np.asarray(limb))
    # host oracle
    for i in range(B):
        acc = curve.zero_host()
        for j in range(n):
            if bits_np[i, j]:
                acc = curve.add_host(acc, pts[j])
        assert got_aff[i] == acc
        assert limb_aff[i] == acc


@pytest.mark.parametrize("w", [2, 3, 4])
def test_grouped_conditional_sum_vs_plain(w, rng):
    """Windowed subset-sum lookup == per-bit conditional sum == host, for
    n not divisible by w (padding path) and small chunks."""
    curve = JUBJUB
    n, B = 29, 3
    pts = [curve.rand_point(rng) for _ in range(n)]
    bits_np = np.asarray(
        [[rng.randrange(2) for _ in range(n)] for _ in range(B)], np.uint8
    )
    bits = jnp.asarray(bits_np)
    combos = jnp.asarray(cr.pack_table_grouped(curve, pts, w))
    assert combos.shape[:2] == (-(-n // w), 1 << w)
    got = cr.te_conditional_sum_grouped_rns(curve, combos, bits, w, chunk=4)
    got_aff = cr.unpack_points_rns(curve, np.asarray(got))
    for i in range(B):
        acc = curve.zero_host()
        for j in range(n):
            if bits_np[i, j]:
                acc = curve.add_host(acc, pts[j])
        assert got_aff[i] == acc


def test_scalar_mul_bits_vs_host(rng):
    curve = JUBJUB
    pt = curve.rand_point(rng)
    k = rng.randrange(curve.scalar.p)
    nbits = curve.scalar.p.bit_length()
    bits = jnp.asarray([(k >> i) & 1 for i in range(nbits)], jnp.uint8)
    dev = jnp.asarray(cr.pack_points_rns(curve, pt))
    got = cr.te_scalar_mul_bits_rns(curve, dev, bits)
    assert cr.unpack_points_rns(curve, np.asarray(got)) == curve.scalar_mul_host(pt, k)


@pytest.mark.parametrize("w", [2, 4])
def test_scalar_mul_windowed_vs_host(w, rng):
    curve = JUBJUB
    pts = [curve.rand_point(rng) for _ in range(2)]
    ks = [rng.randrange(curve.scalar.p), 1]
    nbits = curve.scalar.p.bit_length()
    bits = jnp.asarray(
        [[(k >> i) & 1 for i in range(nbits)] for k in ks], jnp.uint8
    )
    dev = jnp.asarray(cr.pack_points_rns(curve, pts))
    got = cr.te_scalar_mul_bits_windowed_rns(curve, dev, bits, w)
    aff = cr.unpack_points_rns(curve, np.asarray(got))
    for i in range(2):
        assert aff[i] == curve.scalar_mul_host(pts[i], ks[i])


def test_fixed_base_mul_vs_host(rng):
    curve = JUBJUB
    pt = curve.rand_point(rng)
    ks = [rng.randrange(curve.scalar.p) for _ in range(3)] + [0, 1]
    nbits = curve.scalar.p.bit_length()
    bits = jnp.asarray(
        [[(k >> i) & 1 for i in range(nbits)] for k in ks], jnp.uint8
    )
    got = cr.te_fixed_base_mul_rns(curve, pt, bits)
    aff = cr.unpack_points_rns(curve, np.asarray(got))
    for i, k in enumerate(ks):
        assert aff[i] == curve.scalar_mul_host(pt, k), k


def test_to_limb_points_device_conversion(rng):
    """RNS -> Montgomery-limb conversion on device matches the limb tier
    bit-for-bit (canonical limbs of identical field values)."""
    curve = JUBJUB
    pts = [curve.rand_point(rng) for _ in range(5)]
    dev = jnp.asarray(cr.pack_points_rns(curve, pts))
    # run through one add so Z != 1 and values carry the 3p lazy bound
    shifted = cr.te_add_rns(curve, dev, jnp.roll(dev, 1, axis=0))
    limbs = np.asarray(cr.to_limb_points(curve, shifted))
    # canonical: every limb row must unpack to the same ints as the RNS rows
    want = cr.curve_field(curve).unpack(np.asarray(shifted))
    got = curve.base.unpack(limbs.reshape(-1, limbs.shape[-1])).reshape(5, 4)
    for i in range(5):
        for j in range(4):
            assert int(got[i, j]) == int(want[i, j])
    # and the affine interpretation matches the host chain
    aff = curve.unpack_points(limbs)
    for i in range(5):
        assert aff[i] == curve.add_host(pts[i], pts[(i - 1) % 5])


def test_supports_rns():
    from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1

    assert cr.supports_rns(JUBJUB)
    assert cr.supports_rns(ED_ON_BLS12_377)
    assert not cr.supports_rns(BLS12_381_G1)


@pytest.mark.parametrize("w", [2, 3, 4])
def test_grouped_msm_kernel_interpret(w, rng):
    """The fused Pallas grouped-MSM kernel (interpret mode) == host oracle
    == the XLA grouped path, incl. padding and multi-block batches."""
    from crypto_primitives_tpu.ops import msm_rns_pallas as mk

    curve = JUBJUB
    n, B = 22, 10  # n % w != 0 for w in {3, 4}; B > block_b exercises grid
    pts = [curve.rand_point(rng) for _ in range(n)]
    bits_np = np.asarray(
        [[rng.randrange(2) for _ in range(n)] for _ in range(B)], np.uint8
    )
    combos = jnp.asarray(mk.pack_combos_kernel(curve, pts, w))
    got = mk.grouped_msm_pallas(
        curve, combos, jnp.asarray(bits_np), w, block_b=8, interpret=True
    )
    aff = cr.unpack_points_rns(curve, np.asarray(got))
    combos_xla = jnp.asarray(cr.pack_table_grouped(curve, pts, w))
    xla = cr.te_conditional_sum_grouped_rns(curve, combos_xla, jnp.asarray(bits_np), w)
    xla_aff = cr.unpack_points_rns(curve, np.asarray(xla))
    for i in range(B):
        acc = curve.zero_host()
        for j in range(n):
            if bits_np[i, j]:
                acc = curve.add_host(acc, pts[j])
        assert aff[i] == acc
        assert xla_aff[i] == acc


def test_grouped_msm_kernel_edges(rng):
    """All-zero bits -> identity; all-one bits -> full sum; single add."""
    from crypto_primitives_tpu.ops import msm_rns_pallas as mk

    curve = JUBJUB
    n, w = 8, 4
    pts = [curve.rand_point(rng) for _ in range(n)]
    combos = jnp.asarray(mk.pack_combos_kernel(curve, pts, w))
    bits = np.zeros((3, n), np.uint8)
    bits[1, :] = 1
    bits[2, 5] = 1
    got = mk.grouped_msm_pallas(
        curve, combos, jnp.asarray(bits), w, block_b=8, interpret=True
    )
    aff = cr.unpack_points_rns(curve, np.asarray(got))
    assert aff[0] == curve.zero_host()
    full = curve.zero_host()
    for p in pts:
        full = curve.add_host(full, p)
    assert aff[1] == full
    assert aff[2] == pts[5]


def test_bowe_hopwood_kernel_table_interpret(rng):
    """BH signed-digit grouped tables through the Pallas kernel (interpret)
    == the host BH evaluation (reference mod.rs:114-186 semantics)."""
    from crypto_primitives_tpu.models.crh.bowe_hopwood import (
        CHUNK_SIZE,
        BoweHopwoodCRH,
    )
    from crypto_primitives_tpu.models.crh.pedersen import (
        Window,
        bytes_to_bits_batch,
    )
    from crypto_primitives_tpu.ops import msm_rns_pallas as mk
    from crypto_primitives_tpu.ops import field as ff

    curve = JUBJUB
    bh = BoweHopwoodCRH(curve, Window(8, 4))
    params = bh.setup(rng)
    msgs = [bytes(rng.randrange(256) for _ in range(4)) for _ in range(3)]
    nchunks = 8 * 4
    n_real = -(-(4 * 8) // CHUNK_SIZE)
    bits = jnp.asarray(
        bytes_to_bits_batch(
            np.asarray([list(m) for m in msgs], np.uint8), nchunks * CHUNK_SIZE
        )
    )
    table = jnp.asarray(params.packed_signed_grouped_kernel(n_real))
    acc = mk.grouped_msm_pallas(
        curve, table, bits, CHUNK_SIZE, block_b=8, interpret=True
    )
    aff = cr.unpack_points_rns(curve, np.asarray(acc))
    for i, m in enumerate(msgs):
        assert aff[i][0] == bh.evaluate(params, m)


def test_schnorr_sign_batch(rng):
    """sign_batch signatures verify under both host verify and
    verify_batch; deterministic-rng equivalence is not required (the
    reference's sign is randomized), only validity."""
    from crypto_primitives_tpu.models.signature.schnorr import Schnorr

    sch = Schnorr(JUBJUB)
    params = sch.setup(rng)
    B = 3
    msgs = [bytes(rng.randrange(256) for _ in range(20)) for _ in range(B)]
    keys = [sch.keygen(params, rng) for _ in range(B)]
    keys = sch.keygen_batch(params, rng, B)
    for pk, sk in keys:
        assert pk == JUBJUB.scalar_mul_host(params.generator, sk)
    sigs = sch.sign_batch(params, [sk for _, sk in keys], msgs, rng)
    for i in range(B):
        assert sch.verify(params, keys[i][0], msgs[i], sigs[i])
    assert sch.verify_batch(params, [pk for pk, _ in keys], msgs, sigs) == [True] * B
    assert not sch.verify(params, keys[0][0], msgs[1], sigs[0])


@pytest.mark.parametrize("n_par", [2, 4])
def test_grouped_msm_kernel_n_par(n_par, rng):
    """Group-parallel partial accumulators (identity-group padding +
    te_add_rns tree merge) == host oracle == the n_par=1 kernel."""
    from crypto_primitives_tpu.ops import msm_rns_pallas as mk

    curve = JUBJUB
    n, w, B = 21, 3, 6  # G=7 groups: not divisible by n_par (padding)
    pts = [curve.rand_point(rng) for _ in range(n)]
    bits_np = np.asarray(
        [[rng.randrange(2) for _ in range(n)] for _ in range(B)], np.uint8
    )
    combos = jnp.asarray(mk.pack_combos_kernel(curve, pts, w))
    got = mk.grouped_msm_pallas(
        curve, combos, jnp.asarray(bits_np), w, block_b=8, interpret=True,
        n_par=n_par,
    )
    aff = cr.unpack_points_rns(curve, np.asarray(got))
    for i in range(B):
        acc = curve.zero_host()
        for j in range(n):
            if bits_np[i, j]:
                acc = curve.add_host(acc, pts[j])
        assert aff[i] == acc, i
