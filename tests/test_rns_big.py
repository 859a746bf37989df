"""The big (>=300-bit) RNS-Montgomery plan geometry and BLS12-381 G1 on it.

VERDICT r3 task 1 + r4 task 1: `rns.build_plan` grows the residue bases
past the legacy 2x24 geometry for moduli the 24-prime product cannot
cover with the 16p margin (the 381-bit BLS12-381 G1 base field lands on
k=40, ls=22, mid_red=True; k stays 8-aligned for Mosaic tile layout), so
the most famous SW curve in the ecosystem rides the RNS fast tier instead
of silently dropping to the ~4x-slower limb tier — and since round 5 the
fused Pallas Poseidon/MSM kernels are parameterized by the plan geometry,
so >256-bit fields get the fused VMEM path too (tests below).
Matches the reference's any-field generality
(/root/reference/crypto-primitives/src/sponge/absorb.rs:263-282).
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.ops import rns, rns_xla
from crypto_primitives_tpu.ops import curve_sw as csw
from crypto_primitives_tpu.ops import curve_sw_rns as sw
from crypto_primitives_tpu.ops.curve_rns_any import rns_mod
from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1 as G1
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR

P = G1.base.p


def test_geometry_selection():
    plan = rns.build_plan(P)
    assert plan.k > rns.K and plan.mid_red and plan.ls == 22
    assert plan.M1 > 64 * P and plan.M2 > 16 * P
    # the legacy pinned plan is untouched (the headline kernel geometry)
    plan0 = rns.build_plan(FR.p)
    assert plan0.k == rns.K and not plan0.mid_red and plan0.ls == 20
    assert plan0.sqrt_sigma is not None


def test_big_plan_mont_mul_np_fuzz(rng):
    """The f32 numpy kernel emulation is exact vs python ints, including
    elevated input bounds (the curve tier's lazy value ledger)."""
    plan = rns.build_plan(P)
    F = np.float32
    for i in range(150):
        a, b = rng.randrange(P), rng.randrange(P)
        am = a * plan.M1 % P + (i % 6) * P
        bm = b * plan.M1 % P + (i % 9) * P
        if am * bm >= P * plan.M1:
            continue
        ar, a2 = rns.to_rns(plan, am)
        br, b2 = rns.to_rns(plan, bm)
        w1 = rns.red(F(ar) * F(br), plan.inv_m1, F(plan.m1))
        w2 = rns.red(F(a2) * F(b2), plan.inv_m2, F(plan.m2))
        r1, _ = rns.mont_reduce_np(plan, (w1, w2))
        got = int(rns.from_rns(plan, r1))
        assert got < 4 * P  # the mont_reduce output bound
        assert got % P == am * bm * pow(plan.M1, -1, P) % P


def test_big_plan_field_device(rng):
    plan = rns.build_plan(P)
    f = rns_xla.RnsField(plan)
    xs = np.array([rng.randrange(P) for _ in range(32)], dtype=object)
    ys = np.array([rng.randrange(P) for _ in range(32)], dtype=object)
    ax, by = jnp.asarray(f.pack(xs)), jnp.asarray(f.pack(ys))
    r, _ = f.mul(ax, 1, by, 1)
    assert all(
        int(g) == int(x) * int(y) % P
        for g, x, y in zip(f.unpack(np.asarray(r)), xs, ys)
    )
    d, _ = f.sub(ax, 1, by, 1)
    assert all(
        int(g) == (int(x) - int(y)) % P
        for g, x, y in zip(f.unpack(np.asarray(d)), xs, ys)
    )
    iv, _ = f.inv(ax, 1)
    assert all(
        int(g) * int(x) % P == 1 for g, x in zip(f.unpack(np.asarray(iv)), xs)
    )


def test_big_plan_bound_assert_at_trace_time(rng):
    """The Montgomery-domain overflow guard fires at trace time."""
    plan = rns.build_plan(P)
    f = rns_xla.RnsField(plan)
    a = jnp.asarray(f.pack(np.array([1], dtype=object)))
    big = f.max_prod  # bound product just past M1//p
    with pytest.raises(AssertionError, match="RNS mul domain overflow"):
        f.mul(a, big, a, 2)


def test_big_plan_limb_conversions(rng):
    """from_mont_limbs (nibble digits at L=24) and to_mont_limbs (6-bit
    scalar split at k+1 > 31) round-trip against FieldSpec.pack."""
    plan = rns.build_plan(P)
    f = rns_xla.RnsField(plan)
    spec = G1.base
    assert rns_xla._limb_digit_shift(plan, spec) == 4
    assert rns_xla._limb_digit_shift(rns.build_plan(FR.p), FR) == 8
    xs = np.array([rng.randrange(P) for _ in range(32)] + [0, 1, P - 1],
                  dtype=object)
    limbs = jnp.asarray(spec.pack(xs))
    rr = rns_xla.from_mont_limbs(plan, spec, limbs)
    assert all(int(g) == int(x) for g, x in zip(f.unpack(np.asarray(rr)), xs))
    back = rns_xla.to_mont_limbs(plan, spec, rr, 3)
    assert all(int(g) == int(x) for g, x in zip(spec.unpack(np.asarray(back)), xs))


def test_g1_rides_rns_tier():
    assert rns_mod(G1) is sw


def _fq_poseidon_config():
    from crypto_primitives_tpu.models.sponge.poseidon import (
        PoseidonConfig,
        find_poseidon_ark_and_mds,
    )
    from crypto_primitives_tpu.ops.fields_known import BLS12_381_FQ as FQ

    ark, mds = find_poseidon_ark_and_mds(FQ, 2, 8, 60, 0)
    return PoseidonConfig(
        field=FQ, full_rounds=8, partial_rounds=60, alpha=5,
        ark=ark, mds=mds, rate=2, capacity=1,
    )


@pytest.mark.slow
def test_big_plan_pallas_kernel_parity(rng):
    """Round-4 verdict task 1: the fused Poseidon kernel parameterized by
    the plan geometry (k=40, mid-red extensions) is bit-equal to the XLA
    limb permutation over the 381-bit base field."""
    from crypto_primitives_tpu.models.sponge.poseidon import permute as xla_permute
    from crypto_primitives_tpu.ops.fields_known import BLS12_381_FQ as FQ
    from crypto_primitives_tpu.ops.poseidon_rns_pallas import permute_rns

    cfg = _fq_poseidon_config()
    plan = rns.build_plan(P)
    B = 8
    vals = [[rng.randrange(P) for _ in range(cfg.t)] for _ in range(B)]
    mont = np.asarray(
        [[v * plan.M1 % P for v in row] for row in vals], dtype=object
    )
    r1, r2 = rns.to_rns(plan, mont.reshape(-1))
    states = jnp.asarray(
        np.concatenate([r1, r2], -1).reshape(B, cfg.t, 2 * plan.k)
    )
    import jax

    out = permute_rns(
        plan, cfg, states, block_b=8,
        interpret=jax.default_backend() != "tpu",
    )
    got = rns.from_rns(plan, np.asarray(out)[..., : plan.k])
    invM1 = pow(plan.M1, -1, P)
    got_vals = [[int(v) * invM1 % P for v in row] for row in got]
    st = jnp.asarray(FQ.pack(np.asarray(vals, dtype=object)))
    exp = FQ.unpack(np.asarray(xla_permute(FQ, cfg.packed(), st)))
    assert got_vals == [[int(v) for v in row] for row in exp]


@pytest.mark.slow
def test_big_field_poseidon_device_tree(rng):
    """The device-resident Poseidon tree over the 381-bit field (the
    generalized kernel end-to-end through a composite structure): root
    bit-equal to the host compress recompute."""
    from crypto_primitives_tpu.models.merkle_tree.device import (
        poseidon_rns_device_tree,
    )
    from crypto_primitives_tpu.models.sponge.poseidon import PoseidonSponge
    from crypto_primitives_tpu.ops.fields_known import BLS12_381_FQ as FQ

    cfg = _fq_poseidon_config()
    leaves = [rng.randrange(P) for _ in range(8)]
    tree = poseidon_rns_device_tree(FQ, cfg, leaves)

    def compress(l, r):
        s = PoseidonSponge(cfg)
        s.state = [0, l % P, r % P]
        s.permute()
        return s.state[1]

    def leaf_hash(x):
        s = PoseidonSponge(cfg)
        s.state = [0, x % P, 0]
        s.permute()
        return s.state[1]

    lvl = [leaf_hash(v) for v in leaves]
    while len(lvl) > 1:
        lvl = [compress(lvl[i], lvl[i + 1]) for i in range(0, len(lvl), 2)]
    assert tree.root() == lvl[0]


@pytest.mark.slow
def test_big_field_sponge_rides_rns_tier(rng):
    """A PoseidonSpongeBatch over the 381-bit field selects the RNS rep
    (no more fall-through to the limb kernel) and its squeezes are
    bit-equal to the host oracle."""
    from crypto_primitives_tpu.models.sponge.poseidon import (
        PoseidonSponge,
        PoseidonSpongeBatch,
        _rns_supported,
    )
    from crypto_primitives_tpu.ops.fields_known import BLS12_381_FQ as FQ

    assert _rns_supported(FQ)
    cfg = _fq_poseidon_config()
    B = 4
    vals = [rng.randrange(P) for _ in range(B)]
    sb = PoseidonSpongeBatch(cfg, batch_shape=(B,), rep="rns")
    elems = jnp.asarray(FQ.pack(np.asarray(vals, dtype=object)[:, None]))
    sb.absorb(elems)
    got = FQ.unpack(np.asarray(sb.squeeze_native_field_elements(2)))
    for b in range(B):
        s = PoseidonSponge(cfg)
        s.absorb_elements([vals[b]])
        want = s.squeeze_native_field_elements(2)
        assert [int(v) for v in got[b]] == want, b


def test_g1_add_oracle(rng):
    pts = [G1.rand_point(rng) for _ in range(6)]
    qts = [G1.rand_point(rng) for _ in range(6)]
    Pd = jnp.asarray(sw.pack_points_rns(G1, pts))
    Qd = jnp.asarray(sw.pack_points_rns(G1, qts))
    got = sw.unpack_affine_rns(G1, sw.sw_add_rns(G1, Pd, Qd))
    assert list(got) == [G1.add_host(a, b) for a, b in zip(pts, qts)]
    # complete-law corners: double, identity, inverse
    assert list(sw.unpack_affine_rns(G1, sw.sw_add_rns(G1, Pd, Pd))) == [
        G1.double_host(a) for a in pts
    ]
    I = sw.identity_rns(G1, (6,))
    assert list(sw.unpack_affine_rns(G1, sw.sw_add_rns(G1, Pd, I))) == pts
    negP = sw.sw_neg_rns(G1, Pd)
    assert list(sw.unpack_affine_rns(G1, sw.sw_add_rns(G1, Pd, negP))) == [None] * 6


def test_g1_scalar_muls_bit_exact_vs_limb(rng):
    pts = [G1.rand_point(rng) for _ in range(4)]
    ks = [rng.randrange(G1.scalar.p) for _ in range(4)]
    nbits = G1.scalar.nbits
    bits = np.zeros((4, nbits), np.uint8)
    for i, k in enumerate(ks):
        for j in range(k.bit_length()):
            bits[i, j] = (k >> j) & 1
    Pd = jnp.asarray(sw.pack_points_rns(G1, pts))
    out = sw.sw_scalar_mul_bits_windowed_rns(G1, Pd, jnp.asarray(bits))
    want = [G1.scalar_mul_host(pt, k) for pt, k in zip(pts, ks)]
    assert list(sw.unpack_affine_rns(G1, out)) == want
    # RNS -> limb interop lands on the limb tier's representation bit-exactly
    lp = sw.to_limb_points(G1, out)
    aff = csw.sw_to_affine(G1, lp)
    vals = G1.base.unpack(np.asarray(aff))
    for i in range(4):
        assert (int(vals[i][0]), int(vals[i][1])) == want[i]
    # fixed-base path
    fb = sw.sw_fixed_base_mul_rns(G1, pts[0], jnp.asarray(bits))
    assert list(sw.unpack_affine_rns(G1, fb)) == [
        G1.scalar_mul_host(pts[0], k) for k in ks
    ]


@pytest.mark.slow
def test_g1_primitives_end_to_end(rng):
    """Schnorr + ElGamal + Pedersen over BLS12-381 G1 through the normal
    curve-generic dispatch (the verdict's done-gate: batch APIs on the
    fast tier, bit-exact vs host)."""
    from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window
    from crypto_primitives_tpu.models.encryption.elgamal import ElGamal
    from crypto_primitives_tpu.models.signature.schnorr import Schnorr

    B = 4
    sch = Schnorr(G1)
    sp = sch.setup(rng)
    pairs = sch.keygen_batch(sp, rng, B)
    pks, sks = zip(*pairs)
    for pk, sk in pairs:
        assert pk == G1.scalar_mul_host(sp.generator, sk)
    msgs = [bytes([i]) * 32 for i in range(B)]
    sigs = sch.sign_batch(sp, list(sks), msgs, rng)
    assert all(sch.verify_batch(sp, list(pks), msgs, sigs))
    assert not any(
        sch.verify_batch(sp, list(pks), [m + b"!" for m in msgs], sigs)
    )

    eg = ElGamal(G1)
    ep = eg.setup(rng)
    epk, esk = eg.keygen(ep, rng)
    m_pts = [G1.rand_point(rng) for _ in range(B)]
    rs = [rng.randrange(G1.scalar.p) for _ in range(B)]
    assert list(eg.decrypt_batch(ep, esk, eg.encrypt_batch(ep, epk, m_pts, rs))) == m_pts

    crh = PedersenCRH(G1, Window(4, 16))
    cp = crh.setup(rng)
    data = bytes(range(8))
    out = np.asarray(
        crh.evaluate_batch(cp, jnp.asarray(np.frombuffer(data, np.uint8)[None]))
    )
    x, y = int(G1.base.unpack(out[0][0])), int(G1.base.unpack(out[0][1]))
    assert (x, y) == crh.evaluate(cp, data)
