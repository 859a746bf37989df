"""Native C++ engine vs the python-int oracle and the JAX path — a third
independent implementation for cross-model testing (VERDICT r3 task 2:
the engine now backs the single-op host paths; CPT_NATIVE=0 forces the
python tier, keeping the oracle reachable)."""

import numpy as np
import pytest

from crypto_primitives_tpu import native
from crypto_primitives_tpu.models.sponge import PoseidonSponge, get_default_poseidon_parameters
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR

pytestmark = pytest.mark.skipif(not native.available(), reason="g++ engine unavailable")


def test_native_mont_mul(rng):
    nf = native.NativeField(FR)
    xs = [rng.randrange(FR.p) for _ in range(20)] + [0, 1, FR.p - 1]
    ys = [rng.randrange(FR.p) for _ in range(20)] + [FR.p - 1, FR.p - 1, FR.p - 1]
    got = nf.mont_mul_batch(xs, ys)
    for g, x, y in zip(got, xs, ys):
        assert g == x * y % FR.p
    inv = nf.inv_batch(xs[:5])
    for i, x in zip(inv, xs[:5]):
        assert i * x % FR.p == 1


def test_native_poseidon_permute(rng):
    cfg = get_default_poseidon_parameters(FR, 2, False)
    np_engine = native.NativePoseidon(cfg)
    states = [[rng.randrange(FR.p) for _ in range(3)] for _ in range(5)]
    got = np_engine.permute(states)
    for st, g in zip(states, got):
        oracle = PoseidonSponge(cfg)
        oracle.state = list(st)
        oracle._permute_python()  # the independent python-int model
        assert g == oracle.state


def test_native_poseidon_48byte_field_three_way(rng):
    """Round-4 verdict task 5: the compiled tier is no longer 32-byte
    only — Poseidon over the 381-bit BLS12-381 base field runs the
    6-limb template, three-way checked (C++ == python-int oracle ==
    XLA limb permute) plus the dense Merkle build vs a host recompute."""
    import jax.numpy as jnp

    from crypto_primitives_tpu.models.sponge.poseidon import (
        PoseidonConfig,
        find_poseidon_ark_and_mds,
        permute as xla_permute,
    )
    from crypto_primitives_tpu.ops.fields_known import BLS12_381_FQ as FQ

    ark, mds = find_poseidon_ark_and_mds(FQ, 2, 8, 60, 0)
    cfg = PoseidonConfig(
        field=FQ, full_rounds=8, partial_rounds=60, alpha=5,
        ark=ark, mds=mds, rate=2, capacity=1,
    )
    eng = native.poseidon_engine(cfg)
    assert eng is not None, "48-byte native tier missing"
    states = [[rng.randrange(FQ.p) for _ in range(3)] for _ in range(3)]
    got = eng.permute(states)
    # python-int oracle
    for st, g in zip(states, got):
        oracle = PoseidonSponge(cfg)
        oracle.state = list(st)
        oracle._permute_python()
        assert g == oracle.state
    # XLA limb path
    dev = jnp.asarray(FQ.pack(np.asarray(states, dtype=object)))
    exp = FQ.unpack(np.asarray(xla_permute(FQ, cfg.packed(), dev)))
    assert got == [[int(v) for v in row] for row in exp]
    # dense Merkle build vs host compress recompute
    leaves = [rng.randrange(FQ.p) for _ in range(8)]
    nodes = eng.merkle_non_leaf(leaves)

    def compress(l, r):
        o = PoseidonSponge(cfg)
        o.state = [0, l % FQ.p, r % FQ.p]
        o._permute_python()
        return o.state[1]

    lvl = [compress(leaves[2 * i], leaves[2 * i + 1]) for i in range(4)]
    top = [compress(lvl[0], lvl[1]), compress(lvl[2], lvl[3])]
    assert nodes == [compress(top[0], top[1])] + top + lvl


def test_native_te_curve_three_way(rng, monkeypatch):
    """python-int vs C++ vs device on TE curve ops (VERDICT r3 task 2's
    three-way cross-model gate)."""
    import jax.numpy as jnp

    from crypto_primitives_tpu.ops.curves_known import ED_ON_BLS12_377 as TE

    eng = native.NativeTECurve(TE)
    pts = [TE.rand_point(rng) for _ in range(4)]
    ks = [rng.randrange(TE.scalar.p) for _ in range(4)] + [0]
    pts.append(pts[0])
    # python oracle (force the pure tier)
    monkeypatch.setenv("CPT_NATIVE", "0")
    py = [TE.scalar_mul_host(p, k) for p, k in zip(pts, ks)]
    assert py == [TE._scalar_mul_py(p, k) for p, k in zip(pts, ks)]
    monkeypatch.setenv("CPT_NATIVE", "1")
    # C++
    assert eng.scalar_mul_batch(pts, ks) == py
    assert eng.add(pts[0], pts[1]) == TE.add_host(pts[0], pts[1])
    # device
    bits = np.zeros((len(ks), TE.scalar.nbits), np.uint8)
    for i, k in enumerate(ks):
        for j in range(int(k).bit_length()):
            bits[i, j] = (k >> j) & 1
    dev = TE.dev_scalar_mul_bits(
        jnp.asarray(TE.pack_points(pts)), jnp.asarray(bits)
    )
    assert list(TE.unpack_points(np.asarray(dev))) == py


def test_native_sw_curve_three_way(rng, monkeypatch):
    from crypto_primitives_tpu.ops.curves_known import PALLAS as SW

    eng = native.NativeSWCurve(SW)
    pts = [SW.rand_point(rng) for _ in range(3)]
    ks = [rng.randrange(SW.scalar.p) for _ in range(3)]
    monkeypatch.setenv("CPT_NATIVE", "0")
    py = [SW.scalar_mul_host(p, k) for p, k in zip(pts, ks)]
    monkeypatch.setenv("CPT_NATIVE", "1")
    assert eng.scalar_mul_batch(pts, ks) == py
    # complete-law corner cases: identity and inverse
    assert eng.add(pts[0], None) == pts[0]
    assert eng.add(pts[0], SW.neg_host(pts[0])) is None
    assert eng.scalar_mul(pts[0], 0) is None


def test_native_bls12_381_g1_six_limb(rng, monkeypatch):
    """The 6x64-limb instantiation (381-bit base field)."""
    from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1 as G1

    eng = native.NativeSWCurve(G1)
    assert eng.nl == 6
    pts = [G1.rand_point(rng) for _ in range(2)]
    ks = [rng.randrange(G1.scalar.p) for _ in range(2)]
    monkeypatch.setenv("CPT_NATIVE", "0")
    py = [G1.scalar_mul_host(p, k) for p, k in zip(pts, ks)]
    monkeypatch.setenv("CPT_NATIVE", "1")
    assert eng.scalar_mul_batch(pts, ks) == py
    assert eng.add(pts[0], pts[1]) == G1.add_host(pts[0], pts[1])


def test_native_single_op_dispatch_parity(rng, monkeypatch):
    """The wired single-op model paths (Schnorr sign/verify, Pedersen
    evaluate, Pedersen commit, Poseidon compress) agree between the native
    and python tiers (VERDICT r3 task 2 done-gate)."""
    import random

    from crypto_primitives_tpu.models.commitment.pedersen import PedersenCommitment
    from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window
    from crypto_primitives_tpu.models.crh.poseidon import PoseidonTwoToOneCRH
    from crypto_primitives_tpu.models.signature.schnorr import Schnorr
    from crypto_primitives_tpu.ops.curves_known import ED_ON_BLS12_377 as TE

    msg = bytes(range(64))

    def run_all():
        r = random.Random(1234)
        sch = Schnorr(TE)
        sp = sch.setup(r)
        pk, sk = sch.keygen(sp, r)
        sig = sch.sign(sp, sk, msg, r)
        assert sch.verify(sp, pk, msg, sig)
        rpk = sch.randomize_public_key(sp, pk, b"\x05" * 32)

        crh = PedersenCRH(TE, Window(4, 8))
        cp = crh.setup(r)
        digest = crh.evaluate(cp, bytes([r.randrange(256) for _ in range(4)]))

        com = PedersenCommitment(TE, Window(4, 8))
        comp = com.setup(r)
        c = com.commit(comp, b"\x01\x02", r.randrange(TE.scalar.p))

        cfg = get_default_poseidon_parameters(FR, 2, False)
        two = PoseidonTwoToOneCRH(FR)
        h = two.compress(cfg, 123456789, 987654321)
        return (pk, sk, sig.prover_response, sig.verifier_challenge, rpk,
                digest, c, h)

    monkeypatch.setenv("CPT_NATIVE", "1")
    got_native = run_all()
    monkeypatch.setenv("CPT_NATIVE", "0")
    got_python = run_all()
    assert got_native == got_python
