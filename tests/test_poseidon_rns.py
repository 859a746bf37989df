"""RNS-Montgomery Poseidon path (v5): plan arithmetic, numpy-f32 kernel
emulation, and the Pallas kernel in interpreter mode, all vs the host
oracle / integer arithmetic.  Semantics mirror the reference permutation
(crypto-primitives/src/sponge/poseidon/mod.rs:98-121)."""

import numpy as np
import pytest

import jax.numpy as jnp

from crypto_primitives_tpu.models.sponge import (
    PoseidonSponge,
    get_default_poseidon_parameters,
)
from crypto_primitives_tpu.ops import rns
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.ops.poseidon_rns_pallas import permute_rns

P = FR.p


@pytest.fixture(scope="module")
def plan():
    return rns.build_plan(P)



def to_mont_rns(plan, xs):
    """ints -> Montgomery form -> RNS residue pair."""
    M1 = plan.M1
    arr = np.asarray([[x * M1 % P for x in row] for row in xs], dtype=object)
    return rns.to_rns(plan, arr)


def from_mont_rns(plan, r1):
    M1 = plan.M1
    vals = rns.from_rns(plan, np.asarray(r1))
    inv = pow(M1, -1, P)
    return np.vectorize(lambda v: int(v) * inv % P, otypes=[object])(vals)


def test_mont_mul_random(plan, rng):
    for _ in range(50):
        x, y = rng.randrange(4 * P), rng.randrange(4 * P)
        a = rns.to_rns(plan, x)
        b = rns.to_rns(plan, y)
        r1, om = rns.mont_mul_np(plan, a, b)
        got = int(rns.from_rns(plan, r1)) % P
        want = x * y * pow(plan.M1, -1, P) % P
        assert got == want
        # closure bound for chaining
        assert int(rns.from_rns(plan, r1)) < 4 * P
        # twisted base-2 consistency
        full = int(rns.from_rns(plan, r1))
        for j in range(rns.K):
            mj = int(plan.m2[j])
            assert int(om[..., j]) % mj == full * int(plan.tau[j]) % mj


def test_mont_mul_edge_values(plan):
    edge = [0, 1, P - 1, P, 2 * P, 4 * P - 1, plan.M1 % P]
    for x in edge:
        for y in edge:
            a, b = rns.to_rns(plan, x), rns.to_rns(plan, y)
            r1, _ = rns.mont_mul_np(plan, a, b)
            got = int(rns.from_rns(plan, r1)) % P
            assert got == x * y * pow(plan.M1, -1, P) % P


def test_chained_x17(plan, rng):
    """x^17 via square-and-multiply chains outputs back into inputs —
    exercises the lazy-bound fixpoint over many dependent muls."""
    for _ in range(5):
        x = rng.randrange(P)
        a = rns.to_rns(plan, x * plan.M1 % P)
        acc = a
        for _ in range(4):
            acc = rns.mont_mul_np(plan, acc, acc)
        acc = rns.mont_mul_np(plan, acc, a)
        got = int(from_mont_rns(plan, acc[0]))
        assert got == pow(x, 17, P)


@pytest.mark.parametrize("rate", [2, 3, 4, 5, 6, 7, 8])
def test_rns_kernel_interpret_matches_oracle(plan, rng, rate):
    cfg = get_default_poseidon_parameters(FR, rate, False)
    B = 3
    states = [[rng.randrange(P) for _ in range(cfg.t)] for _ in range(B)]
    r1, r2 = to_mont_rns(plan, states)
    dev = jnp.asarray(
        np.concatenate([r1, r2], axis=-1), dtype=jnp.float32
    )  # (B, t, 2K)
    out = np.asarray(permute_rns(plan, cfg, dev, block_b=128, interpret=True))
    got = from_mont_rns(plan, out[..., : rns.K])
    for i in range(B):
        oracle = PoseidonSponge(cfg)
        oracle.state = list(states[i])
        oracle.permute()
        assert [int(v) for v in got[i]] == oracle.state


def test_rns_kernel_padding(plan, rng):
    cfg = get_default_poseidon_parameters(FR, 2, False)
    states = [[rng.randrange(P) for _ in range(cfg.t)] for _ in range(3)]
    r1, r2 = to_mont_rns(plan, states)
    dev = jnp.asarray(np.concatenate([r1, r2], axis=-1), dtype=jnp.float32)
    out = np.asarray(permute_rns(plan, cfg, dev, block_b=128, interpret=True))
    assert out.shape == (3, cfg.t, 2 * rns.K)
    got = from_mont_rns(plan, out[..., : rns.K])
    oracle = PoseidonSponge(cfg)
    oracle.state = list(states[2])
    oracle.permute()
    assert [int(v) for v in got[2]] == oracle.state


# ---------------- v6.5 sparse partial-round schedule ----------------

from crypto_primitives_tpu.ops import poseidon_sparse as ps
from crypto_primitives_tpu.ops.poseidon_rns_pallas import (
    _sparse_schedule,
    max_sparse_run_len,
)


@pytest.mark.parametrize("rate", [2, 3, 8])
@pytest.mark.parametrize("max_run", [5, 100])
def test_sparse_schedule_host_equivalence(rng, rate, max_run):
    """The factored schedule (sparse runs + dense refresh rounds) is
    bit-equal to the naive reference permutation for every state."""
    for goal in (False, True):
        cfg = get_default_poseidon_parameters(FR, rate, goal)
        sched = ps.build_sparse_schedule(cfg, max_run)
        for _ in range(3):
            st = [rng.randrange(P) for _ in range(cfg.t)]
            oracle = PoseidonSponge(cfg)
            oracle.state = list(st)
            oracle.permute()
            assert ps.permute_with_schedule(cfg, sched, st) == oracle.state


@pytest.mark.parametrize("rate", [2, 3, 8])
def test_rns_kernel_sparse_interpret_matches_oracle(plan, rng, rate):
    """The v6.5 kernel (sparse=True) under the f32 interpreter is
    bit-exact vs the host oracle — covers the variable-addend fold, the
    per-run pre matrices, and the transformed constants end to end.
    (Configs whose value-bound gate closes fall back to the dense path
    inside permute_rns and must STILL be bit-exact.)"""
    cfg = get_default_poseidon_parameters(FR, rate, False)
    if rate <= 3:
        assert _sparse_schedule(plan, cfg) is not None, "gate should pass"
    B = 3
    states = [[rng.randrange(P) for _ in range(cfg.t)] for _ in range(B)]
    r1, r2 = to_mont_rns(plan, states)
    dev = jnp.asarray(np.concatenate([r1, r2], axis=-1), dtype=jnp.float32)
    out = np.asarray(
        permute_rns(plan, cfg, dev, block_b=128, interpret=True, sparse=True)
    )
    got = from_mont_rns(plan, out[..., : rns.K])
    for i in range(B):
        oracle = PoseidonSponge(cfg)
        oracle.state = list(states[i])
        oracle.permute()
        assert [int(v) for v in got[i]] == oracle.state


def test_sparse_run_len_gate(plan):
    """Flagship (rate 2, t=3) gate opens with multi-run splitting; wide
    rates may close (M1/p is only ~55) and fall back to dense."""
    cfg = get_default_poseidon_parameters(FR, 2, False)
    L = max_sparse_run_len(plan, cfg)
    assert L >= 2
    sched = ps.build_sparse_schedule(cfg, L)
    assert not sched.is_sparse[-1]  # last partial round always dense
    run = 0
    for b in sched.is_sparse:
        run = run + 1 if b else 0
        assert run <= L
    assert sum(sched.is_sparse) >= cfg.partial_rounds * 2 // 3


# ---------------- v6.6 sqrt-sigma twisted domain ----------------


def test_sigma_qr_plan_fields(plan):
    """BLS12-381 Fr is pinned in SIGMA_QR_BASES: the plan carries a valid
    sqrt_sigma (square roots of c_sigma), twisted ext2 weights, and keeps
    the curve tier's M1//p >= 55 mul domain."""
    assert P in rns.SIGMA_QR_BASES
    assert plan.sqrt_sigma is not None
    for r, s, m in zip(
        plan.sqrt_sigma.astype(np.int64),
        plan.c_sigma.astype(np.int64),
        plan.m1,
    ):
        assert int(r) * int(r) % int(m) == int(s)
    for r, ri, m in zip(
        plan.sqrt_sigma.astype(np.int64),
        plan.inv_sqrt_sigma.astype(np.int64),
        plan.m1,
    ):
        assert int(r) * int(ri) % int(m) == 1
    assert plan.M1 // plan.p >= 55  # curve_rns bound algebra survives
    assert plan.M2 > 16 * plan.p


def test_mont_mul_twisted_matches_plain(plan, rng):
    """mont_mul in the sqrt-sigma domain == plain mont_mul after
    untwisting, over random and edge values."""
    vals = [0, 1, P - 1, 2 * P] + [rng.randrange(4 * P) for _ in range(20)]
    for x in vals:
        y = rng.randrange(4 * P)
        a, b = rns.to_rns(plan, x), rns.to_rns(plan, y)
        at = (rns.twist_b1_np(plan, a[0]), a[1])
        bt = (rns.twist_b1_np(plan, b[0]), b[1])
        r1t, omt = rns.mont_mul_np_twisted(plan, at, bt)
        r1 = rns.untwist_b1_np(plan, r1t)
        got = int(rns.from_rns(plan, r1)) % P
        assert got == x * y * pow(plan.M1, -1, P) % P
        # B2 halves agree with the plain path bit-exactly
        r1p, omp = rns.mont_mul_np(plan, a, b)
        assert np.array_equal(np.asarray(omt), np.asarray(omp))
        # twisted residues stay in the lazy domain for chaining
        assert np.all(np.asarray(r1t) < 2 * np.asarray(plan.m1))


@pytest.mark.parametrize("rate", [2, 3, 8])
def test_rns_kernel_twisted_interpret_matches_oracle(plan, rng, rate):
    """The twisted kernel (explicit twisted=True) and the untwisted one
    (twisted=False) both match the host oracle bit-for-bit; external RNS
    representation is unchanged by the twist."""
    cfg = get_default_poseidon_parameters(FR, rate, False)
    B = 3
    states = [[rng.randrange(P) for _ in range(cfg.t)] for _ in range(B)]
    r1, r2 = to_mont_rns(plan, states)
    dev = jnp.asarray(np.concatenate([r1, r2], axis=-1), dtype=jnp.float32)
    out_t = np.asarray(
        permute_rns(plan, cfg, dev, block_b=128, interpret=True, twisted=True)
    )
    out_u = np.asarray(
        permute_rns(plan, cfg, dev, block_b=128, interpret=True, twisted=False)
    )
    for out in (out_t, out_u):
        got = from_mont_rns(plan, out[..., : rns.K])
        for i in range(B):
            oracle = PoseidonSponge(cfg)
            oracle.state = list(states[i])
            oracle.permute()
            assert [int(v) for v in got[i]] == oracle.state


def test_rns_kernel_twisted_sparse_interpret(plan, rng):
    """Twist + v6.5 sparse schedule compose."""
    cfg = get_default_poseidon_parameters(FR, 2, False)
    states = [[rng.randrange(P) for _ in range(cfg.t)] for _ in range(3)]
    r1, r2 = to_mont_rns(plan, states)
    dev = jnp.asarray(np.concatenate([r1, r2], axis=-1), dtype=jnp.float32)
    out = np.asarray(
        permute_rns(
            plan, cfg, dev, block_b=128, interpret=True, sparse=True,
            twisted=True,
        )
    )
    got = from_mont_rns(plan, out[..., : rns.K])
    for i in range(3):
        oracle = PoseidonSponge(cfg)
        oracle.state = list(states[i])
        oracle.permute()
        assert [int(v) for v in got[i]] == oracle.state
