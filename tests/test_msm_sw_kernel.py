"""Fused SW MSM kernel (ops/msm_sw_rns_pallas.py) parity, both bound
disciplines, and the round-5 plan-growth fix for curves whose legacy plan
could not cover the addition ledger.

Round-4 verdict task 1: BLS12-381 G1 Pedersen/MSM get the fused VMEM
path.  The kernel runs interpreted off-TPU (bit-exact semantics, same
code path); compiled-TPU parity is exercised by the grouped_kernel_ok
probe on real hardware and tools/bench_g1_rns.py.
Reference workload: crypto-primitives/src/crh/pedersen/mod.rs:76-130.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.ops import curve_rns as cr
from crypto_primitives_tpu.ops import curve_sw_rns as sw
from crypto_primitives_tpu.ops import msm_sw_rns_pallas as mk
from crypto_primitives_tpu.ops import rns
from crypto_primitives_tpu.ops.curves_known import (
    BLS12_381_G1 as G1,
    ED25519,
    PALLAS,
    SECP256R1,
)


def _host_msm(curve, pts, row):
    acc = None
    for j, p in enumerate(pts):
        if row[j]:
            acc = p if acc is None else curve.add_host(acc, p)
    return acc


@pytest.mark.parametrize(
    "curve", [G1, PALLAS, SECP256R1], ids=["g1", "pallas", "secp256r1"]
)
def test_sw_kernel_parity_interpret(curve, rng):
    """Kernel == XLA grouped path == host oracle, covering the fast
    (big-plan) and normalized (legacy-plan) bound disciplines, identity
    padding (7 points at w=3) and the all-identity result."""
    plan = rns.build_plan(curve.base.p)
    n, w, B = 7, 3, 4
    pts = [curve.rand_point(rng) for _ in range(n)]
    ck = jnp.asarray(mk.pack_combos_sw_kernel(curve, pts, w))
    cx = jnp.asarray(sw.pack_table_grouped(curve, pts, w))
    bits = np.asarray(
        [[rng.randrange(2) for _ in range(n)] for _ in range(B)], np.uint8
    )
    bits[0] = 0  # all-identity row
    out_k = mk.grouped_msm_sw_pallas(
        curve, ck, jnp.asarray(bits), w, block_b=8, interpret=True
    )
    out_x = sw.sw_conditional_sum_grouped_rns(curve, cx, jnp.asarray(bits), w)
    got_k = sw.unpack_affine_rns(curve, np.asarray(out_k))
    got_x = sw.unpack_affine_rns(curve, np.asarray(out_x))
    for b in range(B):
        exp = _host_msm(curve, pts, bits[b])
        assert got_x[b] == exp, ("xla", b)
        assert got_k[b] == exp, ("kernel", b)


def test_plan_growth_covers_curve_ledgers():
    """Round-5 fix: ed25519 (M1//p was 49 < the TE HWCD peak 54) and
    secp256r1 (24 < the SW RCB peak 36) used to pass supports_rns but
    crash every device curve op at trace time; both now get a big plan
    and genuinely ride the RNS tier."""
    for curve, need in ((ED25519, 54), (SECP256R1, 36)):
        plan = rns.build_plan(curve.base.p)
        assert plan.M1 // plan.p >= need
        assert plan.mid_red and plan.k % 8 == 0
    assert cr.supports_rns(ED25519)
    assert sw.supports_rns(SECP256R1)
    # legacy plans survive untouched
    assert not rns.build_plan(PALLAS.base.p).mid_red
    assert not rns.build_plan(G1.scalar.p).mid_red


def test_ed25519_secp_device_adds(rng):
    """The previously-crashing ops now work: one batched complete
    addition per curve model against the host oracle."""
    pts = [ED25519.rand_point(rng) for _ in range(3)]
    qts = [ED25519.rand_point(rng) for _ in range(3)]
    Pd = jnp.asarray(cr.pack_points_rns(ED25519, pts))
    Qd = jnp.asarray(cr.pack_points_rns(ED25519, qts))
    got = cr.unpack_affine_rns(ED25519, np.asarray(cr.te_add_rns(ED25519, Pd, Qd)))
    assert list(got) == [ED25519.add_host(a, b) for a, b in zip(pts, qts)]

    spts = [SECP256R1.rand_point(rng) for _ in range(3)]
    sqts = [SECP256R1.rand_point(rng) for _ in range(3)]
    SP = jnp.asarray(sw.pack_points_rns(SECP256R1, spts))
    SQ = jnp.asarray(sw.pack_points_rns(SECP256R1, sqts))
    got = sw.unpack_affine_rns(
        SECP256R1, np.asarray(sw.sw_add_rns(SECP256R1, SP, SQ))
    )
    assert list(got) == [
        SECP256R1.add_host(a, b) for a, b in zip(spts, sqts)
    ]


def test_msm_many_parity(rng):
    """msm_many (round-4 verdict weak #3: N MSMs in one device program)
    returns exactly what N individual auto calls return, across curve
    models and mixed table/batch shapes."""
    from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window
    from crypto_primitives_tpu.ops.curve_rns_any import rns_mod
    from crypto_primitives_tpu.ops.curves_known import JUBJUB

    for curve in (JUBJUB, PALLAS):
        mod = rns_mod(curve)
        crhs = [
            PedersenCRH(curve, Window(4, 8)),
            PedersenCRH(curve, Window(4, 16)),
        ]
        params = [c.setup(rng) for c in crhs]
        inputs = [
            np.asarray(
                [[rng.randrange(256) for _ in range(4)] for _ in range(b)],
                np.uint8,
            )
            for b in (2, 3)
        ]
        many = crhs[0].evaluate_batch_rns_many(params, [jnp.asarray(i) for i in inputs])
        for n, crh in enumerate(crhs):
            single = crh.evaluate_batch_rns(params[n], jnp.asarray(inputs[n]))
            got = mod.unpack_affine_rns(curve, np.asarray(many[n]))
            want = mod.unpack_affine_rns(curve, np.asarray(single))
            assert list(got) == list(want), (curve, n)


@pytest.mark.slow
def test_ed25519_te_kernel_parity_interpret(rng):
    """The TE MSM kernel parameterized by the big plan geometry (ed25519
    rides k=32 mid-red now)."""
    from crypto_primitives_tpu.ops import msm_rns_pallas as tmk

    n, w, B = 6, 3, 3
    pts = [ED25519.rand_point(rng) for _ in range(n)]
    combos = jnp.asarray(tmk.pack_combos_kernel(ED25519, pts, w))
    bits = np.asarray(
        [[rng.randrange(2) for _ in range(n)] for _ in range(B)], np.uint8
    )
    out = tmk.grouped_msm_pallas(
        ED25519, combos, jnp.asarray(bits), w, block_b=8, interpret=True
    )
    got = cr.unpack_points_rns(ED25519, np.asarray(out))
    for b in range(B):
        exp = ED25519.zero_host()
        for j, p in enumerate(pts):
            if bits[b, j]:
                exp = ED25519.add_host(exp, p)
        assert got[b] == exp, b
