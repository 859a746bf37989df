"""Roofline ablation for the fused grouped-MSM kernel (round-3 verdict
item 6) — the Pedersen hot loop (ops/msm_rns_pallas.py).

Three outputs:
  1. differential-G timing of the full kernel (G1 vs G0 groups in one
     call: per-group-add cost with setup/fetch cancelled);
  2. stage ablations ('select' / 'reduce' / 'addition' stubs — results
     WRONG, timing only) attributing time to the one-hot table matmul,
     the two Montgomery reductions, and the rest of the HWCD addition;
  3. an op inventory counted from the jaxpr of a bit-exact pure replica
     of the kernel's group body, split into VPU lane-ops and MXU MACs,
     and the implied utilization vs the measured machine rooflines
     (PERFORMANCE.md: f32 dependent-chain VPU ~4.5 Tlane-op/s).

Run on the real TPU; interpret-mode replica verification also runs on
CPU (`JAX_PLATFORMS=cpu python tools/ablate_msm.py --verify`).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.ops import rns
from crypto_primitives_tpu.ops.curves_known import JUBJUB
from crypto_primitives_tpu.ops.msm_rns_pallas import (
    _msm_consts,
    grouped_msm_pallas,
    pack_combos_kernel,
)
from crypto_primitives_tpu.ops.rns import DELTA1, DELTA2, DIGIT, K

W = 5
B = 128
NBITS = 2000  # the Pedersen CRH bench input size (PERFORMANCE.md:148)


def _mk_inputs(rng, nbits, w):
    pts = [JUBJUB.rand_point(rng) for _ in range(nbits)]
    combos = jnp.asarray(pack_combos_kernel(JUBJUB, pts, w))
    bits = jnp.asarray(
        np.asarray(
            [[rng.randrange(2) for _ in range(nbits)] for _ in range(B)],
            np.uint8,
        )
    )
    return combos, bits


def timed(fn, *args, reps=3):
    np.asarray(jnp.sum(fn(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def measure(interpret=False):
    """Differential-G stage timing.  One jit wrapper per variant (a fresh
    wrapper per call would re-trace every rep, and eager per-call prep
    pays an RPC round-trip per op under the axon tunnel); scalar sum
    fetch (full-result fetches ride the ~15 MB/s tunnel and dominate)."""
    import random

    rng = random.Random(0)
    combos, bits = _mk_inputs(rng, NBITS, W)
    G = combos.shape[0]
    g0 = G // 4

    def make_chain(ablate, n_par, k, dependent):
        """k MSM calls statically unrolled inside ONE jit: K-delta timing
        cancels the ~25 ms per-call tunnel overhead (measured: a
        100-group call times the same as a 400-group call).  Independent
        calls pipeline -> marginal THROUGHPUT; dependent=True threads an
        opaque zero through each call's bits -> serial LATENCY."""

        @jax.jit
        def fn(c, b):
            acc = jnp.float32(0)
            for i in range(k):
                # roll the bit rows so each chained call is a distinct
                # program input (XLA would CSE k identical calls)
                bi = jnp.roll(b, i, axis=-1)
                if dependent:
                    # runtime-zero XLA cannot fold away: forces call i to
                    # wait for call i-1's result
                    dep = jnp.where(
                        jnp.isnan(acc), jnp.uint8(1), jnp.uint8(0)
                    )
                    bi = bi ^ dep
                out = grouped_msm_pallas(
                    JUBJUB, c, bi, W,
                    interpret=interpret, ablate=ablate, n_par=n_par,
                )
                acc = acc + jnp.sum(out)
            return acc

        return fn

    def kdelta(ablate, n_par, dependent, K0=2, K1=34):
        t0 = timed(make_chain(ablate, n_par, K0, dependent), combos, bits)
        t1 = timed(make_chain(ablate, n_par, K1, dependent), combos, bits)
        return (t1 - t0) / (K1 - K0)

    print(f"K-delta methodology: 32-call delta, B={B}, G={G}")
    for dependent in (False, True):
        kind = "serial-latency" if dependent else "pipelined-throughput"
        for ablate in (None, "select", "reduce", "addition"):
            per_call = kdelta(ablate, 0, dependent)
            print(
                f"[{kind}] {ablate or 'baseline':10s} "
                f"per-call={per_call*1e3:7.2f}ms -> {B/per_call:9.0f} "
                f"hashes/s ({B*G/per_call/1e6:.2f}e6 group-adds/s)",
                flush=True,
            )
        for n_par in (1, 8):
            per_call = kdelta(None, n_par, dependent)
            print(
                f"[{kind}] n_par={n_par}:   per-call={per_call*1e3:7.2f}ms "
                f"-> {B/per_call:9.0f} hashes/s "
                f"({B*G/per_call/1e6:.2f}e6 group-adds/s)",
                flush=True,
            )


# ----------------------------------------------------------------------
# Pure replica of the kernel's group body (for jaxpr op counting)
# ----------------------------------------------------------------------


def _replica(curve, w):
    plan = rns.build_plan(curve.base.p)
    vec, e1w_np, e2w_np = _msm_consts(plan, curve)
    f32 = jnp.float32
    v = jnp.asarray(vec)
    e1w = jnp.asarray(e1w_np)
    e2w = jnp.asarray(e2w_np)
    EW = 1 << w

    def body(acc, cg, idx_row):
        inv_all, m_all = v[0], v[1]  # rows are (2K, 1) columns already
        inv1, m1 = v[2, :K], v[3, :K]
        inv2, m2 = v[4, :K], v[5, :K]
        c_sigma = v[6, :K]
        c2 = v[8, :K]
        negM1, negM2 = v[9, :K], v[10, :K]
        p2c2 = v[11, :K]
        offE, offF = v[12], v[13]

        def red(x, inv, m):
            q = jnp.floor(x * inv)
            return x - q * m

        def ext(s, Wm, negM, inv, m, delta):
            d1 = jnp.floor(s * f32(2.0**-DIGIT))
            d0 = s - d1 * f32(1 << DIGIT)
            x = jnp.concatenate([d0, d1], axis=0)
            out = jax.lax.dot(Wm, x, preferred_element_type=f32)
            U0, U1 = out[:K], out[K : 2 * K]
            L0 = out[2 * K : 2 * K + 1]
            L1 = out[2 * K + 1 : 2 * K + 2]
            L2 = out[2 * K + 2 :]
            lam = jnp.floor((L0 + L1) + L2 + f32(delta))
            return red((U0 + U1) + lam * negM, inv, m)

        def mont_reduce(wv, s1_ready):
            s1 = wv[:K] if s1_ready else red(wv[:K] * c_sigma, inv1, m1)
            qh = ext(s1, e1w, negM1, inv2, m2, DELTA1)
            om_pre = (
                wv[K:] + qh * p2c2 if s1_ready else wv[K:] * c2 + qh * p2c2
            )
            om = red(om_pre, inv2, m2)
            r1 = ext(om, e2w, negM2, inv1, m1, DELTA2)
            return jnp.concatenate([r1, om], axis=0)

        Bc = acc.shape[1] // 4
        rows_e = jax.lax.broadcasted_iota(jnp.int32, (4 * EW, 4 * Bc), 0) % EW
        rows_c = jax.lax.broadcasted_iota(jnp.int32, (4 * EW, 4 * Bc), 0) // EW
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (4 * EW, 4 * Bc), 1) // Bc
        idx4 = jnp.concatenate([idx_row] * 4, axis=1)
        onehot = jnp.where(
            (rows_e == idx4) & (rows_c == lane_c), f32(1.0), f32(0.0)
        )
        so = jax.lax.dot(cg, onehot, preferred_element_type=f32)
        sel = so[: 2 * K] + so[2 * K :]
        X1, Y1 = acc[:, :Bc], acc[:, Bc : 2 * Bc]
        s1 = red(X1 + Y1, inv_all, m_all)
        lhs = jnp.concatenate([acc[:, : 3 * Bc], s1], axis=1)
        r1v = mont_reduce(red(lhs * sel, inv_all, m_all), True)
        A = r1v[:, :Bc]
        Bv = r1v[:, Bc : 2 * Bc]
        C = r1v[:, 2 * Bc : 3 * Bc]
        S = r1v[:, 3 * Bc :]
        D = acc[:, 3 * Bc :]
        E = red(S + (offE - A - Bv), inv_all, m_all)
        F = red(D + (offF - C), inv_all, m_all)
        Gv = red(D + C, inv_all, m_all)
        H = red(Bv + A, inv_all, m_all)
        lhs3 = jnp.concatenate([E, Gv, E, F], axis=1)
        rhs3 = jnp.concatenate([F, H, H, Gv], axis=1)
        return mont_reduce(red(lhs3 * rhs3, inv_all, m_all), False)

    return body


_ELEM = {
    "add": 1, "sub": 1, "mul": 1, "floor": 1, "neg": 1, "max": 1, "min": 1,
}


def op_inventory(w=W, Bc=B):
    """Count VPU lane-ops and MXU MACs in one group body from its jaxpr."""
    body = _replica(JUBJUB, w)
    acc = jnp.zeros((2 * K, 4 * Bc), jnp.float32)
    cg = jnp.zeros((4 * K, 4 * (1 << w)), jnp.float32)
    idx = jnp.zeros((1, Bc), jnp.int32)
    jaxpr = jax.make_jaxpr(body)(acc, cg, idx)
    lane_ops = 0
    macs = 0
    for eq in jaxpr.jaxpr.eqns:
        name = eq.primitive.name
        shape = eq.outvars[0].aval.shape if eq.outvars else ()
        n = int(np.prod(shape)) if shape else 1
        if name in _ELEM:
            lane_ops += n
        elif name == "dot_general":
            a_sh = eq.invars[0].aval.shape
            b_sh = eq.invars[1].aval.shape
            macs += a_sh[0] * a_sh[1] * b_sh[1]
        elif name in ("select_n",):
            lane_ops += n
    return lane_ops, macs


def verify_replica():
    """Bit-equality of the replica loop vs the interpret-mode kernel."""
    import random

    rng = random.Random(1)
    nbits = 8 * W
    combos, bits = _mk_inputs(rng, nbits, W)
    want = np.asarray(
        grouped_msm_pallas(JUBJUB, combos, bits[:8], W, interpret=True)
    )
    body = _replica(JUBJUB, W)
    Bc = 8
    G = combos.shape[0]
    weights = jnp.asarray([1 << i for i in range(W)], jnp.int32)
    idx = jnp.sum(
        bits[:8].reshape(Bc, G, W).astype(jnp.int32) * weights, axis=-1
    ).T  # (G, Bc)
    vec, _, _ = _msm_consts(rns.build_plan(JUBJUB.base.p), JUBJUB)
    one_col = jnp.asarray(vec)[14]  # (2K, 1)
    zero = jnp.zeros((2 * K, Bc), jnp.float32)
    one_b = jnp.broadcast_to(one_col, (2 * K, Bc))
    acc = jnp.concatenate([zero, one_b, zero, one_b], axis=1)
    cg = jnp.asarray(combos)
    for g in range(G):
        acc = body(acc, cg[g], idx[g : g + 1])
    got = np.asarray(acc).reshape(2 * K, 4, Bc)
    got = np.moveaxis(got, 0, -1)  # (4, Bc, 2K)
    got = np.moveaxis(got, 0, 1)  # (Bc, 4, 2K)
    assert np.array_equal(got, want), "replica != kernel"
    print("replica bit-equal to interpret-mode kernel OK", flush=True)


def main():
    lane_ops, macs = op_inventory()
    per_elem_vpu = lane_ops / (4 * B)  # lane-ops per element-coordinate set
    print(
        f"op inventory per group body (B={B}, w={W}): "
        f"{lane_ops:,} VPU lane-ops ({lane_ops/B:,.0f}/element), "
        f"{macs:,} MXU MACs ({macs/B:,.0f}/element)",
        flush=True,
    )
    # measured machine lines (PERFORMANCE.md:27-43)
    VPU = 4.5e12  # f32 dependent-chain lane-ops/s
    MXU_F32 = 50e12  # f32 dot ceiling (bf16 203T / ~4)
    bound_vpu = VPU / (lane_ops / B)
    bound_mxu = MXU_F32 / (macs / B)
    bound = 1.0 / (1.0 / bound_vpu + 1.0 / bound_mxu)  # serialized bound
    print(
        f"roofline bounds: VPU {bound_vpu/1e6:.2f}e6, MXU {bound_mxu/1e6:.2f}e6, "
        f"serialized {bound/1e6:.2f}e6 group-adds/s",
        flush=True,
    )
    if jax.default_backend() != "cpu":
        measure()
    else:
        print("(CPU backend: skipping timing; --verify for replica check)")


if __name__ == "__main__":
    if "--verify" in sys.argv:
        verify_replica()
    else:
        main()
