"""Fused Pallas TPU kernel for the grouped conditional-sum MSM over
short-Weierstrass curves (round-4 verdict task 1: BLS12-381 G1 Pedersen /
fixed-base MSM on the fused VMEM path).

The SW twin of ops/msm_rns_pallas.py: the XLA grouped path
(ops/curve_sw_rns.py sw_conditional_sum_grouped_rns) materializes ~30
(B, 3, 2K) intermediates per curve addition to HBM; here the accumulator
never leaves VMEM and the whole subset-sum table is VMEM-resident.
Structure per w-bit group:

  * one-hot select as an exact-bf16 MXU matmul over 6-bit digit planes
    (same trick as the TE kernel);
  * the complete projective Renes-Costello-Batina Algorithm 1 addition —
    the SAME op sequence and value-bound ledger as sw_add_rns (which
    keeps every product inside the bound_a*bound_b <= M1//p Montgomery
    domain), stacked as (2K, 6B) lane-wide Montgomery reductions.  Unlike
    the TE kernel there is no affine-combo shortcut: the SW identity
    (0 : 1 : 0) is not affine, so combos stay projective and the law
    stays complete.  Two bound disciplines:
      - plans with M1//p >= 108 (every big mid-red plan; G1's has ~2^49)
        skip the cross-term and output re-normalizations entirely — the
        accumulator runs at value bound 6, saving 7 of the XLA path's 25
        Montgomery ops per addition;
      - tighter plans (legacy 2x24, M1//p = 55) keep sw_add_rns's exact
        normalization schedule.

Parameterized by the RNS plan geometry (k residues per base, mid-red
extensions) like the round-5 Poseidon kernel.  Bit-exact (value-level) vs
the XLA grouped path and the limb tier: tests/test_rns_big.py.
Reference workload: crypto-primitives/src/crh/pedersen/mod.rs:76-130.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crypto_primitives_tpu.ops import rns
from crypto_primitives_tpu.ops.rns import DELTA1, DELTA2, DIGIT

DEFAULT_BLOCK = 512

# Value-bound budget for the fast (no-renormalize) discipline: the widest
# product is t1p(12) * t4p(9) = 108 (see the bound ledger in the kernel).
FAST_BOUND_BUDGET = 108


def _plain_rows(plan: rns.RNSPlan, v: int, p: int) -> np.ndarray:
    """Montgomery-form residues in the standard storage convention
    (base 1 untwisted, base 2 tau-twisted) — the RnsField layout."""
    vm = int(v) % p * plan.M1 % p
    r1 = [vm % int(m) for m in plan.m1]
    r2 = [(vm * int(t)) % int(m) for m, t in zip(plan.m2, plan.tau)]
    return np.asarray(r1 + r2, dtype=np.float32)


def pack_combos_sw_from_subsets(curve, groups) -> np.ndarray:
    """Host precompute: per-group combo points -> kernel layout.

    groups: list of lists, each 2^w host affine points (None = identity).
    Returns (G, 2*2K, 3*2^w) float32 — per group, rows are the projective
    combo residues' 6-bit digit planes (d0; 64*d1), columns coord-major
    [X | Y | Z] x 2^w combos, standard storage convention (the kernel's
    mont_reduce runs the generic c_sigma/c2 path, exactly like
    rns_xla.mul_raw)."""
    p = curve.base.p
    plan = rns.build_plan(p)
    K = plan.k
    G = len(groups)
    ew = len(groups[0])
    out = np.zeros((G, 2 * 2 * K, 3 * ew), np.float32)
    for g, subset in enumerate(groups):
        assert len(subset) == ew
        for e, pt in enumerate(subset):
            vals = (0, 1, 0) if pt is None else (int(pt[0]), int(pt[1]), 1)
            for c, v in enumerate(vals):
                rows = _plain_rows(plan, v, p)  # (2K,)
                r64 = rows.astype(np.int64)
                d1, d0 = np.divmod(r64, 1 << DIGIT)
                col = c * ew + e
                out[g, : 2 * K, col] = d0
                out[g, 2 * K :, col] = 64.0 * d1
    return out


def pack_combos_sw_kernel(curve, pts, w: int = 3) -> np.ndarray:
    """Subset-sum grouped tables: the SAME grouping as the XLA table
    (curve_rns.subset_groups — curve-model agnostic), so kernel and XLA
    paths select identical points."""
    from crypto_primitives_tpu.ops.curve_rns import subset_groups

    groups = subset_groups(curve, pts, w)
    # subset_groups returns host affine tuples with curve.zero_host() for
    # the identity; normalize the identity encoding to None
    zero = curve.zero_host()
    groups = [[None if pt == zero else pt for pt in grp] for grp in groups]
    return pack_combos_sw_from_subsets(curve, groups)


@functools.cache
def _sw_msm_consts(plan: rns.RNSPlan, curve):
    """Column constants: per-base vectors, sub offsets, curve constants
    (a, 3b, a^2) and the Montgomery one, all standard storage."""

    def col(a):
        return np.asarray(a, np.float32).reshape(-1, 1)

    K = plan.k

    def pad2k(a):
        return np.concatenate(
            [np.asarray(a, np.float32), np.zeros(K, np.float32)]
        )

    p = plan.p

    def sub_offset(n: int) -> np.ndarray:
        # RnsField._sub_offset twin: residues of n*p plus a 2m lazy margin
        off1 = [(n * p) % int(m) + 2 * int(m) for m in plan.m1]
        off2 = [
            ((n * p) % int(m)) * int(t) % int(m) + 2 * int(m)
            for m, t in zip(plan.m2, plan.tau)
        ]
        return np.asarray(off1 + off2, np.float32)

    vec = np.stack(
        [
            col(np.concatenate([plan.inv_m1, plan.inv_m2])),
            col(np.concatenate([plan.m1, plan.m2]).astype(np.float32)),
            col(pad2k(plan.inv_m1)),
            col(pad2k(plan.m1.astype(np.float32))),
            col(pad2k(plan.inv_m2)),
            col(pad2k(plan.m2.astype(np.float32))),
            col(pad2k(plan.c_sigma)),
            col(pad2k(plan.c2)),
            col(pad2k(plan.p2c2)),
            col(pad2k(plan.negM1)),
            col(pad2k(plan.negM2)),
            col(sub_offset(3)),  # off3
            col(sub_offset(6)),  # off6
            col(_plain_rows(plan, 1, p)),  # Montgomery one
            col(_plain_rows(plan, curve.a % p, p)),
            col(_plain_rows(plan, 3 * curve.b % p, p)),
            col(_plain_rows(plan, curve.a * curve.a % p, p)),
        ]
    )
    return (
        vec,
        np.asarray(plan.ext1_w, np.float32),
        np.asarray(plan.ext2_w, np.float32),
    )


def _make_sw_msm_kernel(plan: rns.RNSPlan, G: int, w: int):
    f32 = jnp.float32
    K = plan.k
    mid_red = plan.mid_red
    fast = plan.M1 // plan.p >= FAST_BOUND_BUDGET
    EW = 1 << w

    def kernel(combos_ref, e1w_ref, e2w_ref, vec_ref, idx_ref, out_ref):
        v = vec_ref[...]
        inv_all, m_all = v[0], v[1]
        inv1, m1 = v[2, :K], v[3, :K]
        inv2, m2 = v[4, :K], v[5, :K]
        c_sigma = v[6, :K]
        c2, p2c2 = v[7, :K], v[8, :K]
        negM1, negM2 = v[9, :K], v[10, :K]
        off3, off6 = v[11], v[12]
        one_col = v[13]
        a_col, b3_col, a2_col = v[14], v[15], v[16]
        e1w = e1w_ref[...]
        e2w = e2w_ref[...]

        def red(x, inv, m):
            q = jnp.floor(x * inv)
            return x - q * m

        def ext(s, W, negM, inv, m, delta):
            d1 = jnp.floor(s * f32(2.0**-DIGIT))
            d0 = s - d1 * f32(1 << DIGIT)
            x = jnp.concatenate([d0, d1], axis=0)
            out = jax.lax.dot(W, x, preferred_element_type=f32)
            U0, U1 = out[:K], out[K : 2 * K]
            L0 = out[2 * K : 2 * K + 1]
            L1 = out[2 * K + 1 : 2 * K + 2]
            L2 = out[2 * K + 2 :]
            lam = jnp.floor((L0 + L1) + L2 + f32(delta))
            if mid_red:  # big plans: raw U1 rows, reduce before the 64 fold
                U1 = f32(1 << DIGIT) * red(U1, inv, m)
            return red((U0 + U1) + lam * negM, inv, m)

        def mont_reduce(wv):
            # generic path (standard-storage operands), rns_xla.mul_raw twin
            s1 = red(wv[:K] * c_sigma, inv1, m1)
            qh = ext(s1, e1w, negM1, inv2, m2, DELTA1)
            om_pre = wv[K:] * c2 + qh * p2c2
            om = red(om_pre, inv2, m2)
            r1 = ext(om, e2w, negM2, inv1, m1, DELTA2)
            return jnp.concatenate([r1, om], axis=0)

        def mont_mul(a, b):
            return mont_reduce(red(a * b, inv_all, m_all))

        B3 = out_ref.shape[1]
        B = B3 // 3
        zero = jnp.zeros((2 * K, B), f32)
        one_b = jnp.broadcast_to(one_col, (2 * K, B))
        acc0 = jnp.concatenate([zero, one_b, zero], axis=1)  # (0 : 1 : 0)

        # one-hot row map: row r = c*EW + e selects coordinate c, window
        # value e; lane l = c*B + b
        RR = 3 * EW
        rows_e = jax.lax.broadcasted_iota(jnp.int32, (RR, 3 * B), 0) % EW
        rows_c = jax.lax.broadcasted_iota(jnp.int32, (RR, 3 * B), 0) // EW
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (RR, 3 * B), 1) // B

        abc = jnp.concatenate(
            [
                jnp.broadcast_to(a_col, (2 * K, B)),
                jnp.broadcast_to(b3_col, (2 * K, B)),
                jnp.broadcast_to(a_col, (2 * K, B)),
                jnp.broadcast_to(b3_col, (2 * K, B)),
                jnp.broadcast_to(a_col, (2 * K, B)),
                jnp.broadcast_to(a2_col, (2 * K, B)),
            ],
            axis=1,
        )  # round-2 constant row [a, 3b, a, 3b, a, a^2]

        def body(i, acc):
            idx1 = idx_ref[pl.ds(i, 1), :]  # (1, B)
            idx3 = jnp.concatenate([idx1] * 3, axis=1)  # (1, 3B)
            cg = combos_ref[i]  # (4K, 3*EW) digit planes
            onehot = jnp.where(
                (rows_e == idx3) & (rows_c == lane_c), f32(1.0), f32(0.0)
            )
            so = jax.lax.dot(cg, onehot, preferred_element_type=f32)
            sel = so[: 2 * K] + so[2 * K :]  # (2K, 3B) standard residues
            # --- complete RCB addition, sw_add_rns op order.  Value-bound
            # ledger (units of p): acc coords <= BA (3 normalized / 6
            # fast), sel coords <= 1.
            X1, Y1, Z1 = acc[:, :B], acc[:, B : 2 * B], acc[:, 2 * B :]
            X2, Y2, Z2 = sel[:, :B], sel[:, B : 2 * B], sel[:, 2 * B :]
            sx1 = red(X1 + Y1, inv_all, m_all)  # 2*BA
            sy1 = red(Y1 + Z1, inv_all, m_all)
            sz1 = red(X1 + Z1, inv_all, m_all)
            sx2 = red(X2 + Y2, inv_all, m_all)  # 2
            sy2 = red(Y2 + Z2, inv_all, m_all)
            sz2 = red(X2 + Z2, inv_all, m_all)
            lhs = jnp.concatenate([X1, Y1, Z1, sx1, sz1, sy1], axis=1)
            rhs = jnp.concatenate([X2, Y2, Z2, sx2, sz2, sy2], axis=1)
            r1v = mont_mul(lhs, rhs)  # max (2*BA)*2 <= 24 <= M1//p
            m0 = r1v[:, :B]
            m1v = r1v[:, B : 2 * B]
            m2v = r1v[:, 2 * B : 3 * B]
            A = r1v[:, 3 * B : 4 * B]
            Bv = r1v[:, 4 * B : 5 * B]
            C = r1v[:, 5 * B :]
            # cross sums, bound 9 (3+3+3); sub offsets keep values >= 0
            s_xy = red(A + (off3 - m0) + (off3 - m1v), inv_all, m_all)
            s_xz = red(Bv + (off3 - m0) + (off3 - m2v), inv_all, m_all)
            s_yz = red(C + (off3 - m1v) + (off3 - m2v), inv_all, m_all)
            cvars = jnp.concatenate(
                [s_xz, m2v, m2v, s_xz, m0, m2v], axis=1
            )
            r2v = mont_mul(cvars, abc)  # 9*1
            a_sxz = r2v[:, :B]
            b3_m2 = r2v[:, B : 2 * B]
            a_m2 = r2v[:, 2 * B : 3 * B]
            b3_sxz = r2v[:, 3 * B : 4 * B]
            a_m0 = r2v[:, 4 * B : 5 * B]
            a2_m2 = r2v[:, 5 * B :]
            Zp = red(b3_m2 + a_sxz, inv_all, m_all)  # 6
            U = red(m1v + (off6 - Zp), inv_all, m_all)  # 9
            V = red(m1v + Zp, inv_all, m_all)  # 9
            t1p = red(m0 + m0 + m0 + a_m2, inv_all, m_all)  # 12
            t4p = red(
                b3_sxz + a_m0 + (off3 - a2_m2), inv_all, m_all
            )  # 9
            if not fast:
                # legacy discipline: renormalize the four cross terms so
                # round 3 stays inside M1//p = 55 (sw_add_rns:140-144)
                cross = jnp.concatenate([U, t1p, V, t4p], axis=1)
                ones4 = jnp.concatenate([one_b] * 4, axis=1)
                crn = mont_mul(cross, ones4)  # 12*1
                U = crn[:, :B]
                t1p = crn[:, B : 2 * B]
                V = crn[:, 2 * B : 3 * B]
                t4p = crn[:, 3 * B :]
            # round 3: fast max t1p(12)*t4p(9) = 108; legacy max 9*3 = 27
            lhs3 = jnp.concatenate([U, t1p, s_xy, s_yz, s_yz, s_xy], axis=1)
            rhs3 = jnp.concatenate([V, t4p, U, t4p, V, t1p], axis=1)
            r3v = mont_mul(lhs3, rhs3)
            Y3 = red(r3v[:, :B] + r3v[:, B : 2 * B], inv_all, m_all)  # 6
            X3 = red(
                r3v[:, 2 * B : 3 * B] + (off3 - r3v[:, 3 * B : 4 * B]),
                inv_all,
                m_all,
            )  # 6
            Z3 = red(
                r3v[:, 4 * B : 5 * B] + r3v[:, 5 * B :], inv_all, m_all
            )  # 6
            outp = jnp.concatenate([X3, Y3, Z3], axis=1)
            if not fast:
                # output renormalize -> bound 3 (sw_add_rns:151-153)
                ones3 = jnp.concatenate([one_b] * 3, axis=1)
                outp = mont_mul(outp, ones3)
            return outp

        acc = jax.lax.fori_loop(0, G, body, acc0)
        # final renormalize: the returned points carry bound <= 3 in both
        # disciplines (interchangeable with the XLA path's BOUND)
        ones3 = jnp.concatenate([one_b] * 3, axis=1)
        out_ref[...] = mont_mul(acc, ones3)

    return kernel


@functools.lru_cache(maxsize=32)
def _build_sw_grouped_msm(curve, G: int, w: int, block_b: int, interpret: bool):
    plan = rns.build_plan(curve.base.p)
    K = plan.k
    vec, e1w, e2w = _sw_msm_consts(plan, curve)
    kernel = _make_sw_msm_kernel(plan, G, w)

    @jax.jit
    def run(combos, idx):
        # combos (G, 4K, 3*2^w) f32; idx (B, G) int32 -> (B, 3, 2K) f32
        B = idx.shape[0]
        pad = (-B) % block_b
        if pad:
            idx = jnp.concatenate(
                [idx, jnp.zeros((pad, G), idx.dtype)], axis=0
            )
        Bp = B + pad
        idx_t = idx.T  # (G, Bp)

        def full_spec(arr):
            return pl.BlockSpec(
                arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
            )

        out = pl.pallas_call(
            kernel,
            grid=(Bp // block_b,),
            in_specs=[
                full_spec(combos),
                full_spec(e1w),
                full_spec(e2w),
                full_spec(vec),
                pl.BlockSpec(
                    (G, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (2 * K, 3 * block_b), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((2 * K, 3 * Bp), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(combos, jnp.asarray(e1w), jnp.asarray(e2w), jnp.asarray(vec), idx_t)
        nb = Bp // block_b
        o = out.reshape(2 * K, nb, 3, block_b)
        o = jnp.moveaxis(o, 0, -1)  # (nb, 3, block_b, 2K)
        return o.transpose(0, 2, 1, 3).reshape(Bp, 3, 2 * K)[:B]

    return run


def grouped_msm_sw_pallas(
    curve,
    combos: jnp.ndarray,
    bits: jnp.ndarray,
    w: int,
    block_b: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """sum_j bits[..., j] * table[j] over a pack_combos_sw_kernel table.

    bits (..., N) uint8 (zero-padded to G*w internally); returns
    projective points (..., 3, 2K) in the standard convention (value
    bound 3) — interchangeable with sw_conditional_sum_grouped_rns
    output."""
    G = combos.shape[0]
    batch = bits.shape[:-1]
    n = bits.shape[-1]
    flatb = bits.reshape(-1, n)
    blockb = min(block_b, max(8, flatb.shape[0]))
    if n < G * w:
        flatb = jnp.concatenate(
            [flatb, jnp.zeros((flatb.shape[0], G * w - n), flatb.dtype)],
            axis=-1,
        )
    weights = jnp.asarray([1 << i for i in range(w)], jnp.int32)
    idx = jnp.sum(
        flatb.reshape(flatb.shape[0], G, w).astype(jnp.int32) * weights,
        axis=-1,
    )
    run = _build_sw_grouped_msm(curve, G, w, blockb, interpret)
    out = run(combos, idx)
    k = rns.build_plan(curve.base.p).k
    return out.reshape(batch + (3, 2 * k))
