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

# Value-bound budget for the fast (no-renormalize) discipline: tree adds
# take BOTH operands at bound 6, so round-1 products peak at 12*12 = 144
# (see the ledger in add_pts).
FAST_BOUND_BUDGET = 144


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


def _make_sw_msm_kernel(plan: rns.RNSPlan, Gc: int, w: int, C: int):
    """Kernel over Gc chunks of C groups each: one one-hot select matmul
    per chunk, then a log2(C)-deep pairwise tree of complete RCB
    additions plus one accumulator add — the dependent-add chain shrinks
    from G to ~G*(log2(C)+1)/C steps (the in-VMEM shape of the XLA
    path's sw_sum_rns log-tree), which is what the serial one-group-per-
    iteration form was latency-bound on."""
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

        def add_pts(P1, P2):
            """Complete RCB addition of coordinate-major point blocks
            (2K, 3W): sw_add_rns op order.  Value-bound ledger (units of
            p): fast discipline runs every stored point at bound <= 6
            (round-1 products peak at 12*12 = 144 <= M1//p, asserted by
            FAST_BOUND_BUDGET); the legacy discipline renormalizes cross
            terms and outputs exactly like sw_add_rns, keeping points at
            bound 3 and products <= 36."""
            W = P1.shape[1] // 3
            X1, Y1, Z1 = P1[:, :W], P1[:, W : 2 * W], P1[:, 2 * W :]
            X2, Y2, Z2 = P2[:, :W], P2[:, W : 2 * W], P2[:, 2 * W :]
            one_w = jnp.broadcast_to(one_col, (2 * K, W))
            abc = jnp.concatenate(
                [
                    jnp.broadcast_to(a_col, (2 * K, W)),
                    jnp.broadcast_to(b3_col, (2 * K, W)),
                    jnp.broadcast_to(a_col, (2 * K, W)),
                    jnp.broadcast_to(b3_col, (2 * K, W)),
                    jnp.broadcast_to(a_col, (2 * K, W)),
                    jnp.broadcast_to(a2_col, (2 * K, W)),
                ],
                axis=1,
            )
            sx1 = red(X1 + Y1, inv_all, m_all)
            sy1 = red(Y1 + Z1, inv_all, m_all)
            sz1 = red(X1 + Z1, inv_all, m_all)
            sx2 = red(X2 + Y2, inv_all, m_all)
            sy2 = red(Y2 + Z2, inv_all, m_all)
            sz2 = red(X2 + Z2, inv_all, m_all)
            lhs = jnp.concatenate([X1, Y1, Z1, sx1, sz1, sy1], axis=1)
            rhs = jnp.concatenate([X2, Y2, Z2, sx2, sz2, sy2], axis=1)
            r1v = mont_mul(lhs, rhs)
            m0 = r1v[:, :W]
            m1v = r1v[:, W : 2 * W]
            m2v = r1v[:, 2 * W : 3 * W]
            A = r1v[:, 3 * W : 4 * W]
            Bv = r1v[:, 4 * W : 5 * W]
            C6 = r1v[:, 5 * W :]
            s_xy = red(A + (off3 - m0) + (off3 - m1v), inv_all, m_all)
            s_xz = red(Bv + (off3 - m0) + (off3 - m2v), inv_all, m_all)
            s_yz = red(C6 + (off3 - m1v) + (off3 - m2v), inv_all, m_all)
            cvars = jnp.concatenate([s_xz, m2v, m2v, s_xz, m0, m2v], axis=1)
            r2v = mont_mul(cvars, abc)
            a_sxz = r2v[:, :W]
            b3_m2 = r2v[:, W : 2 * W]
            a_m2 = r2v[:, 2 * W : 3 * W]
            b3_sxz = r2v[:, 3 * W : 4 * W]
            a_m0 = r2v[:, 4 * W : 5 * W]
            a2_m2 = r2v[:, 5 * W :]
            Zp = red(b3_m2 + a_sxz, inv_all, m_all)  # 6
            U = red(m1v + (off6 - Zp), inv_all, m_all)  # 9
            V = red(m1v + Zp, inv_all, m_all)  # 9
            t1p = red(m0 + m0 + m0 + a_m2, inv_all, m_all)  # 12
            t4p = red(b3_sxz + a_m0 + (off3 - a2_m2), inv_all, m_all)  # 9
            if not fast:
                cross = jnp.concatenate([U, t1p, V, t4p], axis=1)
                ones4 = jnp.concatenate([one_w] * 4, axis=1)
                crn = mont_mul(cross, ones4)  # 12*1
                U = crn[:, :W]
                t1p = crn[:, W : 2 * W]
                V = crn[:, 2 * W : 3 * W]
                t4p = crn[:, 3 * W :]
            lhs3 = jnp.concatenate([U, t1p, s_xy, s_yz, s_yz, s_xy], axis=1)
            rhs3 = jnp.concatenate([V, t4p, U, t4p, V, t1p], axis=1)
            r3v = mont_mul(lhs3, rhs3)
            Y3 = red(r3v[:, :W] + r3v[:, W : 2 * W], inv_all, m_all)
            X3 = red(
                r3v[:, 2 * W : 3 * W] + (off3 - r3v[:, 3 * W : 4 * W]),
                inv_all,
                m_all,
            )
            Z3 = red(r3v[:, 4 * W : 5 * W] + r3v[:, 5 * W :], inv_all, m_all)
            outp = jnp.concatenate([X3, Y3, Z3], axis=1)
            if not fast:
                ones3 = jnp.concatenate([one_w] * 3, axis=1)
                outp = mont_mul(outp, ones3)
            return outp

        B3 = out_ref.shape[1]
        B = B3 // 3
        zero = jnp.zeros((2 * K, B), f32)
        one_b = jnp.broadcast_to(one_col, (2 * K, B))
        acc0 = jnp.concatenate([zero, one_b, zero], axis=1)  # (0 : 1 : 0)

        # chunked one-hot over C groups: row r = u*(3EW) + c*EW + e (the
        # chunked combos column order); lane l = c*(C*B) + u*B + b
        RR = C * 3 * EW
        CL = 3 * C * B
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (RR, CL), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (RR, CL), 1)
        rows_u = r_iota // (3 * EW)
        rows_c = (r_iota % (3 * EW)) // EW
        rows_e = r_iota % EW
        lane_c = l_iota // (C * B)
        lane_u = (l_iota % (C * B)) // B

        def body(cc, acc):
            # idx lanes matching l = c*(C*B) + u*B + b
            idx_u = [idx_ref[pl.ds(cc * C + u, 1), :] for u in range(C)]
            idx_cb = jnp.concatenate(idx_u, axis=1)  # (1, C*B)
            idx_l = jnp.concatenate([idx_cb] * 3, axis=1)  # (1, CL)
            cg = combos_ref[cc]  # (4K, C*3*EW) digit planes
            onehot = jnp.where(
                (rows_e == idx_l) & (rows_c == lane_c) & (rows_u == lane_u),
                f32(1.0),
                f32(0.0),
            )
            so = jax.lax.dot(cg, onehot, preferred_element_type=f32)
            S = so[: 2 * K] + so[2 * K :]  # (2K, 3CB) standard residues
            n_pts = C
            while n_pts > 1:
                half = n_pts // 2
                cb = n_pts * B
                hw = half * B
                X = S[:, :cb]
                Y = S[:, cb : 2 * cb]
                Z = S[:, 2 * cb :]
                P1 = jnp.concatenate(
                    [X[:, :hw], Y[:, :hw], Z[:, :hw]], axis=1
                )
                P2 = jnp.concatenate(
                    [X[:, hw:], Y[:, hw:], Z[:, hw:]], axis=1
                )
                S = add_pts(P1, P2)
                n_pts = half
            return add_pts(acc, S)

        acc = jax.lax.fori_loop(0, Gc, body, acc0)
        # final renormalize: the returned points carry bound <= 3 in both
        # disciplines (interchangeable with the XLA path's BOUND)
        ones3 = jnp.concatenate([one_b] * 3, axis=1)
        out_ref[...] = mont_mul(acc, ones3)

    return kernel


@functools.lru_cache(maxsize=32)
def _build_sw_grouped_msm(curve, G: int, w: int, block_b: int,
                          interpret: bool, chunk: int):
    plan = rns.build_plan(curve.base.p)
    K = plan.k
    EW = 1 << w
    Gc = G // chunk
    vec, e1w, e2w = _sw_msm_consts(plan, curve)
    kernel = _make_sw_msm_kernel(plan, Gc, w, chunk)

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
        # chunk the table: (Gc, 4K, chunk*3EW), column u*(3EW) + c*EW + e
        cc = combos.reshape(Gc, chunk, 4 * K, 3 * EW)
        cc = jnp.transpose(cc, (0, 2, 1, 3)).reshape(
            Gc, 4 * K, chunk * 3 * EW
        )

        def full_spec(arr):
            return pl.BlockSpec(
                arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
            )

        out = pl.pallas_call(
            kernel,
            grid=(Bp // block_b,),
            in_specs=[
                full_spec(cc),
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
        )(cc, jnp.asarray(e1w), jnp.asarray(e2w), jnp.asarray(vec), idx_t)
        nb = Bp // block_b
        o = out.reshape(2 * K, nb, 3, block_b)
        o = jnp.moveaxis(o, 0, -1)  # (nb, 3, block_b, 2K)
        return o.transpose(0, 2, 1, 3).reshape(Bp, 3, 2 * K)[:B]

    return run


@functools.lru_cache(maxsize=16)
def _identity_group_sw(curve, w: int) -> np.ndarray:
    """One all-identity combo group (pads G up to a multiple of the
    chunk width; adding the identity is exact under the complete law)."""
    return pack_combos_sw_from_subsets(curve, [[None] * (1 << w)])[0]


def grouped_msm_sw_pallas(
    curve,
    combos: jnp.ndarray,
    bits: jnp.ndarray,
    w: int,
    block_b: int = DEFAULT_BLOCK,
    interpret: bool = False,
    chunk: int = 8,
) -> jnp.ndarray:
    """sum_j bits[..., j] * table[j] over a pack_combos_sw_kernel table.

    bits (..., N) uint8 (zero-padded to G*w internally); returns
    projective points (..., 3, 2K) in the standard convention (value
    bound 3) — interchangeable with sw_conditional_sum_grouped_rns
    output.  chunk: groups tree-summed per kernel iteration (see
    _make_sw_msm_kernel); G is identity-padded up to a multiple."""
    G = combos.shape[0]
    batch = bits.shape[:-1]
    n = bits.shape[-1]
    flatb = bits.reshape(-1, n)
    blockb = min(block_b, max(8, flatb.shape[0]))
    Gp = -(-G // chunk) * chunk
    if Gp > G:
        combos = jnp.concatenate(
            [
                combos,
                jnp.broadcast_to(
                    jnp.asarray(_identity_group_sw(curve, w)),
                    (Gp - G,) + combos.shape[1:],
                ),
            ],
            axis=0,
        )
    if n < Gp * w:
        flatb = jnp.concatenate(
            [flatb, jnp.zeros((flatb.shape[0], Gp * w - n), flatb.dtype)],
            axis=-1,
        )
    weights = jnp.asarray([1 << i for i in range(w)], jnp.int32)
    idx = jnp.sum(
        flatb.reshape(flatb.shape[0], Gp, w).astype(jnp.int32) * weights,
        axis=-1,
    )
    run = _build_sw_grouped_msm(curve, Gp, w, blockb, interpret, chunk)
    out = run(combos, idx)
    k = rns.build_plan(curve.base.p).k
    return out.reshape(batch + (3, 2 * k))
