"""Fused Pallas TPU kernel for the grouped conditional-sum MSM.

The Pedersen / fixed-base scalar-mul hot loop (ops/curve_rns.py
te_conditional_sum_grouped_rns) as ONE VMEM-resident program: the XLA
path materializes ~30 (B, 4, 2K) intermediates per curve addition to HBM;
here the accumulator never leaves VMEM and the whole subset-sum table
(a few MB) is VMEM-resident.  Structure per w-bit group:

  * one-hot select as an exact-bf16 MXU matmul: combo residues are stored
    as 6-bit digit planes (d0 rows; 64*d1 rows — integer < 2^6 times a
    power of two is bf16-exact), multiplied by a {0,1} one-hot matrix
    built from the group's window values;
  * a HWCD complete addition specialized for this workload: combo points
    are affine (Z2 = 1 — drops the D product), the curve constant d is
    folded into the stored T2 coordinate (C = T1 * (d*T2), no constant
    mul), a = -1 (aA = -A, so H = B + A), and combo residues carry the
    sigma / tau*c2 twists (poseidon_rns_pallas._mont_twisted_rows) so the
    round-1 Montgomery reduction skips its constant stage.  8 field muls
    in 2 stacked mont_reduces vs the generic path's 11 in 3.

Layout mirrors ops/poseidon_rns_pallas.py: residues on sublanes, batch on
lanes, the 4 accumulator coordinates lane-stacked as (2K, 4*B); constants
as (2K, 1) columns.  Bit-exact vs the XLA grouped path (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crypto_primitives_tpu.ops import rns
from crypto_primitives_tpu.ops.poseidon_rns_pallas import _mont_twisted_rows
from crypto_primitives_tpu.ops.rns import DELTA1, DELTA2, DIGIT, K

DEFAULT_BLOCK = 512


def pack_combos_from_subsets(curve, groups) -> np.ndarray:
    """Host precompute: explicit per-group combo points -> kernel layout.

    groups: list of lists, each 2^w host affine points (groups[g][e] is
    the point selected when the group's window value is e).  Returns
    (G, 2*2K, 4*2^w) float32 — per group, rows are the combo residues'
    6-bit digit planes (d0; 64*d1), columns are coord-major
    [X2 | Y2 | d*T2 | s2] x 2^w combos, residues sigma-twisted (base 1)
    and tau*c2-twisted (base 2)."""
    assert curve.a == curve.base.p - 1, "kernel specialized for a = -1"
    p = curve.base.p
    plan = rns.build_plan(p)
    K = plan.k  # plan geometry (legacy 24, or a big mid-red plan's k)
    G = len(groups)
    ew = len(groups[0])
    d = curve.d
    out = np.zeros((G, 2 * 2 * K, 4 * ew), np.float32)
    for g, subset in enumerate(groups):
        assert len(subset) == ew
        for e, (x, y) in enumerate(subset):
            vals = (x, y, d * x % p * y % p, (x + y) % p)
            for c, v in enumerate(vals):
                rows = _mont_twisted_rows(plan, v, p)  # (2K,) twisted Mont
                r64 = rows.astype(np.int64)
                d1, d0 = np.divmod(r64, 1 << DIGIT)
                col = c * ew + e
                out[g, : 2 * K, col] = d0
                out[g, 2 * K :, col] = 64.0 * d1
    return out


def pack_combos_kernel(curve, pts, w: int = 4) -> np.ndarray:
    """Subset-sum grouped tables (see pack_combos_from_subsets): pts are
    padded to a multiple of w with the identity; groups[g][e] =
    sum_{i: e>>i & 1} pts[g*w + i] — the SAME grouping as the XLA table
    (curve_rns.subset_groups), so kernel and XLA paths select identical
    points."""
    from crypto_primitives_tpu.ops.curve_rns import subset_groups

    return pack_combos_from_subsets(curve, subset_groups(curve, pts, w))


@functools.cache
def _msm_consts(plan: rns.RNSPlan, curve):
    """Column constants: the 12-row vec of poseidon_rns_pallas plus the
    sub offsets and the Montgomery-one residues for the identity init."""

    K = plan.k

    def col(a):
        return np.asarray(a, np.float32).reshape(-1, 1)

    def pad2k(a):
        return np.concatenate([np.asarray(a, np.float32), np.zeros(K, np.float32)])

    p = plan.p

    def twisted_offset(kp: int, extra_m: int) -> np.ndarray:
        off1 = [(kp % int(m)) + extra_m * int(m) for m in plan.m1]
        off2 = [
            ((kp % int(m)) * int(t)) % int(m) + extra_m * int(m)
            for m, t in zip(plan.m2, plan.tau)
        ]
        return np.asarray(off1 + off2, np.float32)

    one_rows = _plain_mont_rows(plan, 1, p)
    vec = np.stack(
        [
            col(np.concatenate([plan.inv_m1, plan.inv_m2])),
            col(np.concatenate([plan.m1, plan.m2]).astype(np.float32)),
            col(pad2k(plan.inv_m1)),
            col(pad2k(plan.m1.astype(np.float32))),
            col(pad2k(plan.inv_m2)),
            col(pad2k(plan.m2.astype(np.float32))),
            col(pad2k(plan.c_sigma)),
            col(pad2k(plan.p2)),
            col(pad2k(plan.c2)),
            col(pad2k(plan.negM1)),
            col(pad2k(plan.negM2)),
            col(pad2k(plan.p2c2)),
            col(twisted_offset(6 * p, 4)),  # offE: E = S - A - B + 6p
            col(twisted_offset(3 * p, 2)),  # offF: F = D - C + 3p
            col(one_rows),  # Montgomery one (plain twisted storage)
        ]
    )
    return vec, np.asarray(plan.ext1_w, np.float32), np.asarray(plan.ext2_w, np.float32)


def _plain_mont_rows(plan: rns.RNSPlan, v: int, p: int) -> np.ndarray:
    """Montgomery-form residues in the PLAIN storage convention (base 1
    untwisted, base 2 tau-twisted) — accumulator format."""
    vm = int(v) % p * plan.M1 % p
    r1 = [vm % int(m) for m in plan.m1]
    r2 = [(vm * int(t)) % int(m) for m, t in zip(plan.m2, plan.tau)]
    return np.asarray(r1 + r2, dtype=np.float32)


def _make_msm_kernel(plan: rns.RNSPlan, G: int, w: int, ablate: str = None,
                     n_par: int = 1):
    """ablate (timing-only stubs, results WRONG — tools/ablate_msm.py):
    'select' skips the one-hot table matmul, 'reduce' replaces the two
    Montgomery reductions with a linear stub, 'addition' skips the HWCD
    addition entirely (accumulator = selected point).

    n_par > 1 runs that many group-strided partial accumulators
    side-by-side on lanes (caller merges them with te_add_rns): the
    serial dependent-add chain shrinks from G to G/n_par iterations and
    every VPU/MXU op widens by n_par, attacking the issue-latency bound
    tools/ablate_msm.py measures at small batch (G must be a multiple of
    n_par; accumulator j owns groups [j*G/n_par, (j+1)*G/n_par))."""
    f32 = jnp.float32
    K = plan.k  # plan geometry
    mid_red = plan.mid_red
    EW = 1 << w
    assert G % n_par == 0, (G, n_par)
    SG = G // n_par  # groups per accumulator
    P = n_par

    def kernel(combos_ref, e1w_ref, e2w_ref, vec_ref, idx_ref, out_ref):
        v = vec_ref[...]
        inv_all, m_all = v[0], v[1]
        inv1, m1 = v[2, :K], v[3, :K]
        inv2, m2 = v[4, :K], v[5, :K]
        c_sigma = v[6, :K]
        c2 = v[8, :K]
        negM1, negM2 = v[9, :K], v[10, :K]
        p2c2 = v[11, :K]
        offE, offF = v[12], v[13]
        one_col = v[14]
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

        def mont_reduce(wv, s1_ready):
            if ablate == "reduce":
                return red(wv[:K] + wv[K:], inv1, m1).repeat(2, axis=0)[: 2 * K]
            if s1_ready:
                s1 = wv[:K]
            else:
                s1 = red(wv[:K] * c_sigma, inv1, m1)
            qh = ext(s1, e1w, negM1, inv2, m2, DELTA1)
            if s1_ready:
                om_pre = wv[K:] + qh * p2c2
            else:
                om_pre = wv[K:] * c2 + qh * p2c2
            om = red(om_pre, inv2, m2)
            r1 = ext(om, e2w, negM2, inv1, m1, DELTA2)
            return jnp.concatenate([r1, om], axis=0)

        B4 = out_ref.shape[1]
        B = B4 // 4  # effective batch = P * block_b
        Bb = B // P  # block_b
        zero = jnp.zeros((2 * K, B), f32)
        one_b = jnp.broadcast_to(one_col, (2 * K, B))
        acc0 = jnp.concatenate([zero, one_b, zero, one_b], axis=1)

        # one-hot row map for the select matmul over the (4*P*EW, 4B)
        # one-hot: row r = c*(P*EW) + j*EW + e activates the lanes of
        # coordinate block c, accumulator j, window value e; lane
        # l = c*(P*Bb) + j*Bb + b
        RR = 4 * P * EW
        rows_e = jax.lax.broadcasted_iota(jnp.int32, (RR, 4 * B), 0) % EW
        rows_j = (
            jax.lax.broadcasted_iota(jnp.int32, (RR, 4 * B), 0) // EW
        ) % P
        rows_c = jax.lax.broadcasted_iota(jnp.int32, (RR, 4 * B), 0) // (
            P * EW
        )
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (RR, 4 * B), 1) // B
        lane_j = (
            jax.lax.broadcasted_iota(jnp.int32, (RR, 4 * B), 1) % B
        ) // Bb

        def body(i, acc):
            if ablate == "select":
                sel = acc + jnp.float32(i)  # skip the table matmul
            else:
                # accumulator j consumes group j*S + i this iteration
                idx_parts = [
                    idx_ref[pl.ds(j * SG + i, 1), :] for j in range(P)
                ]
                idxP = jnp.concatenate(idx_parts, axis=1)  # (1, P*Bb)
                idx4 = jnp.concatenate([idxP] * 4, axis=1)  # (1, 4B)
                cgs = [combos_ref[j * SG + i] for j in range(P)]
                # columns c-major across accumulators to match the lanes
                cg = jnp.concatenate(
                    [
                        cgs[j][:, c * EW : (c + 1) * EW]
                        for c in range(4)
                        for j in range(P)
                    ],
                    axis=1,
                )  # (4K, 4*P*EW)
                onehot = jnp.where(
                    (rows_e == idx4) & (rows_c == lane_c)
                    & (rows_j == lane_j),
                    f32(1.0),
                    f32(0.0),
                )
                so = jax.lax.dot(cg, onehot, preferred_element_type=f32)
                sel = so[: 2 * K] + so[2 * K :]  # (2K, 4B) twisted residues
            if ablate == "addition":
                return red(acc + sel, inv_all, m_all)  # skip the HWCD add
            # round 1: [X1|Y1|T1|s1] * [X2|Y2|dT2|s2] -> [A|B|C|S]
            X1, Y1 = acc[:, :B], acc[:, B : 2 * B]
            s1 = red(X1 + Y1, inv_all, m_all)
            lhs = jnp.concatenate([acc[:, : 3 * B], s1], axis=1)
            r1v = mont_reduce(red(lhs * sel, inv_all, m_all), True)
            A = r1v[:, :B]
            Bv = r1v[:, B : 2 * B]
            C = r1v[:, 2 * B : 3 * B]
            S = r1v[:, 3 * B :]
            D = acc[:, 3 * B :]  # Z1 (Z2 = 1)
            E = red(S + (offE - A - Bv), inv_all, m_all)
            F = red(D + (offF - C), inv_all, m_all)
            Gv = red(D + C, inv_all, m_all)
            H = red(Bv + A, inv_all, m_all)  # a = -1: H = B - aA = B + A
            # round 3: X3=E*F, Y3=G*H, T3=E*H, Z3=F*G
            lhs3 = jnp.concatenate([E, Gv, E, F], axis=1)
            rhs3 = jnp.concatenate([F, H, H, Gv], axis=1)
            return mont_reduce(red(lhs3 * rhs3, inv_all, m_all), False)

        out_ref[...] = jax.lax.fori_loop(0, SG, body, acc0)

    return kernel


@functools.lru_cache(maxsize=32)
def _build_grouped_msm(curve, G: int, w: int, block_b: int, interpret: bool,
                       ablate: str = None, n_par: int = 1):
    plan = rns.build_plan(curve.base.p)
    K = plan.k
    vec, e1w, e2w = _msm_consts(plan, curve)
    kernel = _make_msm_kernel(plan, G, w, ablate, n_par)
    P = n_par

    @jax.jit
    def run(combos, idx):
        # combos (G, 4K, 4*2^w) f32; idx (B, G) int32 -> (B, 4, 2K) f32
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
                pl.BlockSpec((G, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (2 * K, 4 * P * block_b), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((2 * K, 4 * P * Bp), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(combos, jnp.asarray(e1w), jnp.asarray(e2w), jnp.asarray(vec), idx_t)
        # per block: lanes are [coord c][accumulator j][element b]
        nb = Bp // block_b
        o = out.reshape(2 * K, nb, 4, P, block_b)
        o = jnp.moveaxis(o, 0, -1)  # (nb, 4, P, block_b, 2K)
        o = o.transpose(2, 0, 3, 1, 4).reshape(P, Bp, 4, 2 * K)
        if P == 1:
            return o[0, :B]
        # merge the group-strided partial accumulators (log tree)
        from crypto_primitives_tpu.ops.curve_rns import te_add_rns

        parts = o
        n = P
        while n > 1:
            half = n // 2
            parts = jnp.concatenate(
                [
                    te_add_rns(curve, parts[:half], parts[half : 2 * half]),
                    parts[2 * half : n],
                ],
                axis=0,
            )
            n = half + (n - 2 * half)
        return parts[0, :B]

    return run


def grouped_msm_pallas(
    curve,
    combos: jnp.ndarray,
    bits: jnp.ndarray,
    w: int,
    block_b: int = DEFAULT_BLOCK,
    interpret: bool = False,
    ablate: str = None,
    n_par: int = 0,
) -> jnp.ndarray:
    """sum_j bits[..., j] * table[j] over a pack_combos_kernel table.

    bits (..., N) uint8 (zero-padded to G*w internally); returns extended
    points (..., 4, 2K) in the plain accumulator convention (same as
    ops/curve_rns.py, value bound 3p) — interchangeable with
    te_conditional_sum_grouped_rns output.

    n_par: partial-accumulator width (0 = auto = 1).  Runs n_par
    group-strided accumulators side-by-side on lanes, padded with
    identity groups and tree-merged (te_add_rns) after the kernel.
    K-delta measurement on the chip (tools/ablate_msm.py) showed the
    kernel already at ~90% of its op-inventory roofline at n_par=1 —
    single-call wall time at small B is per-call dispatch overhead, not
    kernel time — so auto stays 1; the option remains for future
    topologies."""
    G = combos.shape[0]
    batch = bits.shape[:-1]
    n = bits.shape[-1]
    flatb = bits.reshape(-1, n)
    blockb = min(block_b, max(8, flatb.shape[0]))
    if n_par == 0:
        n_par = 1
    S = -(-G // n_par)
    Gp = n_par * S
    if Gp > G:
        combos = jnp.concatenate(
            [
                combos,
                jnp.broadcast_to(
                    jnp.asarray(_identity_group(curve, w)),
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
    run = _build_grouped_msm(
        curve, Gp, w, blockb, interpret, ablate, n_par
    )
    out = run(combos, idx)
    k = rns.build_plan(curve.base.p).k
    return out.reshape(batch + (4, 2 * k))


@functools.lru_cache(maxsize=16)
def _identity_group(curve, w: int) -> np.ndarray:
    """One all-identity combo group (pads G up to a multiple of n_par;
    adding the identity is exact under the complete law)."""
    return pack_combos_from_subsets(curve, [[(0, 1)] * (1 << w)])[0]
