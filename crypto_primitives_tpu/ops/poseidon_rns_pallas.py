"""Fused Pallas TPU kernel for the Poseidon permutation over RNS residues.

v5 of the Poseidon compute path (see PERFORMANCE.md for the lineage).  The
v4 limb kernel is VPU-issue-bound at ~1.1M lane-ops/permutation; this
kernel represents field elements in the RNS-Montgomery system of
ops/rns.py (2x24 eleven-bit prime residues, f32 arithmetic) where a field
multiplication costs ~1.3k lane-ops plus two small exact-bf16 MXU matmuls
(the Kawamura base extensions), for a ~2.5x lower VPU op count.

State layout: (t * 2K, B) float32 in VMEM — per element, rows 0:K are
base-1 residues, rows K:2K are tau-twisted base-2 residues, all lazy in
[0, 2m).  The whole permutation (all rounds, s-boxes, MDS) runs in VMEM;
round scheduling is bit-identical to the XLA path / host oracle
(reference semantics: crypto-primitives/src/sponge/poseidon/mod.rs:98-121):
ark[r] is added before the round-r s-box (folded into the previous
round's MDS reduction), full MDS every round.

MDS and ark constants are stored as plain (non-Montgomery) residues so
the linear layer needs no Montgomery reduction — products are reduced
per-residue only (Barrett), keeping Montgomery form intact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crypto_primitives_tpu.ops import rns
from crypto_primitives_tpu.ops.rns import DELTA1, DELTA2, DIGIT, K, LAM_SHIFT

DEFAULT_BLOCK = 1024


def _mont_twisted_rows(
    plan: rns.RNSPlan, v: int, p: int, twisted: bool = False
) -> np.ndarray:
    """Montgomery-form constant as kernel MDS rows: B1 sigma-pre-twisted
    (sqrt-sigma in the v6.6 twisted domain, where the state carries the
    other sqrt factor), B2 tau*c2-pre-twisted (s1_ready/c2_ready format)."""
    vm = int(v) % p * plan.M1 % p
    c2i = plan.c2.astype(np.int64)
    b1_twist = plan.sqrt_sigma if twisted else plan.c_sigma
    r1 = [
        (vm * int(sg)) % int(m)
        for m, sg in zip(plan.m1, b1_twist.astype(np.int64))
    ]
    r2 = [
        (vm * int(tw) % int(m)) * int(cc) % int(m)
        for m, tw, cc in zip(plan.m2, plan.tau, c2i)
    ]
    return np.asarray(r1 + r2, dtype=np.float32)


def _plan_consts(plan: rns.RNSPlan, config, sched=None, twisted=False):
    """Precompute all kernel constant arrays for (field plan, poseidon cfg).

    With `sched` (a poseidon_sparse.SparseSchedule), additionally emits the
    sparse-partial-round tables: sp_tab[r] = [m00, v_hat.., w..] rows for
    sparse partial round r, mds_pre for full round rf2-1, dense_tab for the
    dense partial rounds, and folds-based ark tables."""
    K = plan.k  # shadow the module default: all shapes follow the plan
    t = config.t
    p = plan.p
    col = lambda a: np.asarray(a, dtype=np.float32).reshape(-1, 1)
    # stacked per-base vectors over 2K rows
    inv_all = col(np.concatenate([plan.inv_m1, plan.inv_m2]))
    m_all = col(np.concatenate([plan.m1, plan.m2]))
    ones = np.ones((K, 1), dtype=np.float32)
    consts = dict(
        inv_all=inv_all,
        m_all=m_all,
        inv1=col(plan.inv_m1),
        m1=col(plan.m1.astype(np.float32)),
        inv2=col(plan.inv_m2),
        m2=col(plan.m2.astype(np.float32)),
        c_sigma=col(plan.c_sigma),
        p2=col(plan.p2),
        c2=col(plan.c2),
        p2c2=col(plan.p2c2),
        negM1=col(plan.negM1),
        # twisted domain: ext2 emits sqrt-sigma-twisted B1 rows directly
        negM2=col(plan.negM2s if twisted else plan.negM2),
        sqrt_sigma=col(plan.sqrt_sigma) if twisted else ones,
        inv_sqrt=col(plan.inv_sqrt_sigma) if twisted else ones,
        ext1_w=plan.ext1_w,  # (2K+3, 2K)
        ext2_w=plan.ext2s_w if twisted else plan.ext2_w,
    )
    def rns_rows(v: int) -> np.ndarray:
        """Both-base residue rows: B1 plain (sqrt-sigma-twisted in the
        twisted domain), B2 tau-twisted."""
        if twisted:
            r1 = [
                (v * int(sq)) % int(m)
                for m, sq in zip(plan.m1, plan.sqrt_sigma.astype(np.int64))
            ]
        else:
            r1 = [v % int(m) for m in plan.m1]
        r2 = [(v * int(tw)) % int(m) for m, tw in zip(plan.m2, plan.tau)]
        return np.asarray(r1 + r2, dtype=np.float32)

    # MDS in Montgomery form.  B1 rows additionally carry the sigma twist:
    # products mds*state then accumulate w1*sigma directly, so mont_reduce
    # skips its s1 const-mul (s1_ready).  B2 rows carry tau*c2 (v6.4): the
    # products arrive pre-multiplied by c2, so mont_reduce's omega stage
    # skips its w2*c2 const-mul too (c2_ready).
    def mat_rows(mat) -> np.ndarray:
        out = np.zeros((t, t, 2 * K, 1), dtype=np.float32)
        for i in range(t):
            for j in range(t):
                out[i, j, :, 0] = _mont_twisted_rows(
                    plan, int(mat[i][j]), p, twisted
                )
        return out

    consts["mds"] = mat_rows(config.mds)
    # ark rounds 1.. fold into the omega reduction of the MDS mont_reduce:
    # only tau-twisted B2 residues are needed (ext2 re-extends to B1).
    # Row r holds the round-r fold vector (naive: ark[r+1]; sparse
    # schedule: sched.folds[r]); last row zero.  ark0 applied at entry.
    R_T = config.full_rounds + config.partial_rounds
    fold_vecs = (
        sched.folds
        if sched is not None
        else [list(config.ark[r + 1]) for r in range(R_T - 1)] + [[0] * t]
    )
    arkf = np.zeros((R_T, t * K, 1), dtype=np.float32)
    for r in range(R_T):
        for i in range(t):
            a = int(fold_vecs[r][i]) % p * plan.M1 % p
            arkf[r, i * K : (i + 1) * K, 0] = [
                (a * int(tw)) % int(m) for m, tw in zip(plan.m2, plan.tau)
            ]
    ark0 = np.zeros((t * 2 * K, 1), dtype=np.float32)
    for i in range(t):
        ark0[i * 2 * K : (i + 1) * 2 * K, 0] = rns_rows(
            int(config.ark[0][i]) * plan.M1 % p
        )
    consts["arkf"] = arkf
    consts["ark0"] = ark0
    if sched is not None:
        R_P = config.partial_rounds
        # sp_tab[r] = [m00; v_hat_1..v_hat_{t-1}; w_1..w_{t-1}] twisted
        # Montgomery rows; zero at dense slots (never read there)
        sp_tab = np.zeros((R_P, 2 * t - 1, 2 * K, 1), dtype=np.float32)
        for r in range(R_P):
            if not sched.is_sparse[r]:
                continue
            sp_tab[r, 0, :, 0] = _mont_twisted_rows(
                plan, sched.sp_m00[r], p, twisted
            )
            for j in range(t - 1):
                sp_tab[r, 1 + j, :, 0] = _mont_twisted_rows(
                    plan, sched.sp_v[r][j], p, twisted
                )
                sp_tab[r, t + j, :, 0] = _mont_twisted_rows(
                    plan, sched.sp_w[r][j], p, twisted
                )
        consts["sp_tab"] = sp_tab
        consts["mds_pre"] = mat_rows(sched.pre_full)
        dense_slots = sorted(sched.dense_mats)
        consts["dense_slot_of"] = {i: n for n, i in enumerate(dense_slots)}
        consts["dense_tab"] = (
            np.stack([mat_rows(sched.dense_mats[i]) for i in dense_slots])
            if dense_slots
            else np.zeros((1, t, t, 2 * K, 1), dtype=np.float32)
        )
    return consts


def _make_kernel(plan: rns.RNSPlan, config, ablate: str = "", sched=None,
                 twisted: bool = False):
    # ablate: dev-only timing knob (tools/ablate_rns.py) — "nomxu" stubs the
    # extension matmuls, "nored" the recombine reductions, "nosbox"/"nomds"
    # whole stages.  Produces WRONG results; never set in production paths.
    # sched: optional poseidon_sparse.SparseSchedule (v6.5) — partial rounds
    # run sparse-factorized MDS layers (2t-1 products, identity part folded
    # as a value addend into the Montgomery reduction).
    K = plan.k  # plan geometry (legacy 24, or the big mid-red plans' k)
    mid_red = plan.mid_red
    t = config.t
    alpha = config.alpha
    rf2 = config.full_rounds // 2
    R_P = config.partial_rounds
    R_T = config.full_rounds + R_P
    consts = _plan_consts(plan, config, sched, twisted)
    f32 = jnp.float32

    def kernel(ark0_ref, arkf_ref, mds_ref, e1w_ref, e2w_ref, vec_ref, *rest_refs):
        if sched is not None:
            sp_tab_ref, mds_pre_ref, dense_tab_ref, state_ref, out_ref = rest_refs
        else:
            state_ref, out_ref = rest_refs
        # v6: the t state elements ride the LANE axis stacked side by side —
        # one (2K, t*B) array instead of a t-tuple of (2K, B).  Every
        # mont_reduce (sbox chains in full rounds, the whole MDS output) then
        # issues t-x-wider, t-x-fewer MXU matmuls; per-element access (MDS
        # products, partial-round s-box) is aligned lane slicing.
        # vec_ref packs the per-base column constants as (12, 2K, 1)
        v = vec_ref[...]
        inv_all, m_all = v[0], v[1]
        inv1, m1 = v[2, :K], v[3, :K]
        inv2, m2 = v[4, :K], v[5, :K]
        c_sigma = v[6, :K]
        p2, c2 = v[7, :K], v[8, :K]
        negM1, negM2 = v[9, :K], v[10, :K]
        p2c2 = v[11, :K]
        sqrt_sigma, inv_sqrt = v[12, :K], v[13, :K]
        e1w = e1w_ref[...]
        e2w = e2w_ref[...]

        def red(w, inv, m):
            q = jnp.floor(w * inv)
            return w - q * m

        def ext(s, W, negM, inv, m, delta):
            """No-mid-red recombine (rns._ext_matrix): the 4096*S2 plane is
            folded into the U0/U1 weight blocks mod m, so
            X = U0 + 64*U1 + lam*negM stays < 2^24 (bound asserted in
            rns.build_plan) and only the final Barrett red remains.  Big
            (mid_red) plans carry raw U1 rows instead — the 64-fold would
            overflow the f32-exact budget at k > 24 — and Barrett-reduce
            U1 before the 64-scale recombine (rns._ext twin)."""
            d1 = jnp.floor(s * f32(2.0**-DIGIT))
            d0 = s - d1 * f32(1 << DIGIT)
            if "nomxu" in ablate:
                out = jnp.broadcast_to(d0[:1], (2 * K + 3, d0.shape[1]))
            elif "bf16cast" in ablate:
                x = jnp.concatenate([d0, d1], axis=0).astype(jnp.bfloat16)
                out = jax.lax.dot(
                    W.astype(jnp.bfloat16), x, preferred_element_type=f32
                )
            else:
                # f32 operands straight into the MXU: digits < 2^7 and
                # weights < 2^8 (or small-int * 2^-LAM_SHIFT) are bf16-exact,
                # so the single bf16 pass Mosaic emits is exact and the VPU
                # skips a (2K, W) cast per extension
                x = jnp.concatenate([d0, d1], axis=0)
                out = jax.lax.dot(W, x, preferred_element_type=f32)
            U0, U1 = out[:K], out[K : 2 * K]
            L0, L1, L2 = out[2 * K : 2 * K + 1], out[2 * K + 1 : 2 * K + 2], out[2 * K + 2 :]
            lam = jnp.floor((L0 + L1) + L2 + f32(delta))  # scales folded in W
            if "nored" in ablate:
                return red(U0 + lam * negM, inv, m)
            if mid_red:
                U1 = f32(1 << DIGIT) * red(U1, inv, m)
            X = (U0 + U1) + lam * negM  # else U1's 64 scale folded in W
            return red(X, inv, m)

        def mont_reduce(w, ark2=None, s1_ready=False, c2_ready=False,
                        w1_lazy=False):
            """w: (2K, B) lazy residues of an integer < p*M1 (B2 rows
            tau^2-twisted) -> residues of W*M1^{-1} mod p, value < 3p.
            ark2 (tau-twisted B2 rows of a constant a < p) folds into the
            omega red; the result then represents W*M1^{-1} + a < 4p.
            s1_ready: w[:K] already carries the sigma twist (pre-twisted
            constants), skipping the s1 const-mul.
            c2_ready: w[K:] already carries the c2 twist (tau*c2-twisted
            MDS constants), skipping the omega-stage const-mul.
            w1_lazy: w is a pair-grouped accumulation < (2m-1)*m (odd-width
            MDS rows): one Barrett red before the ext1 digit split; the
            lazy B2 half is safe (bound asserted in rns.build_plan)."""
            if s1_ready or "nosig" in ablate:
                s1 = red(w[:K], inv1, m1) if w1_lazy else w[:K]
            else:
                s1 = red(w[:K] * c_sigma, inv1, m1)
            qh = ext(s1, e1w, negM1, inv2, m2, DELTA1)
            # merged t0/omega: (w2 + qh*p2)*c2 = w2*c2 + qh*(p2*c2 mod m);
            # bound 2*(2m-1)*(m-1) + ark < 2^24, exact (see rns.mont_reduce_np)
            if "nosig" in ablate:
                om_pre = w[K:] + qh * p2
            elif c2_ready:
                om_pre = w[K:] + qh * p2c2
            else:
                om_pre = w[K:] * c2 + qh * p2c2
            if ark2 is not None:
                om_pre = om_pre + ark2
            om = red(om_pre, inv2, m2)
            r1 = ext(om, e2w, negM2, inv1, m1, DELTA2)
            return jnp.concatenate([r1, om], axis=0)

        def mont_mul(a, b):
            # twisted domain (v6.6): B1 operands carry sqrt-sigma, so the
            # reduced product IS the quotient coefficient — the c_sigma
            # mul + second Barrett red vanish (s1_ready), and ext2s emits
            # the result already twisted
            return mont_reduce(red(a * b, inv_all, m_all), s1_ready=twisted)

        def sbox(x):
            bits = bin(alpha)[2:]
            acc = x
            for bchar in bits[1:]:
                acc = mont_mul(acc, acc)
                if bchar == "1":
                    acc = mont_mul(acc, x)
            return acc

        def mds_ark(stk, r, mdsc):
            """MDS row dot (v6.4 pair-grouped lazy accumulation: a reduced
            acc plus TWO products stays < 2^24, so one Barrett per product
            pair; an odd trailing product is left lazy for mont_reduce's
            w1_lazy path) -> ONE stacked full Montgomery reduction (integer
            bound < 12p^2 < p*M1) with the round-r fold vector folded into
            its omega red.  MDS constants are sigma-pre-twisted in B1
            (s1_ready) and tau*c2-twisted in B2 (c2_ready)."""
            B = stk.shape[1] // t
            ark_next = arkf_ref[r]  # (t*K, 1) tau-twisted B2 rows
            accs = []
            w1_lazy = t % 2 == 1
            for i in range(t):
                prods = [
                    stk[:, j * B : (j + 1) * B] * mdsc[i, j] for j in range(t)
                ]
                acc = red(prods[0] + prods[1], inv_all, m_all)
                j = 2
                while j + 1 < t:
                    acc = red(acc + prods[j] + prods[j + 1], inv_all, m_all)
                    j += 2
                if j < t:  # odd trailing product: stays lazy
                    acc = acc + prods[j]
                accs.append(acc)
            w = jnp.concatenate(accs, axis=1)  # (2K, t*B)
            arow = jnp.concatenate(
                [
                    jnp.broadcast_to(ark_next[i * K : (i + 1) * K], (K, B))
                    for i in range(t)
                ],
                axis=1,
            )
            return mont_reduce(
                w, ark2=arow, s1_ready=True, c2_ready=True, w1_lazy=w1_lazy
            )

        def sparse_mds_ark(stk, r):
            """v6.5 sparse partial round (sched.is_sparse[r-rf2]):
            row 0 = m00*z + <v_hat, rest> (pair-grouped lazy as the dense
            path), rows 1.. = w_j*z raw lazy products; the identity
            contribution (rest itself) folds into the omega stage of the
            SAME stacked mont_reduce as a value ADDEND (rest's tau-twisted
            B2 rows ride the ark2 slot — ext2 re-extends the sum to both
            bases).  5 products instead of 9 at t=3; bounds asserted in
            rns.build_plan (variable-addend budget)."""
            B = stk.shape[1] // t
            z = stk[:, :B]  # already sboxed by round_fn
            rest = stk[:, B:]
            sp = sp_tab_ref[r - rf2]  # (2t-1, 2K, 1)
            prods = [z * sp[0]] + [
                rest[:, j * B : (j + 1) * B] * sp[1 + j] for j in range(t - 1)
            ]
            acc = red(prods[0] + prods[1], inv_all, m_all)
            j = 2
            while j + 1 < t:
                acc = red(acc + prods[j] + prods[j + 1], inv_all, m_all)
                j += 2
            if j < t:
                acc = acc + prods[j]
            rows = [z * sp[t + j] for j in range(t - 1)]  # raw lazy
            w = jnp.concatenate([acc] + rows, axis=1)  # (2K, t*B)
            ark_next = arkf_ref[r]
            arow0 = jnp.broadcast_to(ark_next[0:K], (K, B))
            arows = [
                jnp.broadcast_to(ark_next[(1 + j) * K : (2 + j) * K], (K, B))
                + rest[K:, j * B : (j + 1) * B]
                for j in range(t - 1)
            ]
            addend = jnp.concatenate([arow0] + arows, axis=1)
            return mont_reduce(
                w, ark2=addend, s1_ready=True, c2_ready=True, w1_lazy=True
            )

        def round_fn(stk, r, full, mdsc=None, sparse=False):
            if "nosbox" not in ablate:
                if full:
                    stk = sbox(stk)
                else:
                    B = stk.shape[1] // t
                    stk = jnp.concatenate(
                        [sbox(stk[:, :B]), stk[:, B:]], axis=1
                    )
            if "nomds" in ablate:
                return red(stk + f32(1.0), inv_all, m_all)
            if sparse:
                return sparse_mds_ark(stk, r)
            return mds_ark(stk, r, mdsc if mdsc is not None else mds_ref[...])

        st = state_ref[...]
        stk = jnp.concatenate(
            [st[i * 2 * K : (i + 1) * 2 * K] for i in range(t)], axis=1
        )  # (2K, t*B) lane-stacked elements
        ark0 = ark0_ref[...]
        B0 = st.shape[1]
        ark0_stk = jnp.concatenate(
            [
                jnp.broadcast_to(ark0[i * 2 * K : (i + 1) * 2 * K], (2 * K, B0))
                for i in range(t)
            ],
            axis=1,
        )
        if twisted:
            # enter the sqrt-sigma domain: twist the B1 rows of every
            # element (ark0's B1 rows are pre-twisted), one mul folded
            # into the entry reduction
            stk = red(
                jnp.concatenate(
                    [stk[:K] * sqrt_sigma, stk[K:]], axis=0
                )
                + ark0_stk,
                inv_all,
                m_all,
            )
        else:
            stk = red(stk + ark0_stk, inv_all, m_all)
        if sched is None:
            mdsc = mds_ref[...]
            stk = jax.lax.fori_loop(
                0, rf2, lambda r, s: round_fn(s, r, True, mdsc), stk
            )
            stk = jax.lax.fori_loop(
                rf2, rf2 + R_P, lambda r, s: round_fn(s, r, False, mdsc), stk
            )
        else:
            mdsc = mds_ref[...]
            stk = jax.lax.fori_loop(
                0, rf2 - 1, lambda r, s: round_fn(s, r, True, mdsc), stk
            )
            # last full round before the segment: merged pre matrix
            stk = round_fn(stk, rf2 - 1, True, mds_pre_ref[...])
            # partial segment: python-level run structure (static)
            i = 0
            while i < R_P:
                if sched.is_sparse[i]:
                    L = 0
                    while i + L < R_P and sched.is_sparse[i + L]:
                        L += 1
                    stk = jax.lax.fori_loop(
                        rf2 + i,
                        rf2 + i + L,
                        lambda r, s: round_fn(s, r, False, sparse=True),
                        stk,
                    )
                    i += L
                else:
                    slot = consts["dense_slot_of"][i]
                    stk = round_fn(stk, rf2 + i, False, dense_tab_ref[slot])
                    i += 1
        stk = jax.lax.fori_loop(
            rf2 + R_P, R_T, lambda r, s: round_fn(s, r, True, mdsc), stk
        )
        if twisted:
            # leave the sqrt-sigma domain: untwist B1 rows so the external
            # RNS representation is unchanged
            stk = jnp.concatenate(
                [red(stk[:K] * inv_sqrt, inv1, m1), stk[K:]], axis=0
            )
        out_ref[...] = jnp.concatenate(
            [stk[:, i * B0 : (i + 1) * B0] for i in range(t)], axis=0
        )

    return kernel, consts


def max_sparse_run_len(plan: rns.RNSPlan, config) -> int:
    """Value-bound gate for the v6.5 sparse partial rounds.

    Element values grow ~2p per sparse round (the identity part rides the
    mont_reduce omega addend un-re-reduced: out <= W/M1 + 2p + addend),
    and every row-dot integer bound must stay under the p*M1 reduction
    domain.  Exact integer simulation of the growth; returns the longest
    admissible run length (0 = sparse path unusable for this config)."""
    p, M1 = plan.p, plan.M1
    t = config.t
    zs = 3 * p  # post-sbox element 0 (mont_mul chain output < 3p)

    def ok(L: int) -> bool:
        V = 4 * p  # elements 1.. entering the run (dense round output + fold)
        for i in range(L):
            # sparse round: row-0 dot (t products, consts < p, elem0 < 4p)
            if 4 * p * p + (t - 1) * p * V >= p * M1:
                return False
            V = (3 * p * p) // M1 + 2 * p + V + (p if i == L - 1 else 0)
        # run-ending dense round re-reduces everything: full dot bound
        return p * (zs + (t - 1) * V) < p * M1

    L = 0
    while L < 256 and ok(L + 1):
        L += 1
    return L


def _sparse_schedule(plan: rns.RNSPlan, config):
    """Build the v6.5 schedule, or None if the config can't use it."""
    from crypto_primitives_tpu.ops import poseidon_sparse

    if config.partial_rounds < 3:
        return None
    L = max_sparse_run_len(plan, config)
    if L < 2:
        return None
    try:
        return poseidon_sparse.build_sparse_schedule(config, L)
    except ZeroDivisionError:  # singular Mhat during factorization
        return None


@functools.cache
def _build_rns_permute(
    plan: rns.RNSPlan, config, block_b: int, interpret: bool, ablate: str = "",
    sparse: bool = False, twisted: bool = False,
):
    K = plan.k  # plan geometry (see _make_kernel)
    t = config.t
    sched = _sparse_schedule(plan, config) if sparse else None
    kernel, consts = _make_kernel(plan, config, ablate, sched, twisted)

    # pack the column constants into one (14, 2K, 1) array; base-1-only
    # vectors sit in rows :K with zero padding
    def pad2k(a):
        out = np.zeros((2 * K, 1), dtype=np.float32)
        out[: a.shape[0]] = a
        return out

    vec_np = np.stack(
        [
            consts["inv_all"],
            consts["m_all"],
            pad2k(consts["inv1"]),
            pad2k(consts["m1"]),
            pad2k(consts["inv2"]),
            pad2k(consts["m2"]),
            pad2k(consts["c_sigma"]),
            pad2k(consts["p2"]),
            pad2k(consts["c2"]),
            pad2k(consts["negM1"]),
            pad2k(consts["negM2"]),
            pad2k(consts["p2c2"]),
            pad2k(consts["sqrt_sigma"]),
            pad2k(consts["inv_sqrt"]),
        ]
    )

    @jax.jit
    def run(state):  # (B, t, 2K) f32 residues
        B = state.shape[0]
        pad = (-B) % block_b
        if pad:
            state = jnp.concatenate(
                [state, jnp.zeros((pad, t, 2 * K), jnp.float32)], axis=0
            )
        Bp = B + pad
        st = state.reshape(Bp, t * 2 * K).T

        def full_spec(arr):
            return pl.BlockSpec(
                arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
            )

        const_arrays = [
            consts["ark0"],
            consts["arkf"],
            consts["mds"],
            consts["ext1_w"],
            consts["ext2_w"],
            vec_np,
        ]
        if sched is not None:
            const_arrays += [
                consts["sp_tab"],
                consts["mds_pre"],
                consts["dense_tab"],
            ]
        out = pl.pallas_call(
            kernel,
            grid=(Bp // block_b,),
            in_specs=[full_spec(a) for a in const_arrays]
            + [
                pl.BlockSpec(
                    (t * 2 * K, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (t * 2 * K, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((t * 2 * K, Bp), jnp.float32),
            # v5e has 128 MiB VMEM; the conservative 16 MiB scoped default
            # rejects larger blocks (more temporaries since the v6.4
            # pair-grouped MDS).  64 MiB leaves double-buffering headroom.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
                # batch blocks are independent: let Mosaic overlap them
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(*[jnp.asarray(a) for a in const_arrays], st)
        return out.T.reshape(Bp, t, 2 * K)[:B]

    return run


# module default for the v6.5 sparse partial rounds; flipped once real-TPU
# measurement confirms the win (bench.py / tools/bench_rns_kernel.py probe
# both explicitly)
SPARSE_DEFAULT = False


def permute_rns(plan, config, state, block_b: int = DEFAULT_BLOCK,
                interpret: bool = False, sparse=None, twisted=None):
    """Poseidon permutation on RNS-resident state (B, t, 2K) float32.

    twisted (v6.6): run the rounds in the sqrt-sigma-twisted B1 domain
    (entry/exit twists keep the external representation unchanged).
    Defaults on whenever the plan carries sqrt_sigma (a SIGMA_QR_BASES
    field); CPT_DISABLE_SIGMA_TWIST=1 forces the untwisted path."""
    if sparse is None:
        sparse = SPARSE_DEFAULT
    if twisted is None:
        import os

        twisted = plan.sqrt_sigma is not None and not os.environ.get(
            "CPT_DISABLE_SIGMA_TWIST"
        )
    return _build_rns_permute(
        plan, config, block_b, interpret, sparse=sparse, twisted=twisted
    )(state)
