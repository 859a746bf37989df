"""Fused Pallas TPU kernel for the Poseidon permutation.

Why: the XLA path (models/sponge/poseidon.py `permute`) materializes every
field-mul intermediate to HBM (~50 MB per multiplication at B=8192), making
it bandwidth-bound at ~1.4e5 perm/s.  This kernel keeps the entire
(rounds x muls) pipeline in VMEM with the batch riding the 128-lane axis.

Design (v4, after ablation-driven tuning — see PERFORMANCE.md):
  * **constant x variable** multiplications (the whole MDS application and
    the n'/p products inside every Montgomery reduction) are single exact
    bf16 matmuls against precomputed base-256 convolution matrices of the
    constants.  Digit layouts are PLANE-ORDERED and baked into the matrix
    column/row permutations (columns: [lo-plane | hi-plane | ...] of the
    16-bit digits; rows: [even 8-digits | odd 8-digits]) so the kernel
    never interleaves sublanes — splits and recombines are plain slices.
  * the n' matmul consumes the RELAXED schoolbook accumulator directly
    (3 byte planes); digit-index truncation of the convolution matrix is
    exact mod R, so the t_low carry chain is eliminated entirely.
  * ark constants are folded into the MDS reduction pre-reduce (adding
    ark_mont * R in accumulator digits), eliminating standalone
    add-mod carry chains; round 0's ark is applied once before the loop.
  * **variable x variable** (s-box squaring chains): uint32 VPU schoolbook
    products, anti-diagonal accumulation as a pure-VPU chain of padded row
    adds (measured faster than MXU band matmuls, whose per-call overhead
    dominated); squarings use upper-triangle products with doubled
    off-diagonal terms.
  * carries/borrows are log-depth Kogge-Stone prefix scans on sublanes.

Montgomery form and round scheduling remain bit-identical to the XLA path
(src/sponge/poseidon/mod.rs:98-121 semantics); parity is enforced against
the host oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crypto_primitives_tpu.ops.field import LIMB_BITS, LIMB_MASK, _int_to_limbs

DEFAULT_BLOCK = 256  # batch lanes per grid step


def _digits8(x: int, n: int) -> np.ndarray:
    return np.array([(x >> (8 * i)) & 0xFF for i in range(n)], dtype=np.float32)


def _conv_matrix_po(c: int, in_rows16: int, in_planes: int, out_rows16: int) -> np.ndarray:
    """Plane-ordered base-256 convolution matrix of constant ``c``.

    Input columns: plane-major — column (p * in_rows16 + i) holds the byte
    at 8-digit position (2i + p) of a 16-bit-digit operand.
    Output rows: [even 8-digits (2k) x out_rows16 | odd 8-digits (2k+1) x
    out_rows16]; the caller recombines 16-bit digits as even + (odd << 8).
    Output truncated at 8-digit (2*out_rows16 - 1).
    """
    out8 = 2 * out_rows16
    cd = _digits8(c, out8)
    M8 = np.zeros((out8, in_planes * in_rows16), dtype=np.float32)
    for p in range(in_planes):
        for i in range(in_rows16):
            v = 2 * i + p  # 8-digit position of this column
            col = p * in_rows16 + i
            for d in range(out8 - v):
                M8[v + d, col] = cd[d]
    # row permutation: evens then odds
    perm = list(range(0, out8, 2)) + list(range(1, out8, 2))
    return M8[perm]


def _make_kernel(spec, config):
    """Build (kernel, consts arrays) for a (field, PoseidonConfig) pair."""
    L = spec.num_limbs
    t = config.t
    alpha = config.alpha
    rf2 = config.full_rounds // 2
    R_P = config.partial_rounds
    R_T = config.full_rounds + R_P
    p_int = spec.p
    OUT16 = 2 * L + 1  # result rows per element

    # ---- constant matrices (bf16-exact entries < 256) ----
    mds_mont = [[spec.to_mont(v) for v in row] for row in config.mds]
    # whole-MDS: rows = t blocks of [even OUT16 | odd OUT16], cols = blocks
    # of 2-plane canonical state digits.  f32 accumulation is exact only up
    # to 2^24, so the contraction is CHUNKED at <= 8 input elements
    # (8 * 2L * 255^2 < 2^24); chunk outputs are summed in uint32.
    MDS_CHUNK = max(1, (1 << 24) // (2 * L * 255 * 255))
    mds_chunks = [list(range(s, min(s + MDS_CHUNK, t))) for s in range(0, t, MDS_CHUNK)]
    mds_ms = []
    for chunk in mds_chunks:
        m = np.zeros((t * 2 * OUT16, len(chunk) * 2 * L), dtype=np.float32)
        for i in range(t):
            for cj, j in enumerate(chunk):
                m[
                    i * 2 * OUT16 : (i + 1) * 2 * OUT16,
                    cj * 2 * L : (cj + 1) * 2 * L,
                ] = _conv_matrix_po(mds_mont[i][j], L, 2, OUT16)
        mds_ms.append(m)
    # pad chunk matrices to a common width so they share one kernel input
    maxw = max(m.shape[1] for m in mds_ms)
    mds_m = np.zeros((len(mds_ms), t * 2 * OUT16, maxw), dtype=np.float32)
    for k, m in enumerate(mds_ms):
        mds_m[k, :, : m.shape[1]] = m
    # with >1 chunk (or t near the bound) the combined 8-digit values can
    # overflow the uint32 16-bit recombine; insert a compression pass then
    NEEDS_COMPRESS = len(mds_chunks) > 1 or t * 2 * L * 255 * 255 >= (1 << 24)
    # n' matmul: consumes 4-plane RELAXED accumulator rows 0..L-1 (digits up
    # to 2^31 from the MDS path); output truncated at 8-digit 2L-1 == mod R
    # (exact; discarded high-position terms are multiples of R)
    nprime_m = _conv_matrix_po(spec.n_prime, L, 4, L)
    # p matmul: canonical m (2 planes) -> full product digits
    p_m = _conv_matrix_po(p_int, L, 2, OUT16)

    # small uint32 constants: p<<j for conditional subtraction (L+1 rows);
    # 4p needed for wide-rate MDS reductions (u < ~(t/2+2) p)
    psub_np = np.zeros((3, L + 1, 1), dtype=np.uint32)
    psub_np[0, :, 0] = _int_to_limbs(p_int, L + 1)
    psub_np[1, :, 0] = _int_to_limbs(p_int << 1, L + 1)
    psub_np[2, :, 0] = _int_to_limbs(p_int << 2, L + 1)

    # ark tables: round-0 ark as canonical Montgomery limbs for the pre-add;
    # rounds 1..R-1 folded into the previous round's MDS accumulator as the
    # 16-bit digits of (ark_mont * R) (low L digits are zero).  Row r of the
    # fold table holds ark[r+1] (last row zero).
    ark0_np = np.asarray(spec.pack([config.ark[0]])).reshape(t * L, 1)
    ark_fold_np = np.zeros((R_T, t * OUT16, 1), dtype=np.uint32)
    for r in range(R_T - 1):
        for i in range(t):
            y = spec.to_mont(config.ark[r + 1][i]) << (16 * L)  # ark_mont * R
            for d in range(OUT16):
                ark_fold_np[r, i * OUT16 + d, 0] = (y >> (16 * d)) & LIMB_MASK

    consts = dict(
        ark0=ark0_np, ark_fold=ark_fold_np, mds_m=mds_m, nprime_m=nprime_m,
        p_m=p_m, psub=psub_np,
    )

    def shift_up(x, s):
        if s == 0:
            return x
        return jnp.concatenate(
            [jnp.zeros((s,) + x.shape[1:], dtype=x.dtype), x[: x.shape[0] - s]], axis=0
        )

    def _mask01(cond):
        return jnp.where(cond, jnp.uint32(1), jnp.uint32(0))

    def prefix_carry(g, p):
        K = g.shape[0]
        s = 1
        while s < K:
            g = g | (p & shift_up(g, s))
            p = p & shift_up(p, s)
            s *= 2
        return g

    def carry(acc, out_rows):
        """Relaxed base-2^16 digits (K, B) u32 -> canonical (out_rows, B)."""
        K = acc.shape[0]
        if K > out_rows:
            acc = acc[:out_rows]
        elif K < out_rows:
            acc = jnp.concatenate(
                [acc, jnp.zeros((out_rows - K,) + acc.shape[1:], jnp.uint32)], axis=0
            )
        acc = (acc & LIMB_MASK) + shift_up(acc >> LIMB_BITS, 1)
        acc = (acc & LIMB_MASK) + shift_up(acc >> LIMB_BITS, 1)
        g = _mask01(acc > LIMB_MASK)
        p = _mask01(acc == LIMB_MASK)
        ci = shift_up(prefix_carry(g, p), 1)
        return (acc + ci) & LIMB_MASK

    def sub_limbs(a, c):
        g = _mask01(a < c)
        p = _mask01(a == c)
        bo = prefix_carry(g, p)
        return (a - c - shift_up(bo, 1)) & LIMB_MASK, bo[-1:]

    def cond_sub(u, c):
        d, borrow = sub_limbs(u, c)
        return jnp.where(borrow != 0, u, d)

    def to_f32(x_u32):
        return x_u32.astype(jnp.int32).astype(jnp.float32)

    def to_bf16(x_u32):
        return to_f32(x_u32).astype(jnp.bfloat16)

    def kernel(ark0_ref, arkf_ref, mdsm_ref, npm_ref, pm_ref,
               psub_ref, state_ref, out_ref):
        mdsm = mdsm_ref[...]
        npm = npm_ref[...]
        pm = pm_ref[...]
        psub_c = [psub_ref[0], psub_ref[1], psub_ref[2]]

        def planes2(x16):
            """Canonical 16-bit digits -> 2 plane-ordered byte planes (bf16)."""
            return to_bf16(jnp.concatenate([x16 & 0xFF, x16 >> 8], axis=0))

        def combine(acc8_f32, rows16):
            """[even | odd] f32 rows -> relaxed 16-bit u32 digits."""
            a = acc8_f32.astype(jnp.int32)
            return (a[:rows16] + (a[rows16 : 2 * rows16] << 8)).astype(jnp.uint32)

        def _padded(x, before, after, B):
            parts = []
            if before:
                parts.append(jnp.zeros((before, B), jnp.uint32))
            parts.append(x)
            if after:
                parts.append(jnp.zeros((after, B), jnp.uint32))
            return jnp.concatenate(parts, axis=0) if len(parts) > 1 else x

        def sb_acc(a, b):
            """Variable x variable schoolbook: (L,B)x(L,B) -> relaxed (2L+1,B).

            Anti-diagonal accumulation is a pure-VPU chain of padded row adds
            — measured faster than the earlier byte-plane MXU band matmuls,
            whose per-call overhead dominated (PERFORMANCE.md ablations).
            Each digit accumulates <= 2L values < 2^16 -> < 2^21, exact u32.
            """
            B = a.shape[-1]
            prod = a[:, None, :] * b[None, :, :]  # (L, L, B) u32 exact
            lo = prod & LIMB_MASK
            hi = prod >> LIMB_BITS
            acc = None
            for i in range(L):
                r = _padded(lo[i], i, L + 1 - i, B) + _padded(hi[i], i + 1, L - i, B)
                acc = r if acc is None else acc + r
            return acc

        def sq_acc(a):
            """Squaring schoolbook: upper-triangle products, off-diagonal
            terms doubled by a shift — roughly halves the products and adds."""
            B = a.shape[-1]
            acc = None
            for i in range(L):
                row = a[i : i + 1] * a[i:]  # (L - i, B): a_i * a_j for j >= i
                lo = row & LIMB_MASK
                hi = row >> LIMB_BITS
                # double the j > i terms (they appear twice in the square)
                dbl_lo = jnp.concatenate([lo[:1], lo[1:] << 1], axis=0) if L - i > 1 else lo
                dbl_hi = jnp.concatenate([hi[:1], hi[1:] << 1], axis=0) if L - i > 1 else hi
                r = _padded(dbl_lo, 2 * i, L - i + 1, B) + _padded(
                    dbl_hi, 2 * i + 1, L - i, B
                )
                acc = r if acc is None else acc + r
            return acc

        def mont_reduce(acc, num_products):
            """acc: (2L+1, B) relaxed (digits < 2^31).  The n' product
            consumes the relaxed digits directly (4 byte planes;
            digit-truncation is exact mod R), so no pre-carry is needed."""
            a16 = acc[:L]
            rel4 = to_bf16(
                jnp.concatenate(
                    [a16 & 0xFF, (a16 >> 8) & 0xFF, (a16 >> 16) & 0xFF, a16 >> 24],
                    axis=0,
                )
            )
            m8 = jax.lax.dot(npm, rel4, preferred_element_type=jnp.float32)
            m = carry(combine(m8, L), L)  # canonical m (mod R)
            mp8 = jax.lax.dot(pm, planes2(m), preferred_element_type=jnp.float32)
            mp = combine(mp8, OUT16)
            u = carry(acc + mp, OUT16)[L:]  # (L+1, B)
            max_mult = num_products // 2 + 1
            j = max(max_mult.bit_length() - 1, 0)
            while j >= 0:
                u = cond_sub(u, psub_c[j])
                j -= 1
            return u[:L]

        def mont_mul(a, b):
            return mont_reduce(sb_acc(a, b), 1)

        def mont_sqr(a):
            return mont_reduce(sq_acc(a), 1)

        def add_mod(x, y):
            return cond_sub(carry(x + y, L), psub_c[0][:L])

        def sbox(x):
            bits = bin(alpha)[2:]
            acc = x
            for bchar in bits[1:]:
                acc = mont_sqr(acc)
                if bchar == "1":
                    acc = mont_mul(acc, x)
            return acc

        def round_fn(elems, r, full):
            """elems enter with this round's ark already included (folded by
            the previous round's MDS reduce / the round-0 pre-add)."""
            if full:
                elems = tuple(sbox(e) for e in elems)
            else:
                elems = (sbox(elems[0]),) + elems[1:]
            # chunked whole-MDS matmuls, uint-summed in the 8-digit domain
            B = elems[0].shape[-1]
            acc8u = None
            for k, chunk in enumerate(mds_chunks):
                sp = jnp.concatenate([planes2(elems[j]) for j in chunk], axis=0)
                if sp.shape[0] < mdsm.shape[-1]:
                    sp = jnp.concatenate(
                        [sp, jnp.zeros((mdsm.shape[-1] - sp.shape[0], B), sp.dtype)],
                        axis=0,
                    )
                part = jax.lax.dot(
                    mdsm[k], sp, preferred_element_type=jnp.float32
                ).astype(jnp.int32)
                acc8u = part if acc8u is None else acc8u + part
            acc8u = acc8u.astype(jnp.uint32)
            ark_next = arkf_ref[r]  # (t*OUT16, 1): digits of ark[r+1]*R
            new = []
            for i in range(t):
                blk = acc8u[i * 2 * OUT16 : (i + 1) * 2 * OUT16]
                e8, o8 = blk[:OUT16], blk[OUT16:]
                if NEEDS_COMPRESS:
                    # one 8-digit compression pass (permuted even/odd order)
                    e8, o8 = (
                        (e8 & 0xFF) + shift_up(o8 >> 8, 1),
                        (o8 & 0xFF) + (e8 >> 8),
                    )
                acc16 = e8 + (o8 << 8)
                acc16 = acc16 + jnp.broadcast_to(
                    ark_next[i * OUT16 : (i + 1) * OUT16], acc16.shape
                )
                new.append(mont_reduce(acc16, t + 1))
            return tuple(new)

        st = state_ref[...]
        elems = tuple(st[i * L : (i + 1) * L, :] for i in range(t))
        # round-0 ark pre-add
        ark0 = ark0_ref[...]
        elems = tuple(
            add_mod(e, jnp.broadcast_to(ark0[i * L : (i + 1) * L], e.shape))
            for i, e in enumerate(elems)
        )

        def full_body(r, elems):
            return round_fn(elems, r, True)

        def partial_body(r, elems):
            return round_fn(elems, r, False)

        elems = jax.lax.fori_loop(0, rf2, full_body, elems)
        elems = jax.lax.fori_loop(rf2, rf2 + R_P, partial_body, elems)
        elems = jax.lax.fori_loop(rf2 + R_P, R_T, full_body, elems)
        out_ref[...] = jnp.concatenate(list(elems), axis=0)

    return kernel, consts


@functools.cache
def _build_pallas_permute(spec, config, block_b: int, interpret: bool):
    L = spec.num_limbs
    t = config.t
    kernel, consts = _make_kernel(spec, config)

    @jax.jit
    def run(state):  # state (B, t, L) uint32 Montgomery
        B = state.shape[0]
        pad = (-B) % block_b
        if pad:
            state = jnp.concatenate([state, jnp.zeros((pad, t, L), jnp.uint32)], axis=0)
        Bp = B + pad
        st = state.reshape(Bp, t * L).T  # (t*L, Bp)

        def full_spec(arr):
            return pl.BlockSpec(
                arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
            )

        out = pl.pallas_call(
            kernel,
            grid=(Bp // block_b,),
            in_specs=[
                full_spec(consts["ark0"]),
                full_spec(consts["ark_fold"]),
                full_spec(consts["mds_m"]),
                full_spec(consts["nprime_m"]),
                full_spec(consts["p_m"]),
                full_spec(consts["psub"]),
                pl.BlockSpec((t * L, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (t * L, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((t * L, Bp), jnp.uint32),
            interpret=interpret,
        )(
            jnp.asarray(consts["ark0"]),
            jnp.asarray(consts["ark_fold"]),
            jnp.asarray(consts["mds_m"], dtype=jnp.bfloat16),
            jnp.asarray(consts["nprime_m"], dtype=jnp.bfloat16),
            jnp.asarray(consts["p_m"], dtype=jnp.bfloat16),
            jnp.asarray(consts["psub"]),
            st,
        )
        res = out.T.reshape(Bp, t, L)
        return res[:B]

    return run


def permute_pallas(spec, config, state: jnp.ndarray, block_b: int = DEFAULT_BLOCK,
                   interpret: bool = False) -> jnp.ndarray:
    """Poseidon permutation via the fused kernel.

    state: (B, t, L) uint32 Montgomery.  Set ``interpret=True`` to run the
    kernel in interpreter mode off-TPU (slow; for correctness tests).
    """
    return _build_pallas_permute(spec, config, block_b, interpret)(state)
