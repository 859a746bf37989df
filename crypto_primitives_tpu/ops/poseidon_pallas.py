"""Fused Pallas TPU kernel for the Poseidon permutation.

Why: the XLA path (models/sponge/poseidon.py `permute`) materializes every
field-mul intermediate to HBM (~50 MB per multiplication at B=8192), making
it bandwidth-bound at ~1.4e5 perm/s.  This kernel keeps the entire
(rounds x muls) pipeline in VMEM with the batch riding the 128-lane axis.

Two multiplication paths:
  * **constant x variable** (the MDS application, and the n'/p products
    inside every Montgomery reduction): the whole digit-convolution
    including cross-element accumulation is ONE exact bf16 matmul against a
    precomputed base-256 convolution matrix of the constant (entries < 256
    are bf16-exact; f32 accumulators stay < 2^23) — this moves ~80% of the
    limb arithmetic onto the MXU;
  * **variable x variable** (s-box squaring chains): uint32 VPU schoolbook
    products, anti-diagonal accumulation via two byte-plane bf16 matmuls
    against a fixed 0/1 band matrix.

Carries are log-depth Kogge-Stone prefix scans along the sublane axis.
Montgomery form and round scheduling are bit-identical to the XLA path
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

from crypto_primitives_tpu.ops.field import LIMB_BITS, LIMB_MASK, _band_matrix, _int_to_limbs

DEFAULT_BLOCK = 256  # batch lanes per grid step


def _digits8(x: int, n: int) -> np.ndarray:
    return np.array([(x >> (8 * i)) & 0xFF for i in range(n)], dtype=np.float32)


def _const_conv_matrix(c: int, in_digits: int, out_digits: int) -> np.ndarray:
    """Base-256 convolution matrix of the constant ``c``:
    (M @ s8)[r] = sum_v c_digit[r-v] * s8[v]."""
    cd = _digits8(c, out_digits)  # enough digits
    M = np.zeros((out_digits, in_digits), dtype=np.float32)
    for v in range(in_digits):
        for d in range(out_digits - v):
            M[v + d, v] = cd[d]
    return M


def _make_kernel(spec, config):
    """Build (kernel, consts arrays) for a (field, PoseidonConfig) pair."""
    L = spec.num_limbs
    D8 = 2 * L  # base-256 digits per element
    t = config.t
    alpha = config.alpha
    rf2 = config.full_rounds // 2
    R_P = config.partial_rounds
    p_int = spec.p

    # ---- constant matrices (bf16-exact entries < 256) ----
    # whole-MDS: (t*(2D8+1), t*D8), block (i, j) = conv matrix of mds[i][j]
    mds_mont = [[spec.to_mont(v) for v in row] for row in config.mds]
    OD = 2 * D8 + 1
    mds_m8 = np.zeros((t * OD, t * D8), dtype=np.float32)
    for i in range(t):
        for j in range(t):
            mds_m8[i * OD : (i + 1) * OD, j * D8 : (j + 1) * D8] = _const_conv_matrix(
                mds_mont[i][j], D8, OD
            )
    nprime_m8 = _const_conv_matrix(spec.n_prime, D8, D8)  # mod R truncation
    p_m8 = _const_conv_matrix(p_int, D8, OD)
    band_m2t = _band_matrix(L).T.astype(np.float32)  # (2L+1, 2L^2)

    # small uint32 constants: [p, 2p] for conditional subtraction (L+1 rows)
    psub_np = np.zeros((2, L + 1, 1), dtype=np.uint32)
    psub_np[0, :, 0] = _int_to_limbs(p_int, L + 1)
    psub_np[1, :, 0] = _int_to_limbs(p_int << 1, L + 1)

    ark_np = np.asarray(spec.pack(config.ark)).reshape(
        config.full_rounds + R_P, t * L, 1
    )

    consts = dict(
        ark=ark_np,
        mds_m8=mds_m8,
        nprime_m8=nprime_m8,
        p_m8=p_m8,
        band=band_m2t,
        psub=psub_np,
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

    def split8_bf16(x16):
        """Canonical 16-bit digits (R, B) u32 -> interleaved 8-bit digits
        (2R, B) bf16 (d0_lo, d0_hi, d1_lo, ...)."""
        lo = x16 & 0xFF
        hi = (x16 >> 8) & 0xFF
        s = jnp.stack([lo, hi], axis=1)  # (R, 2, B)
        s = s.reshape(2 * x16.shape[0], x16.shape[-1])
        return to_f32(s).astype(jnp.bfloat16)

    def from8(acc8_f32, out_rows16):
        """Base-256 f32 digits (R8, B) -> relaxed base-2^16 u32 (out16, B)."""
        a = acc8_f32.astype(jnp.int32).astype(jnp.uint32)
        R8 = a.shape[0]
        if R8 % 2 == 1:
            a = jnp.concatenate(
                [a, jnp.zeros((1,) + a.shape[1:], jnp.uint32)], axis=0
            )
        # avoid strided slicing (mosaic lowers it as gather): reshape pairs
        ar = a.reshape(a.shape[0] // 2, 2, a.shape[-1])
        out = ar[:, 0, :] + (ar[:, 1, :] << 8)
        return out[:out_rows16]

    def const_mul_acc(M8, s16, out_rows16):
        """(constant conv-matrix) x s16 -> relaxed base-2^16 digits."""
        s8 = split8_bf16(s16)
        acc8 = jax.lax.dot(
            M8, s8, preferred_element_type=jnp.float32
        )  # exact: terms < 2^16, <=96 of them
        return from8(acc8, out_rows16)

    def kernel(ark_ref, band_ref, mdsm_ref, npm_ref, pm_ref, psub_ref, state_ref, out_ref):
        band = band_ref[...]
        mdsm = mdsm_ref[...]
        npm = npm_ref[...]
        pm = pm_ref[...]
        psub_c = [psub_ref[0], psub_ref[1]]

        def sb_acc(a, b):
            """Variable x variable schoolbook: (L,B)x(L,B) -> relaxed (2L+1,B)."""
            prod = a[:, None, :] * b[None, :, :]  # (L, L, B) u32 exact
            lo = prod & LIMB_MASK
            hi = prod >> LIMB_BITS
            B = a.shape[-1]
            v = jnp.concatenate([lo.reshape(L * L, B), hi.reshape(L * L, B)], axis=0)
            v0 = to_f32(v & 0xFF).astype(jnp.bfloat16)
            v1 = to_f32(v >> 8).astype(jnp.bfloat16)
            a0 = jax.lax.dot(band, v0, preferred_element_type=jnp.float32)
            a1 = jax.lax.dot(band, v1, preferred_element_type=jnp.float32)
            return (a0.astype(jnp.int32) + (a1.astype(jnp.int32) << 8)).astype(jnp.uint32)

        def mont_reduce(acc, num_products):
            t_low = carry(acc, L)
            m = carry(const_mul_acc(npm, t_low, L), L)
            mp = const_mul_acc(pm, m, 2 * L + 1)
            if acc.shape[0] < 2 * L + 1:
                acc = jnp.concatenate(
                    [acc, jnp.zeros((2 * L + 1 - acc.shape[0],) + acc.shape[1:], jnp.uint32)],
                    axis=0,
                )
            u = carry(acc + mp, 2 * L + 1)[L:]
            max_mult = num_products // 2 + 1
            j = max(max_mult.bit_length() - 1, 0)
            while j >= 0:
                u = cond_sub(u, psub_c[j])
                j -= 1
            return u[:L]

        def mont_mul(a, b):
            return mont_reduce(sb_acc(a, b), 1)

        def add_mod(x, y):
            return cond_sub(carry(x + y, L), psub_c[0][:L])

        def sbox(x):
            bits = bin(alpha)[2:]
            acc = x
            for bchar in bits[1:]:
                acc = mont_mul(acc, acc)
                if bchar == "1":
                    acc = mont_mul(acc, x)
            return acc

        def round_fn(elems, r, full):
            ark_row = ark_ref[r]  # (t*L, 1)
            elems = tuple(
                add_mod(e, jnp.broadcast_to(ark_row[i * L : (i + 1) * L], e.shape))
                for i, e in enumerate(elems)
            )
            if full:
                elems = tuple(sbox(e) for e in elems)
            else:
                elems = (sbox(elems[0]),) + elems[1:]
            # whole-MDS as one constant matmul over the concatenated state
            s_all = jnp.concatenate(list(elems), axis=0)  # (t*L, B)
            acc8 = jax.lax.dot(
                mdsm, split8_bf16(s_all), preferred_element_type=jnp.float32
            )  # (t*(2D8+1), B)
            new = []
            for i in range(t):
                acc16 = from8(acc8[i * OD : (i + 1) * OD], 2 * L + 1)
                new.append(mont_reduce(acc16, t))
            return tuple(new)

        st = state_ref[...]
        elems = tuple(st[i * L : (i + 1) * L, :] for i in range(t))

        def full_body(r, elems):
            return round_fn(elems, r, True)

        def partial_body(r, elems):
            return round_fn(elems, r, False)

        elems = jax.lax.fori_loop(0, rf2, full_body, elems)
        elems = jax.lax.fori_loop(rf2, rf2 + R_P, partial_body, elems)
        elems = jax.lax.fori_loop(rf2 + R_P, config.full_rounds + R_P, full_body, elems)
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
                full_spec(consts["ark"]),
                full_spec(consts["band"]),
                full_spec(consts["mds_m8"]),
                full_spec(consts["nprime_m8"]),
                full_spec(consts["p_m8"]),
                full_spec(consts["psub"]),
                pl.BlockSpec((t * L, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (t * L, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((t * L, Bp), jnp.uint32),
            interpret=interpret,
        )(
            jnp.asarray(consts["ark"]),
            jnp.asarray(consts["band"], dtype=jnp.bfloat16),
            jnp.asarray(consts["mds_m8"], dtype=jnp.bfloat16),
            jnp.asarray(consts["nprime_m8"], dtype=jnp.bfloat16),
            jnp.asarray(consts["p_m8"], dtype=jnp.bfloat16),
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
