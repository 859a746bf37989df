"""Limbed prime-field arithmetic for TPU.

This is the layer the reference gets for free from ``ark-ff`` (see
/root/reference/crypto-primitives/Cargo.toml:20-24 — ``ark-ff`` provides
``PrimeField``/Montgomery backends) and that a TPU-native build must provide
itself.  Design (SURVEY.md §7A): field elements are fixed-limb little-endian
arrays of 16-bit digits held in ``uint32`` lanes, so that

  * a 16x16-bit limb product fits exactly in a uint32 (no overflow, no int64),
  * schoolbook accumulation of up to ~2^9 such half-products stays < 2^32,
  * the batch axis (thousands of independent field elements) rides the VPU
    lanes, and limb index rides the sublanes.

Elements on device are kept in **Montgomery form** (R = 2^(16*L)), matching
arkworks' `MontBackend` semantics so that digests/bytes are bit-compatible:
``into_bigint()`` of arkworks == ``from_mont`` here.

Two tiers:
  * Host tier: Python-int helpers on :class:`FieldSpec` (exact, arbitrary
    precision) used for setup-time computation and as the test oracle —
    mirroring the reference's cross-model testing strategy
    (/root/reference/crypto-primitives/src/sponge/poseidon/tests.rs:68-240).
  * Device tier: pure jnp functions (`add`, `sub`, `mont_mul`, `mont_dot`,
    `pow_const`, `inv`, ...) over uint32 limb arrays, fully vectorized over
    arbitrary leading batch dimensions, jit/scan/shard_map-compatible.

No data-dependent control flow anywhere: carries are fixed-length unrolled
chains; conditional subtraction is branchless select.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def _int_to_limbs(x: int, num_limbs: int) -> np.ndarray:
    out = np.zeros((num_limbs,), dtype=np.uint32)
    for i in range(num_limbs):
        out[i] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    if x >> (LIMB_BITS * num_limbs):
        raise ValueError("integer does not fit in limbs")
    return out


def _limbs_to_int(limbs: Sequence[int]) -> int:
    x = 0
    for i, l in enumerate(limbs):
        x |= int(l) << (LIMB_BITS * i)
    return x


class FieldSpec:
    """A prime field `F_p` with fixed limb layout and Montgomery constants.

    Mirrors the role of arkworks' `MontConfig` (e.g. the in-tree BLS12-381 Fr
    at /root/reference/crypto-primitives/src/sponge/test.rs:5-11).  Hashable by
    identity so it can be used as a static jit argument.
    """

    def __init__(self, name: str, modulus: int, generator: int | None = None):
        self.name = name
        self.p = modulus
        self.generator = generator
        self.nbits = modulus.bit_length()  # == arkworks MODULUS_BIT_SIZE
        # Number of 16-bit limbs; R = 2^(16 L).  For 249..255-bit moduli this
        # is 16 limbs -> R = 2^256, identical to arkworks' 4x64-bit layout.
        # The limb pipeline needs >= 1 spare bit above the modulus (add
        # computes a+b < 2p before the conditional subtract; the carry out
        # of limb L-1 would otherwise be dropped), so a modulus that
        # exactly fills its limbs — e.g. the 256-bit P-256 prime — gets one
        # extra limb.  arkworks instead relies on u64 add-with-carry.
        self.num_limbs = -(-self.nbits // LIMB_BITS)
        if self.nbits % LIMB_BITS == 0:
            self.num_limbs += 1
        L = self.num_limbs
        self.R = 1 << (LIMB_BITS * L)
        self.R_mod_p = self.R % modulus
        self.R2_mod_p = (self.R * self.R) % modulus
        # n0 = -p^{-1} mod 2^16 (per-digit Montgomery factor)
        self.n0 = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        # n' = -p^{-1} mod R (full-width Montgomery factor)
        self.n_prime = (-pow(modulus, -1, self.R)) % self.R
        # Serialized byte length of into_bigint().to_bytes_le() (full limbs)
        self.bigint_bytes = (L * LIMB_BITS) // 8
        # arkworks serialize_compressed size for Fp with no flags:
        # ceil(MODULUS_BIT_SIZE / 8)
        self.compressed_bytes = -(-self.nbits // 8)

        self.p_limbs = _int_to_limbs(modulus, L)
        self.r_limbs = _int_to_limbs(self.R_mod_p, L)
        self.r2_limbs = _int_to_limbs(self.R2_mod_p, L)
        self.n_prime_limbs = _int_to_limbs(self.n_prime, L)
        self.zero_limbs = np.zeros((L,), dtype=np.uint32)

    # -- identity hashing so the spec can be a static argument under jit --
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return f"FieldSpec({self.name}, {self.nbits} bits, {self.num_limbs} limbs)"

    # ---------------- host (python-int) tier ----------------

    def to_mont(self, x: int) -> int:
        return (x * self.R) % self.p

    def from_mont(self, x: int) -> int:
        return (x * pow(self.R, -1, self.p)) % self.p

    def inv(self, x: int) -> int:
        return pow(x, -1, self.p)

    def from_le_bytes_mod_order(self, b: bytes) -> int:
        """arkworks `F::from_le_bytes_mod_order` semantics."""
        return int.from_bytes(b, "little") % self.p

    def from_random_bytes(self, b: bytes):
        """arkworks `F::from_random_bytes` (EmptyFlags path): copy the bytes
        into the 64-bit-limb bigint buffer LE, mask the top limb down to
        MODULUS_BIT_SIZE bits (`last_limb_mask = u64::MAX >>
        (-MODULUS_BIT_SIZE mod 64)`), then reject if the masked integer is
        >= p.  NOTE the masking happens BEFORE the range check — a 32-byte
        digest with the top bit set is still accepted for a 255-bit modulus."""
        limbs64 = -(-self.nbits // 64)
        if len(b) > 8 * limbs64 + 1:
            b = b[: 8 * limbs64 + 1]
        v = int.from_bytes(b, "little") & ((1 << self.nbits) - 1)
        return v if v < self.p else None

    def to_bytes_le(self, x: int) -> bytes:
        """arkworks `into_bigint().to_bytes_le()` — full limb width."""
        return int(x).to_bytes(self.bigint_bytes, "little")

    def serialize_compressed(self, x: int) -> bytes:
        """arkworks `CanonicalSerialize::serialize_compressed` for Fp."""
        return int(x).to_bytes(self.compressed_bytes, "little")

    # ---------------- packing: host <-> device ----------------

    def pack(self, values, mont: bool = True) -> np.ndarray:
        """Pack python ints (nested lists OK) into a uint32 limb array.

        With ``mont=True`` (default) values are converted into Montgomery
        form first — device arrays always hold Montgomery representation.
        """
        arr = np.asarray(values, dtype=object)
        flat = arr.reshape(-1)
        out = np.zeros((flat.shape[0], self.num_limbs), dtype=np.uint32)
        for i, v in enumerate(flat):
            v = int(v) % self.p
            if mont:
                v = self.to_mont(v)
            out[i] = _int_to_limbs(v, self.num_limbs)
        return out.reshape(arr.shape + (self.num_limbs,))

    def unpack(self, limbs, mont: bool = True):
        """Inverse of :meth:`pack`; returns python ints (object ndarray)."""
        arr = np.asarray(limbs)
        assert arr.shape[-1] == self.num_limbs
        flat = arr.reshape(-1, self.num_limbs)
        out = np.empty((flat.shape[0],), dtype=object)
        for i in range(flat.shape[0]):
            v = _limbs_to_int(flat[i])
            if mont:
                v = self.from_mont(v)
            out[i] = v
        if arr.ndim == 1:
            return out[0]
        return out.reshape(arr.shape[:-1])


# ======================================================================
# Device tier: all functions take uint32 arrays of shape (..., L) in
# Montgomery form (unless noted) and are pure / jit-friendly.
# ======================================================================


def _consts(spec: FieldSpec):
    return (
        jnp.asarray(spec.p_limbs, dtype=jnp.uint32),
        jnp.asarray(spec.r_limbs, dtype=jnp.uint32),
        jnp.asarray(spec.r2_limbs, dtype=jnp.uint32),
    )


def zeros(spec: FieldSpec, shape=()) -> jnp.ndarray:
    return jnp.zeros(shape + (spec.num_limbs,), dtype=jnp.uint32)


def ones(spec: FieldSpec, shape=()) -> jnp.ndarray:
    """Montgomery representation of 1 (i.e. R mod p)."""
    one = jnp.asarray(spec.r_limbs, dtype=jnp.uint32)
    return jnp.broadcast_to(one, shape + (spec.num_limbs,))


def _shift_up(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Shift limbs toward higher indices by s (zero-fill), last axis."""
    if s == 0:
        return x
    pad = jnp.zeros(x.shape[:-1] + (s,), dtype=x.dtype)
    return jnp.concatenate([pad, x[..., : x.shape[-1] - s]], axis=-1)


def _prefix_carry(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Kogge–Stone parallel-prefix over the carry semigroup.

    g[..., i]: position i *generates* a carry; p[..., i]: it *propagates* one.
    Returns co with co[..., i] = carry out of position i (inclusive scan).
    Log-depth instead of a ripple chain — this is what keeps both XLA compile
    time and the TPU critical path short (SURVEY.md §7 hard-parts (1)).
    """
    K = g.shape[-1]
    s = 1
    while s < K:
        g = g | (p & _shift_up(g, s))
        p = p & _shift_up(p, s)
        s *= 2
    return g


def _carry_canon(acc: jnp.ndarray, out_limbs: int, return_carry: bool = False):
    """Collapse relaxed uint32 base-2^16 digits into canonical 16-bit limbs.

    ``acc``: (..., K), entries < 2^32.  Two compression passes bring digits
    to <= 2^16, then a log-depth prefix resolves the remaining single-bit
    ripple.  Any carry beyond ``out_limbs`` is dropped unless requested.
    """
    K = acc.shape[-1]
    if K < out_limbs:
        acc = jnp.concatenate(
            [acc, jnp.zeros(acc.shape[:-1] + (out_limbs - K,), dtype=jnp.uint32)],
            axis=-1,
        )
    elif K > out_limbs:
        # callers must not drop nonzero high digits implicitly
        acc = acc[..., :out_limbs]
    # pass 1: digits < 2^17
    acc = (acc & LIMB_MASK) + _shift_up(acc >> LIMB_BITS, 1)
    # pass 2: digits <= 2^16
    acc = (acc & LIMB_MASK) + _shift_up(acc >> LIMB_BITS, 1)
    g = acc > LIMB_MASK  # digit == 2^16 exactly
    p = acc == LIMB_MASK
    co = _prefix_carry(g, p)
    carry_in = _shift_up(co.astype(jnp.uint32), 1)
    out = (acc + carry_in) & LIMB_MASK
    if return_carry:
        return out, co[..., -1].astype(jnp.uint32)
    return out


def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray):
    """a - b over canonical limbs; returns (diff, borrow_out), borrow in {0,1}.

    Borrow resolution is the same log-depth prefix as addition.
    """
    g = a < b  # generates a borrow
    p = a == b  # propagates a borrow
    bo = _prefix_carry(g, p)
    borrow_in = _shift_up(bo.astype(jnp.uint32), 1)
    out = (a - b - borrow_in) & LIMB_MASK
    return out, bo[..., -1].astype(jnp.uint32)


def _geq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b over canonical limb arrays; returns bool (...,)."""
    _, borrow = _sub_limbs(a, b)
    return borrow == 0


def _cond_sub_p(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Branchless: a - p if a >= p else a (a < 2p, canonical limbs)."""
    p_limbs, _, _ = _consts(spec)
    d, borrow = _sub_limbs(a, p_limbs)
    keep = (borrow != 0)[..., None]
    return jnp.where(keep, a, d)


def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Modular addition (works identically for Montgomery or standard form).

    All supported fields have nbits <= 16L - 1, so a + b < 2^(16L) and no
    carry escapes the top limb.
    """
    a, b = jnp.broadcast_arrays(a, b)
    s = _carry_canon(a + b, spec.num_limbs)
    return _cond_sub_p(spec, s)


def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.broadcast_arrays(a, b)
    p_limbs, _, _ = _consts(spec)
    d, borrow = _sub_limbs(a, b)
    # if borrowed, add p back: d2 = d + p (mod 2^(16L)) is the right value
    dp = _carry_canon(d + p_limbs, spec.num_limbs)
    return jnp.where((borrow != 0)[..., None], dp, d)


def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return sub(spec, zeros(spec, a.shape[:-1]), a)


@functools.cache
def _band_matrix(L: int) -> np.ndarray:
    """Fixed anti-diagonal accumulation matrix for schoolbook products.

    Maps flattened (lo || hi) half-products of an LxL schoolbook onto 2L+1
    relaxed base-2^16 digits: digit k collects lo[i,j] with i+j == k and
    hi[i,j] with i+j == k-1.  Shape (2*L*L, 2L+1), f32 0/1 — the whole
    accumulation becomes ONE matmul, which XLA maps straight onto the MXU
    (f32 is exact here: every accumulated value < 2^21 < 2^24).
    """
    M = np.zeros((2 * L * L, 2 * L + 1), dtype=np.float32)
    for i in range(L):
        for j in range(L):
            M[i * L + j, i + j] = 1.0  # lo part
            M[L * L + i * L + j, i + j + 1] = 1.0  # hi part
    return M


def _schoolbook_acc(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Relaxed schoolbook product accumulator.

    a, b: (..., L) canonical 16-bit limbs.  Returns (..., 2L+1) uint32 relaxed
    digits (base 2^16) of a*b; each digit < 2L * 2^16 <= 2^21 for L=16.
    The anti-diagonal gather is a single f32 matmul against a fixed banded
    matrix (MXU-friendly; exact since values < 2^24).
    """
    L = a.shape[-1]
    prod = a[..., :, None] * b[..., None, :]  # (..., L, L) exact in uint32
    lo = (prod & LIMB_MASK).astype(jnp.float32)
    hi = (prod >> LIMB_BITS).astype(jnp.float32)
    v = jnp.concatenate(
        [lo.reshape(*prod.shape[:-2], L * L), hi.reshape(*prod.shape[:-2], L * L)],
        axis=-1,
    )
    M = jnp.asarray(_band_matrix(L))
    acc = jax.lax.dot_general(
        v,
        M,
        (((v.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # full-f32 passes: exact < 2^24
    )
    return acc.astype(jnp.uint32)


def _mul_mod_r(a: jnp.ndarray, b_limbs: jnp.ndarray) -> jnp.ndarray:
    """(a * b) mod R as canonical limbs; a canonical (..., L), b constant (L,)."""
    L = a.shape[-1]
    acc = _schoolbook_acc(a, jnp.broadcast_to(b_limbs, a.shape))
    return _carry_canon(acc, L)  # truncation to L limbs == mod R


def _mont_reduce(spec: FieldSpec, acc: jnp.ndarray, num_products: int = 1) -> jnp.ndarray:
    """Full-width Montgomery reduction of a relaxed (..., 2L+1) accumulator.

    Uses the single-shot formulation  m = (T mod R) * n' mod R,
    u = (T + m*p) / R  with n' = -p^{-1} mod R — three banded-matmul
    schoolbook products and log-depth carries, no sequential limb loop.

    ``num_products`` = number of schoolbook products summed into ``acc``
    (1 for a plain product, K for a K-term lazy dot): u < (K/2 + 1) * p,
    handled by descending power-of-two conditional subtractions.
    Returns canonical limbs of acc * R^{-1} mod p, fully reduced (< p).
    """
    L = spec.num_limbs
    p_limbs, _, _ = _consts(spec)
    t_low = _carry_canon(acc, L)  # T mod R, canonical
    m = _mul_mod_r(t_low, jnp.asarray(spec.n_prime_limbs))  # (..., L)
    mp = _schoolbook_acc(m, jnp.broadcast_to(p_limbs, m.shape))  # (..., 2L+1)
    K = acc.shape[-1]
    if K < 2 * L + 1:
        acc = jnp.concatenate(
            [acc, jnp.zeros(acc.shape[:-1] + (2 * L + 1 - K,), dtype=jnp.uint32)],
            axis=-1,
        )
    u_full = _carry_canon(acc + mp, 2 * L + 1)  # low L limbs are all zero
    u = u_full[..., L:]  # (..., L+1), u < (K/2 + 1) p
    max_mult = num_products // 2 + 1
    j = max(max_mult.bit_length() - 1, 0)
    while j >= 0:
        c = _int_to_limbs((spec.p << j), L + 1)
        d, borrow = _sub_limbs(u, jnp.asarray(c))
        u = jnp.where((borrow != 0)[..., None], u, d)
        j -= 1
    return u[..., :L]


def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p (both in Montgomery form -> result too)."""
    a, b = jnp.broadcast_arrays(a, b)
    return _mont_reduce(spec, _schoolbook_acc(a, b))


def mont_sqr(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


def mont_dot(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Sum_k a[...,k,:] * b[...,k,:] with a single Montgomery reduction.

    The accumulation of schoolbook digits across the contracted axis happens
    *before* reduction (lazy reduction), so a K-term dot costs one reduction
    instead of K.  This is the workhorse for Poseidon MDS application
    (SURVEY.md §3.3) and MSM bucket sums.  Requires K * 2L * 2^16 < 2^32,
    i.e. K <= 2^11 for L=16.
    """
    a, b = jnp.broadcast_arrays(a, b)
    if axis != -2:
        a = jnp.moveaxis(a, axis, -2)
        b = jnp.moveaxis(b, axis, -2)
    K = a.shape[-2]
    assert K * 2 * spec.num_limbs * (1 << LIMB_BITS) < (1 << 32), "dot too wide; split"
    acc = _schoolbook_acc(a, b)  # (..., K, 2L+1)
    acc = jnp.sum(acc, axis=-2, dtype=jnp.uint32)
    return _mont_reduce(spec, acc, num_products=K)


def to_mont_device(spec: FieldSpec, a_std: jnp.ndarray) -> jnp.ndarray:
    """Convert standard-form limbs -> Montgomery form on device (mul by R^2)."""
    _, _, r2 = _consts(spec)
    return mont_mul(spec, a_std, jnp.broadcast_to(r2, a_std.shape))


def from_mont_device(spec: FieldSpec, a_mont: jnp.ndarray) -> jnp.ndarray:
    """Montgomery -> standard form on device (Montgomery-reduce by 1)."""
    L = spec.num_limbs
    acc = jnp.concatenate(
        [a_mont, jnp.zeros(a_mont.shape[:-1] + (L + 1,), dtype=jnp.uint32)], axis=-1
    )
    return _mont_reduce(spec, acc)


def pow_const(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a *static* exponent, unrolled square-and-multiply (MSB-first).

    Used for the Poseidon S-box x^alpha
    (/root/reference/crypto-primitives/src/sponge/poseidon/mod.rs:66-77).
    """
    assert e >= 1
    bits = bin(e)[2:]
    acc = a
    for bit in bits[1:]:
        acc = mont_sqr(spec, acc)
        if bit == "1":
            acc = mont_mul(spec, acc, a)
    return acc


def pow_dynamic(spec: FieldSpec, base: jnp.ndarray, exp_limbs: jnp.ndarray) -> jnp.ndarray:
    """base^exp where exp is given as standard-form limbs (not Montgomery).

    LSB-first ladder via lax.scan over all 16L exponent bits (static length).
    """
    L = spec.num_limbs

    def body(carry, limb_and_bit):
        acc, b = carry
        bit = limb_and_bit
        acc = jnp.where((bit == 1)[..., None], mont_mul(spec, acc, b), acc)
        b = mont_sqr(spec, b)
        return (acc, b), None

    # Expand exponent to a (16L, ...) bit array
    bits = []
    for i in range(L):
        for j in range(LIMB_BITS):
            bits.append((exp_limbs[..., i] >> j) & 1)
    bits = jnp.stack(bits, axis=0)
    acc0 = ones(spec, base.shape[:-1])
    (acc, _), _ = jax.lax.scan(body, (acc0, base), bits)
    return acc


def inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Fermat inverse a^(p-2); returns 0 for input 0 (like arkworks' None->panic
    avoided: callers must ensure nonzero, mirroring `inverse().unwrap()`)."""
    e = spec.p - 2
    # scan over bits LSB-first with constant exponent bits baked in would
    # unroll; instead reuse pow_dynamic with packed exponent
    exp = jnp.asarray(_int_to_limbs(e, spec.num_limbs))
    exp = jnp.broadcast_to(exp, a.shape)
    return pow_dynamic(spec, a, exp)


def batch_inv(spec: FieldSpec, a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Montgomery batch inversion along ``axis`` (one `inv`, 3(n-1) muls).

    TPU-shaped replacement for arkworks' per-element `inverse()` at affine
    normalization moments (SURVEY.md §7 hard-parts (2)).
    """
    a = jnp.moveaxis(a, axis, 0)
    n = a.shape[0]

    def fwd(carry, x):
        nxt = mont_mul(spec, carry, x)
        return nxt, carry  # prefix products *excluding* x

    run, prefixes = jax.lax.scan(fwd, ones(spec, a.shape[1:-1]), a)
    total_inv = inv(spec, run)

    def bwd(carry, xp):
        x, prefix = xp
        out = mont_mul(spec, carry, prefix)
        carry = mont_mul(spec, carry, x)
        return carry, out

    _, outs = jax.lax.scan(bwd, total_inv, (a, prefixes), reverse=True)
    return jnp.moveaxis(outs, 0, axis)


def eq(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.broadcast_arrays(a, b)
    return jnp.all(a == b, axis=-1)


def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask ? a : b, with mask shaped (...,) broadcasting over the limb axis."""
    return jnp.where(mask[..., None], a, b)


def mul_small(spec: FieldSpec, a: jnp.ndarray, c: int) -> jnp.ndarray:
    """Multiply by a static integer constant (folded into Montgomery form)."""
    cm = spec.pack([c])[0]
    return mont_mul(spec, a, jnp.asarray(cm))


# ----------------------------------------------------------------------
# All public entry points are jit-compiled with the FieldSpec static:
# eager per-op dispatch is ~1000x slower than the fused XLA executable, and
# every higher layer composes these under its own jit anyway (nested jit is
# free).  The underlying python functions stay directly traceable.
# ----------------------------------------------------------------------
add = jax.jit(add, static_argnums=(0,))
sub = jax.jit(sub, static_argnums=(0,))
neg = jax.jit(neg, static_argnums=(0,))
mont_mul = jax.jit(mont_mul, static_argnums=(0,))
mont_sqr = jax.jit(mont_sqr, static_argnums=(0,))
mont_dot = jax.jit(mont_dot, static_argnums=(0,), static_argnames=("axis",))
to_mont_device = jax.jit(to_mont_device, static_argnums=(0,))
from_mont_device = jax.jit(from_mont_device, static_argnums=(0,))
pow_const = jax.jit(pow_const, static_argnums=(0, 2))
pow_dynamic = jax.jit(pow_dynamic, static_argnums=(0,))
inv = jax.jit(inv, static_argnums=(0,))
batch_inv = jax.jit(batch_inv, static_argnums=(0,), static_argnames=("axis",))
eq = jax.jit(eq, static_argnums=(0,))
is_zero = jax.jit(is_zero, static_argnums=(0,))
