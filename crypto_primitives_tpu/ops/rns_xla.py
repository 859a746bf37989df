"""Generic device-side RNS-Montgomery field arithmetic (XLA level).

The fused Pallas kernel (ops/poseidon_rns_pallas.py) hard-codes the
Poseidon round structure; this module exposes the same RNS-Montgomery
multiplication (ops/rns.py design: 2xK eleven-bit prime residues in f32,
Kawamura base extensions as exact-bf16 matmuls) as composable jnp ops, so
*every* field-heavy primitive — curve additions for Pedersen/Bowe-Hopwood
commitments, Schnorr and ElGamal scalar muls, MSMs — can ride it instead
of the ~5x slower 16-limb schoolbook path in ops/field.py.  It replaces
what the reference gets from ark-ff's Montgomery backend
(/root/reference/crypto-primitives/Cargo.toml:20) on the curve-op side.

Representation
--------------
An element is one float32 array ``(..., 2K)``: columns ``0:K`` hold base-1
residues, ``K:2K`` hold tau-twisted base-2 residues (the storage format of
rns.to_rns), all lazy in ``[0, 2m)``.  Values live in the M1-Montgomery
domain (an element x is stored as residues of some integer V ≡ x·M1 mod p,
V < bound·p).  The *bound* (in units of p) is tracked statically per
array; every op asserts its inputs fit the exactness budget at trace
time, the way rns.build_plan asserts the kernel folds.

Invariants (all inherited from ops/rns.py and validated there):
  * every f32 intermediate is an exact integer < 2^24;
  * mul requires bound(a)·bound(b) ≤ M1//p (the W < p·M1 Montgomery
    domain condition) and returns bound 3;
  * sub(a, b) adds ceil(bound(b))·p before subtracting, so represented
    values never go negative.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.ops import rns
from crypto_primitives_tpu.ops.rns import DELTA1, DELTA2, DIGIT, K, LAM_SHIFT


class RnsConsts(NamedTuple):
    """Device constant arrays for one RNSPlan.

    Stored as NUMPY arrays (jnp ops convert at use): constants created
    with jnp.asarray inside a jit trace would be cached as tracers and
    leak into later traces."""

    m: np.ndarray  # (2K,) concat(m1, m2)
    inv_m: np.ndarray  # (2K,) concat(inv_m1, inv_m2), round-to-zero
    m1: np.ndarray  # (K,)
    m2: np.ndarray  # (K,)
    inv_m1: np.ndarray  # (K,)
    inv_m2: np.ndarray  # (K,)
    c_sigma: np.ndarray  # (K,)
    c2: np.ndarray  # (K,)
    p2c2: np.ndarray  # (K,)
    negM1: np.ndarray  # (K,)
    negM2: np.ndarray  # (K,)
    ext1_w: np.ndarray  # (2K, 2K+3) bf16 (transposed for x @ W)
    ext2_w: np.ndarray  # (2K, 2K+3) bf16
    k: int = K  # residues per base (plan geometry)
    mid_red: bool = False  # big-plan extension variant (rns._ext)


@functools.cache
def plan_consts(plan: rns.RNSPlan) -> RnsConsts:
    f32 = np.float32
    return RnsConsts(
        k=plan.k,
        mid_red=plan.mid_red,
        m=np.concatenate([plan.m1, plan.m2]).astype(f32),
        inv_m=np.concatenate([plan.inv_m1, plan.inv_m2]).astype(f32),
        m1=plan.m1.astype(f32),
        m2=plan.m2.astype(f32),
        inv_m1=plan.inv_m1.astype(f32),
        inv_m2=plan.inv_m2.astype(f32),
        c_sigma=plan.c_sigma.astype(f32),
        c2=plan.c2.astype(f32),
        p2c2=plan.p2c2.astype(f32),
        negM1=plan.negM1.astype(f32),
        negM2=plan.negM2.astype(f32),
        ext1_w=plan.ext1_w.T.astype(jnp.bfloat16),
        ext2_w=plan.ext2_w.T.astype(jnp.bfloat16),
    )


def max_mul_bound(plan: rns.RNSPlan) -> int:
    """bound(a)*bound(b) must not exceed this (W < p*M1 condition)."""
    return plan.M1 // plan.p


# ----------------------------------------------------------------------
# Core residue ops (each maps 1:1 onto an rns.py emulation op)
# ----------------------------------------------------------------------


def _red(w: jnp.ndarray, inv_m: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Barrett reduce w (exact integer < 2^24) into [0, 2m)."""
    q = jnp.floor(w * inv_m)
    return w - q * m


def _ext(
    c: RnsConsts,
    s: jnp.ndarray,
    W: jnp.ndarray,
    negM: jnp.ndarray,
    inv_out: jnp.ndarray,
    m_out: jnp.ndarray,
    delta: float,
) -> jnp.ndarray:
    """Kawamura base extension (folded-S2 form, mirrors rns._ext).

    s: (..., K) lazy source residues -> (..., K) destination residues of
    the represented integer (+ {0,1}·M_src for ext1's one-sided delta).
    The matmul runs in bf16 with f32 accumulation; digits < 2^6 and
    weights (ints < 2^8 times powers of two) are bf16-exact, so the MXU
    pass is exact regardless of accumulation order.
    """
    k = c.k
    s0 = jnp.floor(s * (2.0**-DIGIT))
    d0 = s - s0 * (2.0**DIGIT)
    x = jnp.concatenate([d0, s0], axis=-1).astype(jnp.bfloat16)  # (..., 2K)
    out = jax.lax.dot_general(
        x, W, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (..., 2K+3)
    U0, U1 = out[..., :k], out[..., k : 2 * k]
    lam = jnp.floor(
        (out[..., 2 * k] + out[..., 2 * k + 1]) + out[..., 2 * k + 2] + delta
    )
    if c.mid_red:
        # big plans: raw U1 rows — reduce before the 64-scale recombine
        # (the folded form would overflow the f32-exact budget at k > 24)
        U1 = (2.0**DIGIT) * _red(U1, inv_out, m_out)
    X = (U0 + U1) + lam[..., None] * negM
    return _red(X, inv_out, m_out)


def mont_reduce(c: RnsConsts, w: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-reduce a residue pair w (..., 2K) (w2 tau^2-twisted)
    representing W < p*M1: returns residues of W*M1^{-1} mod p, value < 3p.

    Mirrors rns.mont_reduce_np; the only op-order difference is that
    w2*c2 is Barrett-reduced before adding qh*p2c2 (bound
    (2m-1) + (2m-1)(m-1) < 2^24, still exact).
    """
    w1, w2 = w[..., : c.k], w[..., c.k :]
    s1 = _red(w1 * c.c_sigma, c.inv_m1, c.m1)
    qh = _ext(c, s1, c.ext1_w, c.negM1, c.inv_m2, c.m2, DELTA1)
    om_pre = _red(w2 * c.c2, c.inv_m2, c.m2) + qh * c.p2c2
    omega = _red(om_pre, c.inv_m2, c.m2)
    r1 = _ext(c, omega, c.ext2_w, c.negM2, c.inv_m1, c.m1, DELTA2)
    return jnp.concatenate([r1, omega], axis=-1)


def mul_raw(c: RnsConsts, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product of residue arrays (..., 2K); bound bookkeeping
    is the caller's job (use RnsField.mul for the checked version)."""
    w = _red(a * b, c.inv_m, c.m)
    return mont_reduce(c, w)


def add_raw(c: RnsConsts, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _red(a + b, c.inv_m, c.m)


# ----------------------------------------------------------------------
# Bound-checked field API
# ----------------------------------------------------------------------


class RnsField:
    """Field ops over one RNSPlan with static value-bound tracking.

    Elements are plain (..., 2K) f32 arrays; bounds (multiples of p) are
    passed/returned alongside.  MUL_OUT=3 matches mont_reduce's < 3p
    guarantee (rns.mont_reduce_np docstring).
    """

    MUL_OUT = 3

    def __init__(self, plan: rns.RNSPlan):
        self.plan = plan
        self.c = plan_consts(plan)
        self.max_prod = max_mul_bound(plan)
        # sub offsets cache: k -> (2K,) residues of k*p (base2 tau-twisted);
        # numpy so cached values never capture jit tracers
        self._sub_off: dict[int, np.ndarray] = {}

    # -------- host <-> device --------

    def pack(self, x) -> np.ndarray:
        """Python int (or object array) in the plain domain -> Montgomery
        RNS residues (..., 2K) f32 (value bound 1)."""
        p = self.plan.p
        xs = np.asarray(x, dtype=object)
        mont = np.vectorize(lambda v: int(v) * self.plan.M1 % p, otypes=[object])(xs)
        r1, r2 = rns.to_rns(self.plan, mont)
        return np.concatenate([r1, r2], axis=-1)

    def unpack(self, arr) -> np.ndarray:
        """Device residues -> python ints in the plain domain (mod p)."""
        a = np.asarray(arr)
        vals = rns.from_rns(self.plan, a[..., : self.plan.k])
        p, inv = self.plan.p, pow(self.plan.M1, -1, self.plan.p)
        return np.vectorize(lambda v: int(v) * inv % p, otypes=[object])(vals)

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.zeros(shape + (2 * self.plan.k,), jnp.float32)

    # -------- arithmetic --------

    def mul(self, a, ba: int, b, bb: int):
        """(a, bound) x (b, bound) -> (result, 3)."""
        assert ba * bb <= self.max_prod, (
            f"RNS mul domain overflow: {ba}*{bb} > M1//p = {self.max_prod}"
        )
        return mul_raw(self.c, a, b), self.MUL_OUT

    def add(self, a, ba: int, b, bb: int):
        return add_raw(self.c, a, b), ba + bb

    def _sub_offset(self, k: int) -> np.ndarray:
        if k not in self._sub_off:
            p = self.plan.p
            off1 = [(k * p) % int(m) + 2 * int(m) for m in self.plan.m1]
            off2 = [
                ((k * p) % int(m)) * int(t) % int(m) + 2 * int(m)
                for m, t in zip(self.plan.m2, self.plan.tau)
            ]
            self._sub_off[k] = np.asarray(off1 + off2, np.float32)
        return self._sub_off[k]

    def sub(self, a, ba: int, b, bb: int):
        """a - b + bb*p (keeps the represented value nonnegative)."""
        z = a + (self._sub_offset(bb) - b)  # residues < 5m, exact
        return _red(z, self.c.inv_m, self.c.m), ba + bb

    def select(self, mask: jnp.ndarray, a, ba: int, b, bb: int):
        """mask (...,) ? a : b."""
        return jnp.where(mask[..., None], a, b), max(ba, bb)

    def normalize(self, a, ba: int):
        """Multiply by Montgomery-one to re-normalize the bound to 3."""
        one = self.pack(1).astype(np.float32)
        return self.mul(a, ba, jnp.broadcast_to(one, a.shape), 1)

    def pow_const(self, a, ba: int, e: int):
        """a^e for a static exponent (square-and-multiply scan; ~2 muls
        per exponent bit, bounds closed at 3*3 <= M1//p)."""
        assert e >= 1 and ba <= self.MUL_OUT
        bits = np.asarray(
            [int(b) for b in bin(e)[2:]], np.int32
        )  # MSB-first, leading 1

        def body(acc, bit):
            sq, _ = self.mul(acc, self.MUL_OUT, acc, self.MUL_OUT)
            withm, _ = self.mul(sq, self.MUL_OUT, a, self.MUL_OUT)
            return jnp.where(bit != 0, withm, sq), None

        acc, _ = jax.lax.scan(body, a, jnp.asarray(bits[1:]))
        return acc, self.MUL_OUT

    def inv(self, a, ba: int):
        """a^{p-2} (Fermat); a must be nonzero mod p."""
        return self.pow_const(a, ba, self.plan.p - 2)


# ----------------------------------------------------------------------
# Device RNS -> Montgomery-limb conversion (for ops/field.py interop)
# ----------------------------------------------------------------------


@functools.cache
def _crt_limb_consts(plan: rns.RNSPlan, spec, mont: bool = True) -> tuple:
    """Constants for to_mont_limbs: per-residue CRT scalars and the
    (K+1, L) limb matrix of D_j = (M1/m_j)*M1^{-1}*R^{1+mont} mod p rows
    plus the F = -R^{1+mont} mod p lambda row (see to_mont_limbs).

    Big plans (k + 1 > 31) double the rows: [D_j; 64*D_j mod p; F] so the
    scalars can be fed as 6-bit digits — the uint32 accumulation of the
    scalar-row dot would overflow past 31 full-width scalar rows."""
    p = plan.p
    assert spec.p == p
    R = 1 << (16 * spec.num_limbs)
    invM1 = pow(plan.M1, -1, p)
    ic = np.asarray(
        [pow(plan.M1 // int(m), -1, int(m)) for m in plan.m1], np.float32
    )
    lam_w = np.asarray(
        [round(2.0**plan.ls / int(m)) * 2.0**-plan.ls for m in plan.m1],
        np.float32,
    )
    # spec.pack already applies the R Montgomery factor; mont_dot divides
    # by R.  With one extra R baked in (mont=True) the result lands in
    # Montgomery form (x*R); without it (mont=False) in standard form.
    extra = R % p if mont else 1
    dj = [
        (plan.M1 // int(m)) % p * invM1 % p * extra % p for m in plan.m1
    ]
    split = plan.k + 1 > 31
    rows = [spec.pack([v])[0] for v in dj]
    if split:
        rows += [spec.pack([64 * v % p])[0] for v in dj]
    rows.append(spec.pack([(-1) % p * extra % p])[0])
    # numpy (not jnp): cached constants must never capture jit tracers
    return ic, lam_w, np.stack(rows).astype(np.uint32), split


def to_mont_limbs(
    plan: rns.RNSPlan, spec, a: jnp.ndarray, bound: int, mont: bool = True
) -> jnp.ndarray:
    """RNS residues (..., 2K) -> canonical uint32 limbs (..., L), in
    Montgomery form by default (mont=False: standard form).

    Kawamura CRT on device: canonicalize base-1 residues, form
    c_j = s_j * (M1/m_j)^{-1} mod m_j, estimate lambda = floor(sum c_j/m_j)
    (exact for bound*p/M1 < 0.4, the +1/2 delta argument of rns.DELTA2),
    then one lazy mont_dot against the (M1/m_j)-limb constant matrix:
        x*R = (sum_j c_j * D_j + lam * F) * R^{-1}  mod p.
    """
    from crypto_primitives_tpu.ops import field as ff

    c = plan_consts(plan)
    assert bound * plan.p < 0.4 * plan.M1, "value too large for exact CRT"
    ic, lam_w, rows, split = _crt_limb_consts(plan, spec, mont)
    s = a[..., : c.k]
    s = s - c.m1 * (s >= c.m1)  # [0, 2m) -> [0, m)
    cj = _red(s * ic, c.inv_m1, c.m1)
    cj = cj - c.m1 * (cj >= c.m1)
    lam = jnp.floor(jnp.sum(cj * lam_w, axis=-1) + 0.5)
    if split:
        # 6-bit digit split keeps every product < 2^22 and the 2k+1-term
        # uint32 sum < 2^29 (see _crt_limb_consts)
        hi = jnp.floor(cj * (2.0**-DIGIT))
        lo = cj - hi * (2.0**DIGIT)
        scalars = jnp.concatenate([lo, hi, lam[..., None]], axis=-1)
    else:
        scalars = jnp.concatenate([cj, lam[..., None]], axis=-1)  # (..., K+1)
    # Small-scalar dot: scalars < 2^11 against constant limb rows — the
    # generic ff.mont_dot would run (K+1) full LxL schoolbooks; here each
    # product is scalar*limb < 2^27 and the sum stays < 2^32, so one
    # elementwise outer product + ONE Montgomery reduction suffices
    # (T = sum_j c_j*D_j < 2^16*p, so u = (T + m*p)/R < p + 2^15: a single
    # conditional subtraction canonicalizes).
    acc = jnp.sum(
        scalars[..., None].astype(jnp.uint32) * rows, axis=-2
    )  # (..., L) relaxed limbs < 2^32
    L = spec.num_limbs
    acc = jnp.concatenate(
        [acc, jnp.zeros(acc.shape[:-1] + (L + 1,), jnp.uint32)], axis=-1
    )
    return ff._mont_reduce(spec, acc, num_products=1)


# ----------------------------------------------------------------------
# Device Montgomery-limb -> RNS conversion (the absorb-side boundary)
# ----------------------------------------------------------------------


def _limb_digit_shift(plan: rns.RNSPlan, spec) -> int:
    """Digit width for from_mont_limbs: bytes when the f32 accumulation
    stays exact (2L terms of 255*(m-1) < 2^24 — all <=256-bit fields),
    nibbles otherwise (the 381-bit/24-limb case: 4L terms of 15*(m-1))."""
    mmax = int(max(plan.m1.max(), plan.m2.max()))
    if 2 * spec.num_limbs * 255 * (mmax - 1) < 1 << 24:
        return 8
    assert 4 * spec.num_limbs * 15 * (mmax - 1) < 1 << 24
    return 4


@functools.cache
def _limb_rns_consts(plan: rns.RNSPlan, spec) -> np.ndarray:
    """(nd, 2K) f32 weight matrix for from_mont_limbs: row d holds the
    residues of (2^(shift*d) * c' mod p) where c' = R^{-1} * M1^2 mod p
    converts the limb-Montgomery domain (x*R) into the RNS-Montgomery
    domain (x*M1) through the mont_reduce that follows.  Base-2 columns
    carry the tau^2 twist of a product pair (mont_reduce's expected input
    format)."""
    p = plan.p
    cprime = pow(spec.R, -1, p) * plan.M1 % p * plan.M1 % p
    shift = _limb_digit_shift(plan, spec)
    nd = (16 // shift) * spec.num_limbs
    W = np.zeros((nd, 2 * plan.k), np.float32)
    for d in range(nd):
        v = (1 << (shift * d)) * cprime % p
        W[d, : plan.k] = [v % int(m) for m in plan.m1]
        W[d, plan.k :] = [
            (v % int(m)) * (int(t) * int(t) % int(m)) % int(m)
            for m, t in zip(plan.m2, plan.tau)
        ]
    return W


def from_mont_limbs(plan: rns.RNSPlan, spec, limbs: jnp.ndarray) -> jnp.ndarray:
    """Montgomery uint32 16-bit limbs (..., L) (value y = x*R mod p, y < 2p)
    -> RNS residues (..., 2K) f32 of x*M1 mod p, value bound 3 (lazy
    residues in [0, 2m)).  Inverse of to_mont_limbs.

    One digit matmul against _limb_rns_consts (byte digits for <=256-bit
    fields, nibbles for bigger limb counts; sums < 2^24: exact in f32;
    precision=HIGHEST keeps the MXU pass exact) forms the product-pair
    W = y*c' < p*M1, then one mont_reduce lands in the RNS-Montgomery
    domain."""
    c = plan_consts(plan)
    W = _limb_rns_consts(plan, spec)
    shift = _limb_digit_shift(plan, spec)
    mask = (1 << shift) - 1
    parts = [
        ((limbs >> (shift * i)) & mask).astype(jnp.float32)
        for i in range(16 // shift)
    ]
    digits = jnp.stack(parts, axis=-1).reshape(
        limbs.shape[:-1] + ((16 // shift) * spec.num_limbs,)
    )
    raw = jax.lax.dot_general(
        digits,
        jnp.asarray(W),
        (((digits.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # (..., 2K) exact integers < 2^24
    w = _red(raw, jnp.asarray(c.inv_m), jnp.asarray(c.m))
    return mont_reduce(c, w)
