"""Twisted-Edwards curve arithmetic, host oracle + batched device ops.

This replaces what the reference imports from `ark-ec` (TE affine/projective
groups; /root/reference/crypto-primitives/Cargo.toml:21).  TPU design:

  * Points on device are **extended coordinates** (X, Y, T, Z) stacked as a
    (..., 4, L) uint32 Montgomery limb array.  The unified Hisil-Wong-
    Carter-Dawson addition law is used for *all* additions including
    doubling and the identity — it is complete for our curves (a = -1
    square, d nonsquare), so there are no branches anywhere
    (SURVEY.md §7 hard-parts (5): the reference's SW `infinity` special
    cases disappear by construction).
  * The 11 field products of one addition are batched into 3 `mont_mul`
    calls over stacked operands, and the batch axis rides the VPU lanes.
  * Host tier: exact python-int affine arithmetic (the oracle), plus
    Tonelli-Shanks sqrt for point sampling.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.ops import field as ff
from crypto_primitives_tpu.ops.field import FieldSpec


class TECurveSpec:
    """a*x^2 + y^2 = 1 + d*x^2*y^2 over base field q; prime-order subgroup r."""

    def __init__(
        self,
        name: str,
        base: FieldSpec,
        scalar: FieldSpec,
        a: int,
        d: int,
        cofactor: int,
        generator: Optional[Tuple[int, int]] = None,
    ):
        self.name = name
        self.base = base
        self.scalar = scalar
        self.a = a % base.p
        self.d = d % base.p
        self.cofactor = cofactor
        self.generator = generator
        # packed constants (Montgomery)
        self.a_limbs = base.pack([self.a])[0]
        self.d_limbs = base.pack([self.d])[0]

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return f"TECurveSpec({self.name})"

    # ------------- host tier (python ints, affine) -------------

    def is_on_curve(self, pt) -> bool:
        x, y = pt
        p = self.base.p
        return (self.a * x * x + y * y) % p == (1 + self.d * x * x * y * y) % p

    def add_host(self, p1, p2):
        x1, y1 = p1
        x2, y2 = p2
        p = self.base.p
        dxy = self.d * x1 * x2 % p * y1 % p * y2 % p
        x3 = (x1 * y2 + y1 * x2) * pow(1 + dxy, -1, p) % p
        y3 = (y1 * y2 - self.a * x1 * x2) * pow(1 - dxy, -1, p) % p
        return (x3, y3)

    def double_host(self, p1):
        return self.add_host(p1, p1)

    def neg_host(self, p1):
        return ((-p1[0]) % self.base.p, p1[1])

    def scalar_mul_host(self, pt, k: int):
        """Single scalar mul on host: compiled C++ engine when loaded (the
        reference's per-op path is compiled Rust; ours is crypto_primitives_tpu/native/cpmont.cpp),
        python-int double-and-add otherwise (and always under CPT_NATIVE=0,
        keeping the oracle reachable for cross-model tests)."""
        from crypto_primitives_tpu import native

        eng = native.curve_engine(self)
        if eng is not None:
            return eng.scalar_mul(pt, int(k))
        return self._scalar_mul_py(pt, k)

    def _scalar_mul_py(self, pt, k: int):
        k = int(k)
        assert k >= 0
        acc = (0, 1)
        base_pt = pt
        while k > 0:
            if k & 1:
                acc = self.add_host(acc, base_pt)
            base_pt = self.double_host(base_pt)
            k >>= 1
        return acc

    def sqrt_host(self, n: int) -> Optional[int]:
        """Tonelli-Shanks square root mod p; None if non-residue."""
        p = self.base.p
        n %= p
        if n == 0:
            return 0
        if pow(n, (p - 1) // 2, p) != 1:
            return None
        q, s = p - 1, 0
        while q % 2 == 0:
            q //= 2
            s += 1
        # find a non-residue
        z = 2
        while pow(z, (p - 1) // 2, p) != p - 1:
            z += 1
        m, c, t, r = s, pow(z, q, p), pow(n, q, p), pow(n, (q + 1) // 2, p)
        while t != 1:
            i, tt = 0, t
            while tt != 1:
                tt = tt * tt % p
                i += 1
            b = pow(c, 1 << (m - i - 1), p)
            m, c = i, b * b % p
            t = t * c % p
            r = r * b % p
        return r

    def rand_point(self, rng):
        """Sample a uniform point of the prime-order subgroup (rand twin of
        arkworks `C::rand`: random x, solve for y, clear cofactor)."""
        p = self.base.p
        while True:
            x = rng.randrange(p)
            # y^2 = (1 - a x^2) / (1 - d x^2)
            denom = (1 - self.d * x * x) % p
            if denom == 0:
                continue
            y2 = (1 - self.a * x * x) * pow(denom, -1, p) % p
            y = self.sqrt_host(y2)
            if y is None:
                continue
            if rng.random() < 0.5:
                y = (-y) % p
            pt = self.scalar_mul_host((x, y), self.cofactor)
            if pt != (0, 1):
                return pt

    # ------------- serialization (ark-serialize twins) -------------

    def to_uncompressed_bytes(self, pt) -> bytes:
        """TE affine uncompressed = x || y bigint LE bytes (no flags)."""
        return self.base.to_bytes_le(pt[0]) + self.base.to_bytes_le(pt[1])

    def serialize_compressed(self, pt) -> bytes:
        """TE affine compressed: y bytes with MSB flag set iff x > -x
        (ark-ec TEFlags::XIsNegative semantics)."""
        x, y = pt
        data = bytearray(self.base.serialize_compressed(y))
        if x > self.base.p - x:
            data[-1] |= 0x80
        return bytes(data)

    def zero_host(self):
        return (0, 1)

    # ------------- generic-curve device shims (Pedersen et al.) ---------

    coords = 4

    def dev_identity(self, shape=()):
        return identity(self, shape)

    def dev_conditional_sum(self, table, bits):
        return te_conditional_sum(self, table, bits)

    def dev_to_affine(self, pts):
        return te_to_affine(self, pts)

    def dev_add(self, p1, p2):
        return te_add(self, p1, p2)

    def dev_neg(self, pts):
        return te_neg(self, pts)

    def dev_scalar_mul_bits(self, base_pts, bits):
        return te_scalar_mul_bits(self, base_pts, bits)

    # ------------- host <-> device packing -------------

    def pack_points(self, pts) -> np.ndarray:
        """Affine host point(s) -> extended limb array.

        Accepts a single ``(x, y)`` tuple (returns (4, L)) or a flat list of
        tuples (returns (N, 4, L)); callers reshape for deeper nesting.
        """
        single = isinstance(pts, tuple)
        if single:
            pts = [pts]
        L = self.base.num_limbs
        out = np.zeros((len(pts), 4, L), dtype=np.uint32)
        p = self.base.p
        for i, (x, y) in enumerate(pts):
            x, y = int(x) % p, int(y) % p
            out[i] = self.base.pack([x, y, x * y % p, 1])
        return out[0] if single else out

    def unpack_points(self, arr):
        """(..., 4, L) extended -> host affine tuples."""
        a = np.asarray(arr)
        flat = a.reshape(-1, 4, a.shape[-1])
        p = self.base.p
        out = np.empty((flat.shape[0],), dtype=object)
        for i in range(flat.shape[0]):
            vals = self.base.unpack(flat[i])
            x, y, _, z = (int(v) for v in vals)
            zi = pow(z, -1, p)
            out[i] = (x * zi % p, y * zi % p)
        if a.ndim == 2:
            return out[0]
        return out.reshape(a.shape[:-2])


# ----------------------------------------------------------------------
# Device tier
# ----------------------------------------------------------------------


def identity(curve: TECurveSpec, shape=()) -> jnp.ndarray:
    """(0 : 1 : 0 : 1) in Montgomery form, shape (..., 4, L)."""
    q = curve.base
    one = jnp.asarray(q.r_limbs, dtype=jnp.uint32)
    zero = jnp.zeros_like(one)
    pt = jnp.stack([zero, one, zero, one], axis=0)
    return jnp.broadcast_to(pt, shape + (4, q.num_limbs))


@functools.partial(jax.jit, static_argnums=(0,))
def te_add(curve: TECurveSpec, p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Unified/complete extended-coordinate addition (add-2008-hwcd).

    p1, p2: (..., 4, L).  11 field muls batched into 3 mont_mul calls.
    """
    q = curve.base
    p1, p2 = jnp.broadcast_arrays(p1, p2)
    X1, Y1, T1, Z1 = (p1[..., i, :] for i in range(4))
    X2, Y2, T2, Z2 = (p2[..., i, :] for i in range(4))
    s1 = ff.add(q, X1, Y1)
    s2 = ff.add(q, X2, Y2)
    # round 1: A=X1*X2, B=Y1*Y2, TT=T1*T2, D=Z1*Z2, S=s1*s2
    lhs = jnp.stack([X1, Y1, T1, Z1, s1], axis=-2)
    rhs = jnp.stack([X2, Y2, T2, Z2, s2], axis=-2)
    r1 = ff.mont_mul(q, lhs, rhs)
    A, B, TT, D, S = (r1[..., i, :] for i in range(5))
    # round 2 (constants): C = d*TT, aA = a*A
    dc = jnp.asarray(curve.d_limbs, dtype=jnp.uint32)
    ac = jnp.asarray(curve.a_limbs, dtype=jnp.uint32)
    consts = jnp.broadcast_to(
        jnp.stack([dc, ac], axis=0), A.shape[:-1] + (2, A.shape[-1])
    )
    r2 = ff.mont_mul(q, jnp.stack([TT, A], axis=-2), consts)
    C, aA = r2[..., 0, :], r2[..., 1, :]
    E = ff.sub(q, ff.sub(q, S, A), B)
    F = ff.sub(q, D, C)
    G = ff.add(q, D, C)
    H = ff.sub(q, B, aA)
    # round 3: X3=E*F, Y3=G*H, T3=E*H, Z3=F*G
    lhs3 = jnp.stack([E, G, E, F], axis=-2)
    rhs3 = jnp.stack([F, H, H, G], axis=-2)
    r3 = ff.mont_mul(q, lhs3, rhs3)
    return r3


@functools.partial(jax.jit, static_argnums=(0,))
def te_neg(curve: TECurveSpec, p1: jnp.ndarray) -> jnp.ndarray:
    q = curve.base
    X, Y, T, Z = (p1[..., i, :] for i in range(4))
    return jnp.stack([ff.neg(q, X), Y, ff.neg(q, T), Z], axis=-2)


def te_double(curve: TECurveSpec, p1: jnp.ndarray) -> jnp.ndarray:
    return te_add(curve, p1, p1)


def te_select(mask: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """mask (...,) ? p1 : p2 over (..., 4, L) points."""
    return jnp.where(mask[..., None, None], p1, p2)


@functools.partial(jax.jit, static_argnums=(0,))
def te_sum(curve: TECurveSpec, pts: jnp.ndarray, axis: int = -3) -> jnp.ndarray:
    """Sum points along an axis by log-depth pairwise tree reduction.

    pts: (..., N, 4, L) -> (..., 4, L).  Each halving step is one batched
    complete addition over N/2 lanes (the TPU shape of the reference's
    rayon window sums, src/crh/pedersen/mod.rs:113-124).
    """
    pts = jnp.moveaxis(pts, axis, 0) if axis != -3 else jnp.moveaxis(pts, -3, 0)
    n = pts.shape[0]
    while n > 1:
        if n % 2 == 1:
            pad = identity(curve, pts.shape[1:-2])[None]
            pts = jnp.concatenate([pts, pad], axis=0)
            n += 1
        pts = te_add(curve, pts[0::2], pts[1::2])
        n //= 2
    return pts[0]


@functools.partial(jax.jit, static_argnums=(0,))
def te_scalar_mul_bits(curve: TECurveSpec, base_pt: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """base_pt (..., 4, L) times scalar given as bits (..., NBITS) (LSB first).

    Branchless double-and-add via lax.scan over the bit axis.
    """
    nbits = bits.shape[-1]
    bits_scan = jnp.moveaxis(bits, -1, 0)

    def body(carry, bit):
        acc, b = carry
        acc = te_select(bit != 0, te_add(curve, acc, b), acc)
        b = te_add(curve, b, b)
        return (acc, b), None

    acc0 = identity(curve, base_pt.shape[:-2])
    (acc, _), _ = jax.lax.scan(body, (acc0, base_pt), bits_scan)
    return acc


@functools.partial(jax.jit, static_argnums=(0,))
def te_to_affine(curve: TECurveSpec, pts: jnp.ndarray) -> jnp.ndarray:
    """Normalize Z->1 via batched inversion; returns (..., 2, L) (x, y)."""
    q = curve.base
    Z = pts[..., 3, :]
    Zi = ff.inv(q, Z)
    xy = ff.mont_mul(q, pts[..., 0:2, :], Zi[..., None, :])
    return xy


@functools.partial(jax.jit, static_argnums=(0, 3))
def te_conditional_sum(
    curve: TECurveSpec, table: jnp.ndarray, bits: jnp.ndarray, chunk: int = 256
) -> jnp.ndarray:
    """sum_j bits[..., j] * table[j] — the fixed-base multi-scalar kernel.

    table: (N, 4, L) precomputed points (e.g. Pedersen per-window doubling
    tables, src/crh/pedersen/mod.rs:48-56); bits: (..., N) 0/1.
    Per-bit select against the identity, then log-depth tree reduction,
    processed in chunks of ``chunk`` table entries to bound live memory.
    Returns (..., 4, L).
    """
    n = table.shape[0]
    batch = bits.shape[:-1]
    acc = identity(curve, batch)
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        tb = table[start:end]  # (C, 4, L)
        bb = bits[..., start:end]  # (..., C)
        sel = te_select(bb != 0, jnp.broadcast_to(tb, batch + tb.shape), identity(curve, batch + (end - start,)))
        acc = te_add(curve, acc, te_sum(curve, sel))
    return acc


def te_eq(curve: TECurveSpec, p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Projective equality: X1*Z2 == X2*Z1 and Y1*Z2 == Y2*Z1."""
    q = curve.base
    l = ff.mont_mul(q, p1[..., 0:2, :], p2[..., 3:4, :])
    r = ff.mont_mul(q, p2[..., 0:2, :], p1[..., 3:4, :])
    return jnp.all(l == r, axis=(-2, -1))
