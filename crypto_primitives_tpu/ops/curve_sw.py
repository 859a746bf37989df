"""Short-Weierstrass curve arithmetic, host oracle + batched device ops.

Closes the SW genericity gap vs the reference, whose primitives are generic
over any ark-ec `CurveGroup` including SW-with-infinity configurations
(e.g. the SW Absorb impls at
/root/reference/crypto-primitives/src/sponge/absorb.rs:263-282 and Pedersen
over any `CurveGroup`, src/crh/pedersen/mod.rs:19-37).  TPU design:

  * Points on device are **homogeneous projective** (X, Y, Z) stacked as a
    (..., 3, L) uint32 Montgomery limb array; the point at infinity is
    (0 : 1 : 0).
  * Addition uses the COMPLETE formulas of Renes-Costello-Batina 2015
    (eprint 2015/1060, Algorithm 1, arbitrary a): one code path handles
    identity, doubling, and inverses with no branches — the SW `infinity`
    special cases of CPU implementations disappear by construction, the
    same design move the TE layer makes with unified extended coordinates.
  * The 12 variable products are batched into 2 `mont_mul` dispatches of 6,
    plus 1 constant-operand dispatch (a, 3b, a^2 folded so the dependent
    a*(t0 - a*t2) const-mul of the paper's step 31 needs no extra round).
  * Host tier: exact python-int affine arithmetic (the oracle), infinity
    represented as None, plus Tonelli-Shanks sqrt for point sampling.

Serialization matches ark-serialize SWFlags semantics (ark-serialize
flags.rs: PointAtInfinity = 1 << 6, YIsNegative = 1 << 7 on the final
byte): compressed = x bytes + flags; uncompressed = x || y + flags.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.ops import field as ff
from crypto_primitives_tpu.ops.field import FieldSpec


def _tonelli(n: int, p: int) -> Optional[int]:
    """Tonelli-Shanks square root mod p; None if non-residue."""
    n %= p
    if n == 0:
        return 0
    if pow(n, (p - 1) // 2, p) != 1:
        return None
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
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


class SWCurveSpec:
    """y^2 = x^3 + a*x + b over base field q; prime-order subgroup r.

    Host points are affine (x, y) int tuples; the identity is None.
    """

    def __init__(
        self,
        name: str,
        base: FieldSpec,
        scalar: FieldSpec,
        a: int,
        b: int,
        cofactor: int,
        generator: Optional[Tuple[int, int]] = None,
    ):
        self.name = name
        self.base = base
        self.scalar = scalar
        self.a = a % base.p
        self.b = b % base.p
        self.cofactor = cofactor
        self.generator = generator
        # packed constants (Montgomery): a, 3b, a^2
        self.a_limbs = base.pack([self.a])[0]
        self.b3_limbs = base.pack([3 * self.b % base.p])[0]
        self.a2_limbs = base.pack([self.a * self.a % base.p])[0]

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return f"SWCurveSpec({self.name})"

    # ------------- host tier (python ints, affine; None = infinity) -----

    def zero_host(self):
        return None

    def is_on_curve(self, pt) -> bool:
        if pt is None:
            return True
        x, y = pt
        p = self.base.p
        return y * y % p == (x * x % p * x + self.a * x + self.b) % p

    def add_host(self, p1, p2):
        if p1 is None:
            return p2
        if p2 is None:
            return p1
        x1, y1 = p1
        x2, y2 = p2
        p = self.base.p
        if x1 == x2:
            if (y1 + y2) % p == 0:
                return None
            lam = (3 * x1 * x1 + self.a) * pow(2 * y1, -1, p) % p
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
        x3 = (lam * lam - x1 - x2) % p
        y3 = (lam * (x1 - x3) - y1) % p
        return (x3, y3)

    def double_host(self, p1):
        return self.add_host(p1, p1)

    def neg_host(self, p1):
        if p1 is None:
            return None
        return (p1[0], (-p1[1]) % self.base.p)

    def scalar_mul_host(self, pt, k: int):
        """Single scalar mul (mod r) on host: compiled C++ engine when
        loaded, python-int double-and-add otherwise (CPT_NATIVE=0 keeps the
        oracle reachable for cross-model tests)."""
        return self.scalar_mul_host_any(pt, int(k) % self.scalar.p)

    def _scalar_mul_py(self, pt, k: int):
        return self._scalar_mul_py_any(pt, int(k) % self.scalar.p)

    def sqrt_host(self, n: int) -> Optional[int]:
        return _tonelli(n, self.base.p)

    def rand_point(self, rng):
        """Uniform point of the prime-order subgroup (random x, solve for
        y, clear cofactor), the `C::rand` twin."""
        p = self.base.p
        while True:
            x = rng.randrange(p)
            rhs = (x * x % p * x + self.a * x + self.b) % p
            y = self.sqrt_host(rhs)
            if y is None:
                continue
            if rng.randrange(2):
                y = (-y) % p
            pt = self.scalar_mul_host_any((x, y), self.cofactor)
            if pt is not None:
                return pt

    def scalar_mul_host_any(self, pt, k: int):
        """Scalar mul by an arbitrary positive int (no mod-r reduction)."""
        from crypto_primitives_tpu import native

        eng = native.curve_engine(self)
        if eng is not None:
            return eng.scalar_mul(pt, int(k))
        return self._scalar_mul_py_any(pt, k)

    def _scalar_mul_py_any(self, pt, k: int):
        acc, base = None, pt
        while k:
            if k & 1:
                acc = self.add_host(acc, base)
            base = self.double_host(base)
            k >>= 1
        return acc

    # ------------- serialization (ark-serialize SWFlags) -------------

    @property
    def swflag_bytes(self) -> int:
        """ark-serialize buffer_byte_size(MODULUS_BIT_SIZE + 2): the SW
        flags occupy the top two bits of the LAST byte, which must not
        collide with modulus data bits — a 255-bit field therefore
        serializes into 33 bytes, not 32 (381-bit BLS12-381 Fq stays 48)."""
        return (self.base.nbits + 2 + 7) // 8

    def _field_with_flags(self, v: int, flags: int) -> bytes:
        data = bytearray(int(v).to_bytes(self.swflag_bytes, "little"))
        data[-1] |= flags
        return bytes(data)

    def to_uncompressed_bytes(self, pt) -> bytes:
        """x plain bigint LE bytes, then y with SWFlags on its final byte
        (infinity = (0, 0) + the 1<<6 flag) — ark-ec 0.4
        serialize_with_mode(Compress::No)."""
        if pt is None:
            return bytes(self.base.bigint_bytes) + self._field_with_flags(0, 0x40)
        flag = 0x80 if pt[1] > self.base.p - pt[1] else 0
        return self.base.to_bytes_le(pt[0]) + self._field_with_flags(pt[1], flag)

    def serialize_compressed(self, pt) -> bytes:
        """x bytes with SWFlags: 1<<6 if infinity (x = 0), 1<<7 if y is
        "negative" (y > -y), matching ark-serialize flags.rs."""
        if pt is None:
            return self._field_with_flags(0, 0x40)
        x, y = pt
        flag = 0x80 if y > self.base.p - y else 0
        return self._field_with_flags(x, flag)

    def deserialize_compressed(self, data: bytes):
        """Inverse of serialize_compressed, validating curve membership."""
        if len(data) != self.swflag_bytes:
            raise ValueError("bad SW compressed length")
        buf = bytearray(data)
        flags = buf[-1] & 0xC0
        buf[-1] &= 0x3F
        x = int.from_bytes(bytes(buf), "little")
        if flags & 0x40:
            if x != 0 or flags & 0x80:
                raise ValueError("bad infinity encoding")
            return None
        if x >= self.base.p:
            raise ValueError("x out of range")
        p = self.base.p
        rhs = (x * x % p * x + self.a * x + self.b) % p
        y = self.sqrt_host(rhs)
        if y is None:
            raise ValueError("x not on curve")
        neg = y > p - y
        if bool(flags & 0x80) != neg:
            y = (p - y) % p
        return (x, y)

    # ------------- host <-> device packing -------------

    def pack_points(self, pts) -> np.ndarray:
        """Affine host point(s) (or None) -> projective limb array
        (..., 3, L) in Montgomery form."""
        single = pts is None or (
            isinstance(pts, tuple) and len(pts) == 2 and isinstance(pts[0], int)
        )
        if single:
            pts = [pts]
        rows = []
        for pt in pts:
            if pt is None:
                rows.append([0, 1, 0])
            else:
                rows.append([pt[0], pt[1], 1])
        arr = self.base.pack(np.asarray(rows, dtype=object))
        return arr[0] if single else arr

    def unpack_points(self, arr):
        """Projective limb array -> affine host points (None = infinity)."""
        a = np.asarray(arr)
        flat = a.reshape((-1, 3, a.shape[-1]))
        vals = self.base.unpack(flat)
        out = []
        p = self.base.p
        for x, y, z in vals:
            x, y, z = int(x), int(y), int(z)
            if z == 0:
                out.append(None)
            else:
                zi = pow(z, -1, p)
                out.append((x * zi % p, y * zi % p))
        return out if a.ndim > 2 else out[0]

    # ------------- generic-curve device shims (Pedersen et al.) ---------

    coords = 3

    def dev_identity(self, shape=()):
        return identity(self, shape)

    def dev_conditional_sum(self, table, bits):
        return sw_conditional_sum(self, table, bits)

    def dev_to_affine(self, pts):
        return sw_to_affine(self, pts)

    def dev_add(self, p1, p2):
        return sw_add(self, p1, p2)

    def dev_neg(self, pts):
        return sw_neg(self, pts)

    def dev_scalar_mul_bits(self, base_pts, bits):
        return sw_scalar_mul_bits(self, base_pts, bits)


def identity(curve: SWCurveSpec, shape=()) -> jnp.ndarray:
    """(0 : 1 : 0) in Montgomery form, shape (..., 3, L)."""
    q = curve.base
    one = jnp.asarray(q.r_limbs, dtype=jnp.uint32)
    zero = jnp.zeros_like(one)
    pt = jnp.stack([zero, one, zero], axis=0)
    return jnp.broadcast_to(pt, shape + (3, q.num_limbs))


@functools.partial(jax.jit, static_argnums=(0,))
def sw_add(curve: SWCurveSpec, p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Complete projective addition (Renes-Costello-Batina Algorithm 1,
    arbitrary a).  p1, p2: (..., 3, L).  12 variable muls batched into two
    6-wide mont_mul dispatches; the dependent a*(t0 - a*t2) const-mul is
    flattened via the precomputed a^2 (a*t0 - a2*t2)."""
    q = curve.base
    p1, p2 = jnp.broadcast_arrays(p1, p2)
    X1, Y1, Z1 = (p1[..., i, :] for i in range(3))
    X2, Y2, Z2 = (p2[..., i, :] for i in range(3))
    sx1, sx2 = ff.add(q, X1, Y1), ff.add(q, X2, Y2)
    sy1, sy2 = ff.add(q, Y1, Z1), ff.add(q, Y2, Z2)
    sz1, sz2 = ff.add(q, X1, Z1), ff.add(q, X2, Z2)
    # round 1: m0=X1X2 m1=Y1Y2 m2=Z1Z2 A=(X1+Y1)(X2+Y2) B=(X1+Z1)(X2+Z2)
    # C=(Y1+Z1)(Y2+Z2)
    lhs = jnp.stack([X1, Y1, Z1, sx1, sz1, sy1], axis=-2)
    rhs = jnp.stack([X2, Y2, Z2, sx2, sz2, sy2], axis=-2)
    r1 = ff.mont_mul(q, lhs, rhs)
    m0, m1, m2, A, B, C = (r1[..., i, :] for i in range(6))
    s_xy = ff.sub(q, ff.sub(q, A, m0), m1)  # X1Y2 + X2Y1
    s_xz = ff.sub(q, ff.sub(q, B, m0), m2)  # X1Z2 + X2Z1
    s_yz = ff.sub(q, ff.sub(q, C, m1), m2)  # Y1Z2 + Y2Z1
    # round 2 (constants): a*s_xz, b3*m2, a*m2, b3*s_xz, a*m0, a2*m2
    ac = jnp.asarray(curve.a_limbs, dtype=jnp.uint32)
    b3c = jnp.asarray(curve.b3_limbs, dtype=jnp.uint32)
    a2c = jnp.asarray(curve.a2_limbs, dtype=jnp.uint32)
    consts = jnp.broadcast_to(
        jnp.stack([ac, b3c, ac, b3c, ac, a2c], axis=0),
        m0.shape[:-1] + (6, m0.shape[-1]),
    )
    vars_ = jnp.stack([s_xz, m2, m2, s_xz, m0, m2], axis=-2)
    r2 = ff.mont_mul(q, vars_, consts)
    a_sxz, b3_m2, a_m2, b3_sxz, a_m0, a2_m2 = (r2[..., i, :] for i in range(6))
    Zp = ff.add(q, b3_m2, a_sxz)  # b3*t2 + a*t4
    U = ff.sub(q, m1, Zp)  # t1 - Z'
    V = ff.add(q, m1, Zp)  # t1 + Z'
    t1p = ff.add(q, ff.add(q, ff.add(q, m0, m0), m0), a_m2)  # 3*t0 + a*t2
    t4p = ff.add(q, b3_sxz, ff.sub(q, a_m0, a2_m2))  # b3*t4 + a*(t0 - a*t2)
    # round 3: Y3 = U*V + t1'*t4'; X3 = s_xy*U - s_yz*t4'; Z3 = s_yz*V + s_xy*t1'
    lhs3 = jnp.stack([U, t1p, s_xy, s_yz, s_yz, s_xy], axis=-2)
    rhs3 = jnp.stack([V, t4p, U, t4p, V, t1p], axis=-2)
    r3 = ff.mont_mul(q, lhs3, rhs3)
    Y3 = ff.add(q, r3[..., 0, :], r3[..., 1, :])
    X3 = ff.sub(q, r3[..., 2, :], r3[..., 3, :])
    Z3 = ff.add(q, r3[..., 4, :], r3[..., 5, :])
    return jnp.stack([X3, Y3, Z3], axis=-2)


@functools.partial(jax.jit, static_argnums=(0,))
def sw_neg(curve: SWCurveSpec, p1: jnp.ndarray) -> jnp.ndarray:
    q = curve.base
    X, Y, Z = (p1[..., i, :] for i in range(3))
    return jnp.stack([X, ff.neg(q, Y), Z], axis=-2)


def sw_double(curve: SWCurveSpec, p1: jnp.ndarray) -> jnp.ndarray:
    return sw_add(curve, p1, p1)


def sw_select(mask: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """mask (...,) ? p1 : p2 over (..., 3, L) points."""
    return jnp.where(mask[..., None, None], p1, p2)


def sw_sum(curve: SWCurveSpec, pts: jnp.ndarray, axis: int = -3) -> jnp.ndarray:
    """Log-depth complete-addition tree reduction along ``axis``."""
    n = pts.shape[axis]
    while n > 1:
        half = n // 2
        lo = jax.lax.slice_in_dim(pts, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(pts, half, 2 * half, axis=axis)
        s = sw_add(curve, lo, hi)
        if n % 2:
            s = jnp.concatenate(
                [s, jax.lax.slice_in_dim(pts, 2 * half, n, axis=axis)], axis=axis
            )
        pts = s
        n = pts.shape[axis]
    return jnp.squeeze(pts, axis=axis)


def sw_scalar_mul_bits(
    curve: SWCurveSpec, base_pt: jnp.ndarray, bits: jnp.ndarray
) -> jnp.ndarray:
    """base_pt (..., 3, L) * scalar given as (..., NB) LE bits."""
    nb = bits.shape[-1]

    def body(carry, i):
        acc, dbl = carry
        sel = sw_add(curve, acc, dbl)
        acc = sw_select(bits[..., i] != 0, sel, acc)
        dbl = sw_double(curve, dbl)
        return (acc, dbl), None

    (acc, _), _ = jax.lax.scan(
        body, (identity(curve, bits.shape[:-1]), base_pt), jnp.arange(nb)
    )
    return acc


def sw_to_affine(curve: SWCurveSpec, pts: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, L) projective -> (..., 2, L) affine Montgomery (batch_inv);
    infinity maps to (0, 0) (z = 0 inverts to 0 via Fermat pow)."""
    q = curve.base
    Z = pts[..., 2, :]
    Zi = ff.inv(q, Z)
    xy = ff.mont_mul(q, pts[..., 0:2, :], Zi[..., None, :])
    return xy


def sw_conditional_sum(
    curve: SWCurveSpec, table: jnp.ndarray, bits: jnp.ndarray, chunk: int = 256
) -> jnp.ndarray:
    """sum_j bits[..., j] * table[j] — fixed-base multi-scalar kernel,
    the SW twin of curve.te_conditional_sum."""
    n = table.shape[0]
    batch = bits.shape[:-1]
    acc = identity(curve, batch)
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        tb = table[start:end]
        bb = bits[..., start:end]
        sel = sw_select(
            bb != 0,
            jnp.broadcast_to(tb, batch + tb.shape),
            identity(curve, batch + (end - start,)),
        )
        acc = sw_add(curve, acc, sw_sum(curve, sel))
    return acc


def sw_eq(curve: SWCurveSpec, p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Projective equality: X1*Z2 == X2*Z1 and Y1*Z2 == Y2*Z1, plus the
    both-at-infinity case (Z1 = Z2 = 0)."""
    q = curve.base
    l = ff.mont_mul(q, p1[..., 0:2, :], p2[..., 2:3, :])
    r = ff.mont_mul(q, p2[..., 0:2, :], p1[..., 2:3, :])
    cross = jnp.all(l == r, axis=(-2, -1))
    z1_zero = jnp.all(p1[..., 2, :] == 0, axis=-1)
    z2_zero = jnp.all(p2[..., 2, :] == 0, axis=-1)
    both_inf = z1_zero & z2_zero
    one_inf = z1_zero ^ z2_zero
    return both_inf | (cross & ~one_inf)
