"""In-circuit twisted-Edwards arithmetic.

Replaces what the reference's gadgets get from ark-r1cs-std's curve vars
(AffineVar with complete TE addition, scalar_mul_le,
precomputed_base_multiscalar_mul_le, TwoBit/ThreeBitCondNeg lookups —
used by src/crh/pedersen/constraints.rs:48-76, bowe_hopwood/constraints.rs:51-94,
signature/schnorr/constraints.rs:60-77, encryption/elgamal/constraints.rs:206-237).

Decomposition costs (documented deltas where we chose differently):
  * variable+variable complete addition: 6 constraints
    (u=x1x2, v=y1y2, w=uv, x3(1+dw)=s-u-v, y3(1-dw)=v-au with s free);
  * variable+constant addition: 3 (u, v become linear);
  * conditional constant add: 3 + 2 selects = 5 per bit;
  * 2-bit lookup: 1 constraint (ark: 2); 3-bit cond-neg lookup: +1.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from crypto_primitives_tpu.ops.curve import TECurveSpec
from crypto_primitives_tpu.r1cs.cs import ConstraintSystem
from crypto_primitives_tpu.r1cs.vars import Boolean, FpVar, UInt8


class TEAffineVar:
    """An affine TE point in the circuit (coordinates over the base field,
    which must equal the constraint field)."""

    def __init__(self, curve: TECurveSpec, x: FpVar, y: FpVar):
        self.curve = curve
        self.x = x
        self.y = y

    @property
    def value(self) -> Tuple[int, int]:
        return (self.x.value, self.y.value)

    @property
    def cs(self) -> ConstraintSystem:
        return self.x.cs

    @classmethod
    def constant(cls, cs: ConstraintSystem, curve: TECurveSpec, pt) -> "TEAffineVar":
        return cls(curve, FpVar.constant(cs, pt[0]), FpVar.constant(cs, pt[1]))

    @classmethod
    def new_witness(cls, cs: ConstraintSystem, curve: TECurveSpec, pt) -> "TEAffineVar":
        return cls(curve, FpVar.new_witness(cs, pt[0]), FpVar.new_witness(cs, pt[1]))

    @classmethod
    def new_input(cls, cs: ConstraintSystem, curve: TECurveSpec, pt) -> "TEAffineVar":
        return cls(curve, FpVar.new_input(cs, pt[0]), FpVar.new_input(cs, pt[1]))

    @classmethod
    def identity(cls, cs: ConstraintSystem, curve: TECurveSpec) -> "TEAffineVar":
        return cls.constant(cs, curve, (0, 1))

    def negate(self) -> "TEAffineVar":
        return TEAffineVar(self.curve, -self.x, self.y)

    def add(self, other: "TEAffineVar") -> "TEAffineVar":
        """Complete TE addition (6 constraints; 3 if either side constant)."""
        cs, curve = self.cs, self.curve
        p = curve.base.p
        u = self.x * other.x
        v = self.y * other.y
        w = u * v  # x1 x2 y1 y2
        s = (self.x + self.y) * (other.x + other.y) if not (
            self.x.const and self.y.const or other.x.const and other.y.const
        ) else None
        if s is None:
            # one side fully constant: x1y2+x2y1 is linear
            if other.x.const and other.y.const:
                num = self.x.scale(other.y.value) + self.y.scale(other.x.value)
            else:
                num = other.x.scale(self.y.value) + other.y.scale(self.x.value)
        else:
            num = s - u - v
        one = FpVar.constant(cs, 1)
        denom_x = one + w.scale(curve.d)
        denom_y = one - w.scale(curve.d)
        x3 = num.mul_by_inverse(denom_x)
        y3 = (v - u.scale(curve.a)).mul_by_inverse(denom_y)
        return TEAffineVar(curve, x3, y3)

    def double(self) -> "TEAffineVar":
        return self.add(self)

    @staticmethod
    def select(cond: Boolean, a: "TEAffineVar", b: "TEAffineVar") -> "TEAffineVar":
        return TEAffineVar(
            a.curve, FpVar.select(cond, a.x, b.x), FpVar.select(cond, a.y, b.y)
        )

    def conditional_add_constant(self, bit: Boolean, pt) -> "TEAffineVar":
        """self + bit * constant-point (5 constraints)."""
        added = self.add(TEAffineVar.constant(self.cs, self.curve, pt))
        return TEAffineVar.select(bit, added, self)

    def scalar_mul_le(self, bits: Sequence[Boolean]) -> "TEAffineVar":
        """Variable-base double-and-add over LSB-first bits (ark
        scalar_mul_le shape)."""
        cs, curve = self.cs, self.curve
        acc = TEAffineVar.identity(cs, curve)
        base = self
        for i, bit in enumerate(bits):
            acc = TEAffineVar.select(bit, acc.add(base), acc)
            if i + 1 < len(bits):
                base = base.double()
        return acc

    def enforce_equal(self, other: "TEAffineVar"):
        self.x.enforce_equal(other.x)
        self.y.enforce_equal(other.y)

    def is_eq(self, other: "TEAffineVar") -> Boolean:
        return self.x.is_eq(other.x) & self.y.is_eq(other.y)


def precomputed_base_multiscalar_mul_le(
    cs: ConstraintSystem, curve: TECurveSpec, tables, bits: Sequence[Boolean]
) -> TEAffineVar:
    """sum over windows/powers of bit-conditional constant adds — the ark
    precomputed_base_multiscalar_mul_le twin used by the Pedersen gadget
    (crh/pedersen/constraints.rs:48-76).  `tables` = generators[w][j] host
    points, flattened window-major alongside the bit order."""
    flat = [g for win in tables for g in win]
    assert len(bits) <= len(flat)
    acc = TEAffineVar.identity(cs, curve)
    for bit, pt in zip(bits, flat):
        acc = acc.conditional_add_constant(bit, pt)
    return acc


def two_bit_lookup(cs: ConstraintSystem, b0: Boolean, b1: Boolean, consts: List[int]) -> FpVar:
    """c[b0 + 2*b1] via one multiplicative constraint (ark TwoBitLookupGadget
    twin; our decomposition costs 1 vs ark's 2)."""
    c0, c1, c2, c3 = [c % cs.field.p for c in consts]
    t = (b0 & b1).fp  # 1 constraint (free if either const)
    out = (
        FpVar.constant(cs, c0)
        + b0.fp.scale(c1 - c0)
        + b1.fp.scale(c2 - c0)
        + t.scale(c3 - c2 - c1 + c0)
    )
    return out


def three_bit_cond_neg_lookup(
    cs: ConstraintSystem, b0: Boolean, b1: Boolean, b2: Boolean, consts: List[int]
) -> FpVar:
    """lookup(b0,b1) * (1 - 2*b2) (ark ThreeBitCondNegLookupGadget twin)."""
    y = two_bit_lookup(cs, b0, b1, consts)
    return y - (b2.fp * y).scale(2)


def fpvar_to_bytes_le(v: FpVar, nbytes: int) -> List[UInt8]:
    """In-circuit `to_bytes` of a field element: full bit decomposition
    packed into UInt8s (the ToBytesGadget path that pedersen's compress
    uses, crh/pedersen/constraints.rs:91-130)."""
    cs = v.cs
    nbits = cs.field.nbits
    bits = v.to_bits_le(nbits)
    bits = bits + [Boolean.constant(cs, False)] * (8 * nbytes - nbits)
    return [UInt8(cs, bits[8 * i : 8 * i + 8]) for i in range(nbytes)]
