"""R1CS core: variables, constraints, device satisfaction check."""

import pytest

from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.r1cs import Boolean, ConstraintSystem, FpVar, UInt32, UInt8
from crypto_primitives_tpu.r1cs.device_check import check_satisfied_device


def test_fpvar_arithmetic(rng):
    cs = ConstraintSystem(FR)
    x = FpVar.new_witness(cs, 7)
    y = FpVar.new_input(cs, 11)
    z = (x + y) * x - y.scale(3)
    assert z.value == ((7 + 11) * 7 - 33) % FR.p
    assert cs.num_constraints == 1  # one nonlinear mul
    assert cs.is_satisfied()
    inv = y.inverse()
    assert (inv.value * 11) % FR.p == 1
    w = x.pow_by_constant(17)
    assert w.value == pow(7, 17, FR.p)
    assert cs.is_satisfied()
    # constant folding: no constraints for constant muls
    n0 = cs.num_constraints
    c = FpVar.constant(cs, 5) * FpVar.constant(cs, 6)
    assert c.value == 30 and c.const and cs.num_constraints == n0


def test_enforce_and_tamper():
    cs = ConstraintSystem(FR)
    x = FpVar.new_witness(cs, 4)
    y = x * x
    y.enforce_equal(FpVar.constant(cs, 16))
    assert cs.is_satisfied()
    assert check_satisfied_device(cs)
    # tamper with the witness -> unsatisfied (host and device agree)
    cs.assignments[1] = 5
    cs.assignments[2] = 20  # 5*5 != 20
    assert not cs.is_satisfied()
    assert not check_satisfied_device(cs)


def test_boolean_ops():
    cs = ConstraintSystem(FR)
    a = Boolean.new_witness(cs, True)
    b = Boolean.new_witness(cs, False)
    assert (a ^ b).value is True
    assert (a & b).value is False
    assert (a | b).value is True
    assert a.not_().value is False
    # xor with constant is free
    n0 = cs.num_constraints
    c = a ^ Boolean.constant(cs, True)
    assert c.value is False and cs.num_constraints == n0
    assert cs.is_satisfied()


def test_is_eq_and_select(rng):
    cs = ConstraintSystem(FR)
    x = FpVar.new_witness(cs, 9)
    y = FpVar.new_witness(cs, 9)
    z = FpVar.new_witness(cs, 10)
    assert x.is_eq(y).value is True
    assert x.is_eq(z).value is False
    s = FpVar.select(x.is_eq(y), x, z)
    assert s.value == 9
    assert cs.is_satisfied()


def test_uint32(rng):
    cs = ConstraintSystem(FR)
    a = UInt32.new_witness(cs, 0xDEADBEEF)
    b = UInt32.new_witness(cs, 0x12345678)
    assert (a ^ b).value == 0xDEADBEEF ^ 0x12345678
    assert a.rotr(7).value == ((0xDEADBEEF >> 7) | (0xDEADBEEF << 25)) & 0xFFFFFFFF
    assert a.shr(3).value == 0xDEADBEEF >> 3
    s = UInt32.addmany([a, b, UInt32.constant(cs, 1)])
    assert s.value == (0xDEADBEEF + 0x12345678 + 1) & 0xFFFFFFFF
    assert cs.is_satisfied()
    assert check_satisfied_device(cs)
    # addmany constraint shape: 34-bit decomposition + packing = 35
    cs2 = ConstraintSystem(FR)
    x = UInt32.new_witness(cs2, 1)
    y = UInt32.new_witness(cs2, 2)
    n0 = cs2.num_constraints
    UInt32.addmany([x, y, UInt32.constant(cs2, 3)])
    assert cs2.num_constraints - n0 == 35


def test_to_bits_roundtrip(rng):
    cs = ConstraintSystem(FR)
    v = rng.randrange(1 << 64)
    x = FpVar.new_witness(cs, v)
    bits = x.to_bits_le(64)
    assert sum(int(b.value) << i for i, b in enumerate(bits)) == v
    assert cs.is_satisfied()
    # wrong witness bit breaks satisfaction
    idx = bits[0].fp.lc.terms
    var = next(iter(idx))
    cs.assignments[var] = 1 - cs.assignments[var]
    assert not cs.is_satisfied()
