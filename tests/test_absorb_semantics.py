"""Absorb-encoding semantic tests, mirroring the reference's robustness
suite (SURVEY §4.4): domain separation, length prefixes, derive-macro
equivalence, string absorption."""

import dataclasses

import pytest

from crypto_primitives_tpu.models.sponge import (
    Felt,
    PoseidonSponge,
    SWPointAbsorb,
    TEPointAbsorb,
    U8,
    U16,
    U32,
    U64,
    U128,
    WithLength,
    absorbable,
    get_default_poseidon_parameters,
    to_sponge_bytes,
    to_sponge_field_elements,
)
from crypto_primitives_tpu.ops.curves_known import JUBJUB
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR


@pytest.fixture(scope="module")
def pcfg():
    return get_default_poseidon_parameters(FR, 2, False)


def _squeeze_after(pcfg, value):
    s = PoseidonSponge(pcfg)
    s.absorb(value)
    return s.squeeze_native_field_elements(3)


def assert_different_encodings(pcfg, a, b):
    """tests.rs:242-258 pattern."""
    assert to_sponge_bytes(a, FR) != to_sponge_bytes(b, FR)
    assert _squeeze_after(pcfg, a) != _squeeze_after(pcfg, b)


def test_single_field_element(rng, pcfg):
    e = rng.randrange(FR.p)
    assert_different_encodings(pcfg, Felt(e), Felt((e + 1) % FR.p))


def test_list_with_constant_size_element(rng, pcfg):
    lst1 = [Felt(rng.randrange(FR.p)) for _ in range(32)]
    lst2 = list(lst1)
    lst2[3] = Felt((lst2[3].value + 1) % FR.p)
    assert_different_encodings(pcfg, lst1, lst2)


def test_list_with_nonconstant_size_element(pcfg):
    """tests.rs:279-303: variable-size lists need the length prefix."""
    lst1 = [WithLength([U8(1), U8(2), U8(3), U8(4)]), WithLength([U8(5), U8(6)])]
    lst2 = [WithLength([U8(1), U8(2)]), WithLength([U8(3), U8(4), U8(5), U8(6)])]
    assert_different_encodings(pcfg, lst1, lst2)
    # without the length prefix the two ARE ambiguous (encodings equal)
    flat1 = [U8(1), U8(2), U8(3), U8(4), U8(5), U8(6)]
    assert to_sponge_field_elements([U8(1), U8(2)], FR) + to_sponge_field_elements(
        [U8(3), U8(4), U8(5), U8(6)], FR
    ) != to_sponge_field_elements(flat1, FR)  # u8 batches self-prefix


def test_string_absorb(pcfg):
    """absorb.rs:471-496: two strings != their concatenation."""
    d1 = to_sponge_bytes("hello", FR) + to_sponge_bytes("world", FR)
    d2 = to_sponge_bytes("helloworld", FR)
    assert d1 != d2
    f1 = to_sponge_field_elements("hello", FR) + to_sponge_field_elements("world", FR)
    f2 = to_sponge_field_elements("helloworld", FR)
    assert f1 != f2


def test_absorb_derive_equivalence(pcfg):
    """absorb.rs:427-469: the derive twin equals field-by-field absorption."""

    @absorbable
    @dataclasses.dataclass
    class SubStruct:
        a: U8
        b: U16

    @absorbable
    @dataclasses.dataclass
    class TestStruct:
        a: U8
        b: U16
        c: U32
        d: U64
        e: U128
        f: Felt
        g: SubStruct

    v = TestStruct(U8(1), U16(2), U32(3), U64(4), U128(5), Felt(6), SubStruct(U8(7), U16(8)))
    s1 = PoseidonSponge(pcfg)
    s1.absorb(v)
    out_derived = s1.squeeze_bytes(32)
    s2 = PoseidonSponge(pcfg)
    for field in (v.a, v.b, v.c, v.d, v.e, v.f, v.g):
        s2.absorb(field)
    assert s2.squeeze_bytes(32) == out_derived
    # forgetting fields changes the output
    s3 = PoseidonSponge(pcfg)
    for field in (v.a, v.b, v.c):
        s3.absorb(field)
    assert s3.squeeze_bytes(32) != out_derived


def test_point_absorb_encodings(rng, pcfg):
    pt = JUBJUB.rand_point(rng)
    te = TEPointAbsorb(*pt)
    assert to_sponge_field_elements(te, FR) == [pt[0], pt[1]]
    sw = SWPointAbsorb(pt[0], pt[1], infinity=False)
    assert to_sponge_field_elements(sw, FR) == [pt[0], pt[1], 0]
    # TE bytes: x||y bigint LE
    assert to_sponge_bytes(te, FR) == pt[0].to_bytes(32, "little") + pt[1].to_bytes(32, "little")


def test_u8_batch_length_prefix(pcfg):
    """absorb.rs:137-141: u8 batches are length-prefixed; single u8 is not."""
    b1 = to_sponge_field_elements(bytes([7]), FR)
    single = to_sponge_field_elements(U8(7), FR)
    assert single == [7]
    assert b1 != single
    # prefix = u64 LE length packed with the data
    expect_bytes = (1).to_bytes(8, "little") + bytes([7])
    val = int.from_bytes(expect_bytes, "little")
    assert b1 == [val]
