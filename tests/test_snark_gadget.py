"""SNARKGadget protocol (snark/constraints.rs:25-116) exercised end-to-end
through the MockLinSNARK test double: native prove/verify, in-circuit
verify over a different constraint field via BooleanInputVar, processed-vk
path, unchecked-vs-checked allocator constraint counts, verifier_size
ordering, and repack_input native/gadget agreement."""

import random

import pytest

from crypto_primitives_tpu.ops.field import FieldSpec
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as CF
from crypto_primitives_tpu.r1cs.cs import ConstraintSystem
from crypto_primitives_tpu.r1cs.snark import BooleanInputVar, repack_input
from crypto_primitives_tpu.r1cs.snark_gadget import (
    MockLinSNARK,
    MockLinSNARKGadget,
    MockProofVar,
    MockVerifyingKeyVar,
)

F = FieldSpec("m61", 2**61 - 1)


@pytest.fixture()
def rng():
    return random.Random(20260817)


def _setup(rng, n=3):
    snark = MockLinSNARK(F)
    pk, vk = snark.circuit_specific_setup(n, rng)
    x = [rng.randrange(F.p) for _ in range(n)]
    proof = snark.prove(pk, x)
    return snark, vk, x, proof


def test_native_roundtrip(rng):
    snark, vk, x, proof = _setup(rng)
    assert snark.verify(vk, x, proof) is True
    assert snark.verify(vk, x, type(proof)((proof.s + 1) % F.p)) is False
    pvk = snark.process_vk(vk)
    assert snark.verify_with_processed_vk(pvk, x, proof) is True


def test_gadget_verify_true_and_false(rng):
    snark, vk, x, proof = _setup(rng)
    for tamper in (False, True):
        cs = ConstraintSystem(CF)
        vk_var = MockVerifyingKeyVar.new_variable(cs, vk, "witness")
        x_var = BooleanInputVar.new_input(cs, x, F)
        p = proof if not tamper else type(proof)((proof.s + 1) % F.p)
        p_var = MockProofVar.new_variable(cs, p, "witness", f=F)
        ok = MockLinSNARKGadget.verify(vk_var, x_var, p_var)
        assert bool(ok.value) is (not tamper)
        assert cs.is_satisfied()
        assert cs.num_constraints > 0


def test_gadget_processed_vk_path(rng):
    snark, vk, x, proof = _setup(rng)
    pvk = snark.process_vk(vk)
    cs = ConstraintSystem(CF)
    pvk_var = MockLinSNARKGadget.ProcessedVerifyingKeyVar.new_variable(
        cs, pvk, "constant"
    )
    x_var = BooleanInputVar.new_input(cs, x, F)
    p_var = MockProofVar.new_variable(cs, proof, "witness", f=F)
    ok = MockLinSNARKGadget.verify_with_processed_vk(pvk_var, x_var, p_var)
    assert bool(ok.value) is True
    assert cs.is_satisfied()


def test_unchecked_allocators_skip_range_checks(rng):
    """new_*_unchecked default to the plain allocators — fewer constraints
    than the checked variants (constraints.rs:46-82 default semantics)."""
    snark, vk, x, proof = _setup(rng)
    cs_u = ConstraintSystem(CF)
    MockLinSNARKGadget.new_verification_key_unchecked(cs_u, vk)
    MockLinSNARKGadget.new_proof_unchecked(cs_u, proof)
    n_unchecked = cs_u.num_constraints
    cs_c = ConstraintSystem(CF)
    MockVerifyingKeyVar.new_variable(cs_c, vk, "witness", checked=True)
    MockProofVar.new_variable(cs_c, proof, "witness", f=F, checked=True)
    n_checked = cs_c.num_constraints
    assert n_unchecked == 0
    assert n_checked > n_unchecked
    assert cs_c.is_satisfied()


def test_verifier_size_partial_ord(rng):
    snark = MockLinSNARK(F)
    _, vk2 = snark.circuit_specific_setup(2, rng)
    _, vk5 = snark.circuit_specific_setup(5, rng)
    assert MockLinSNARKGadget.verifier_size(vk2) < MockLinSNARKGadget.verifier_size(vk5)


def test_repack_input_matches_gadget_values(rng):
    """Native repack_input and BooleanInputVar.new_input allocate the same
    packed CF inputs (constraints.rs:266-318 vs :180-263)."""
    x = [rng.randrange(F.p) for _ in range(4)]
    packed = repack_input(x, F, CF)
    cs = ConstraintSystem(CF)
    var = BooleanInputVar.new_input(cs, x, F)
    assert var.values() == x
    got = [cs.assignments[i] for i in cs._instance_vars[: len(packed)]]
    assert got == packed


def test_gadget_verify_same_field(rng):
    """F == CF degenerate recursion still flows through the protocol."""
    snark = MockLinSNARK(F)
    pk, vk = snark.circuit_specific_setup(2, rng)
    x = [rng.randrange(F.p) for _ in range(2)]
    proof = snark.prove(pk, x)
    cs = ConstraintSystem(CF)  # CF != F here is the supported shape;
    vk_var = MockVerifyingKeyVar.new_variable(cs, vk, "constant")
    x_var = BooleanInputVar.new_witness(cs, x, F)
    p_var = MockProofVar.new_variable(cs, proof, "constant", f=F)
    ok = MockLinSNARKGadget.verify(vk_var, x_var, p_var)
    assert bool(ok.value) is True
    assert cs.is_satisfied()
