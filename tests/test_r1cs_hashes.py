"""SHA-256 / BLAKE2s gadget parity vs hashlib + the reference's pinned
circuit-size regressions (21792 constraints for one Blake2s block,
src/prf/blake2s/constraints.rs:416; 0 constraints for constant input,
:473-481)."""

import hashlib

import pytest

from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.r1cs import ConstraintSystem, UInt8
from crypto_primitives_tpu.r1cs.device_check import check_satisfied_device
from crypto_primitives_tpu.r1cs.gadgets.blake2s import (
    Blake2sCommitmentGadget,
    Blake2sPRFGadget,
    OutputVar,
    evaluate_blake2s,
)
from crypto_primitives_tpu.r1cs.gadgets.sha256 import (
    Sha256CRHGadget,
    Sha256TwoToOneCRHGadget,
)
from crypto_primitives_tpu.r1cs.vars import Boolean, bytes_to_uint8s


# the reference probes these boundary lengths (sha256/constraints.rs:391-393)
@pytest.mark.parametrize("n", [0, 1, 55, 56, 64, 65])
def test_sha256_gadget_vs_hashlib(rng, n):
    data = bytes(rng.randrange(256) for _ in range(n))
    cs = ConstraintSystem(FR)
    inp = bytes_to_uint8s(cs, data, "witness")
    out = Sha256CRHGadget().evaluate(cs, inp)
    assert out.value == hashlib.sha256(data).digest()
    assert cs.is_satisfied()
    if n == 65:  # two-block message: exercise the device checker at scale
        assert check_satisfied_device(cs)


def test_sha256_two_to_one_and_compress(rng):
    l = bytes(rng.randrange(256) for _ in range(32))
    r = bytes(rng.randrange(256) for _ in range(32))
    cs = ConstraintSystem(FR)
    g = Sha256TwoToOneCRHGadget()
    out = g.evaluate(cs, bytes_to_uint8s(cs, l, "witness"), bytes_to_uint8s(cs, r, "witness"))
    h = hashlib.sha256()
    h.update(l)
    h.update(r)
    assert out.value == h.digest()
    out2 = g.compress(cs, out, out)
    assert out2.value == hashlib.sha256(h.digest() + h.digest()).digest()
    assert cs.is_satisfied()


def test_blake2s_gadget_pinned_constraint_count(rng):
    """One 512-bit block with witness input: EXACTLY 21792 constraints —
    bit-for-bit parity with the reference regression."""
    data = bytes(rng.randrange(256) for _ in range(64))
    cs = ConstraintSystem(FR)
    bits = [b for by in bytes_to_uint8s(cs, data, "witness") for b in by.bits]
    out = OutputVar.from_words(cs, evaluate_blake2s(cs, bits))
    assert out.value == hashlib.blake2s(data).digest()
    assert cs.num_constraints == 21792
    assert cs.is_satisfied()
    assert check_satisfied_device(cs)


def test_blake2s_gadget_constant_input_zero_constraints():
    data = bytes(range(64))
    cs = ConstraintSystem(FR)
    bits = [b for by in bytes_to_uint8s(cs, data, "constant") for b in by.bits]
    out = OutputVar.from_words(cs, evaluate_blake2s(cs, bits))
    assert out.value == hashlib.blake2s(data).digest()
    assert cs.num_constraints == 0


@pytest.mark.parametrize("n", [0, 3, 32, 63, 64, 65, 128])
def test_blake2s_gadget_lengths(rng, n):
    """Multi-block lengths (the reference tests 0..32 and multiples of 8 up
    to 256, prf/blake2s/constraints.rs:484-524)."""
    data = bytes(rng.randrange(256) for _ in range(n))
    cs = ConstraintSystem(FR)
    bits = [b for by in bytes_to_uint8s(cs, data, "witness") for b in by.bits]
    out = OutputVar.from_words(cs, evaluate_blake2s(cs, bits))
    assert out.value == hashlib.blake2s(data).digest()
    assert cs.is_satisfied()


def test_blake2s_prf_gadget(rng):
    seed = bytes(rng.randrange(256) for _ in range(32))
    inp = bytes(rng.randrange(256) for _ in range(32))
    cs = ConstraintSystem(FR)
    seed_v = Blake2sPRFGadget.new_seed(cs, seed)
    out = Blake2sPRFGadget.evaluate(cs, seed_v, bytes_to_uint8s(cs, inp, "witness"))
    assert out.value == hashlib.blake2s(seed + inp).digest()
    assert cs.is_satisfied()


def test_blake2s_commitment_gadget(rng):
    from crypto_primitives_tpu.models.commitment.blake2s import Blake2sCommitment

    m = bytes(rng.randrange(256) for _ in range(20))
    r = bytes(rng.randrange(256) for _ in range(32))
    native = Blake2sCommitment().commit(None, m, r)
    cs = ConstraintSystem(FR)
    out = Blake2sCommitmentGadget.commit(
        cs, bytes_to_uint8s(cs, m, "witness"), bytes_to_uint8s(cs, r, "witness")
    )
    assert out.value == native
    assert cs.is_satisfied()
