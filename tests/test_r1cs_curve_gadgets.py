"""Curve-based gadget twins vs native (Pedersen CRH/commitment,
Bowe-Hopwood, injective map, Schnorr randomize-pk, ElGamal encrypt) —
the reference's native<->gadget pattern for each constraints.rs."""

import pytest

from crypto_primitives_tpu.models.commitment.pedersen import PedersenCommitment
from crypto_primitives_tpu.models.crh.bowe_hopwood import BoweHopwoodCRH
from crypto_primitives_tpu.models.crh.injective_map import PedersenCRHCompressor
from crypto_primitives_tpu.models.crh.pedersen import (
    PedersenCRH,
    PedersenTwoToOneCRH,
    Window,
)
from crypto_primitives_tpu.models.encryption.elgamal import ElGamal
from crypto_primitives_tpu.models.signature.schnorr import Schnorr
from crypto_primitives_tpu.ops.curves_known import JUBJUB
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.r1cs import ConstraintSystem
from crypto_primitives_tpu.r1cs.gadgets.curve import TEAffineVar
from crypto_primitives_tpu.r1cs.gadgets.elgamal import ElGamalEncGadget
from crypto_primitives_tpu.r1cs.gadgets.pedersen import (
    BoweHopwoodCRHGadget,
    PedersenCommitmentGadget,
    PedersenCRHCompressorGadget,
    PedersenCRHGadget,
    PedersenTwoToOneCRHGadget,
)
from crypto_primitives_tpu.r1cs.gadgets.signature import SchnorrRandomizePkGadget
from crypto_primitives_tpu.r1cs.vars import Boolean, bytes_to_uint8s

W = Window(window_size=4, num_windows=16)


def test_te_affine_var_ops(rng):
    cs = ConstraintSystem(FR)
    p1 = JUBJUB.rand_point(rng)
    p2 = JUBJUB.rand_point(rng)
    v1 = TEAffineVar.new_witness(cs, JUBJUB, p1)
    v2 = TEAffineVar.new_witness(cs, JUBJUB, p2)
    assert v1.add(v2).value == JUBJUB.add_host(p1, p2)
    assert v1.double().value == JUBJUB.double_host(p1)
    # constant add costs 3 constraints
    n0 = cs.num_constraints
    v1.add(TEAffineVar.constant(cs, JUBJUB, p2))
    assert cs.num_constraints - n0 == 3
    # scalar mul
    k = rng.randrange(1 << 16)
    bits = [Boolean.new_witness(cs, bool((k >> i) & 1)) for i in range(16)]
    assert v1.scalar_mul_le(bits).value == JUBJUB.scalar_mul_host(p1, k)
    assert cs.is_satisfied()


def test_pedersen_crh_gadget_vs_native(rng):
    """crh/pedersen/constraints.rs:203-250 pattern."""
    crh = PedersenCRH(JUBJUB, W)
    params = crh.setup(rng)
    msg = bytes(rng.randrange(256) for _ in range(8))
    native = crh.evaluate(params, msg)
    cs = ConstraintSystem(FR)
    out = PedersenCRHGadget(JUBJUB, W).evaluate(cs, params, bytes_to_uint8s(cs, msg, "witness"))
    assert out.value == native
    assert cs.is_satisfied()


def test_pedersen_two_to_one_gadget_and_compress(rng):
    two = PedersenTwoToOneCRH(JUBJUB, Window(4, 256))
    params = two.setup(rng)
    l = bytes(rng.randrange(256) for _ in range(32))
    r = bytes(rng.randrange(256) for _ in range(32))
    native = two.evaluate(params, l, r)
    cs = ConstraintSystem(FR)
    g = PedersenTwoToOneCRHGadget(JUBJUB, Window(4, 256))
    out = g.evaluate(cs, params, bytes_to_uint8s(cs, l, "witness"), bytes_to_uint8s(cs, r, "witness"))
    assert out.value == native
    # in-circuit compress of two digests
    native2 = two.compress(params, native, native)
    out2 = g.compress(cs, params, out, out)
    assert out2.value == native2
    assert cs.is_satisfied()


def test_bowe_hopwood_gadget_vs_native(rng):
    """bowe_hopwood/constraints.rs:214-274 pattern + input-size guard."""
    w = Window(window_size=8, num_windows=4)
    bh = BoweHopwoodCRH(JUBJUB, w)
    params = bh.setup(rng)
    msg = bytes(rng.randrange(256) for _ in range(12))
    native = bh.evaluate(params, msg)
    cs = ConstraintSystem(FR)
    out = BoweHopwoodCRHGadget(JUBJUB, w).evaluate(cs, params, bytes_to_uint8s(cs, msg, "witness"))
    assert out.value == native
    assert cs.is_satisfied()
    with pytest.raises(ValueError):
        BoweHopwoodCRHGadget(JUBJUB, w).evaluate(
            cs, params, bytes_to_uint8s(cs, bytes(100), "witness")
        )


def test_injective_map_gadget(rng):
    comp = PedersenCRHCompressor(JUBJUB, W)
    params = comp.setup(rng)
    msg = bytes(rng.randrange(256) for _ in range(8))
    native = comp.evaluate(params, msg)
    cs = ConstraintSystem(FR)
    out = PedersenCRHCompressorGadget(JUBJUB, W).evaluate(
        cs, params, bytes_to_uint8s(cs, msg, "witness")
    )
    assert out.value == native
    assert cs.is_satisfied()


def test_pedersen_commitment_gadget_vs_native(rng):
    """commitment/pedersen/constraints.rs:157-205 pattern."""
    comm = PedersenCommitment(JUBJUB, Window(4, 96))  # up to 48-byte input
    params = comm.setup(rng)
    msg = bytes(rng.randrange(256) for _ in range(16))
    r = comm.rand_randomness(rng)
    native = comm.commit(params, msg, r)
    cs = ConstraintSystem(FR)
    g = PedersenCommitmentGadget(JUBJUB, Window(4, 96))
    rbits = g.randomness_bits(cs, r)
    out = g.commit(cs, params, bytes_to_uint8s(cs, msg, "witness"), rbits)
    assert out.value == native
    assert cs.is_satisfied()


def test_schnorr_randomize_pk_gadget(rng):
    """schnorr/constraints.rs:119-159 pattern (randomize-pk only — the
    reference implements no Schnorr verify circuit)."""
    scheme = Schnorr(JUBJUB)
    params = scheme.setup(rng)
    pk, _ = scheme.keygen(params, rng)
    randomness = bytes(rng.randrange(256) for _ in range(32))
    native = scheme.randomize_public_key(params, pk, randomness)
    cs = ConstraintSystem(FR)
    pk_var = TEAffineVar.new_witness(cs, JUBJUB, pk)
    out = SchnorrRandomizePkGadget(JUBJUB).randomize(
        cs, params, pk_var, bytes_to_uint8s(cs, randomness, "witness")
    )
    assert out.value == native
    assert cs.is_satisfied()


def test_elgamal_enc_gadget(rng):
    """encryption/elgamal/constraints.rs:251-308 pattern."""
    scheme = ElGamal(JUBJUB)
    params = scheme.setup(rng)
    pk, _ = scheme.keygen(params, rng)
    msg = JUBJUB.rand_point(rng)
    r = scheme.rand_randomness(rng)
    native = scheme.encrypt(params, pk, msg, r)
    cs = ConstraintSystem(FR)
    g = ElGamalEncGadget(JUBJUB)
    out = g.encrypt(
        cs, params,
        TEAffineVar.new_witness(cs, JUBJUB, msg),
        g.randomness_bits(cs, r),
        TEAffineVar.new_witness(cs, JUBJUB, pk),
    )
    assert out.value == native
    assert cs.is_satisfied()
