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


# ---------------- short-Weierstrass gadget vars (round 2) ----------------

from crypto_primitives_tpu.models.sponge.absorb import (
    SWPointAbsorb,
    to_sponge_field_elements,
)
from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1 as G1
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FQ as FQ
from crypto_primitives_tpu.r1cs.gadgets.absorb import absorb_gadget
from crypto_primitives_tpu.r1cs.gadgets.curve import SWProjectiveVar


def test_sw_projective_var_ops(rng):
    """Complete-RCB in-circuit ops vs the host oracle, incl. the identity
    and doubling cases the complete law must cover."""
    cs = ConstraintSystem(FQ)
    p1 = G1.rand_point(rng)
    p2 = G1.rand_point(rng)
    v1 = SWProjectiveVar.new_witness(cs, G1, p1)
    v2 = SWProjectiveVar.new_witness(cs, G1, p2)
    assert v1.add(v2).value == G1.add_host(p1, p2)
    assert v1.double().value == G1.double_host(p1)
    assert v1.add(v1.negate()).value is None
    ident = SWProjectiveVar.identity(cs, G1)
    assert ident.add(v1).value == p1
    assert v1.add(ident).value == p1
    k = rng.randrange(1 << 16)
    bits = [Boolean.new_witness(cs, bool((k >> i) & 1)) for i in range(16)]
    assert v1.scalar_mul_le(bits).value == G1.scalar_mul_host(p1, k)
    assert cs.is_satisfied()


def test_sw_affine_var_to_affine(rng):
    cs = ConstraintSystem(FQ)
    p1 = G1.rand_point(rng)
    aff = SWProjectiveVar.new_witness(cs, G1, p1).to_affine()
    assert (aff.x.value, aff.y.value) == p1
    assert aff.infinity.value is False
    # infinity representative is (0, 1) + flag (r1cs-std to_affine semantics)
    inf = SWProjectiveVar.new_witness(cs, G1, None).to_affine()
    assert inf.infinity.value is True
    assert (inf.x.value, inf.y.value) == (0, 1)
    assert cs.is_satisfied()


def test_sw_absorb_gadget_vs_native(rng):
    """Twin of the reference's sw_curve_consistency_check
    (sponge/constraints/absorb.rs:270-311): gadget sponge encoding of a
    random SW point equals the native Absorb encoding."""
    cs = ConstraintSystem(FQ)
    p1 = G1.rand_point(rng)
    native = to_sponge_field_elements(SWPointAbsorb(p1[0], p1[1]), FQ)
    var = SWProjectiveVar.new_witness(cs, G1, p1)
    gadget = absorb_gadget(cs, var.to_affine())
    assert [g.value for g in gadget] == native
    # projective var absorbs via to_affine (absorb.rs:142-166)
    gadget_proj = absorb_gadget(cs, var)
    assert [g.value for g in gadget_proj] == native
    assert cs.is_satisfied()


def test_pedersen_crh_gadget_sw_curve(rng):
    """The reference Pedersen gadget is generic over CurveVar incl. SW
    projective vars (crh/pedersen/constraints.rs:23-46); check the SW
    instantiation against the (curve-generic) native CRH."""
    win = Window(window_size=4, num_windows=8)
    crh = PedersenCRH(G1, win)
    params = crh.setup(rng)
    msg = bytes(rng.randrange(256) for _ in range(4))
    native = crh.evaluate(params, msg)
    cs = ConstraintSystem(FQ)
    gadget = PedersenCRHGadget(G1, win)
    out = gadget.evaluate(cs, params, bytes_to_uint8s(cs, msg))
    assert out.value == native
    assert cs.is_satisfied()


def test_schnorr_randomize_pk_gadget_sw(rng):
    """The curve-generic randomize gadget over an SW curve var
    (schnorr/constraints.rs:32-59 is generic over GC: CurveVar; Pallas
    instantiation with SWProjectiveVar)."""
    from crypto_primitives_tpu.ops.curves_known import PALLAS
    from crypto_primitives_tpu.r1cs.gadgets.curve import SWProjectiveVar

    scheme = Schnorr(PALLAS)
    params = scheme.setup(rng)
    pk, _ = scheme.keygen(params, rng)
    randomness = bytes(rng.randrange(256) for _ in range(32))
    native = scheme.randomize_public_key(params, pk, randomness)
    cs = ConstraintSystem(PALLAS.base)
    gadget = SchnorrRandomizePkGadget(PALLAS)
    assert gadget.var_for_curve(PALLAS) is SWProjectiveVar
    pk_var = SWProjectiveVar.new_witness(cs, PALLAS, pk)
    out = gadget.randomize(
        cs, params, pk_var, bytes_to_uint8s(cs, randomness, "witness")
    )
    assert out.value == native
    assert cs.is_satisfied()
