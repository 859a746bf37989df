"""Native<->gadget consistency — THE central reference test pattern
(SURVEY.md §4.1): compute natively, synthesize the circuit, assert the
gadget value matches and the constraint system is satisfied."""

import pytest

from crypto_primitives_tpu.models.merkle_tree import (
    FieldDigestDomain,
    IdentityDigestConverter,
    MerkleTree,
    MerkleTreeConfig,
)
from crypto_primitives_tpu.models.crh.poseidon import PoseidonCRH, PoseidonTwoToOneCRH
from crypto_primitives_tpu.models.sponge import (
    Felt,
    PoseidonSponge,
    get_default_poseidon_parameters,
)
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.r1cs import ConstraintSystem, FpVar
from crypto_primitives_tpu.r1cs.device_check import check_satisfied_device
from crypto_primitives_tpu.r1cs.gadgets.merkle import PathVar
from crypto_primitives_tpu.r1cs.gadgets.poseidon import (
    PoseidonCRHGadget,
    PoseidonSpongeVar,
    PoseidonTwoToOneCRHGadget,
)


@pytest.fixture(scope="module")
def pcfg():
    return get_default_poseidon_parameters(FR, 2, False)


def test_poseidon_sponge_gadget_vs_native(rng, pcfg):
    """sponge/poseidon/constraints.rs:308-347 pattern."""
    values = [rng.randrange(FR.p) for _ in range(5)]
    native = PoseidonSponge(pcfg)
    native.absorb_elements(values[:3])
    native.absorb_elements(values[3:])
    expect = native.squeeze_native_field_elements(3)

    cs = ConstraintSystem(FR)
    sponge = PoseidonSpongeVar(cs, pcfg)
    sponge.absorb([FpVar.new_witness(cs, v) for v in values[:3]])
    sponge.absorb([FpVar.new_witness(cs, v) for v in values[3:]])
    out = sponge.squeeze_field_elements(3)
    assert [o.value for o in out] == expect
    assert cs.is_satisfied()
    assert check_satisfied_device(cs)
    # s-box cost: alpha=17 -> 5 muls per s-boxed element
    cfg = pcfg
    sboxes = cfg.full_rounds * cfg.t + cfg.partial_rounds  # per permutation
    # sponge used >= 1 permutation; sanity: count is a multiple of 5
    assert cs.num_constraints % 5 == 0


def test_poseidon_crh_gadget(rng, pcfg):
    """crh/poseidon/constraints.rs pattern incl. constant folding (:44-52)."""
    crh = PoseidonCRH(FR)
    vals = [rng.randrange(FR.p) for _ in range(3)]
    native = crh.evaluate(pcfg, vals)
    cs = ConstraintSystem(FR)
    gadget = PoseidonCRHGadget(pcfg)
    out = gadget.evaluate(cs, [FpVar.new_witness(cs, v) for v in vals])
    assert out.value == native
    assert cs.is_satisfied()
    # constant inputs -> constant-folded, zero constraints
    cs2 = ConstraintSystem(FR)
    out2 = gadget.evaluate(cs2, [FpVar.constant(cs2, v) for v in vals])
    assert out2.value == native and out2.const
    assert cs2.num_constraints == 0


def test_poseidon_two_to_one_gadget(rng, pcfg):
    two = PoseidonTwoToOneCRH(FR)
    l, r = rng.randrange(FR.p), rng.randrange(FR.p)
    native = two.compress(pcfg, l, r)
    cs = ConstraintSystem(FR)
    g = PoseidonTwoToOneCRHGadget(pcfg)
    out = g.compress(cs, FpVar.new_witness(cs, l), FpVar.new_witness(cs, r))
    assert out.value == native
    assert cs.is_satisfied()


def _build_tree(rng, pcfg, n=8):
    import jax.numpy as jnp

    cfg = MerkleTreeConfig(
        PoseidonCRH(FR), PoseidonTwoToOneCRH(FR),
        FieldDigestDomain(FR), FieldDigestDomain(FR), IdentityDigestConverter(),
    )
    leaves = [[rng.randrange(FR.p)] for _ in range(n)]
    tree = MerkleTree.new(cfg, pcfg, pcfg, jnp.asarray(FR.pack(leaves)))
    return cfg, leaves, tree


@pytest.mark.slow
def test_merkle_path_gadget(rng, pcfg):
    """merkle_tree/constraints.rs verify_membership pattern
    (tests/constraints.rs:55-147), incl. the bad-root twin: with a wrong
    root the enforced circuit must be unsatisfied."""
    cfg, leaves, tree = _build_tree(rng, pcfg)
    root = tree.root()
    leaf_g = PoseidonCRHGadget(pcfg)
    two_g = PoseidonTwoToOneCRHGadget(pcfg)
    for i in (0, 3, 7):
        proof = tree.generate_proof(i)
        cs = ConstraintSystem(FR)
        pv = PathVar.new_witness(cs, proof)
        root_var = FpVar.new_input(cs, root)
        leaf_vars = [FpVar.new_witness(cs, v) for v in leaves[i]]
        ok = pv.verify_membership(leaf_g, two_g, root_var, leaf_vars)
        assert ok.value is True
        ok.fp.enforce_equal(FpVar.constant(cs, 1))
        assert cs.is_satisfied()
        assert check_satisfied_device(cs)

    # bad root: satisfaction must fail once enforced (should_panic twin)
    proof = tree.generate_proof(2)
    cs = ConstraintSystem(FR)
    pv = PathVar.new_witness(cs, proof)
    bad_root = FpVar.new_input(cs, (root + 1) % FR.p)
    leaf_vars = [FpVar.new_witness(cs, v) for v in leaves[2]]
    ok = pv.verify_membership(leaf_g, two_g, bad_root, leaf_vars)
    assert ok.value is False
    ok.fp.enforce_equal(FpVar.constant(cs, 1))
    assert not cs.is_satisfied()


def test_merkle_update_and_check_gadget(rng, pcfg):
    """tests/constraints.rs:156-210 twin."""
    cfg, leaves, tree = _build_tree(rng, pcfg)
    old_root = tree.root()
    i = 5
    proof = tree.generate_proof(i)
    new_leaf = [rng.randrange(FR.p)]
    snapshot = MerkleTree(
        cfg, pcfg, pcfg, tree.non_leaf_nodes.copy(), tree.leaf_nodes.copy(), tree.height
    )
    snapshot.update(i, new_leaf)
    new_root = snapshot.root()

    cs = ConstraintSystem(FR)
    pv = PathVar.new_witness(cs, proof)
    ok = pv.update_and_check(
        PoseidonCRHGadget(pcfg), PoseidonTwoToOneCRHGadget(pcfg),
        FpVar.new_input(cs, old_root), FpVar.new_input(cs, new_root),
        [FpVar.new_witness(cs, v) for v in leaves[i]],
        [FpVar.new_witness(cs, v) for v in new_leaf],
    )
    assert ok.value is True
    assert cs.is_satisfied()
