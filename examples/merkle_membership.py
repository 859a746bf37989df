"""Merkle trees: host tier, device tier, and the membership gadget.

Mirrors the reference's `merkle_tree` module end-to-end
(src/merkle_tree/mod.rs + constraints.rs): build a tree, prove and
verify membership, update a leaf, then prove membership *in zero
knowledge* by synthesizing the PathVar circuit and checking it on
device.  The device tree (`sha256_device_tree`) is the TPU-native twin —
same roots, same proofs, built in one compiled dispatch per level.

Run: python examples/merkle_membership.py
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.crh.poseidon import (
    PoseidonCRH,
    PoseidonTwoToOneCRH,
)
from crypto_primitives_tpu.models.crh.sha256 import Sha256CRH, Sha256TwoToOneCRH
from crypto_primitives_tpu.models.merkle_tree import (
    ByteDigestConverter,
    ByteDigestDomain,
    FieldDigestDomain,
    IdentityDigestConverter,
    MerkleTree,
    MerkleTreeConfig,
)
from crypto_primitives_tpu.models.merkle_tree.device import sha256_device_tree
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.ops import BLS12_381_FR as FR
from crypto_primitives_tpu.r1cs.cs import ConstraintSystem
from crypto_primitives_tpu.r1cs.device_check import check_satisfied_device
from crypto_primitives_tpu.r1cs.gadgets.merkle import PathVar
from crypto_primitives_tpu.r1cs.gadgets.poseidon import (
    PoseidonCRHGadget,
    PoseidonTwoToOneCRHGadget,
)
from crypto_primitives_tpu.r1cs.vars import FpVar


def sha256_host_and_device():
    rng = random.Random(7)
    n = 16
    leaves = np.frombuffer(
        bytes(rng.randrange(256) for _ in range(n * 17)), dtype=np.uint8
    ).reshape(n, 17)

    config = MerkleTreeConfig(
        leaf_hash=Sha256CRH(),
        two_to_one_hash=Sha256TwoToOneCRH(),
        leaf_domain=ByteDigestDomain(32),
        inner_domain=ByteDigestDomain(32),
        leaf_inner_converter=ByteDigestConverter(32),
    )
    tree = MerkleTree.new(config, None, None, jnp.asarray(leaves))
    proof = tree.generate_proof(5)
    assert proof.verify(config, None, None, tree.root(), bytes(leaves[5]))
    assert not proof.verify(config, None, None, tree.root(), bytes(leaves[6]))
    print(f"sha256 host tree: root {tree.root().hex()[:16]}..., proof verifies")

    dev = sha256_device_tree(jnp.asarray(leaves))
    assert dev.root() == tree.root()
    assert dev.generate_proof(5).auth_path == proof.auth_path
    print("sha256 device tree: root and proofs bit-equal to the host tier")

    new_leaf = bytes(rng.randrange(256) for _ in range(17))
    tree.update(5, new_leaf)
    assert tree.generate_proof(5).verify(config, None, None, tree.root(), new_leaf)
    print("leaf 5 updated; fresh proof verifies against the new root")


def poseidon_membership_circuit():
    rng = random.Random(11)
    pcfg = get_default_poseidon_parameters(FR, 2, False)
    config = MerkleTreeConfig(
        leaf_hash=PoseidonCRH(FR),
        two_to_one_hash=PoseidonTwoToOneCRH(FR),
        leaf_domain=FieldDigestDomain(FR),
        inner_domain=FieldDigestDomain(FR),
        leaf_inner_converter=IdentityDigestConverter(),
    )
    leaves = [[rng.randrange(FR.p)] for _ in range(8)]
    tree = MerkleTree.new(config, pcfg, pcfg, jnp.asarray(FR.pack(leaves)))
    proof = tree.generate_proof(3)

    # the reference's verify_membership circuit (constraints.rs:96-140)
    cs = ConstraintSystem(FR)
    pv = PathVar.new_witness(cs, proof)
    root_var = FpVar.new_input(cs, tree.root())
    leaf_vars = [FpVar.new_witness(cs, v) for v in leaves[3]]
    ok = pv.verify_membership(
        PoseidonCRHGadget(pcfg), PoseidonTwoToOneCRHGadget(pcfg), root_var, leaf_vars
    )
    ok.fp.enforce_equal(FpVar.constant(cs, 1))
    assert cs.is_satisfied()          # exact python-int evaluation
    assert check_satisfied_device(cs)  # one XLA program over all constraints
    print(
        f"poseidon membership circuit: {cs.num_constraints} constraints, "
        "satisfied on host and device"
    )


if __name__ == "__main__":
    sha256_host_and_device()
    poseidon_membership_circuit()
