"""Verify drive: PointPathVar update_and_check (Pedersen merkle gadget
config) through the public boundary, 2-leaf tree to bound circuit size.
CPU-forced (axon TPU tunnel hung)."""

import random

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.crh.pedersen import (
    PedersenCRH,
    PedersenTwoToOneCRH,
    Window,
)
from crypto_primitives_tpu.models.merkle_tree import (
    MerkleTree,
    MerkleTreeConfig,
    PointDigestDomain,
    PointToBytesDigestConverter,
)
from crypto_primitives_tpu.ops.curves_known import JUBJUB
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.r1cs.cs import ConstraintSystem
from crypto_primitives_tpu.r1cs.gadgets.curve import TEAffineVar
from crypto_primitives_tpu.r1cs.gadgets.merkle import PointPathVar
from crypto_primitives_tpu.r1cs.gadgets.pedersen import (
    PedersenCRHGadget,
    PedersenTwoToOneCRHGadget,
)
from crypto_primitives_tpu.r1cs.vars import FpVar, UInt8

rng = random.Random(11)
leaf_crh = PedersenCRH(JUBJUB, Window(4, 16))
two = PedersenTwoToOneCRH(JUBJUB, Window(4, 256))
cfg = MerkleTreeConfig(
    leaf_hash=leaf_crh,
    two_to_one_hash=two,
    leaf_domain=PointDigestDomain(JUBJUB),
    inner_domain=PointDigestDomain(JUBJUB),
    leaf_inner_converter=PointToBytesDigestConverter(JUBJUB),
)
lp, tp = leaf_crh.setup(rng), two.setup(rng)
leaves = [bytes(rng.randrange(256) for _ in range(8)) for _ in range(2)]
dev_leaves = jnp.asarray(np.frombuffer(b"".join(leaves), np.uint8).reshape(2, 8))
tree = MerkleTree.new(cfg, lp, tp, dev_leaves)
old_root = tree.root()
proof = tree.generate_proof(0)

new_leaf = bytes(rng.randrange(256) for _ in range(8))
tree.update(0, new_leaf)
new_root = tree.root()

cs = ConstraintSystem(FR)
pv = PointPathVar.new_witness(cs, JUBJUB, proof)
leaf_g = PedersenCRHGadget(JUBJUB, Window(4, 16))
two_g = PedersenTwoToOneCRHGadget(JUBJUB, Window(4, 256))
old_root_var = TEAffineVar.new_input(cs, JUBJUB, old_root)
new_root_var = TEAffineVar.new_input(cs, JUBJUB, new_root)
old_vars = [UInt8.new_witness(cs, b) for b in leaves[0]]
new_vars = [UInt8.new_witness(cs, b) for b in new_leaf]
ok = pv.update_and_check(
    lp, tp, leaf_g, two_g, old_root_var, new_root_var, old_vars, new_vars
)
assert ok.value is True
ok.fp.enforce_equal(FpVar.constant(cs, 1))
assert cs.is_satisfied()
print("update_and_check OK, constraints:", cs.num_constraints, flush=True)
print("DRIVE PASSED", flush=True)
