"""Verify drive: Pedersen byte-tree Merkle config (reference
src/merkle_tree/tests/mod.rs:5-183 twin) through the public boundary.
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
from crypto_primitives_tpu.models.merkle_tree.device import pedersen_device_tree
from crypto_primitives_tpu.ops.curves_known import JUBJUB

rng = random.Random(5)
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
leaves = [bytes(rng.randrange(256) for _ in range(8)) for _ in range(8)]
dev_leaves = jnp.asarray(np.frombuffer(b"".join(leaves), np.uint8).reshape(8, 8))
tree = MerkleTree.new(cfg, lp, tp, dev_leaves)
root = tree.root()
assert tree.generate_proof(2).verify(cfg, lp, tp, root, leaves[2])
assert not tree.generate_proof(2).verify(cfg, lp, tp, root, leaves[3])
print("generic Pedersen byte tree OK", flush=True)

dev = pedersen_device_tree(JUBJUB, lp, tp, Window(4, 16), Window(4, 256), dev_leaves)
assert cfg.inner_domain.eq_host(dev.root(), root)
assert dev.generate_proof(5).verify(cfg, lp, tp, root, leaves[5])
print("device RNS Pedersen tree OK", flush=True)
print("DRIVE PASSED", flush=True)
