"""Pedersen byte-tree Merkle config — twin of the reference's PRIMARY
byte-oriented test configuration (src/merkle_tree/tests/mod.rs:5-183:
Pedersen leaf + two-to-one hashes over JubJub, ByteDigestConverter):
build -> prove -> verify -> multipath -> update round trip, digests as
affine points, inner inputs as x||y uncompressed bytes.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.models.crh.pedersen import (
    PedersenCRH,
    PedersenTwoToOneCRH,
    Window,
)
from crypto_primitives_tpu.models.merkle_tree import (
    MerkleTree,
    MerkleTreeConfig,
    MultiPath,
    PointDigestDomain,
    PointToBytesDigestConverter,
)
from crypto_primitives_tpu.ops.curves_known import JUBJUB

LEAF_BYTES = 8

pytestmark = pytest.mark.slow  # device-oracle fuzz tier (run_tests.sh)


@pytest.fixture(scope="module")
def setup():
    rng = random.Random(77)
    leaf_crh = PedersenCRH(JUBJUB, Window(4, LEAF_BYTES * 2))  # 64-bit input
    two = PedersenTwoToOneCRH(JUBJUB, Window(4, 256))  # 1024-bit input
    cfg = MerkleTreeConfig(
        leaf_hash=leaf_crh,
        two_to_one_hash=two,
        leaf_domain=PointDigestDomain(JUBJUB),
        inner_domain=PointDigestDomain(JUBJUB),
        leaf_inner_converter=PointToBytesDigestConverter(JUBJUB),
    )
    leaf_params = leaf_crh.setup(rng)
    two_params = two.setup(rng)
    return rng, cfg, leaf_params, two_params


def _host_root(cfg, leaf_params, two_params, leaves):
    """Independent host-tier fold (pure python ints)."""
    conv = cfg.leaf_inner_converter
    digests = [cfg.leaf_hash.evaluate(leaf_params, lv) for lv in leaves]
    cur = [
        cfg.two_to_one_hash.evaluate(
            two_params, conv.convert(digests[i]), conv.convert(digests[i + 1])
        )
        for i in range(0, len(digests), 2)
    ]
    while len(cur) > 1:
        cur = [
            cfg.two_to_one_hash.compress(two_params, cur[i], cur[i + 1])
            for i in range(0, len(cur), 2)
        ]
    return cur[0]


def test_pedersen_byte_tree_round_trip(setup):
    rng, cfg, leaf_params, two_params = setup
    n = 8
    leaves = [bytes(rng.randrange(256) for _ in range(LEAF_BYTES)) for _ in range(n)]
    dev_leaves = jnp.asarray(np.frombuffer(b"".join(leaves), np.uint8).reshape(n, LEAF_BYTES))
    tree = MerkleTree.new(cfg, leaf_params, two_params, dev_leaves)
    root = tree.root()
    # batched device build == independent host fold
    assert cfg.inner_domain.eq_host(root, _host_root(cfg, leaf_params, two_params, leaves))
    # every proof verifies; wrong root / wrong leaf rejected (Ok(false))
    for i in range(n):
        proof = tree.generate_proof(i)
        assert proof.verify(cfg, leaf_params, two_params, root, leaves[i])
        assert not proof.verify(cfg, leaf_params, two_params, root, leaves[(i + 1) % n])
    bad = (root[0], (root[1] + 1) % JUBJUB.base.p)
    assert not tree.generate_proof(0).verify(cfg, leaf_params, two_params, bad, leaves[0])


def test_pedersen_byte_tree_multipath_and_update(setup):
    rng, cfg, leaf_params, two_params = setup
    n = 8
    leaves = [bytes(rng.randrange(256) for _ in range(LEAF_BYTES)) for _ in range(n)]
    dev_leaves = jnp.asarray(np.frombuffer(b"".join(leaves), np.uint8).reshape(n, LEAF_BYTES))
    tree = MerkleTree.new(cfg, leaf_params, two_params, dev_leaves)
    root = tree.root()
    idx = [1, 3, 6]
    mp = tree.generate_multi_proof(idx)
    assert mp.verify(cfg, leaf_params, two_params, root, [leaves[i] for i in idx])
    assert not mp.verify(
        cfg, leaf_params, two_params, root, [leaves[(i + 1) % n] for i in idx]
    )
    # update leaf 3 and re-verify against the new root
    new_leaf = bytes(rng.randrange(256) for _ in range(LEAF_BYTES))
    tree.update(3, new_leaf)
    new_root = tree.root()
    assert not cfg.inner_domain.eq_host(root, new_root)
    assert tree.generate_proof(3).verify(cfg, leaf_params, two_params, new_root, new_leaf)
    leaves2 = list(leaves)
    leaves2[3] = new_leaf
    assert cfg.inner_domain.eq_host(
        new_root, _host_root(cfg, leaf_params, two_params, leaves2)
    )


@pytest.mark.slow
def test_pedersen_device_tree_matches_generic(setup):
    """Device-resident RNS Pedersen byte tree == generic MerkleTree: root,
    every auth path, and batched device verification."""
    from crypto_primitives_tpu.models.merkle_tree.device import (
        pedersen_device_tree,
    )

    rng, cfg, leaf_params, two_params = setup
    n = 16
    leaves = [bytes(rng.randrange(256) for _ in range(LEAF_BYTES)) for _ in range(n)]
    dev_leaves = jnp.asarray(
        np.frombuffer(b"".join(leaves), np.uint8).reshape(n, LEAF_BYTES)
    )
    generic = MerkleTree.new(cfg, leaf_params, two_params, dev_leaves)
    dev = pedersen_device_tree(
        JUBJUB, leaf_params, two_params, Window(4, LEAF_BYTES * 2), Window(4, 256),
        dev_leaves,
    )
    assert cfg.inner_domain.eq_host(dev.root(), generic.root())
    for i in range(0, n, 5):
        p_dev = dev.generate_proof(i)
        p_gen = generic.generate_proof(i)
        assert p_dev.leaf_index == p_gen.leaf_index
        assert cfg.inner_domain.eq_host(p_dev.leaf_sibling_hash, p_gen.leaf_sibling_hash)
        for a, b in zip(p_dev.auth_path, p_gen.auth_path):
            assert cfg.inner_domain.eq_host(a, b)
        assert p_dev.verify(cfg, leaf_params, two_params, dev.root(), leaves[i])


@pytest.mark.slow
def test_pedersen_point_path_gadget(setup):
    """Native-vs-gadget parity for the Pedersen point-digest path — the
    reference's primary merkle constraint config
    (src/merkle_tree/tests/constraints.rs:17-147), incl. bad-root twin."""
    from crypto_primitives_tpu.r1cs.cs import ConstraintSystem
    from crypto_primitives_tpu.r1cs.device_check import check_satisfied_device
    from crypto_primitives_tpu.r1cs.gadgets.curve import TEAffineVar
    from crypto_primitives_tpu.r1cs.gadgets.merkle import PointPathVar
    from crypto_primitives_tpu.r1cs.gadgets.pedersen import (
        PedersenCRHGadget,
        PedersenTwoToOneCRHGadget,
    )
    from crypto_primitives_tpu.r1cs.vars import FpVar, UInt8
    from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR

    rng, cfg, leaf_params, two_params = setup
    n = 4
    leaves = [bytes(rng.randrange(256) for _ in range(LEAF_BYTES)) for _ in range(n)]
    dev_leaves = jnp.asarray(
        np.frombuffer(b"".join(leaves), np.uint8).reshape(n, LEAF_BYTES)
    )
    tree = MerkleTree.new(cfg, leaf_params, two_params, dev_leaves)
    root = tree.root()
    leaf_g = PedersenCRHGadget(JUBJUB, Window(4, LEAF_BYTES * 2))
    two_g = PedersenTwoToOneCRHGadget(JUBJUB, Window(4, 256))

    for i in (3,):  # one path: the 1024-bit compress circuits dominate runtime
        proof = tree.generate_proof(i)
        assert proof.verify(cfg, leaf_params, two_params, root, leaves[i])
        cs = ConstraintSystem(FR)
        pv = PointPathVar.new_witness(cs, JUBJUB, proof)
        root_var = TEAffineVar.new_input(cs, JUBJUB, root)
        leaf_vars = [UInt8.new_witness(cs, b) for b in leaves[i]]
        ok = pv.verify_membership(
            leaf_params, two_params, leaf_g, two_g, root_var, leaf_vars
        )
        assert ok.value is True
        ok.fp.enforce_equal(FpVar.constant(cs, 1))
        assert cs.is_satisfied()
        assert check_satisfied_device(cs)

    # bad root: circuit unsatisfied once enforced (should_panic twin)
    proof = tree.generate_proof(1)
    cs = ConstraintSystem(FR)
    pv = PointPathVar.new_witness(cs, JUBJUB, proof)
    bad = TEAffineVar.new_input(cs, JUBJUB, (root[0], (root[1] + 1) % JUBJUB.base.p))
    leaf_vars = [UInt8.new_witness(cs, b) for b in leaves[1]]
    ok = pv.verify_membership(
        leaf_params, two_params, leaf_g, two_g, bad, leaf_vars
    )
    assert ok.value is False
    ok.fp.enforce_equal(FpVar.constant(cs, 1))
    assert not cs.is_satisfied()
