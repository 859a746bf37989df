"""Merkle tree end-to-end round trips, mirroring the reference's two
configurations (src/merkle_tree/tests/mod.rs): byte-oriented (SHA-256,
ByteDigestConverter) and field-native (Poseidon, IdentityDigestConverter),
plus the MultiPath prefix-length dissection ([0,2,1,2,0,2,1,2] for an
8-leaf all-leaves proof, tests/mod.rs:164-181) and update/check_update."""

import hashlib

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.models.crh.poseidon import PoseidonCRH, PoseidonTwoToOneCRH
from crypto_primitives_tpu.models.crh.sha256 import Sha256CRH, Sha256TwoToOneCRH
from crypto_primitives_tpu.models.merkle_tree import (
    ByteDigestConverter,
    ByteDigestDomain,
    FieldDigestDomain,
    IdentityDigestConverter,
    MerkleTree,
    MerkleTreeConfig,
    verify_paths_batch,
)
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR


def poseidon_tree_config():
    return MerkleTreeConfig(
        leaf_hash=PoseidonCRH(FR),
        two_to_one_hash=PoseidonTwoToOneCRH(FR),
        leaf_domain=FieldDigestDomain(FR),
        inner_domain=FieldDigestDomain(FR),
        leaf_inner_converter=IdentityDigestConverter(),
    )


def sha256_tree_config():
    return MerkleTreeConfig(
        leaf_hash=Sha256CRH(),
        two_to_one_hash=Sha256TwoToOneCRH(),
        leaf_domain=ByteDigestDomain(32),
        inner_domain=ByteDigestDomain(32),
        leaf_inner_converter=ByteDigestConverter(32),
    )


def build_poseidon_tree(rng, n):
    cfg = poseidon_tree_config()
    params = get_default_poseidon_parameters(FR, 2, False)
    leaves_host = [[rng.randrange(FR.p)] for _ in range(n)]
    leaves_dev = jnp.asarray(FR.pack(leaves_host))  # (n, 1, L)
    tree = MerkleTree.new(cfg, params, params, leaves_dev)
    return cfg, params, leaves_host, leaves_dev, tree


@pytest.mark.slow
def test_poseidon_tree_root_matches_host_oracle(rng):
    """Device-built root == pure-python chain (cross-model, SURVEY §4.3)."""
    cfg, params, leaves_host, _, tree = build_poseidon_tree(rng, 8)
    # host chain
    lh = [cfg.leaf_hash.evaluate(params, l) for l in leaves_host]
    level = [
        cfg.two_to_one_hash.evaluate(params, lh[2 * i], lh[2 * i + 1])
        for i in range(4)
    ]
    while len(level) > 1:
        level = [
            cfg.two_to_one_hash.compress(params, level[2 * i], level[2 * i + 1])
            for i in range(len(level) // 2)
        ]
    assert tree.root() == level[0]


def test_poseidon_tree_prove_verify(rng):
    cfg, params, leaves_host, _, tree = build_poseidon_tree(rng, 8)
    root = tree.root()
    for i, leaf in enumerate(leaves_host):
        proof = tree.generate_proof(i)
        assert proof.verify(cfg, params, params, root, leaf)
    # wrong root must return False, not raise (mod.rs:207-211)
    proof = tree.generate_proof(3)
    assert not proof.verify(cfg, params, params, (root + 1) % FR.p, leaves_host[3])
    # wrong leaf
    assert not proof.verify(cfg, params, params, root, [123456])


def test_poseidon_multiproof_and_prefix_lengths(rng):
    cfg, params, leaves_host, _, tree = build_poseidon_tree(rng, 8)
    root = tree.root()
    mp = tree.generate_multi_proof(range(8))
    # pinned prefix-length dissection (tests/mod.rs:164-181)
    assert mp.auth_paths_prefix_lenghts == [0, 2, 1, 2, 0, 2, 1, 2]
    assert sum(len(s) for s in mp.auth_paths_suffixes) == 6  # vs 16 uncompressed
    assert mp.verify(cfg, params, params, root, leaves_host)
    # tamper the FIRST leaf: its subtree nodes are computed fresh, so the
    # root mismatch is caught.  (Tampering a later leaf whose ancestors were
    # already memoized from an earlier proven leaf is NOT caught — faithful
    # mirror of the reference's hash_lut or_insert_with behavior,
    # src/merkle_tree/mod.rs:308-322.)
    bad = list(leaves_host)
    bad[0] = [42]
    assert not mp.verify(cfg, params, params, root, bad)
    bad2 = list(leaves_host)
    bad2[2] = [42]
    assert mp.verify(cfg, params, params, root, bad2)  # reference quirk


def test_poseidon_update_and_check_update(rng):
    cfg, params, leaves_host, _, tree = build_poseidon_tree(rng, 8)
    new_leaf = [rng.randrange(FR.p)]
    tree.update(5, new_leaf)
    proof = tree.generate_proof(5)
    assert proof.verify(cfg, params, params, tree.root(), new_leaf)
    # check_update: wrong asserted root -> False, no mutation
    old_root = tree.root()
    assert not tree.check_update(2, [7], (old_root + 1) % FR.p)
    assert tree.root() == old_root
    # correct asserted root -> True
    snapshot = MerkleTree(
        cfg, params, params, tree.non_leaf_nodes.copy(), tree.leaf_nodes.copy(), tree.height
    )
    snapshot.update(2, [7])
    assert tree.check_update(2, [7], snapshot.root())
    assert tree.root() == snapshot.root()


def test_poseidon_batched_path_verification(rng):
    cfg, params, leaves_host, leaves_dev, tree = build_poseidon_tree(rng, 16)
    root = tree.root()
    proofs = [tree.generate_proof(i) for i in range(16)]
    sib = np.stack([cfg.leaf_domain.from_host(p.leaf_sibling_hash) for p in proofs])
    auth = np.stack(
        [np.stack([cfg.inner_domain.from_host(d) for d in p.auth_path]) for p in proofs]
    )
    ok = verify_paths_batch(
        cfg, params, params, root, leaves_dev, list(range(16)),
        jnp.asarray(sib), jnp.asarray(auth),
    )
    assert bool(jnp.all(ok))
    # corrupt one sibling -> that row must fail
    sib_bad = sib.copy()
    sib_bad[3] = cfg.leaf_domain.from_host(1)
    ok = verify_paths_batch(
        cfg, params, params, root, leaves_dev, list(range(16)),
        jnp.asarray(sib_bad), jnp.asarray(auth),
    )
    ok = np.asarray(ok)
    assert not ok[3] and ok.sum() == 15


def host_sha256_tree_root(leaves):
    """Independent host model of the SHA-256 byte tree (40-byte converted
    digests: 8-byte LE length prefix + digest)."""
    conv = lambda d: len(d).to_bytes(8, "little") + d
    level = [hashlib.sha256(l).digest() for l in leaves]
    # only the leaf->inner transition applies the converter; upper levels
    # compress raw 32-byte digests (crh/sha256/mod.rs:67-78)
    level = [
        hashlib.sha256(conv(level[2 * i]) + conv(level[2 * i + 1])).digest()
        for i in range(len(level) // 2)
    ]
    while len(level) > 1:
        level = [
            hashlib.sha256(level[2 * i] + level[2 * i + 1]).digest()
            for i in range(len(level) // 2)
        ]
    return level[0]


def test_sha256_tree_round_trip(rng):
    cfg = sha256_tree_config()
    n = 16
    leaves = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(n)]
    leaves_dev = jnp.asarray(
        np.frombuffer(b"".join(leaves), dtype=np.uint8).reshape(n, 32)
    )
    tree = MerkleTree.new(cfg, None, None, leaves_dev)
    assert tree.root() == host_sha256_tree_root(leaves)
    root = tree.root()
    for i in (0, 7, 15):
        proof = tree.generate_proof(i)
        assert proof.verify(cfg, None, None, root, leaves[i])
        assert not proof.verify(cfg, None, None, root, b"x" * 32)
    mp = tree.generate_multi_proof([1, 5, 5, 13])
    assert mp.leaf_indexes == [1, 5, 13]
    assert mp.verify(cfg, None, None, root, [leaves[1], leaves[5], leaves[13]])


def test_sha256_tree_update(rng):
    cfg = sha256_tree_config()
    n = 8
    leaves = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(n)]
    leaves_dev = jnp.asarray(
        np.frombuffer(b"".join(leaves), dtype=np.uint8).reshape(n, 32)
    )
    tree = MerkleTree.new(cfg, None, None, leaves_dev)
    new_leaf = b"\x07" * 32
    tree.update(4, new_leaf)
    expected = host_sha256_tree_root(leaves[:4] + [new_leaf] + leaves[5:])
    assert tree.root() == expected


def test_blank_tree(rng):
    cfg, params = poseidon_tree_config(), get_default_poseidon_parameters(FR, 2, False)
    tree = MerkleTree.blank(cfg, params, params, height=4)
    # all-equal leaves -> both children of root equal
    d = cfg.inner_domain
    assert d.to_host(tree.non_leaf_nodes[1]) == d.to_host(tree.non_leaf_nodes[2])
    assert tree.height == 4
