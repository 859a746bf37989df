"""Device-resident Merkle trees (models/merkle_tree/device.py) vs the
generic host-convertible MerkleTree: roots, proofs, batched verify,
batched update.  Mirrors the reference test coverage for the flagship
bench configuration (benches/merkle_tree.rs + merkle_tree/tests/mod.rs)."""

import hashlib

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.models.merkle_tree import MerkleTree
from crypto_primitives_tpu.models.merkle_tree.device import (
    DeviceMerkleTree,
    poseidon_rns_device_tree,
    sha256_device_tree,
)
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR

from test_merkle_tree import (
    build_poseidon_tree,
    poseidon_tree_config,
    sha256_tree_config,
)


@pytest.fixture(scope="module")
def sha_trees():
    import random

    rng = random.Random(777)
    n = 16
    leaves = np.frombuffer(
        b"".join(bytes([rng.randrange(256) for _ in range(17)]) for _ in range(n)),
        dtype=np.uint8,
    ).reshape(n, 17)
    cfg = sha256_tree_config()
    host_tree = MerkleTree.new(cfg, None, None, jnp.asarray(leaves))
    dev_tree = sha256_device_tree(jnp.asarray(leaves))
    return cfg, leaves, host_tree, dev_tree


def test_sha_device_root_matches_generic(sha_trees):
    cfg, leaves, host_tree, dev_tree = sha_trees
    assert dev_tree.root() == host_tree.root()


def test_sha_device_proofs_match_generic(sha_trees):
    cfg, leaves, host_tree, dev_tree = sha_trees
    for i in (0, 3, 7, 15):
        p_host = host_tree.generate_proof(i)
        p_dev = dev_tree.generate_proof(i)
        assert p_dev.leaf_sibling_hash == p_host.leaf_sibling_hash
        assert p_dev.auth_path == p_host.auth_path
        assert p_dev.leaf_index == p_host.leaf_index
        # the canonical Path verifies against the generic config
        assert p_dev.verify(cfg, None, None, dev_tree.root(), bytes(leaves[i]))


def test_sha_device_batch_verify(sha_trees):
    cfg, leaves, host_tree, dev_tree = sha_trees
    idx = jnp.asarray([0, 5, 9, 14], dtype=jnp.int32)
    leaf_sib, auth = dev_tree.proof_rows(idx)
    from crypto_primitives_tpu.ops.sha256 import sha256

    leaf_dig = sha256(jnp.asarray(leaves)[np.asarray(idx)])
    ok = dev_tree.verify_rows_batch(
        dev_tree.root_row(), leaf_dig, idx, leaf_sib, auth
    )
    assert np.asarray(ok).all()
    # wrong root -> all False (Ok(false) posture, not an exception)
    bad = dev_tree.verify_rows_batch(
        jnp.zeros_like(dev_tree.root_row()), leaf_dig, idx, leaf_sib, auth
    )
    assert not np.asarray(bad).any()
    # tampered sibling -> that row False
    leaf_sib2 = leaf_sib.at[1, 0].set(leaf_sib[1, 0] ^ 1)
    ok2 = np.asarray(
        dev_tree.verify_rows_batch(
            dev_tree.root_row(), leaf_dig, idx, leaf_sib2, auth
        )
    )
    assert ok2.tolist() == [True, False, True, True]


def test_sha_device_update_batch(sha_trees, rng):
    cfg, leaves, host_tree, dev_tree = sha_trees
    # rebuild a fresh device tree so module fixture stays pristine
    dev = sha256_device_tree(jnp.asarray(leaves))
    new3 = bytes(rng.randrange(256) for _ in range(17))
    new9 = bytes(rng.randrange(256) for _ in range(17))
    from crypto_primitives_tpu.ops.sha256 import sha256

    new_digs = sha256(jnp.asarray(np.frombuffer(new3 + new9, np.uint8).reshape(2, 17)))
    dev.update_batch([3, 9], new_digs)
    # oracle: generic host tree updated one by one
    host = MerkleTree.new(cfg, None, None, jnp.asarray(leaves))
    host.update(3, new3)
    host.update(9, new9)
    assert dev.root() == host.root()


@pytest.mark.slow
def test_poseidon_rns_device_tree_matches_generic(rng):
    cfg, params, leaves_host, leaves_dev, host_tree = build_poseidon_tree(rng, 16)
    pcfg = get_default_poseidon_parameters(FR, 2, False)
    dev_tree = poseidon_rns_device_tree(
        FR, pcfg, [leaf[0] for leaf in leaves_host]
    )
    assert dev_tree.root() == host_tree.root()
    for i in (0, 7, 15):
        p_host = host_tree.generate_proof(i)
        p_dev = dev_tree.generate_proof(i)
        assert p_dev.leaf_sibling_hash == p_host.leaf_sibling_hash
        assert p_dev.auth_path == p_host.auth_path


@pytest.mark.slow
def test_poseidon_rns_device_batch_verify_and_update(rng):
    cfg, params, leaves_host, leaves_dev, host_tree = build_poseidon_tree(rng, 8)
    pcfg = get_default_poseidon_parameters(FR, 2, False)
    vals = [leaf[0] for leaf in leaves_host]
    dev_tree = poseidon_rns_device_tree(FR, pcfg, vals)
    idx = jnp.asarray([1, 4, 6], dtype=jnp.int32)
    leaf_sib, auth = dev_tree.proof_rows(idx)
    # leaf digests recomputed through the same pipeline
    from crypto_primitives_tpu.models.merkle_tree.device import _rns_compress_fns
    from crypto_primitives_tpu.ops import rns

    plan, leaf_hash, _, _ = _rns_compress_fns(FR, pcfg)
    mont = np.asarray([vals[int(i)] * plan.M1 % FR.p for i in idx], dtype=object)
    r1, r2 = rns.to_rns(plan, mont)
    leaf_dig = leaf_hash(jnp.asarray(np.concatenate([r1, r2], axis=-1)))
    ok = dev_tree.verify_rows_batch(
        dev_tree.root_row(), leaf_dig, idx, leaf_sib, auth
    )
    assert np.asarray(ok).all()
    # batched update matches the generic tree updated serially
    nv = [rng.randrange(FR.p) for _ in range(2)]
    monts = np.asarray([v * plan.M1 % FR.p for v in nv], dtype=object)
    nr1, nr2 = rns.to_rns(plan, monts)
    dev_tree.update_batch([2, 5], leaf_hash(jnp.asarray(np.concatenate([nr1, nr2], -1))))
    host_tree.update(2, [nv[0]])
    host_tree.update(5, [nv[1]])
    assert dev_tree.root() == host_tree.root()


def test_sha_device_multipath_verify(sha_trees):
    """Deduplicated device multi-verify == per-path truth; shared-node hash
    count is the LUT count (all-leaves case degenerates to a tree rebuild:
    n-1 compresses vs n*(h-1) naive)."""
    cfg, leaves, host_tree, dev_tree = sha_trees
    from crypto_primitives_tpu.ops.sha256 import sha256

    for idx_host in ([0, 1, 2, 7], [5], list(range(16)), [3, 12]):
        idx = jnp.asarray(idx_host, dtype=jnp.int32)
        leaf_sib, auth = dev_tree.proof_rows(idx)
        leaf_dig = sha256(jnp.asarray(leaves)[np.asarray(idx)])
        ok = dev_tree.multipath_verify_rows(
            dev_tree.root_row(), leaf_dig, idx_host, leaf_sib, auth
        )
        assert bool(np.asarray(ok)), idx_host
        bad = dev_tree.multipath_verify_rows(
            jnp.zeros_like(dev_tree.root_row()), leaf_dig, idx_host, leaf_sib, auth
        )
        assert not bool(np.asarray(bad))

    # tampered leaf digest -> False
    idx_host = [0, 6, 11]
    idx = jnp.asarray(idx_host, dtype=jnp.int32)
    leaf_sib, auth = dev_tree.proof_rows(idx)
    leaf_dig = sha256(jnp.asarray(leaves)[np.asarray(idx)])
    leaf_dig = leaf_dig.at[2, 0].set(leaf_dig[2, 0] ^ 1)
    assert not bool(np.asarray(dev_tree.multipath_verify_rows(
        dev_tree.root_row(), leaf_dig, idx_host, leaf_sib, auth
    )))

    # computed-over-auth precedence (reference LUT-first lookup,
    # mod.rs:272-330): when both children of a node are proven, the
    # proof-supplied sibling rows for them are UNUSED — corrupting them
    # must not flip the verdict
    idx_host = [4, 5]  # siblings: each one's leaf_sib is the other's digest
    idx = jnp.asarray(idx_host, dtype=jnp.int32)
    leaf_sib, auth = dev_tree.proof_rows(idx)
    leaf_dig = sha256(jnp.asarray(leaves)[np.asarray(idx)])
    leaf_sib_bad = leaf_sib.at[:, 0].set(leaf_sib[:, 0] ^ 1)
    assert bool(np.asarray(dev_tree.multipath_verify_rows(
        dev_tree.root_row(), leaf_dig, idx_host, leaf_sib_bad, auth
    )))


def test_poseidon_rns_device_multipath_verify(rng):
    cfg, params, leaves_host, _, host_tree = build_poseidon_tree(rng, 8)
    vals = [row[0] for row in leaves_host]
    dev_tree = poseidon_rns_device_tree(FR, params, vals)
    assert dev_tree.root() == host_tree.root()
    from crypto_primitives_tpu.models.merkle_tree.device import _rns_compress_fns
    from crypto_primitives_tpu.ops import rns

    plan, leaf_hash, _, _ = _rns_compress_fns(FR, params)
    idx_host = [1, 2, 6, 7]
    idx = jnp.asarray(idx_host, dtype=jnp.int32)
    leaf_sib, auth = dev_tree.proof_rows(idx)
    mont = np.asarray([vals[i] * plan.M1 % FR.p for i in idx_host], dtype=object)
    r1, r2 = rns.to_rns(plan, mont)
    leaf_dig = leaf_hash(jnp.asarray(np.concatenate([r1, r2], axis=-1)))
    ok = dev_tree.multipath_verify_rows(
        dev_tree.root_row(), leaf_dig, idx_host, leaf_sib, auth
    )
    assert bool(np.asarray(ok))


def test_rns_tree_canonical_root_cross_process(rng):
    """Round-2 verdict item 10: a root arriving from another process
    (canonical field codec) must be device-comparable against the RNS
    tree without per-node host round-trips — canonical_root_row() and
    verify_rows_batch(root_canonical=True)."""
    from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
    from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
    from crypto_primitives_tpu.utils import canonical as c

    pcfg = get_default_poseidon_parameters(FR, 2, False)
    vals = [rng.randrange(FR.p) for _ in range(16)]
    tree = poseidon_rns_device_tree(FR, pcfg, vals)
    # "another process": the root travels as canonical bytes
    wire = c.write_field(FR, tree.root())
    root_int = c.read_field(FR, c.Reader(wire))
    root_limbs = jnp.asarray(FR.pack([[root_int]]))[0, 0]
    # device-side canonical compare
    assert np.asarray(tree.canonical_root_row()).tolist() == np.asarray(
        root_limbs
    ).tolist()
    idx = jnp.asarray([0, 5, 11], jnp.int32)
    sib, auth = tree.proof_rows(idx)
    ld = jnp.take(tree.leaf_digests, idx, axis=0)
    ok = tree.verify_rows_batch(
        root_limbs, ld, idx, sib, auth, root_canonical=True
    )
    assert np.asarray(ok).tolist() == [True, True, True]
    # wrong canonical root rejects (Ok(false), mod.rs:207-211)
    bad = jnp.asarray(FR.pack([[(root_int + 1) % FR.p]]))[0, 0]
    ok = tree.verify_rows_batch(bad, ld, idx, sib, auth, root_canonical=True)
    assert np.asarray(ok).tolist() == [False, False, False]


def test_verify_rows_batch_clear_errors(rng):
    """Weak-#7 regression: mis-shaped arguments produce a clear message,
    not a raw XLA broadcast error."""
    import pytest as _pytest

    leaves = jnp.asarray(
        np.asarray([[i] * 8 for i in range(8)], np.uint8)
    )
    tree = sha256_device_tree(leaves)
    idx = jnp.asarray([1, 2], jnp.int32)
    sib, auth = tree.proof_rows(idx)
    ld = jnp.take(tree.leaf_digests, idx, axis=0)
    with _pytest.raises(ValueError, match="hash raw leaves"):
        tree.verify_rows_batch(
            tree.root_row(), jnp.take(leaves, idx, axis=0), idx, sib, auth
        )
    with _pytest.raises(ValueError, match="one digest row"):
        tree.verify_rows_batch(tree.leaf_digests, ld, idx, sib, auth)
    ok = tree.verify_rows_batch(tree.root_row(), ld, idx, sib, auth)
    assert np.asarray(ok).tolist() == [True, True]
