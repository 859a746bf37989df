"""Sharded full-surface Merkle tier (round-2 verdict item 8): mesh-resident
tree with retained levels, sharded batched verify, sharded deduplicated
MultiPath verify, and sharded update_batch — all asserted BIT-EQUAL to the
single-device DeviceMerkleTree on the virtual 8-device CPU mesh (the same
oracle pattern as test_parallel.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.models.merkle_tree.device import (
    _sha_compress,
    _sha_convert,
    _sha_leaf_hash,
    sha256_device_tree,
)
from crypto_primitives_tpu.parallel import make_mesh
from crypto_primitives_tpu.parallel.merkle_tree_sharded import (
    sharded_merkle_tree,
    sharded_multipath_verify_rows,
)

pytestmark = pytest.mark.slow  # device-oracle tier (run_tests.sh)

D = 8


@pytest.fixture(scope="module")
def trees():
    import random

    rng = random.Random(11)
    n = 64 * D
    leaves = jnp.asarray(
        np.asarray(
            [[rng.randrange(256) for _ in range(16)] for _ in range(n)],
            dtype=np.uint8,
        )
    )
    mesh = make_mesh(D)
    sh = sharded_merkle_tree(
        _sha_leaf_hash, _sha_compress, leaves, mesh,
        leaf_convert=_sha_convert(),
    )
    single = sha256_device_tree(leaves)
    return sh, single, leaves, mesh


def test_sharded_tree_root_and_proofs_bitequal(trees):
    sh, single, leaves, mesh = trees
    assert np.asarray(sh.root_row).tobytes() == np.asarray(single.root_row()).tobytes()
    idx = jnp.arange(leaves.shape[0], dtype=jnp.int32)
    sib_s, auth_s = sh.proof_rows(idx)
    sib_1, auth_1 = single.proof_rows(idx)
    assert np.array_equal(np.asarray(sib_s), np.asarray(sib_1))
    assert np.array_equal(np.asarray(auth_s), np.asarray(auth_1))


def test_sharded_verify_rows_batch(trees):
    sh, single, leaves, mesh = trees
    n = leaves.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sib, auth = sh.proof_rows(idx)
    ld = sh.leaf_digests
    ok = sh.verify_rows_batch(sh.root_row, ld, idx, sib, auth)
    assert bool(np.all(np.asarray(ok)))
    bad_root = sh.root_row.at[0].add(1)
    ok = sh.verify_rows_batch(bad_root, ld, idx, sib, auth)
    assert not bool(np.any(np.asarray(ok)))


def test_sharded_multipath_verify(trees):
    sh, single, leaves, mesh = trees
    indexes = [3, 4, 5, 100, 101, 333, 444, 511]
    idx = jnp.asarray(indexes, jnp.int32)
    sib, auth = single.proof_rows(idx)
    ld = jnp.take(single.leaf_digests, idx, axis=0)
    ok = sharded_multipath_verify_rows(
        _sha_compress, _sha_convert(), single.root_row(), ld, indexes,
        sib, auth, mesh,
    )
    assert bool(np.asarray(ok))
    # single-device twin agrees, and a bad root rejects
    assert bool(
        np.asarray(
            single.multipath_verify_rows(single.root_row(), ld, indexes, sib, auth)
        )
    )
    ok = sharded_multipath_verify_rows(
        _sha_compress, _sha_convert(), single.root_row().at[0].add(1), ld,
        indexes, sib, auth, mesh,
    )
    assert not bool(np.asarray(ok))


def test_sharded_update_batch_bitequal(trees):
    import random

    rng = random.Random(12)
    sh, single, leaves, mesh = trees
    n = leaves.shape[0]
    # updates spread across shards, including two in one shard
    upd_idx = [0, 1, 77, 200, 201, n - 1]
    new_leaves = np.asarray(
        [[rng.randrange(256) for _ in range(16)] for _ in range(len(upd_idx))],
        dtype=np.uint8,
    )
    new_digests = _sha_leaf_hash(jnp.asarray(new_leaves))
    sh.update_batch(upd_idx, new_digests)
    single.update_batch(upd_idx, new_digests)
    assert np.asarray(sh.root_row).tobytes() == np.asarray(single.root_row()).tobytes()
    assert np.array_equal(np.asarray(sh.leaf_digests), np.asarray(single.leaf_digests))
    # every level bit-equal: compare via fresh proofs over all leaves
    idx = jnp.arange(n, dtype=jnp.int32)
    sib_s, auth_s = sh.proof_rows(idx)
    sib_1, auth_1 = single.proof_rows(idx)
    assert np.array_equal(np.asarray(sib_s), np.asarray(sib_1))
    assert np.array_equal(np.asarray(auth_s), np.asarray(auth_1))


def test_sharded_poseidon_rns_tree_and_permute(rng):
    """The HEADLINE path under shard_map (round-3 verdict item 4): the
    fused RNS-Montgomery Poseidon kernel (interpret mode on the CPU mesh,
    the compiled kernel on a real TPU mesh) drives a sharded Poseidon
    device tree and a sharded data-parallel permute batch, both bit-equal
    to the single-device twins."""
    from crypto_primitives_tpu.models.merkle_tree.device import (
        _rns_compress_fns,
        poseidon_rns_device_tree,
    )
    from crypto_primitives_tpu.models.sponge import (
        get_default_poseidon_parameters,
    )
    from crypto_primitives_tpu.ops import rns
    from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
    from crypto_primitives_tpu.ops.poseidon_rns_pallas import permute_rns
    from crypto_primitives_tpu.parallel.merkle_tree_sharded import (
        sharded_permute_batch,
    )

    cfg = get_default_poseidon_parameters(FR, 2, False)
    plan, leaf_hash, compress, _ = _rns_compress_fns(FR, cfg)
    mesh = make_mesh(D)

    # data-parallel RNS permute batch (zero-collective headline workload)
    B = 16 * D
    vals = [[rng.randrange(FR.p) for _ in range(cfg.t)] for _ in range(B)]
    mont = np.asarray(
        [[v * plan.M1 % FR.p for v in row] for row in vals], dtype=object
    )
    r1, r2 = rns.to_rns(plan, mont.reshape(-1))
    states = jnp.asarray(
        np.concatenate([r1, r2], -1).reshape(B, cfg.t, 2 * rns.K)
    )

    def perm(s):
        return permute_rns(
            plan, cfg, s, block_b=max(8, s.shape[0]), interpret=True
        )

    out_sh = sharded_permute_batch(perm, states, mesh)
    assert np.array_equal(np.asarray(out_sh), np.asarray(perm(states)))

    # full-surface sharded tree on the RNS kernel: build, proofs, batched
    # verify, update_batch — every compress is a kernel invocation
    n = 16 * D
    leaf_vals = [rng.randrange(FR.p) for _ in range(n)]
    mont = np.asarray([v * plan.M1 % FR.p for v in leaf_vals], dtype=object)
    r1, r2 = rns.to_rns(plan, mont)
    leaves = jnp.asarray(np.concatenate([r1, r2], -1))
    sh = sharded_merkle_tree(leaf_hash, compress, leaves, mesh)
    single = poseidon_rns_device_tree(FR, cfg, leaf_vals)
    assert np.array_equal(np.asarray(sh.root_row), np.asarray(single.root_row()))
    idx = jnp.arange(n, dtype=jnp.int32)
    sib_s, auth_s = sh.proof_rows(idx)
    sib_1, auth_1 = single.proof_rows(idx)
    assert np.array_equal(np.asarray(sib_s), np.asarray(sib_1))
    assert np.array_equal(np.asarray(auth_s), np.asarray(auth_1))
    ok = sh.verify_rows_batch(sh.root_row, sh.leaf_digests, idx, sib_s, auth_s)
    assert bool(np.all(np.asarray(ok)))
    bad = sh.root_row.at[0].add(1)
    assert not bool(
        np.any(np.asarray(
            sh.verify_rows_batch(bad, sh.leaf_digests, idx, sib_s, auth_s)
        ))
    )
    upd_idx = [0, 3, n // 2, n - 1]
    new_vals = [rng.randrange(FR.p) for _ in upd_idx]
    mont_u = np.asarray(
        [v * plan.M1 % FR.p for v in new_vals], dtype=object
    )
    ru1, ru2 = rns.to_rns(plan, mont_u)
    new_digests = leaf_hash(jnp.asarray(np.concatenate([ru1, ru2], -1)))
    sh.update_batch(upd_idx, new_digests)
    single.update_batch(upd_idx, new_digests)
    assert np.array_equal(np.asarray(sh.root_row), np.asarray(single.root_row()))
    sib_s2, auth_s2 = sh.proof_rows(idx)
    sib_12, auth_12 = single.proof_rows(idx)
    assert np.array_equal(np.asarray(sib_s2), np.asarray(sib_12))
    assert np.array_equal(np.asarray(auth_s2), np.asarray(auth_12))


@pytest.mark.slow
def test_sharded_pedersen_tree(rng):
    """Sharded Pedersen byte tree (the reference's primary byte-tree
    config) bit-equal to the single-device RNS build."""
    from crypto_primitives_tpu.models.crh.pedersen import Window
    from crypto_primitives_tpu.models.merkle_tree.device import (
        pedersen_device_tree,
        pedersen_tree_fns,
    )
    from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH
    from crypto_primitives_tpu.ops.curves_known import JUBJUB

    leaf_w = Window(4, 32)  # 128-bit leaves
    two_w = Window(4, 256)  # 1024-bit two-to-one (2*64-byte digests)
    crh = PedersenCRH(JUBJUB, leaf_w)
    leaf_params = crh.setup(rng)
    two_params = PedersenCRH(JUBJUB, two_w).setup(rng)
    n = 4 * D
    leaves = jnp.asarray(
        np.asarray(
            [[rng.randrange(256) for _ in range(16)] for _ in range(n)],
            dtype=np.uint8,
        )
    )
    mesh = make_mesh(D)
    leaf_hash, compress, _, to_host = pedersen_tree_fns(
        JUBJUB, leaf_params, two_params, leaf_w, two_w
    )
    sh = sharded_merkle_tree(leaf_hash, compress, leaves, mesh)
    single = pedersen_device_tree(
        JUBJUB, leaf_params, two_params, leaf_w, two_w, leaves
    )
    assert np.array_equal(np.asarray(sh.root_row), np.asarray(single.root_row()))
    idx = jnp.arange(n, dtype=jnp.int32)
    sib_s, auth_s = sh.proof_rows(idx)
    sib_1, auth_1 = single.proof_rows(idx)
    assert np.array_equal(np.asarray(sib_s), np.asarray(sib_1))
    assert np.array_equal(np.asarray(auth_s), np.asarray(auth_1))
