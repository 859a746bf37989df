"""Sharded Merkle construction.

The reference builds each tree level with rayon across one host's cores
(/root/reference/crypto-primitives/src/merkle_tree/mod.rs:441-515, levels
are sequential barriers).  Multi-chip TPU mapping (SURVEY.md §2.10): shard
the leaves across the mesh, let every device build its subtree root locally
(zero communication), then all-gather the D subtree roots (tiny) and fold
the top log2(D) levels identically on every device.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_merkle_root(
    config,
    leaf_hash_param,
    two_to_one_param,
    leaves: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
):
    """Build a Merkle root with leaves sharded over ``mesh``.

    ``leaves``: (N, ...) leaf-hash inputs, N divisible by mesh size * 2.
    Returns the root digest row (device array, replicated).
    The per-shard digest chain matches `MerkleTree.new` exactly, so the root
    is bit-identical to the single-device build.
    """
    two = config.two_to_one_hash
    conv = config.leaf_inner_converter
    n_dev = mesh.shape[axis_name]
    n = leaves.shape[0]
    assert n % n_dev == 0 and (n // n_dev) >= 2, "need >= 2 leaves per shard"

    def local_subtree(leaves_shard):
        # identical digest chain to MerkleTree.new_with_leaf_digest
        ld = config.leaf_hash.evaluate_batch(leaf_hash_param, leaves_shard)
        cur = two.evaluate_batch(
            two_to_one_param, conv.convert_batch(ld[0::2]), conv.convert_batch(ld[1::2])
        )
        while cur.shape[0] > 1:
            cur = two.compress_batch(two_to_one_param, cur[0::2], cur[1::2])
        # all-gather the subtree roots over ICI, then every device folds the
        # top levels identically (replicated output)
        roots = jax.lax.all_gather(cur[0], axis_name)  # (D, digest...)
        while roots.shape[0] > 1:
            roots = two.compress_batch(two_to_one_param, roots[0::2], roots[1::2])
        return roots[0]

    fn = jax.shard_map(
        local_subtree,
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(),  # replicated root
        check_vma=False,
    )
    return fn(leaves)
