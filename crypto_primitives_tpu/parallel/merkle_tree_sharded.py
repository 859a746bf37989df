"""Sharded full Merkle tree: build + batched proof generation over a mesh.

Extends parallel/merkle.py (root only) to the full flagship workload of the
reference's bench (/root/reference/crypto-primitives/benches/merkle_tree.rs:
36-209: create + prove + verify at 2^20 leaves; rayon build at
src/merkle_tree/mod.rs:441-515): leaves are sharded across the mesh, every
device builds its local subtree AND gathers the auth paths for its own
leaves locally, the D subtree roots ride one tiny all-gather over ICI, and
the top log2(D) levels (plus each shard's top-path siblings) are folded
replicated.  Per-leaf outputs stay sharded along the leaf axis — no
materialized global tree ever crosses a device boundary.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def sharded_merkle_build_prove_all(
    leaf_hash_batch: Callable,
    compress_batch: Callable,
    leaves: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
    leaf_convert: Callable = lambda x: x,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build the tree and produce EVERY leaf's auth path, sharded.

    leaves: (N, ...) leaf-hash inputs, N = D * n_local with n_local a power
    of two >= 2.  Returns (root, leaf_sib, auth):
      root      — replicated digest row, bit-identical to the
                  single-device DeviceMerkleTree build;
      leaf_sib  — (N, D_digest) leaf-level sibling digests (sharded);
      auth      — (N, height-2, D_digest) root-first inner auth paths
                  (sharded), matching DeviceMerkleTree.proof_rows.
    """
    n_dev = mesh.shape[axis_name]
    n = leaves.shape[0]
    n_local = n // n_dev
    assert n == n_dev * n_local and n_local >= 2 and (n_local & (n_local - 1)) == 0

    def shard_fn(leaves_shard):
        # local subtree: identical digest chain to DeviceMerkleTree.build
        leaf_digests = leaf_hash_batch(leaves_shard)
        conv = leaf_convert(leaf_digests)
        cur = compress_batch(conv[0::2], conv[1::2])
        local_levels = [cur]
        while cur.shape[0] > 1:
            cur = compress_batch(cur[0::2], cur[1::2])
            local_levels.append(cur)
        local_levels.reverse()  # [subtree root level (1), ..., bottom (n/2)]
        sub_root = local_levels[0][0]

        # tiny collective: the D subtree roots, then fold the top levels
        # replicated on every device
        roots = jax.lax.all_gather(sub_root, axis_name)  # (D, digest)
        top_levels = [roots]
        while top_levels[-1].shape[0] > 1:
            lv = top_levels[-1]
            top_levels.append(compress_batch(lv[0::2], lv[1::2]))
        root = top_levels[-1][0]

        # local auth paths (within the subtree), root-first per leaf
        idx = jnp.arange(n_local, dtype=jnp.int32)
        leaf_sib = jnp.take(leaf_digests, idx ^ 1, axis=0)
        auth_local = []
        node = idx >> 1
        for level in local_levels[:0:-1]:  # bottom ... subtree level 1
            auth_local.append(jnp.take(level, node ^ 1, axis=0))
            node = node >> 1
        auth_local.reverse()

        # top-path siblings for THIS shard (same for all its leaves):
        # siblings of my subtree root's path through the top tree
        d = jax.lax.axis_index(axis_name)
        auth_top = []
        nd = d
        for level in top_levels[:-1]:  # bottom of top tree ... level 1
            auth_top.append(jnp.take(level, nd ^ 1, axis=0))
            nd = nd >> 1
        auth_top.reverse()  # root-first
        top_rows = [jnp.broadcast_to(r, (n_local,) + r.shape) for r in auth_top]
        auth = jnp.stack(top_rows + auth_local, axis=1) if (
            top_rows or auth_local
        ) else jnp.zeros((n_local, 0) + leaf_digests.shape[1:], leaf_digests.dtype)
        return root, leaf_sib, auth

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=(P(), P(axis_name), P(axis_name)),
        check_vma=False,
    )
    return fn(leaves)


def sharded_permute_batch(
    permute_batch: Callable,
    states: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
) -> jnp.ndarray:
    """Data-parallel Poseidon permutation: independent sponge states sharded
    over the mesh, zero communication (the multi-chip twin of the headline
    bench.py workload).  states: (B, t, L) with B divisible by mesh size."""
    assert states.shape[0] % mesh.shape[axis_name] == 0
    fn = jax.shard_map(
        permute_batch,
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return fn(states)
