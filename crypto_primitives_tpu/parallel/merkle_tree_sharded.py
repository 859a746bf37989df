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


class ShardedMerkleTree:
    """Mesh-resident Merkle tree with retained levels, supporting proofs,
    batched verification, and in-place updates — the sharded twin of
    models/merkle_tree/device.DeviceMerkleTree (reference mutation sites:
    src/merkle_tree/mod.rs:629-680 update, :252-294 verify).

    Layout: leaf_digests and each local (subtree) level are sharded along
    the leaf axis (device d owns leaves [d*n_local, (d+1)*n_local));
    the top log2(D) levels are replicated (they are tiny and every
    device's proofs need them)."""

    def __init__(self, mesh, axis_name, compress_batch, leaf_convert,
                 leaf_digests, local_levels, top_levels, n_local):
        self.mesh = mesh
        self.axis_name = axis_name
        self.compress_batch = compress_batch
        self.leaf_convert = leaf_convert
        self.leaf_digests = leaf_digests  # (N, D) sharded
        # local_levels[0] = per-device subtree roots stacked (D, Ddig) ...
        # local_levels[-1] = bottom inner level (N/2, Ddig), all sharded
        self.local_levels = local_levels
        self.top_levels = top_levels  # replicated [(D, Ddig), ..., (1, Ddig)]
        self.n_local = n_local

    @property
    def root_row(self):
        return self.top_levels[-1][0]

    def proof_rows(self, indexes: jnp.ndarray):
        """Auth paths for global leaf indexes (host-gathered top rows +
        device-gathered local rows); matches DeviceMerkleTree.proof_rows
        ordering (root-first)."""
        idx = jnp.asarray(indexes, jnp.int32)
        leaf_sib = jnp.take(self.leaf_digests, idx ^ 1, axis=0)
        auth = []
        node = idx >> 1
        # local levels bottom-up; local_levels[li] holds the global level
        # at n_local/2^(len-li)... rows are GLOBAL level rows stacked in
        # shard order, so global node indexes apply directly
        for level in self.local_levels[:0:-1]:
            auth.append(jnp.take(level, node ^ 1, axis=0))
            node = node >> 1
        # subtree-root level (local_levels[0] = the global D-node level;
        # top_levels[0] is the same level replicated, so skip it) then the
        # rest of the top tree down to the 2-node level
        for level in [self.local_levels[0]] + list(self.top_levels[1:-1]):
            if level.shape[0] == 1:
                break
            auth.append(jnp.take(level, node ^ 1, axis=0))
            node = node >> 1
        auth.reverse()
        if not auth:
            return leaf_sib, jnp.zeros(
                (idx.shape[0], 0) + self.leaf_digests.shape[1:],
                self.leaf_digests.dtype,
            )
        return leaf_sib, jnp.stack(auth, axis=1)

    def update_batch(self, indexes, new_leaf_digests: jnp.ndarray):
        """Scatter new leaf digests and recompute touched ancestors; the
        update list is replicated, each device applies the updates that
        land in its shard (masked scatter through a scratch row, so
        static shapes hold for any update pattern)."""
        idx_host = [int(i) for i in indexes]
        U = len(idx_host)
        idx = jnp.asarray(idx_host, jnp.int32)
        n_local = self.n_local
        axis = self.axis_name

        def shard_fn(ld, new_rows, *levels):
            levels = list(levels)
            d = jax.lax.axis_index(axis)
            mine = (idx >> _log2(n_local)) == d
            loc = idx & (n_local - 1)
            # leaf scatter via scratch row n_local
            tgt = jnp.where(mine, loc, n_local)
            pad = jnp.zeros((1,) + ld.shape[1:], ld.dtype)
            ld = jnp.concatenate([ld, pad], axis=0).at[tgt].set(
                jnp.where(mine[:, None], new_rows, 0)
            )[:n_local]
            # recompute local ancestors bottom-up (levels are local slices:
            # levels[-1] is bottom (n_local/2), levels[0] subtree root (1))
            node = loc >> 1
            for li in range(len(levels) - 1, -1, -1):
                child = (
                    self.leaf_convert(ld)
                    if li == len(levels) - 1
                    else levels[li + 1]
                )
                left = jnp.take(child, jnp.minimum(node * 2, child.shape[0] - 1), axis=0)
                right = jnp.take(child, jnp.minimum(node * 2 + 1, child.shape[0] - 1), axis=0)
                new = self.compress_batch(left, right)
                rows = levels[li].shape[0]
                t = jnp.where(mine, node, rows)
                padl = jnp.zeros((1,) + levels[li].shape[1:], levels[li].dtype)
                levels[li] = jnp.concatenate([levels[li], padl], axis=0).at[
                    t
                ].set(jnp.where(mine[:, None], new, 0))[:rows]
                node = node >> 1
            # refold the replicated top from the new subtree roots
            roots = jax.lax.all_gather(levels[0][0], axis)
            tops = [roots]
            while tops[-1].shape[0] > 1:
                lv = tops[-1]
                tops.append(self.compress_batch(lv[0::2], lv[1::2]))
            return (ld, *levels, *tops)

        n_lv = len(self.local_levels)
        fn = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P(self.axis_name), P()) + (P(self.axis_name),) * n_lv,
            out_specs=(P(self.axis_name),) * (1 + n_lv)
            + (P(),) * len(self.top_levels),
            check_vma=False,
        )
        out = fn(self.leaf_digests, new_leaf_digests, *self.local_levels)
        self.leaf_digests = out[0]
        self.local_levels = list(out[1 : 1 + n_lv])
        self.top_levels = list(out[1 + n_lv :])

    def verify_rows_batch(self, root_row, leaf_digests, indexes, leaf_sib, auth):
        """Data-parallel sharded verification (proof rows sharded along
        the batch axis, root replicated, zero collectives); bit-equal to
        DeviceMerkleTree.verify_rows_batch."""
        idx = jnp.asarray(indexes, jnp.int32)

        def shard_fn(root, ld, ix, sib0, au):
            def pick(cond, a, b):
                return jnp.where(cond[..., None], a, b)

            is_left = (ix & 1) == 0
            own = self.leaf_convert(ld)
            sb = self.leaf_convert(sib0)
            curr = self.compress_batch(
                pick(is_left, own, sb), pick(is_left, sb, own)
            )
            node = ix >> 1
            for level in range(au.shape[1] - 1, -1, -1):
                sb = au[:, level]
                is_left = (node & 1) == 0
                curr = self.compress_batch(
                    pick(is_left, curr, sb), pick(is_left, sb, curr)
                )
                node = node >> 1
            return jnp.all(curr == root[None, :], axis=-1)

        fn = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P(),) + (P(self.axis_name),) * 4,
            out_specs=P(self.axis_name),
            check_vma=False,
        )
        return fn(root_row, leaf_digests, idx, leaf_sib, auth)


def _log2(n: int) -> int:
    return n.bit_length() - 1


def sharded_merkle_tree(
    leaf_hash_batch: Callable,
    compress_batch: Callable,
    leaves: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
    leaf_convert: Callable = lambda x: x,
) -> ShardedMerkleTree:
    """Build a mesh-resident tree retaining every level (the stateful twin
    of sharded_merkle_build_prove_all, which returns proofs only)."""
    n_dev = mesh.shape[axis_name]
    n = leaves.shape[0]
    n_local = n // n_dev
    assert n == n_dev * n_local and n_local >= 2 and (n_local & (n_local - 1)) == 0

    def shard_fn(leaves_shard):
        leaf_digests = leaf_hash_batch(leaves_shard)
        conv = leaf_convert(leaf_digests)
        cur = compress_batch(conv[0::2], conv[1::2])
        local_levels = [cur]
        while cur.shape[0] > 1:
            cur = compress_batch(cur[0::2], cur[1::2])
            local_levels.append(cur)
        local_levels.reverse()
        roots = jax.lax.all_gather(local_levels[0][0], axis_name)
        tops = [roots]
        while tops[-1].shape[0] > 1:
            lv = tops[-1]
            tops.append(compress_batch(lv[0::2], lv[1::2]))
        return (leaf_digests, *local_levels, *tops)

    # probe level count from shapes (host math, static)
    n_lv = _log2(n_local)
    n_top = _log2(n_dev) + 1 if n_dev > 1 else 1
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=(P(axis_name),) * (1 + n_lv) + (P(),) * n_top,
        check_vma=False,
    )
    out = fn(leaves)
    return ShardedMerkleTree(
        mesh, axis_name, compress_batch, leaf_convert,
        out[0], list(out[1 : 1 + n_lv]), list(out[1 + n_lv :]), n_local,
    )


def sharded_multipath_verify_rows(
    compress_batch: Callable,
    leaf_convert: Callable,
    root_row: jnp.ndarray,
    leaf_digests: jnp.ndarray,
    indexes,
    leaf_sib: jnp.ndarray,
    auth: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
) -> jnp.ndarray:
    """Sharded twin of DeviceMerkleTree.multipath_verify_rows (the
    deduplicated MultiPath LUT verify, reference mod.rs:272-330): the
    host-planned per-level schedule is identical; each level's distinct
    compresses are row-partitioned across the mesh and re-replicated with
    one all_gather (the wide bottom levels carry the parallelism; the
    tiny top levels are latency-bound either way)."""
    from crypto_primitives_tpu.models.merkle_tree.device import (
        _multipath_schedule,
    )

    n_levels = int(auth.shape[1])
    schedule = _multipath_schedule(tuple(int(i) for i in indexes), n_levels)
    D = mesh.shape[axis_name]

    def shard_fn(root, ld, sib0, au):
        d = jax.lax.axis_index(axis_name)
        cur = leaf_convert(ld)
        s0 = leaf_convert(sib0)
        for li, (k_prev, src) in enumerate(schedule):
            rows = s0 if li == 0 else au[:, n_levels - li]
            buf = jnp.concatenate([cur[:k_prev], rows], axis=0)
            both = jax.lax.optimization_barrier(jnp.take(buf, src, axis=0))
            k = src.shape[0] // 2
            chunk = -(-k // D)
            pad = chunk * D - k
            if pad:
                padrow = jnp.broadcast_to(both[:1], (pad,) + both.shape[1:])
                lefts = jnp.concatenate([both[:k], padrow], axis=0)
                rights = jnp.concatenate([both[k:], padrow], axis=0)
            else:
                lefts, rights = both[:k], both[k:]
            lslice = jax.lax.dynamic_slice_in_dim(lefts, d * chunk, chunk)
            rslice = jax.lax.dynamic_slice_in_dim(rights, d * chunk, chunk)
            part = compress_batch(lslice, rslice)
            full = jax.lax.all_gather(part, axis_name)  # (D, chunk, Ddig)
            cur = full.reshape((D * chunk,) + full.shape[2:])[:k]
        return jnp.all(cur[0] == root)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(root_row, leaf_digests, leaf_sib, auth)
