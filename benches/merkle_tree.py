"""Merkle tree bench — twin of benches/merkle_tree.rs (SHA-256 tree with
2^20 x 32-byte leaves: create / prove / verify / multi-prove / multi-verify),
plus the Poseidon field-native tree."""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from benches._util import emit
from crypto_primitives_tpu.models.crh.poseidon import PoseidonCRH, PoseidonTwoToOneCRH
from crypto_primitives_tpu.models.crh.sha256 import Sha256CRH, Sha256TwoToOneCRH
from crypto_primitives_tpu.models.merkle_tree import (
    ByteDigestConverter,
    ByteDigestDomain,
    FieldDigestDomain,
    IdentityDigestConverter,
    MerkleTree,
    MerkleTreeConfig,
)
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR


def bench_sha256_tree(n_leaves: int, rng):
    cfg = MerkleTreeConfig(
        Sha256CRH(), Sha256TwoToOneCRH(),
        ByteDigestDomain(32), ByteDigestDomain(32), ByteDigestConverter(32),
    )
    leaves = np.random.default_rng(0).integers(0, 256, (n_leaves, 32), dtype=np.uint8)
    dev = jnp.asarray(leaves)
    MerkleTree.new(cfg, None, None, dev)  # warmup (compiles per-level kernels)
    t0 = time.perf_counter()
    tree = MerkleTree.new(cfg, None, None, dev)
    create = time.perf_counter() - t0
    emit("merkle_sha256_create_leaves_per_s", n_leaves / create, "leaves/s")

    t0 = time.perf_counter()
    proofs = [tree.generate_proof(i) for i in range(0, n_leaves, max(1, n_leaves // 64))]
    emit("merkle_sha256_prove", (time.perf_counter() - t0) / len(proofs), "s/proof")
    root = tree.root()
    t0 = time.perf_counter()
    for i, pr in zip(range(0, n_leaves, max(1, n_leaves // 64)), proofs):
        assert pr.verify(cfg, None, None, root, bytes(leaves[i]))
    emit("merkle_sha256_verify", (time.perf_counter() - t0) / len(proofs), "s/verify")

    idxs = list(range(0, n_leaves, max(1, n_leaves // 64)))
    t0 = time.perf_counter()
    mp = tree.generate_multi_proof(idxs)
    emit("merkle_sha256_multi_prove", time.perf_counter() - t0, "s")
    t0 = time.perf_counter()
    assert mp.verify(cfg, None, None, root, [bytes(leaves[i]) for i in mp.leaf_indexes])
    emit("merkle_sha256_multi_verify", time.perf_counter() - t0, "s")


def bench_poseidon_tree(n_leaves: int, rng):
    cfg = MerkleTreeConfig(
        PoseidonCRH(FR), PoseidonTwoToOneCRH(FR),
        FieldDigestDomain(FR), FieldDigestDomain(FR), IdentityDigestConverter(),
    )
    params = get_default_poseidon_parameters(FR, 2, False)
    leaves = [[rng.randrange(FR.p)] for _ in range(n_leaves)]
    dev = jnp.asarray(FR.pack(leaves))
    MerkleTree.new(cfg, params, params, dev)  # warmup
    t0 = time.perf_counter()
    MerkleTree.new(cfg, params, params, dev)
    create = time.perf_counter() - t0
    emit("merkle_poseidon_create_leaves_per_s", n_leaves / create, "leaves/s")


def main():
    rng = random.Random(0)
    n = int(os.environ.get("BENCH_LEAVES", str(1 << 16)))
    bench_sha256_tree(n, rng)
    bench_poseidon_tree(min(n, 1 << 14), rng)


if __name__ == "__main__":
    main()
