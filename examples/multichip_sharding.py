"""Multi-chip scaling: a Merkle build + all-leaf proofs under shard_map.

The reference parallelises tree builds with rayon threads
(src/merkle_tree/mod.rs:441-515); the TPU-native answer is a
`jax.sharding.Mesh`: each device hashes N/D leaves, builds its local
subtree, and exchanges exactly D digest rows (one `all_gather` over ICI)
to fold the top — weak-scaling by construction.  The sharded root and
every auth path are asserted bit-equal to the single-device tree.

This script forces an 8-virtual-device CPU mesh so it runs anywhere
(including a 1-chip box).  On a real pod slice run with
CPT_EXAMPLE_REAL_MESH=1: that skips BOTH the XLA_FLAGS injection and the
CPU platform pin below, and `make_mesh()` picks up the physical chips.

Run: python examples/multichip_sharding.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not os.environ.get("CPT_EXAMPLE_REAL_MESH"):
    # Append (not setdefault): a pre-existing XLA_FLAGS would otherwise
    # silently suppress the virtual device count and make_mesh(8) would
    # fail on a 1-device box.
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    jax.config.update("jax_platforms", "cpu")  # virtual 8-device mesh

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.merkle_tree.device import (
    _sha_compress,
    _sha_convert,
    _sha_leaf_hash,
    sha256_device_tree,
)
from crypto_primitives_tpu.parallel import (
    make_mesh,
    sharded_merkle_build_prove_all,
)


def main():
    rng = np.random.default_rng(5)
    n = 128
    leaves = jnp.asarray(rng.integers(0, 256, size=(n, 16), dtype=np.uint8))

    mesh = make_mesh(8)  # 1D "data" axis over all 8 devices
    root, leaf_sib, auth = sharded_merkle_build_prove_all(
        _sha_leaf_hash, _sha_compress, leaves, mesh, leaf_convert=_sha_convert()
    )
    print(f"built 2^{n.bit_length() - 1}-leaf tree over {mesh.shape['data']} devices; "
          f"root {np.asarray(root).tobytes().hex()[:16]}...")

    # bit-equality vs the single-device tree: root and every auth path
    single = sha256_device_tree(leaves)
    sib1, auth1 = single.proof_rows(jnp.arange(n))
    assert np.asarray(root).tobytes() == single.root()
    assert np.array_equal(np.asarray(leaf_sib), np.asarray(sib1))
    assert np.array_equal(np.asarray(auth), np.asarray(auth1))
    print(f"sharded root + all {n} auth paths bit-equal to the single-device tree")


if __name__ == "__main__":
    main()
