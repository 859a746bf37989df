"""Multi-chip scaling evidence on the virtual CPU mesh.

Real multi-chip hardware is not available in this environment (one TPU chip
behind a tunnel), so scaling is demonstrated the way the driver validates
sharding: a host-platform mesh (xla_force_host_platform_device_count).  The
numbers show the sharded programs (parallel/) scale with device count; the
absolute single-chip TPU throughputs live in bench.py / PERFORMANCE.md.

This box exposes 4 physical cores, so 8 virtual devices oversubscribe;
D = 4 is the honest ceiling here (each virtual device runs the same SPMD
program a real 8-chip mesh would).

Workloads:
  * sharded SHA-256 Merkle build+prove-all (leaves/s) at D = 1, 2, 4, 8
  * sharded Poseidon permutation batch (perm/s) at D = 1, 2, 4, 8
"""

import os
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.merkle_tree.device import (
    _sha_compress,
    _sha_convert,
    _sha_leaf_hash,
)
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.models.sponge.poseidon import permute
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.parallel import (
    make_mesh,
    sharded_merkle_build_prove_all,
    sharded_permute_batch,
)


def timeit(fn, reps=3):
    fn()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(7)
    print(f"devices: {len(jax.devices())} ({jax.devices()[0].platform})")

    # --- sharded Merkle build + prove-all ---
    n = 1 << 14
    leaves = jnp.asarray(rng.integers(0, 256, size=(n, 16), dtype=np.uint8))
    for d in (1, 2, 4, 8):
        mesh = make_mesh(d)
        t = timeit(
            lambda: sharded_merkle_build_prove_all(
                _sha_leaf_hash, _sha_compress, leaves, mesh,
                leaf_convert=_sha_convert(),
            )
        )
        print(
            f"merkle build+prove-all  D={d}: {n/t:10.0f} leaves/s  ({t*1e3:7.1f} ms)"
        )

    # --- sharded Poseidon permutation batch ---
    cfg = get_default_poseidon_parameters(FR, 2, False)
    packed = cfg.packed()
    B = 4096
    states = jnp.asarray(
        FR.pack(rng.integers(0, 2**63, size=(B, cfg.t)).tolist())
    )
    for d in (1, 2, 4, 8):
        mesh = make_mesh(d)
        t = timeit(
            lambda: sharded_permute_batch(
                lambda s: permute(FR, packed, s), states, mesh
            )
        )
        print(f"poseidon permute batch  D={d}: {B/t:10.0f} perm/s    ({t*1e3:7.1f} ms)")


if __name__ == "__main__":
    main()
