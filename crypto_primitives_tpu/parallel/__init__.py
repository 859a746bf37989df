"""Multi-chip parallelism: mesh helpers, sharded Merkle builds, sharded MSM.

The reference's only parallelism is single-host rayon map-reduce
(SURVEY.md §2.10); the TPU-native equivalents here are first-class:
`jax.sharding.Mesh` + `shard_map` with XLA collectives over ICI —
leaves/points sharded by index, parameter tables replicated.
"""

from crypto_primitives_tpu.parallel.mesh import make_mesh
from crypto_primitives_tpu.parallel.merkle import sharded_merkle_root
from crypto_primitives_tpu.parallel.msm import (
    sharded_fixed_base_msm,
    sharded_fixed_base_msm_rns,
    sharded_fixed_base_msm_sw_rns,
)
from crypto_primitives_tpu.parallel.merkle_tree_sharded import (
    sharded_merkle_build_prove_all,
    sharded_permute_batch,
)
