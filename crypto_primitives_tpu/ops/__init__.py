"""Compute-kernel layer: limb field arithmetic, curve ops, hash cores.

This layer replaces what the reference imports from `ark-ff`/`ark-ec`
(/root/reference/crypto-primitives/Cargo.toml:20-24) plus the RustCrypto
`sha2`/`blake2` crates — re-designed as batched JAX array programs.
"""

from crypto_primitives_tpu.ops import field
from crypto_primitives_tpu.ops.fields_known import (
    ALL_FIELDS,
    BLS12_377_FR,
    BLS12_381_FR,
    ED_ON_BLS12_377_FR,
    JUBJUB_FR,
)
