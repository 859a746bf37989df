"""Serialization and misc utilities (ark-serialize behavioral twins)."""

from crypto_primitives_tpu.utils.serialize import (
    to_uncompressed_bytes,
    uncompressed_bytes_of_field,
    uncompressed_bytes_of_te_point,
)
