"""Blake2s PRF.

Twin of /root/reference/crypto-primitives/src/prf/blake2s/mod.rs:
`evaluate(seed, input) = Blake2s256(seed || input)` with fixed 32-byte
seed/input/output (mod.rs:13-28), plus `Blake2sWithParameterBlock` using a
keyless Blake2s MAC with salt/personalization (mod.rs:30-49 — note the
reference stores `output_size`/`key_size` fields but its `evaluate` always
uses a 32-byte output and an empty key; mirrored faithfully).
"""

from __future__ import annotations

import dataclasses
import hashlib

import jax.numpy as jnp

from crypto_primitives_tpu.ops.blake2s import blake2s


class Blake2sPRF:
    SEED_BYTES = 32
    INPUT_BYTES = 32
    OUTPUT_BYTES = 32

    @staticmethod
    def evaluate(seed: bytes, input_: bytes) -> bytes:
        assert len(seed) == 32 and len(input_) == 32
        return hashlib.blake2s(bytes(seed) + bytes(input_)).digest()

    @staticmethod
    def evaluate_batch(seeds: jnp.ndarray, inputs: jnp.ndarray) -> jnp.ndarray:
        """seeds/inputs (..., 32) uint8 -> (..., 32) uint8."""
        return blake2s(jnp.concatenate([seeds, inputs], axis=-1))


@dataclasses.dataclass
class Blake2sWithParameterBlock:
    output_size: int = 32
    key_size: int = 0
    salt: bytes = b"\x00" * 8
    personalization: bytes = b"\x00" * 8

    def evaluate(self, input_: bytes) -> bytes:
        return hashlib.blake2s(
            bytes(input_), salt=bytes(self.salt), person=bytes(self.personalization)
        ).digest()

    def evaluate_batch(self, inputs: jnp.ndarray) -> jnp.ndarray:
        return blake2s(
            inputs, salt=bytes(self.salt), person=bytes(self.personalization)
        )
