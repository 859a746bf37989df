"""Blake2s commitment: `Com(m; r) = Blake2s256(m || r)`, r = 32 bytes.

Twin of /root/reference/crypto-primitives/src/commitment/blake2s/mod.rs:20-31.
"""

from __future__ import annotations

import hashlib

import jax.numpy as jnp

from crypto_primitives_tpu.ops.blake2s import blake2s


class Blake2sCommitment:
    RANDOMNESS_BYTES = 32

    def setup(self, rng):
        return None

    def rand_randomness(self, rng) -> bytes:
        return bytes(rng.randrange(256) for _ in range(32))

    def commit(self, params, input_: bytes, randomness: bytes) -> bytes:
        assert len(randomness) == 32
        return hashlib.blake2s(bytes(input_) + bytes(randomness)).digest()

    def commit_batch(self, params, inputs: jnp.ndarray, randomness: jnp.ndarray) -> jnp.ndarray:
        """inputs (..., N) uint8, randomness (..., 32) uint8 -> (..., 32)."""
        return blake2s(jnp.concatenate([inputs, randomness], axis=-1))
