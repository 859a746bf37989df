"""SHA-256 CRH.

Twin of /root/reference/crypto-primitives/src/crh/sha256/mod.rs:17-78:
no parameters; `evaluate` = SHA256(input); two-to-one = SHA256(left||right);
`compress` feeds prior 32-byte digests directly.  Host tier uses hashlib
(bit-identical oracle); device tier uses the batched scan kernel in
ops/sha256.py.
"""

from __future__ import annotations

import hashlib

import jax.numpy as jnp

from crypto_primitives_tpu.ops.sha256 import sha256


class Sha256CRH:
    DIGEST_WIDTH = 32

    def setup(self, rng):
        return None

    def evaluate(self, params, input_: bytes) -> bytes:
        return hashlib.sha256(bytes(input_)).digest()

    def evaluate_batch(self, params, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs (..., N) uint8 -> (..., 32) uint8."""
        return sha256(inputs)


class Sha256TwoToOneCRH:
    DIGEST_WIDTH = 32

    def setup(self, rng):
        return None

    def evaluate(self, params, left: bytes, right: bytes) -> bytes:
        h = hashlib.sha256()
        h.update(bytes(left))
        h.update(bytes(right))
        return h.digest()

    def compress(self, params, left: bytes, right: bytes) -> bytes:
        return self.evaluate(params, left, right)

    def evaluate_batch(self, params, left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
        return sha256(jnp.concatenate([left, right], axis=-1))

    compress_batch = evaluate_batch
