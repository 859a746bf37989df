"""Injective-map commitment: Pedersen commit then TE x-coordinate.

Twin of /root/reference/crypto-primitives/src/commitment/injective_map/mod.rs:12-44.
"""

from __future__ import annotations

import jax.numpy as jnp

from crypto_primitives_tpu.models.commitment.pedersen import PedersenCommitment
from crypto_primitives_tpu.models.crh.injective_map import TECompressor
from crypto_primitives_tpu.models.crh.pedersen import Window
from crypto_primitives_tpu.ops.curve import TECurveSpec


class PedersenCommitmentCompressor:
    def __init__(self, curve: TECurveSpec, window: Window, compressor=TECompressor):
        self.inner = PedersenCommitment(curve, window)
        self.compressor = compressor

    def setup(self, rng):
        return self.inner.setup(rng)

    def rand_randomness(self, rng):
        return self.inner.rand_randomness(rng)

    def commit(self, params, input_: bytes, randomness: int) -> int:
        return self.compressor.injective_map(
            self.inner.commit(params, input_, randomness)
        )

    def commit_batch(self, params, inputs: jnp.ndarray, randomness: jnp.ndarray) -> jnp.ndarray:
        return self.compressor.injective_map_batch(
            self.inner.commit_batch(params, inputs, randomness)
        )
