"""Poseidon CRH: thin wrappers over the duplex sponge.

Twin of /root/reference/crypto-primitives/src/crh/poseidon/mod.rs:
  * `CRH.evaluate` absorbs a fixed-length field-element input and squeezes
    one element (mod.rs:30-41);
  * `TwoToOneCRH.evaluate/compress` absorbs left then right (mod.rs:58-79);
  * `setup` is intentionally unimplemented — parameters must be supplied
    (mod.rs:24-28).
"""

from __future__ import annotations

import jax.numpy as jnp

from crypto_primitives_tpu.models.sponge.poseidon import (
    PoseidonConfig,
    PoseidonSponge,
    PoseidonSpongeBatch,
)
from crypto_primitives_tpu.ops.field import FieldSpec


class PoseidonCRH:
    """Input: list of field elements (host) / (..., k, L) array (device)."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec

    def setup(self, rng):
        # mirrors the reference's unimplemented!() (crh/poseidon/mod.rs:24-28)
        raise NotImplementedError("Poseidon parameters must be supplied explicitly")

    def evaluate(self, params: PoseidonConfig, input_) -> int:
        sponge = PoseidonSponge(params)
        sponge.absorb_elements([int(v) for v in input_])
        return sponge.squeeze_native_field_elements(1)[0]

    def evaluate_batch(self, params: PoseidonConfig, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs (..., k, L) Montgomery -> digests (..., L)."""
        sponge = PoseidonSpongeBatch(params, batch_shape=inputs.shape[:-2])
        sponge.absorb(inputs)
        return sponge.squeeze_native_field_elements(1)[..., 0, :]


class PoseidonTwoToOneCRH:
    """Input/Output: single field elements."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec

    def setup(self, rng):
        raise NotImplementedError("Poseidon parameters must be supplied explicitly")

    def evaluate(self, params: PoseidonConfig, left: int, right: int) -> int:
        return self.compress(params, left, right)

    def compress(self, params: PoseidonConfig, left: int, right: int) -> int:
        sponge = PoseidonSponge(params)
        sponge.absorb_elements([int(left)])
        sponge.absorb_elements([int(right)])
        return sponge.squeeze_native_field_elements(1)[0]

    def evaluate_batch(self, params, left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
        """left/right (..., L) Montgomery -> (..., L)."""
        sponge = PoseidonSpongeBatch(params, batch_shape=left.shape[:-1])
        sponge.absorb(left[..., None, :])
        sponge.absorb(right[..., None, :])
        return sponge.squeeze_native_field_elements(1)[..., 0, :]

    compress_batch = evaluate_batch
