"""Injective-map CRH compressors.

Twin of /root/reference/crypto-primitives/src/crh/injective_map/mod.rs:
post-compose a Pedersen CRH with an injective map to shrink the digest —
`TECompressor` returns the x-coordinate of a TE point (mod.rs:22-31).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from crypto_primitives_tpu.models.crh.pedersen import (
    PedersenCRH,
    PedersenTwoToOneCRH,
    Window,
)
from crypto_primitives_tpu.ops.curve import TECurveSpec


class TECompressor:
    """x-coordinate of a TE affine point (injective on the prime-order
    subgroup up to sign — mirrors mod.rs:24-31)."""

    @staticmethod
    def injective_map(pt: Tuple[int, int]) -> int:
        return pt[0]

    @staticmethod
    def injective_map_batch(aff: jnp.ndarray) -> jnp.ndarray:
        """(..., 2, L) affine -> (..., L) x-coordinates."""
        return aff[..., 0, :]


class PedersenCRHCompressor:
    """mod.rs:33-62."""

    def __init__(self, curve: TECurveSpec, window: Window, compressor=TECompressor):
        self.crh = PedersenCRH(curve, window)
        self.compressor = compressor

    def setup(self, rng):
        return self.crh.setup(rng)

    def evaluate(self, params, input_: bytes) -> int:
        return self.compressor.injective_map(self.crh.evaluate(params, input_))

    def evaluate_batch(self, params, inputs: jnp.ndarray) -> jnp.ndarray:
        return self.compressor.injective_map_batch(
            self.crh.evaluate_batch(params, inputs)
        )


class PedersenTwoToOneCRHCompressor:
    """mod.rs:64-108; note compress() converts prior *compressed* digests
    (field elements) to bytes."""

    def __init__(self, curve: TECurveSpec, window: Window, compressor=TECompressor):
        self.curve = curve
        self.two = PedersenTwoToOneCRH(curve, window)
        self.compressor = compressor

    def setup(self, rng):
        return self.two.setup(rng)

    def evaluate(self, params, left: bytes, right: bytes) -> int:
        return self.compressor.injective_map(self.two.evaluate(params, left, right))

    def compress(self, params, left: int, right: int) -> int:
        return self.evaluate(
            params,
            self.curve.base.to_bytes_le(int(left)),
            self.curve.base.to_bytes_le(int(right)),
        )
