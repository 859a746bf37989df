"""Pedersen commitment: `Com(m; r) = PedersenCRH(m) + sum_j r_bits[j] * 2^j * h`.

Twin of /root/reference/crypto-primitives/src/commitment/pedersen/mod.rs:
`Parameters{randomness_generator (powers of h), generators}` (mod.rs:17-21);
setup samples MODULUS_BIT_SIZE powers of a blinding base plus the CRH window
tables (mod.rs:44-60); commit reuses the CRH for the message part then adds
the blinding term over the randomness bits LE (mod.rs:62-105).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.crh.pedersen import (
    PedersenCRH,
    PedersenParameters,
    Window,
)
from crypto_primitives_tpu.ops import curve as cv
from crypto_primitives_tpu.ops import curve_rns as cr
from crypto_primitives_tpu.ops.curve import TECurveSpec


@dataclasses.dataclass(eq=False)
class PedersenCommitmentParameters:
    curve: TECurveSpec
    randomness_generator: List[Tuple[int, int]]
    generators: List[List[Tuple[int, int]]]

    @functools.cache
    def packed_randomness(self) -> np.ndarray:
        # numpy, not jnp: trace-safe caching
        return self.curve.pack_points(self.randomness_generator)

    @functools.cache
    def packed_randomness_rns(self) -> np.ndarray:
        from crypto_primitives_tpu.ops.curve_rns_any import rns_mod

        return rns_mod(self.curve).pack_points_rns(
            self.curve, self.randomness_generator
        )

    @functools.cache
    def packed_randomness_grouped_rns(self, w: int = 3) -> np.ndarray:
        from crypto_primitives_tpu.ops.curve_rns_any import rns_mod

        return rns_mod(self.curve).pack_table_grouped(
            self.curve, self.randomness_generator, w
        )

    @functools.cache
    def packed_randomness_grouped_kernel(self, w: int = 3) -> np.ndarray:
        # curve-model dispatched (TE: msm_rns_pallas layout; SW:
        # msm_sw_rns_pallas projective layout)
        from crypto_primitives_tpu.ops.curve_rns_any import rns_mod

        return rns_mod(self.curve).pack_combos_kernel(
            self.curve, self.randomness_generator, w
        )

    # adapter so conditional_sum_grouped_auto can treat the blinding table
    # like a params object
    def packed_grouped_rns(self, w: int = 3):
        return self.packed_randomness_grouped_rns(w)

    def packed_grouped_kernel(self, w: int = 3):
        return self.packed_randomness_grouped_kernel(w)

    def crh_params(self) -> PedersenParameters:
        if not hasattr(self, "_crh_params"):
            self._crh_params = PedersenParameters(self.curve, self.generators)
        return self._crh_params

    def __hash__(self):
        return id(self)


class PedersenCommitment:
    def __init__(self, curve, window: Window):
        # curve: TECurveSpec or SWCurveSpec (duck-typed host + device tiers)
        self.curve = curve
        self.window = window
        self.crh = PedersenCRH(curve, window)

    def setup(self, rng) -> PedersenCommitmentParameters:
        num_powers = self.curve.scalar.nbits  # MODULUS_BIT_SIZE (mod.rs:51)
        randomness_generator = self.crh.generator_powers(num_powers, rng)
        generators = self.crh.create_generators(rng)
        return PedersenCommitmentParameters(self.curve, randomness_generator, generators)

    def rand_randomness(self, rng) -> int:
        return rng.randrange(self.curve.scalar.p)

    def commit(self, params: PedersenCommitmentParameters, input_: bytes,
               randomness: int) -> Tuple[int, int]:
        """Host tier (mod.rs:62-105)."""
        if len(input_) > self.window.window_size * self.window.num_windows:
            raise ValueError(f"incorrect input length: {len(input_)}")
        result = self.crh.evaluate(params.crh_params(), bytes(input_))
        from crypto_primitives_tpu import native

        eng = native.curve_engine(self.curve)
        if eng is not None:
            blind = eng.scalar_mul(params.randomness_generator[0], int(randomness))
            return eng.add(result, blind) if blind is not None else result
        r = int(randomness)
        for power in params.randomness_generator:
            if r == 0:
                break
            if r & 1:
                result = self.curve.add_host(result, power)
            r >>= 1
        return result

    def commit_batch(self, params: PedersenCommitmentParameters, inputs: jnp.ndarray,
                     randomness: jnp.ndarray) -> jnp.ndarray:
        """inputs (..., nbytes) uint8; randomness (..., NB) bits LE (uint8).

        Returns affine commitments (..., 2, L).
        """
        from crypto_primitives_tpu.ops.curve_rns_any import rns_mod

        mod = rns_mod(self.curve)
        if mod is not None:
            w = self.crh.GROUP_W
            msg = self.crh.evaluate_batch_rns(params.crh_params(), inputs)
            blind = mod.conditional_sum_grouped_auto(
                self.curve, params, randomness, w
            )
            ext = mod.to_limb_points(
                self.curve, mod.add_rns(self.curve, msg, blind)
            )
            return self.curve.dev_to_affine(ext)
        msg = self.crh.evaluate_batch_extended(params.crh_params(), inputs)
        blind = self.curve.dev_conditional_sum(params.packed_randomness(), randomness)
        return self.curve.dev_to_affine(self.curve.dev_add(msg, blind))

    def randomness_to_bits(self, randomness) -> np.ndarray:
        """Host scalars -> (..., nbits) LE bit array for commit_batch."""
        arr = np.asarray(randomness, dtype=object)
        flat = arr.reshape(-1)
        nbits = self.curve.scalar.nbits
        out = np.zeros((flat.shape[0], nbits), dtype=np.uint8)
        for i, v in enumerate(flat):
            v = int(v)
            for j in range(nbits):
                out[i, j] = (v >> j) & 1
        return out.reshape(arr.shape + (nbits,))
