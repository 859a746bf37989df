"""Pedersen CRH over a twisted-Edwards group.

Twin of /root/reference/crypto-primitives/src/crh/pedersen/mod.rs:
`H(m) = sum_i <bits of window i> . 2^j . g_i` over precomputed per-window
doubling tables (`generators[w][j] = 2^j * g_w`, mod.rs:48-56); input is
bytes (LE bit order per byte, mod.rs:200-209), output an affine point;
TwoToOne concatenates two equal halves into one buffer (mod.rs:158-182);
`compress` serializes prior digests to uncompressed x||y bytes first
(mod.rs:187-198).

TPU re-design: the per-window bit/base conditional adds become one
`te_conditional_sum` (select + log-depth complete-addition tree) over the
flattened (NUM_WINDOWS * WINDOW_SIZE)-entry table, batched over messages.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.ops import curve as cv
from crypto_primitives_tpu.ops import curve_rns as cr
from crypto_primitives_tpu.ops.curve import TECurveSpec


@dataclasses.dataclass(frozen=True)
class Window:
    """`pedersen::Window` twin (mod.rs:23-26)."""

    window_size: int
    num_windows: int


@dataclasses.dataclass(eq=False)
class PedersenParameters:
    """`Parameters{generators}` (mod.rs:28-31); generators[w][j] host affine."""

    curve: TECurveSpec
    generators: List[List[Tuple[int, int]]]

    @functools.cache
    def packed_flat(self) -> np.ndarray:
        """(num_windows * window_size, 4, L) extended, window-major.

        Cached as numpy (not jnp) so a first call under a trace cannot
        memoize tracers."""
        flat = [g for win in self.generators for g in win]
        return self.curve.pack_points(flat)

    @functools.cache
    def packed_flat_rns(self) -> np.ndarray:
        """Same table in RNS residues (num_windows*window_size, 4, 2K)."""
        from crypto_primitives_tpu.ops.curve_rns_any import rns_mod

        flat = [g for win in self.generators for g in win]
        return rns_mod(self.curve).pack_points_rns(self.curve, flat)

    @functools.cache
    def packed_grouped_rns(self, w: int = 3) -> np.ndarray:
        """Windowed subset-sum tables (G, 2^w, coords, 2K) for the grouped
        conditional sum (one select replaces w conditional additions);
        curve-model dispatched (TE extended / SW projective)."""
        from crypto_primitives_tpu.ops.curve_rns_any import rns_mod

        flat = [g for win in self.generators for g in win]
        return rns_mod(self.curve).pack_table_grouped(self.curve, flat, w)

    @functools.cache
    def packed_native(self) -> np.ndarray:
        """Same flat table packed for the C++ host engine's bit-table MSM
        (crypto_primitives_tpu/native/cpmont.cpp cpm_*_msm_bits_batch)."""
        from crypto_primitives_tpu import native

        flat = [g for win in self.generators for g in win]
        return native.curve_engine(self.curve).pack_table(flat)

    @functools.cache
    def packed_grouped_kernel(self, w: int = 3) -> np.ndarray:
        """Same tables in the fused Pallas kernel layout; curve-model
        dispatched (TE: ops/msm_rns_pallas.py digit planes with twisted
        residues and d folded into T; SW: ops/msm_sw_rns_pallas.py
        projective digit planes)."""
        from crypto_primitives_tpu.ops.curve_rns_any import rns_mod

        flat = [g for win in self.generators for g in win]
        return rns_mod(self.curve).pack_combos_kernel(self.curve, flat, w)

    def __hash__(self):
        return id(self)


def bytes_to_bits(data: bytes) -> List[bool]:
    """LE bit order within each byte (mod.rs:200-209)."""
    bits = []
    for byte in data:
        for i in range(8):
            bits.append(bool((byte >> i) & 1))
    return bits


def bytes_to_bits_batch(data: np.ndarray, nbits: int) -> np.ndarray:
    """(..., nbytes) uint8 -> (..., nbits) uint8 bits, LE per byte,
    zero-padded to nbits."""
    b = np.asarray(data, dtype=np.uint8)
    bits = np.unpackbits(b[..., None], axis=-1, bitorder="little").reshape(
        b.shape[:-1] + (b.shape[-1] * 8,)
    )
    if bits.shape[-1] < nbits:
        pad = np.zeros(bits.shape[:-1] + (nbits - bits.shape[-1],), dtype=np.uint8)
        bits = np.concatenate([bits, pad], axis=-1)
    return bits


class PedersenCRH:
    def __init__(self, curve: TECurveSpec, window: Window):
        self.curve = curve
        self.window = window
        self.input_size_bits = window.window_size * window.num_windows

    # -- setup (mod.rs:40-74) --

    def generator_powers(self, num_powers: int, rng) -> List[Tuple[int, int]]:
        base = self.curve.rand_point(rng)
        powers = []
        for _ in range(num_powers):
            powers.append(base)
            base = self.curve.double_host(base)
        return powers

    def create_generators(self, rng) -> List[List[Tuple[int, int]]]:
        return [
            self.generator_powers(self.window.window_size, rng)
            for _ in range(self.window.num_windows)
        ]

    def setup(self, rng) -> PedersenParameters:
        return PedersenParameters(self.curve, self.create_generators(rng))

    # -- evaluation --

    def _check_and_pad(self, data: bytes) -> bytes:
        if len(data) * 8 > self.input_size_bits:
            raise ValueError(
                f"incorrect input length {len(data)} for window params "
                f"{self.window.window_size}x{self.window.num_windows}"
            )
        padded_length = self.input_size_bits // 8
        return bytes(data) + b"\x00" * (padded_length - len(data))

    def evaluate(self, params: PedersenParameters, input_: bytes) -> Tuple[int, int]:
        """Host tier: exact mirror of mod.rs:76-129.  Single-op calls ride
        the compiled C++ bit-table MSM when the native engine is loaded
        (python-int fallback below stays the oracle; CPT_NATIVE=0 forces it)."""
        from crypto_primitives_tpu import native

        data = self._check_and_pad(bytes(input_))
        if native.curve_engine(self.curve) is not None:
            eng = native.curve_engine(self.curve)
            bits_arr = np.unpackbits(
                np.frombuffer(data, np.uint8), bitorder="little"
            )[None, :]
            return eng.msm_bits(params.packed_native(), bits_arr)[0]
        bits = bytes_to_bits(data)
        acc = self.curve.zero_host()
        for w in range(self.window.num_windows):
            chunk = bits[w * self.window.window_size : (w + 1) * self.window.window_size]
            for bit, base in zip(chunk, params.generators[w]):
                if bit:
                    acc = self.curve.add_host(acc, base)
        return acc

    GROUP_W = 3  # windowed-lookup width for the RNS conditional sum

    def evaluate_batch_rns(self, params: PedersenParameters, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs (..., nbytes) uint8 -> RNS digests (..., coords, 2K)
        (the fast path: grouped conditional-sum MSM, curve-model
        dispatched via ops/curve_rns_any)."""
        from crypto_primitives_tpu.ops.curve_rns_any import rns_mod

        nbytes = inputs.shape[-1]
        assert nbytes * 8 <= self.input_size_bits
        bits = jnp.asarray(bytes_to_bits_batch(np.asarray(inputs), self.input_size_bits))
        return rns_mod(self.curve).conditional_sum_grouped_auto(
            self.curve, params, bits, self.GROUP_W
        )

    def evaluate_batch_rns_many(self, params_list, inputs_list):
        """N independent CRH evaluations (possibly different parameter
        sets and batch sizes) in ONE device program.

        Use this when issuing many small back-to-back calls: every
        separate device call pays the ~26 ms axon dispatch floor
        (PERFORMANCE.md "per-call latency floor"), so N single calls pay
        N floors while this surface pays one.  Returns the N RNS digest
        arrays (same layout as evaluate_batch_rns)."""
        from crypto_primitives_tpu.ops.curve_rns_any import rns_mod

        bits_list = []
        for inputs in inputs_list:
            nbytes = inputs.shape[-1]
            assert nbytes * 8 <= self.input_size_bits
            bits_list.append(
                jnp.asarray(
                    bytes_to_bits_batch(np.asarray(inputs), self.input_size_bits)
                )
            )
        return rns_mod(self.curve).msm_many(
            self.curve, params_list, bits_list, self.GROUP_W
        )

    def evaluate_batch_extended(self, params: PedersenParameters, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs (..., nbytes) uint8 -> extended digests (..., coords, L)."""
        from crypto_primitives_tpu.ops.curve_rns_any import rns_mod

        mod = rns_mod(self.curve)
        if mod is not None:
            acc = self.evaluate_batch_rns(params, inputs)
            return mod.to_limb_points(self.curve, acc)
        nbytes = inputs.shape[-1]
        assert nbytes * 8 <= self.input_size_bits
        bits = jnp.asarray(bytes_to_bits_batch(np.asarray(inputs), self.input_size_bits))
        return self.curve.dev_conditional_sum(params.packed_flat(), bits)

    def evaluate_batch(self, params: PedersenParameters, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs (..., nbytes) uint8 -> affine digests (..., 2, L) Montgomery."""
        return self.curve.dev_to_affine(self.evaluate_batch_extended(params, inputs))


class PedersenTwoToOneCRH:
    """mod.rs:132-198: halves zero-padded into one INPUT_SIZE_BITS buffer."""

    def __init__(self, curve: TECurveSpec, window: Window):
        self.curve = curve
        self.window = window
        self.crh = PedersenCRH(curve, window)
        self.input_size_bits = self.crh.input_size_bits
        self.half_input_size_bits = self.input_size_bits // 2

    def setup(self, rng) -> PedersenParameters:
        return self.crh.setup(rng)

    def evaluate(self, params, left: bytes, right: bytes) -> Tuple[int, int]:
        assert len(left) == len(right), "left and right input should be of equal length"
        assert len(left) * 8 <= self.half_input_size_bits
        buffer = bytearray(self.input_size_bits // 8)
        combined = bytes(left) + bytes(right)
        buffer[: len(combined)] = combined
        return self.crh.evaluate(params, bytes(buffer))

    def compress(self, params, left: Tuple[int, int], right: Tuple[int, int]):
        """Digests -> uncompressed x||y bytes -> evaluate (mod.rs:187-198)."""
        return self.evaluate(
            params,
            self.curve.to_uncompressed_bytes(left),
            self.curve.to_uncompressed_bytes(right),
        )

    def evaluate_batch(self, params, left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
        """left/right (..., nbytes) uint8 -> (..., 2, L)."""
        assert left.shape == right.shape
        combined = jnp.concatenate([left, right], axis=-1)
        return self.crh.evaluate_batch(params, combined)

    def compress_batch(self, params, left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
        """left/right are affine digest rows (..., 2, L) Montgomery."""
        lb = _affine_to_uncompressed_bytes_batch(self.curve, left)
        rb = _affine_to_uncompressed_bytes_batch(self.curve, right)
        return self.evaluate_batch(params, lb, rb)


def _affine_to_uncompressed_bytes_batch(curve: TECurveSpec, aff: jnp.ndarray) -> jnp.ndarray:
    """(..., 2, L) Montgomery affine -> (..., 2*bigint_bytes) uint8 (x||y LE)."""
    from crypto_primitives_tpu.ops import field as ff

    std = ff.from_mont_device(curve.base, aff)  # (..., 2, L) canonical
    lo = (std & 0xFF).astype(jnp.uint8)
    hi = ((std >> 8) & 0xFF).astype(jnp.uint8)
    by = jnp.stack([lo, hi], axis=-1)  # (..., 2, L, 2)
    return by.reshape(aff.shape[:-2] + (2 * curve.base.bigint_bytes,))
