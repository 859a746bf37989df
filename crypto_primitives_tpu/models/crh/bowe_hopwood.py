"""Bowe-Hopwood-Pedersen CRH (Zcash §5.4.1.7) for TE curves.

Twin of /root/reference/crypto-primitives/src/crh/bowe_hopwood/mod.rs:
input split into 3-bit chunks (CHUNK_SIZE = 3, mod.rs:31); per chunk the
generator is scaled by `(1 + c0 + 2*c1) * (1 - 2*c2)` (signed digits,
mod.rs:161-181); generators within a segment are spaced by 2^4 (4 doublings
per step, mod.rs:44-59); setup enforces WINDOW_SIZE small enough that
segment scalars stay < (p-1)/2 (mod.rs:82-101).  Output is only the
**x-coordinate** of the sum (mod.rs:185).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.crh.pedersen import (
    Window,
    bytes_to_bits,
    bytes_to_bits_batch,
)
from crypto_primitives_tpu.ops import curve as cv
from crypto_primitives_tpu.ops import curve_rns as cr
from crypto_primitives_tpu.ops.curve import TECurveSpec

CHUNK_SIZE = 3


@dataclasses.dataclass(eq=False)
class BoweHopwoodParameters:
    curve: TECurveSpec
    generators: List[List[Tuple[int, int]]]  # [num_windows][window_size]

    @functools.cache
    def packed(self):
        """Returns (g, g2): flattened (W*S, 4, L) numpy tables of generators
        and their doubles (for the +2g conditional).  Numpy, not jnp, so a
        first call under a trace cannot memoize tracers."""
        flat = [g for win in self.generators for g in win]
        g = self.curve.pack_points(flat)
        dbl = [self.curve.double_host(pt) for pt in flat]
        g2 = self.curve.pack_points(dbl)
        return g, g2

    @functools.cache
    def packed_rns(self):
        """Same tables in RNS residues (W*S, 4, 2K)."""
        flat = [g for win in self.generators for g in win]
        dbl = [self.curve.double_host(pt) for pt in flat]
        return (
            cr.pack_points_rns(self.curve, flat),
            cr.pack_points_rns(self.curve, dbl),
        )

    def _signed_combos(self, n_real: int):
        """Per-chunk 8-way signed-digit lookup points: combos[j][e] =
        (1 + c0 + 2*c1) * (1 - 2*c2) * g_j for e = c0 + 2c1 + 4c2 — the
        Bowe-Hopwood chunk encoding (reference mod.rs:161-181) expressed
        as a grouped conditional-sum table; chunks >= n_real (absent in
        the reference's CHUNK_SIZE padding) contribute the identity."""
        flat = [g for win in self.generators for g in win]
        combos = []
        for j, g in enumerate(flat):
            if j >= n_real:
                combos.append([self.curve.zero_host()] * 8)
                continue
            row = []
            for e in range(8):
                c0, c1, c2 = e & 1, (e >> 1) & 1, (e >> 2) & 1
                pt = self.curve.scalar_mul_host(g, 1 + c0 + 2 * c1)
                if c2:
                    pt = self.curve.neg_host(pt)
                row.append(pt)
            combos.append(row)
        return combos

    @functools.cache
    def packed_signed_grouped_rns(self, n_real: int) -> np.ndarray:
        combos = self._signed_combos(n_real)
        flat = [pt for row in combos for pt in row]
        G = len(combos)
        return cr.pack_points_rns(self.curve, flat).reshape(G, 8, 4, -1)

    @functools.cache
    def packed_signed_grouped_kernel(self, n_real: int) -> np.ndarray:
        from crypto_primitives_tpu.ops import msm_rns_pallas as mk

        return mk.pack_combos_from_subsets(self.curve, self._signed_combos(n_real))

    def __hash__(self):
        return id(self)


@functools.lru_cache(maxsize=32)
def _device_signed_table_cached(params, n_real: int, kernel: bool):
    if kernel:
        return jnp.asarray(params.packed_signed_grouped_kernel(n_real))
    return jnp.asarray(params.packed_signed_grouped_rns(n_real))


def _device_signed_table(params, n_real: int, kernel: bool):
    """Device-resident signed-digit table (curve_rns._device_table twin:
    jnp.asarray of a cached numpy table re-uploads ~MBs per call; the
    cache is bypassed under an active trace to avoid leaking tracers)."""
    from jax._src import core as _core

    if not _core.trace_state_clean():
        tab = (
            params.packed_signed_grouped_kernel(n_real)
            if kernel
            else params.packed_signed_grouped_rns(n_real)
        )
        return jnp.asarray(tab)
    return _device_signed_table_cached(params, n_real, kernel)


def max_chunks_per_segment(scalar_p: int) -> int:
    """calculate_num_chunks_in_segment (mod.rs:82-92)."""
    upper_limit = (scalar_p - 1) // 2
    c = 0
    rng = 2
    while rng < upper_limit:
        rng <<= 4
        c += 1
    return c


class BoweHopwoodCRH:
    def __init__(self, curve: TECurveSpec, window: Window):
        self.curve = curve
        self.window = window
        self.input_size_bits = window.window_size * window.num_windows * CHUNK_SIZE

    def create_generators(self, rng) -> List[List[Tuple[int, int]]]:
        gens = []
        for _ in range(self.window.num_windows):
            seg = []
            base = self.curve.rand_point(rng)
            for _ in range(self.window.window_size):
                seg.append(base)
                for _ in range(4):
                    base = self.curve.double_host(base)
            gens.append(seg)
        return gens

    def setup(self, rng) -> BoweHopwoodParameters:
        maxc = max_chunks_per_segment(self.curve.scalar.p)
        if self.window.window_size > maxc:
            raise ValueError(
                "Bowe-Hopwood-PedersenCRH hash must have a window size resulting in "
                f"scalars < (p-1)/2, maximum segment size is {maxc}"
            )
        return BoweHopwoodParameters(self.curve, self.create_generators(rng))

    def _padded_bits(self, data: bytes) -> List[bool]:
        if len(data) * 8 > self.input_size_bits:
            raise ValueError(
                f"incorrect input bitlength {len(data) * 8} for window params "
                f"{self.window.window_size}x{self.window.num_windows}x{CHUNK_SIZE}"
            )
        bits = bytes_to_bits(bytes(data))
        if len(bits) % CHUNK_SIZE != 0:
            bits += [False] * (CHUNK_SIZE - len(bits) % CHUNK_SIZE)
        return bits

    def evaluate(self, params: BoweHopwoodParameters, input_: bytes) -> int:
        """Host tier; returns the x-coordinate (mod.rs:114-186)."""
        bits = self._padded_bits(bytes(input_))
        acc = (0, 1)
        seg_bits = self.window.window_size * CHUNK_SIZE
        for w, segment in enumerate(
            [bits[i : i + seg_bits] for i in range(0, len(bits), seg_bits)]
        ):
            for j in range(0, len(segment), CHUNK_SIZE):
                chunk = segment[j : j + CHUNK_SIZE]
                gen = params.generators[w][j // CHUNK_SIZE]
                enc = gen
                if chunk[0]:
                    enc = self.curve.add_host(enc, gen)
                if len(chunk) > 1 and chunk[1]:
                    enc = self.curve.add_host(enc, self.curve.double_host(gen))
                if len(chunk) > 2 and chunk[2]:
                    enc = self.curve.neg_host(enc)
                acc = self.curve.add_host(acc, enc)
        return acc[0]

    def evaluate_batch(self, params: BoweHopwoodParameters, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs (..., nbytes) uint8 -> x-coordinates (..., L) Montgomery."""
        nbytes = inputs.shape[-1]
        assert nbytes * 8 <= self.input_size_bits
        nchunks = self.window.window_size * self.window.num_windows
        bits = bytes_to_bits_batch(np.asarray(inputs), nchunks * CHUNK_SIZE)
        bits = jnp.asarray(bits).reshape(inputs.shape[:-1] + (nchunks, CHUNK_SIZE))
        batch = bits.shape[:-2]
        n_real = -(-(nbytes * 8) // CHUNK_SIZE)
        if cr.supports_rns(self.curve):
            # each 3-bit chunk is an 8-way signed lookup — a grouped
            # conditional sum over the precomputed signed-digit tables
            # (chunks >= n_real select the identity)
            flat_bits = bits.reshape(batch + (nchunks * CHUNK_SIZE,))
            if cr.grouped_kernel_ok(self.curve):
                from crypto_primitives_tpu.ops import msm_rns_pallas as mk

                acc = mk.grouped_msm_pallas(
                    self.curve,
                    _device_signed_table(params, n_real, True),
                    flat_bits,
                    CHUNK_SIZE,
                )
            else:
                acc = cr.te_conditional_sum_grouped_rns(
                    self.curve,
                    _device_signed_table(params, n_real, False),
                    flat_bits,
                    CHUNK_SIZE,
                )
            total = cr.to_limb_points(self.curve, acc)
            return cv.te_to_affine(self.curve, total)[..., 0, :]
        g, g2 = params.packed()
        gb = jnp.broadcast_to(g, batch + g.shape)
        # enc = g (+ g if c0) (+ 2g if c1), then negate if c2
        enc = cv.te_add(
            self.curve,
            gb,
            cv.te_select(bits[..., 0] != 0, gb, cv.identity(self.curve, batch + (nchunks,))),
        )
        enc = cv.te_add(
            self.curve,
            enc,
            cv.te_select(
                bits[..., 1] != 0,
                jnp.broadcast_to(g2, batch + g2.shape),
                cv.identity(self.curve, batch + (nchunks,)),
            ),
        )
        enc = cv.te_select(bits[..., 2] != 0, cv.te_neg(self.curve, enc), enc)
        # chunks beyond the (3-bit-padded) input are ABSENT in the reference
        # (input is padded only to a multiple of CHUNK_SIZE, mod.rs:131-140),
        # so they must contribute the identity, not (0,0,0)-encoded +g.
        mask = jnp.arange(nchunks) < n_real
        enc = cv.te_select(
            jnp.broadcast_to(mask, batch + (nchunks,)),
            enc,
            cv.identity(self.curve, batch + (nchunks,)),
        )
        total = cv.te_sum(self.curve, enc)
        return cv.te_to_affine(self.curve, total)[..., 0, :]


class BoweHopwoodTwoToOneCRH:
    """mod.rs:189-240; compress feeds uncompressed bytes of prior x-coords."""

    def __init__(self, curve: TECurveSpec, window: Window):
        self.curve = curve
        self.window = window
        self.crh = BoweHopwoodCRH(curve, window)
        self.input_size_bits = self.crh.input_size_bits
        self.half_input_size_bits = self.input_size_bits // 2

    def setup(self, rng) -> BoweHopwoodParameters:
        return self.crh.setup(rng)

    def evaluate(self, params, left: bytes, right: bytes) -> int:
        assert len(left) == len(right), "left and right input should be of equal length"
        assert len(left) * 8 <= self.half_input_size_bits
        buffer = bytearray(self.input_size_bits // 8)
        combined = bytes(left) + bytes(right)
        buffer[: len(combined)] = combined
        return self.crh.evaluate(params, bytes(buffer))

    def compress(self, params, left: int, right: int) -> int:
        return self.evaluate(
            params,
            self.curve.base.to_bytes_le(int(left)),
            self.curve.base.to_bytes_le(int(right)),
        )
