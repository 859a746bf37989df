"""ctypes bindings to the native host engine (native/cpmont.cpp).

Compiled on demand with g++ (no pybind11 in this image — pure C ABI).
Provides the compiled host tier the reference gets from Rust: Montgomery
field ops, TE/SW curve arithmetic (scalar muls, bit-table MSMs), the
Poseidon permutation / two-to-one compression, and dense Merkle builds.

This is the engine behind the single-op host paths — `Schnorr.sign/verify`
(signature/schnorr/mod.rs:77-148 runs compiled Rust in the reference),
`PedersenCRH.evaluate`, `PoseidonTwoToOneCRH.compress`,
`MerkleTree.update` — via :func:`te_engine` / :func:`sw_engine` /
:func:`poseidon_engine`; the python-int tier remains the oracle
(``CPT_NATIVE=0`` disables the native dispatch everywhere).  It doubles as
an independent third implementation for cross-model testing (python-int
oracle vs JAX kernels vs C++; tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from crypto_primitives_tpu.ops.field import FieldSpec

# The C++ source ships INSIDE the package (package data), so a plain
# `pip install .` still gets the compiled host tier — no source checkout
# needed.  The .so lands next to the source when the install is writable,
# else in a per-user cache directory.
_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cpmont.cpp")


def _so_path() -> str:
    pkg_build = os.path.join(os.path.dirname(_SRC), "build")
    if os.access(os.path.dirname(_SRC), os.W_OK):
        return os.path.join(pkg_build, "libcpmont.so")
    cache = os.path.join(
        os.path.expanduser("~"), ".cache", "crypto_primitives_tpu"
    )
    return os.path.join(cache, "libcpmont.so")


_SO = _so_path()

_u64p = ctypes.POINTER(ctypes.c_uint64)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_i = ctypes.c_int
_l = ctypes.c_long
_vp = ctypes.c_void_p


@functools.cache
def _lib() -> Optional[ctypes.CDLL]:
    try:
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            os.makedirs(os.path.dirname(_SO), exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
    except Exception as e:
        if os.environ.get("CPT_NATIVE", "1") != "0":
            import warnings

            warnings.warn(
                "crypto_primitives_tpu: native host engine unavailable "
                f"({type(e).__name__}: {e}); single-op host paths fall back "
                "to the exact python-int tier (set CPT_NATIVE=0 to silence)",
                RuntimeWarning,
                stacklevel=3,
            )
        return None
    sigs = {
        "cpm_field_new": (_vp, [_i, _u64p, _u64p, ctypes.c_uint64]),
        "cpm_field_free": (None, [_vp, _i]),
        "cpm_mont_mul_batch": (None, [_vp, _i, _u64p, _u64p, _u64p, _l]),
        "cpm_add_batch": (None, [_vp, _i, _u64p, _u64p, _u64p, _l]),
        "cpm_inv_batch": (None, [_vp, _i, _u64p, _u64p, _l]),
        "cpm_te_new": (_vp, [_i, _u64p, _u64p, ctypes.c_uint64, _u64p, _u64p]),
        "cpm_te_free": (None, [_vp, _i]),
        "cpm_te_add_batch": (None, [_vp, _i, _u64p, _u64p, _u64p, _l]),
        "cpm_te_scalar_mul_batch": (None, [_vp, _i, _u64p, _u8p, _l, _u64p, _l]),
        "cpm_te_msm_bits_batch": (None, [_vp, _i, _u64p, _u8p, _l, _u64p, _l]),
        "cpm_te_to_affine_batch": (None, [_vp, _i, _u64p, _u64p, _l]),
        "cpm_sw_new": (_vp, [_i, _u64p, _u64p, ctypes.c_uint64, _u64p, _u64p, _u64p]),
        "cpm_sw_free": (None, [_vp, _i]),
        "cpm_sw_add_batch": (None, [_vp, _i, _u64p, _u64p, _u64p, _l]),
        "cpm_sw_scalar_mul_batch": (None, [_vp, _i, _u64p, _u8p, _l, _u64p, _l]),
        "cpm_sw_msm_bits_batch": (None, [_vp, _i, _u64p, _u8p, _l, _u64p, _l]),
        "cpm_sw_to_affine_batch": (None, [_vp, _i, _u64p, _u64p, _u8p, _l]),
        "cpm_poseidon_new": (
            _vp,
            [_i, _u64p, _u64p, ctypes.c_uint64, _i, ctypes.c_uint64, _i, _i,
             _u64p, _u64p],
        ),
        "cpm_poseidon_free": (None, [_vp]),
        "cpm_poseidon_permute": (None, [_vp, _u64p, _l]),
        "cpm_poseidon_two_to_one": (None, [_vp, _u64p, _u64p, _u64p, _l]),
        "cpm_merkle_build": (None, [_vp, _u64p, _l, _u64p]),
    }
    for name, (res, args) in sigs.items():
        fn = getattr(lib, name)
        fn.restype = res
        fn.argtypes = args
    return lib


def available() -> bool:
    return _lib() is not None


def enabled() -> bool:
    """Native dispatch gate: set CPT_NATIVE=0 to force the python-int tier
    (tests use this to keep the oracle independent)."""
    return os.environ.get("CPT_NATIVE", "1") != "0" and available()


def _supported(spec: FieldSpec) -> bool:
    # the FieldSpec Montgomery radix must line up with 64-bit limbs
    return spec.num_limbs % 4 == 0 and spec.bigint_bytes in (32, 48)


def _ptr(arr: np.ndarray):
    if arr.dtype == np.uint8:
        return arr.ctypes.data_as(_u8p)
    return arr.ctypes.data_as(_u64p)


class _FieldCodec:
    """int <-> (n, nl) uint64 LE Montgomery limbs for one FieldSpec."""

    def __init__(self, spec: FieldSpec):
        assert _supported(spec), f"native engine does not support {spec}"
        self.spec = spec
        self.nl = spec.bigint_bytes // 8

    def limbs(self, values, mont=True) -> np.ndarray:
        out = np.zeros((len(values), self.nl), dtype=np.uint64)
        nb = self.spec.bigint_bytes
        for i, v in enumerate(values):
            x = self.spec.to_mont(int(v) % self.spec.p) if mont else int(v)
            out[i] = np.frombuffer(x.to_bytes(nb, "little"), dtype=np.uint64)
        return out

    def ints(self, arr: np.ndarray, mont=True) -> List[int]:
        out = []
        for row in arr.reshape(-1, self.nl):
            x = int.from_bytes(row.tobytes(), "little")
            out.append(self.spec.from_mont(x) if mont else x)
        return out

    def n0(self) -> int:
        return (-pow(self.spec.p, -1, 1 << 64)) % (1 << 64)


class NativeField:
    def __init__(self, spec: FieldSpec):
        self.codec = _FieldCodec(spec)
        self.spec = spec
        self.nl = self.codec.nl
        lib = _lib()
        assert lib is not None, "native engine unavailable"
        self.lib = lib
        p = self.codec.limbs([spec.p], mont=False)
        one = self.codec.limbs([1])
        self.ctx = lib.cpm_field_new(self.nl, _ptr(p), _ptr(one), self.codec.n0())

    def mont_mul_batch(self, xs: List[int], ys: List[int]) -> List[int]:
        a = self.codec.limbs(xs)
        b = self.codec.limbs(ys)
        out = np.zeros_like(a)
        self.lib.cpm_mont_mul_batch(self.ctx, self.nl, _ptr(a), _ptr(b), _ptr(out), len(xs))
        return self.codec.ints(out)

    def inv_batch(self, xs: List[int]) -> List[int]:
        a = self.codec.limbs(xs)
        out = np.zeros_like(a)
        self.lib.cpm_inv_batch(self.ctx, self.nl, _ptr(a), _ptr(out), len(xs))
        return self.codec.ints(out)


def _int_bits(ks) -> Tuple[np.ndarray, int]:
    """Nonnegative ints -> (n, nbits) uint8 bit array, LSB-first.  Width is
    the longest operand's bit length (callers may pass k > r, e.g. the
    Schnorr randomizer multiplier, mod.rs:187-194)."""
    nbits = max((int(k).bit_length() for k in ks), default=0) or 1
    bits = np.zeros((len(ks), nbits), dtype=np.uint8)
    for i, k in enumerate(ks):
        k = int(k)
        for j in range(k.bit_length()):
            bits[i, j] = (k >> j) & 1
    return bits, nbits


class NativeTECurve:
    """Compiled host tier for a TECurveSpec: affine int tuples in/out."""

    def __init__(self, curve):
        self.curve = curve
        self.codec = _FieldCodec(curve.base)
        self.nl = self.codec.nl
        lib = _lib()
        assert lib is not None, "native engine unavailable"
        self.lib = lib
        p = self.codec.limbs([curve.base.p], mont=False)
        one = self.codec.limbs([1])
        a = self.codec.limbs([curve.a])
        d = self.codec.limbs([curve.d])
        self.ctx = lib.cpm_te_new(
            self.nl, _ptr(p), _ptr(one), self.codec.n0(), _ptr(a), _ptr(d)
        )

    # -- packing: affine tuples <-> (n, 4*nl) extended Montgomery limbs --

    def pack(self, pts) -> np.ndarray:
        p = self.curve.base.p
        vals = []
        for (x, y) in pts:
            x, y = int(x) % p, int(y) % p
            vals += [x, y, x * y % p, 1]
        return np.ascontiguousarray(
            self.codec.limbs(vals).reshape(len(pts), 4 * self.nl)
        )

    def _unpack_affine(self, ext: np.ndarray) -> List[Tuple[int, int]]:
        n = ext.shape[0]
        xy = np.zeros((n, 2 * self.nl), dtype=np.uint64)
        self.lib.cpm_te_to_affine_batch(self.ctx, self.nl, _ptr(ext), _ptr(xy), n)
        flat = self.codec.ints(xy.reshape(-1, self.nl))
        return [(flat[2 * i], flat[2 * i + 1]) for i in range(n)]

    # -- ops --

    def add(self, p1, p2):
        a, b = self.pack([p1]), self.pack([p2])
        out = np.zeros_like(a)
        self.lib.cpm_te_add_batch(self.ctx, self.nl, _ptr(a), _ptr(b), _ptr(out), 1)
        return self._unpack_affine(out)[0]

    def scalar_mul(self, pt, k: int):
        return self.scalar_mul_batch([pt], [int(k)])[0]

    def scalar_mul_batch(self, pts, ks):
        bases = self.pack(pts)
        bits, nbits = _int_bits(ks)
        out = np.zeros_like(bases)
        self.lib.cpm_te_scalar_mul_batch(
            self.ctx, self.nl, _ptr(bases), _ptr(bits), nbits, _ptr(out), len(ks)
        )
        return self._unpack_affine(out)

    def pack_table(self, pts) -> np.ndarray:
        """Precompute an MSM table (cache this on the params object)."""
        return self.pack(pts)

    def msm_bits(self, table: np.ndarray, bits: np.ndarray):
        """table (T, 4*nl) from pack_table; bits (n, T) uint8 0/1 ->
        n affine points: out[i] = sum_j bits[i, j] * table[j]."""
        bits = np.ascontiguousarray(bits, dtype=np.uint8)
        n, T = bits.shape
        assert table.shape[0] == T
        out = np.zeros((n, 4 * self.nl), dtype=np.uint64)
        self.lib.cpm_te_msm_bits_batch(
            self.ctx, self.nl, _ptr(table), _ptr(bits), T, _ptr(out), n
        )
        return self._unpack_affine(out)


class NativeSWCurve:
    """Compiled host tier for an SWCurveSpec: affine tuples / None in+out."""

    def __init__(self, curve):
        self.curve = curve
        self.codec = _FieldCodec(curve.base)
        self.nl = self.codec.nl
        lib = _lib()
        assert lib is not None, "native engine unavailable"
        self.lib = lib
        p = self.codec.limbs([curve.base.p], mont=False)
        one = self.codec.limbs([1])
        pp = curve.base.p
        a = self.codec.limbs([curve.a])
        b3 = self.codec.limbs([3 * curve.b % pp])
        a2 = self.codec.limbs([curve.a * curve.a % pp])
        self.ctx = lib.cpm_sw_new(
            self.nl, _ptr(p), _ptr(one), self.codec.n0(), _ptr(a), _ptr(b3), _ptr(a2)
        )

    def pack(self, pts) -> np.ndarray:
        vals = []
        for pt in pts:
            if pt is None:
                vals += [0, 1, 0]
            else:
                vals += [int(pt[0]), int(pt[1]), 1]
        return np.ascontiguousarray(
            self.codec.limbs(vals).reshape(len(pts), 3 * self.nl)
        )

    def _unpack_affine(self, proj: np.ndarray):
        n = proj.shape[0]
        xy = np.zeros((n, 2 * self.nl), dtype=np.uint64)
        inf = np.zeros((n,), dtype=np.uint8)
        self.lib.cpm_sw_to_affine_batch(
            self.ctx, self.nl, _ptr(proj), _ptr(xy), _ptr(inf), n
        )
        flat = self.codec.ints(xy.reshape(-1, self.nl))
        return [
            None if inf[i] else (flat[2 * i], flat[2 * i + 1]) for i in range(n)
        ]

    def add(self, p1, p2):
        a, b = self.pack([p1]), self.pack([p2])
        out = np.zeros_like(a)
        self.lib.cpm_sw_add_batch(self.ctx, self.nl, _ptr(a), _ptr(b), _ptr(out), 1)
        return self._unpack_affine(out)[0]

    def scalar_mul(self, pt, k: int):
        return self.scalar_mul_batch([pt], [int(k)])[0]

    def scalar_mul_batch(self, pts, ks):
        bases = self.pack(pts)
        bits, nbits = _int_bits(ks)
        out = np.zeros_like(bases)
        self.lib.cpm_sw_scalar_mul_batch(
            self.ctx, self.nl, _ptr(bases), _ptr(bits), nbits, _ptr(out), len(ks)
        )
        return self._unpack_affine(out)

    def pack_table(self, pts) -> np.ndarray:
        return self.pack(pts)

    def msm_bits(self, table: np.ndarray, bits: np.ndarray):
        bits = np.ascontiguousarray(bits, dtype=np.uint8)
        n, T = bits.shape
        assert table.shape[0] == T
        out = np.zeros((n, 3 * self.nl), dtype=np.uint64)
        self.lib.cpm_sw_msm_bits_batch(
            self.ctx, self.nl, _ptr(table), _ptr(bits), T, _ptr(out), n
        )
        return self._unpack_affine(out)


@functools.cache
def _te_engine_cached(curve) -> Optional[NativeTECurve]:
    if not available() or not _supported(curve.base):
        return None
    return NativeTECurve(curve)


@functools.cache
def _sw_engine_cached(curve) -> Optional[NativeSWCurve]:
    if not available() or not _supported(curve.base):
        return None
    return NativeSWCurve(curve)


def curve_engine(curve):
    """The compiled host engine for a TE/SW curve spec, or None when the
    native library is unavailable, the base field is unsupported, or
    CPT_NATIVE=0.  The gate is re-checked per call so tests can toggle."""
    if not enabled():
        return None
    from crypto_primitives_tpu.ops.curve import TECurveSpec

    if isinstance(curve, TECurveSpec):
        return _te_engine_cached(curve)
    from crypto_primitives_tpu.ops.curve_sw import SWCurveSpec

    if isinstance(curve, SWCurveSpec):
        return _sw_engine_cached(curve)
    return None


class NativePoseidon:
    """Compiled Poseidon over a PoseidonConfig (4- or 6-limb fields:
    everything through the 48-byte BLS12-381 base field)."""

    def __init__(self, config):
        spec = config.field
        assert _supported(spec), f"native engine does not support {spec}"
        self.config = config
        self.spec = spec
        self.codec = _FieldCodec(spec)
        lib = _lib()
        assert lib is not None, "native engine unavailable"
        self.lib = lib
        p = self.codec.limbs([spec.p], mont=False)
        one = self.codec.limbs([1])
        ark = self.codec.limbs([v for row in config.ark for v in row])
        mds = self.codec.limbs([v for row in config.mds for v in row])
        self.ctx = lib.cpm_poseidon_new(
            self.codec.nl, _ptr(p), _ptr(one), self.codec.n0(), config.t,
            config.alpha, config.full_rounds, config.partial_rounds,
            _ptr(ark), _ptr(mds),
        )

    def permute(self, states: List[List[int]]) -> List[List[int]]:
        t = self.config.t
        arr = self.codec.limbs([v for st in states for v in st])
        self.lib.cpm_poseidon_permute(self.ctx, _ptr(arr), len(states))
        flat = self.codec.ints(arr)
        return [flat[i * t : (i + 1) * t] for i in range(len(states))]

    def two_to_one(self, left: List[int], right: List[int]) -> List[int]:
        """Batched capacity-1 duplex compress (rate >= 2 configs)."""
        assert self.config.capacity == 1 and self.config.rate >= 2
        l = self.codec.limbs(left)
        r = self.codec.limbs(right)
        out = np.zeros_like(l)
        self.lib.cpm_poseidon_two_to_one(self.ctx, _ptr(l), _ptr(r), _ptr(out), len(left))
        return self.codec.ints(out)

    def merkle_non_leaf(self, leaf_digests: List[int]) -> List[int]:
        """Level-order non-leaf digests (root first), layout-identical to
        MerkleTree.non_leaf_nodes."""
        n = len(leaf_digests)
        assert n >= 2 and (n & (n - 1)) == 0
        assert self.config.capacity == 1 and self.config.rate >= 2
        leaves = self.codec.limbs(leaf_digests)
        out = np.zeros((n - 1, self.codec.nl), dtype=np.uint64)
        self.lib.cpm_merkle_build(self.ctx, _ptr(leaves), n, _ptr(out))
        return self.codec.ints(out)


@functools.cache
def _poseidon_engine_cached(config) -> Optional[NativePoseidon]:
    if not available():
        return None
    if not _supported(config.field):
        return None
    return NativePoseidon(config)


def poseidon_engine(config):
    """Compiled Poseidon permutation engine for a config, or None (gate:
    library availability, 4/6-limb field layout, CPT_NATIVE=0)."""
    if not enabled():
        return None
    return _poseidon_engine_cached(config)
