"""ctypes bindings to the native host engine (native/cpmont.cpp).

Compiled on demand with g++ (no pybind11 in this image — pure C ABI).
Provides the compiled host tier the reference gets from Rust: Montgomery
field ops, Poseidon permutation / two-to-one compression, and dense Merkle
builds over field digests — used to accelerate host-side proof generation
and as an independent third implementation for cross-model testing
(python-int oracle vs JAX kernels vs C++).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import List, Optional

import numpy as np

from crypto_primitives_tpu.ops.field import FieldSpec

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native", "cpmont.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "build", "libcpmont.so")


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
    except Exception:
        return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.cpm_field_new.restype = ctypes.c_void_p
    lib.cpm_field_new.argtypes = [u64p, u64p, ctypes.c_uint64]
    lib.cpm_mont_mul.argtypes = [ctypes.c_void_p, u64p, u64p, u64p]
    lib.cpm_mont_mul_batch.argtypes = [ctypes.c_void_p, u64p, u64p, u64p, ctypes.c_long]
    lib.cpm_add.argtypes = [ctypes.c_void_p, u64p, u64p, u64p]
    lib.cpm_poseidon_new.restype = ctypes.c_void_p
    lib.cpm_poseidon_new.argtypes = [
        u64p, u64p, ctypes.c_uint64, u64p,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int, ctypes.c_int, u64p, u64p,
    ]
    lib.cpm_poseidon_permute.argtypes = [ctypes.c_void_p, u64p, ctypes.c_long]
    lib.cpm_poseidon_two_to_one.argtypes = [ctypes.c_void_p, u64p, u64p, u64p, ctypes.c_long]
    lib.cpm_merkle_build.argtypes = [ctypes.c_void_p, u64p, ctypes.c_long, u64p]
    return lib


def available() -> bool:
    return _lib() is not None


def _u64p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _limbs64(spec: FieldSpec, values, mont=True) -> np.ndarray:
    """ints -> (n, 4) uint64 LE limbs (Montgomery by default)."""
    out = np.zeros((len(values), 4), dtype=np.uint64)
    for i, v in enumerate(values):
        x = spec.to_mont(int(v) % spec.p) if mont else int(v)  # raw when mont=False
        out[i] = np.frombuffer(x.to_bytes(32, "little"), dtype=np.uint64)
    return out


def _ints64(spec: FieldSpec, arr: np.ndarray, mont=True) -> List[int]:
    out = []
    for row in arr.reshape(-1, 4):
        x = int.from_bytes(row.tobytes(), "little")
        out.append(spec.from_mont(x) if mont else x)
    return out


class NativeField:
    def __init__(self, spec: FieldSpec):
        assert spec.bigint_bytes == 32, "native engine supports <=256-bit fields"
        self.spec = spec
        lib = _lib()
        assert lib is not None, "native engine unavailable"
        self.lib = lib
        p = _limbs64(spec, [spec.p], mont=False)
        r2 = _limbs64(spec, [spec.R2_mod_p], mont=False)
        n0 = (-pow(spec.p, -1, 1 << 64)) % (1 << 64)
        self.ctx = lib.cpm_field_new(_u64p(p), _u64p(r2), n0)

    def mont_mul_batch(self, xs: List[int], ys: List[int]) -> List[int]:
        a = _limbs64(self.spec, xs)
        b = _limbs64(self.spec, ys)
        out = np.zeros_like(a)
        self.lib.cpm_mont_mul_batch(self.ctx, _u64p(a), _u64p(b), _u64p(out), len(xs))
        return _ints64(self.spec, out)


class NativePoseidon:
    """Compiled Poseidon over a PoseidonConfig (capacity-1 configs)."""

    def __init__(self, config):
        spec = config.field
        assert config.capacity == 1 and spec.bigint_bytes == 32
        self.config = config
        self.spec = spec
        lib = _lib()
        assert lib is not None, "native engine unavailable"
        self.lib = lib
        p = _limbs64(spec, [spec.p], mont=False)
        r2 = _limbs64(spec, [spec.R2_mod_p], mont=False)
        one = _limbs64(spec, [1])
        n0 = (-pow(spec.p, -1, 1 << 64)) % (1 << 64)
        ark = _limbs64(spec, [v for row in config.ark for v in row])
        mds = _limbs64(spec, [v for row in config.mds for v in row])
        self.ctx = lib.cpm_poseidon_new(
            _u64p(p), _u64p(r2), n0, _u64p(one), config.t, config.alpha,
            config.full_rounds, config.partial_rounds, _u64p(ark), _u64p(mds),
        )

    def permute(self, states: List[List[int]]) -> List[List[int]]:
        t = self.config.t
        arr = _limbs64(self.spec, [v for st in states for v in st])
        self.lib.cpm_poseidon_permute(self.ctx, _u64p(arr), len(states))
        flat = _ints64(self.spec, arr)
        return [flat[i * t : (i + 1) * t] for i in range(len(states))]

    def two_to_one(self, left: List[int], right: List[int]) -> List[int]:
        l = _limbs64(self.spec, left)
        r = _limbs64(self.spec, right)
        out = np.zeros_like(l)
        self.lib.cpm_poseidon_two_to_one(self.ctx, _u64p(l), _u64p(r), _u64p(out), len(left))
        return _ints64(self.spec, out)

    def merkle_non_leaf(self, leaf_digests: List[int]) -> List[int]:
        """Level-order non-leaf digests (root first), layout-identical to
        MerkleTree.non_leaf_nodes."""
        n = len(leaf_digests)
        assert n >= 2 and (n & (n - 1)) == 0
        leaves = _limbs64(self.spec, leaf_digests)
        out = np.zeros((n - 1, 4), dtype=np.uint64)
        self.lib.cpm_merkle_build(self.ctx, _u64p(leaves), n, _u64p(out))
        return _ints64(self.spec, out)
