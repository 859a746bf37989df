"""Fused Pallas SHA-256 kernel parity (interpret mode on CPU) vs hashlib —
the same oracle role as the reference's RustCrypto comparisons
(src/crh/sha256/constraints.rs:412-437)."""

import hashlib

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.ops.sha256_pallas import sha256_state_pallas


def _words(msgs, nbytes):
    B = len(msgs)
    total = ((nbytes + 9 + 63) // 64) * 64
    padded = np.zeros((B, total), np.uint8)
    for i, m in enumerate(msgs):
        padded[i, :nbytes] = np.frombuffer(m, np.uint8)
        padded[i, nbytes] = 0x80
        padded[i, -8:] = np.frombuffer((8 * nbytes).to_bytes(8, "big"), np.uint8)
    by = padded.reshape(B, total // 64, 16, 4).astype(np.uint32)
    return (by[..., 0] << 24) | (by[..., 1] << 16) | (by[..., 2] << 8) | by[..., 3]


@pytest.mark.parametrize("nbytes", [32, 40, 80, 119])
def test_kernel_matches_hashlib(nbytes):
    """Covers 1- and 2-block messages incl. the Merkle leaf (32B) and
    converted two-to-one input (2x40B) shapes."""
    rng = np.random.default_rng(nbytes)
    B = 7
    msgs = [rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes() for _ in range(B)]
    st = np.asarray(
        sha256_state_pallas(jnp.asarray(_words(msgs, nbytes)), block_b=128, interpret=True)
    )
    for i, m in enumerate(msgs):
        got = b"".join(int(v).to_bytes(4, "big") for v in st[i])
        assert got == hashlib.sha256(m).digest(), (nbytes, i)


def test_kernel_multi_grid_block():
    """Batch larger than one grid block (block_b=128 -> 2 blocks)."""
    rng = np.random.default_rng(1)
    B = 130
    msgs = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(B)]
    st = np.asarray(
        sha256_state_pallas(jnp.asarray(_words(msgs, 32)), block_b=128, interpret=True)
    )
    for i in (0, 64, 127, 128, 129):
        got = b"".join(int(v).to_bytes(4, "big") for v in st[i])
        assert got == hashlib.sha256(msgs[i]).digest(), i
