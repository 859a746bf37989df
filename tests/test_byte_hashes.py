"""SHA-256 / BLAKE2s kernels vs hashlib oracle at the reference's
boundary-probing lengths (src/crh/sha256/constraints.rs:391-393 uses
[0,1,...,55,56,57,63,64,65,...,129]; blake2s tests use 0..32 and multiples
of 8 up to 256, src/prf/blake2s/constraints.rs:484-524)."""

import hashlib

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.ops.blake2s import blake2s
from crypto_primitives_tpu.ops.sha256 import sha256

SHA_LENS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 16, 17, 32, 37, 55, 56, 57, 63, 64, 65, 100, 128, 129]
B2_LENS = list(range(0, 33)) + [40, 48, 56, 64, 72, 128, 256]


@pytest.mark.parametrize("n", SHA_LENS)
def test_sha256_vs_hashlib(rng, n):
    B = 3
    msgs = [bytes(rng.randrange(256) for _ in range(n)) for _ in range(B)]
    arr = jnp.asarray(np.frombuffer(b"".join(msgs), dtype=np.uint8).reshape(B, n)) if n else jnp.zeros((B, 0), dtype=jnp.uint8)
    out = np.asarray(sha256(arr))
    for i in range(B):
        assert bytes(out[i]) == hashlib.sha256(msgs[i]).digest()


@pytest.mark.parametrize("n", B2_LENS)
def test_blake2s_vs_hashlib(rng, n):
    B = 3
    msgs = [bytes(rng.randrange(256) for _ in range(n)) for _ in range(B)]
    arr = jnp.asarray(np.frombuffer(b"".join(msgs), dtype=np.uint8).reshape(B, n)) if n else jnp.zeros((B, 0), dtype=jnp.uint8)
    out = np.asarray(blake2s(arr))
    for i in range(B):
        assert bytes(out[i]) == hashlib.blake2s(msgs[i]).digest()


def test_blake2s_keyed_salt_person(rng):
    n = 45
    key = bytes(rng.randrange(256) for _ in range(32))
    salt = bytes(rng.randrange(256) for _ in range(8))
    person = bytes(rng.randrange(256) for _ in range(8))
    msg = bytes(rng.randrange(256) for _ in range(n))
    arr = jnp.asarray(np.frombuffer(msg, dtype=np.uint8).reshape(1, n))
    for ds in (32, 16, 1):
        out = np.asarray(blake2s(arr, digest_size=ds, key=key, salt=salt, person=person))
        exp = hashlib.blake2s(msg, digest_size=ds, key=key, salt=salt, person=person).digest()
        assert bytes(out[0]) == exp


def test_blake2s_keyed_empty():
    out = np.asarray(blake2s(jnp.zeros((1, 0), dtype=jnp.uint8), key=b"k"))
    assert bytes(out[0]) == hashlib.blake2s(b"", key=b"k").digest()


def test_large_batch_sha256(rng):
    B, n = 257, 32
    data = np.asarray([[rng.randrange(256) for _ in range(n)] for _ in range(B)], dtype=np.uint8)
    out = np.asarray(sha256(jnp.asarray(data)))
    for i in (0, 128, 256):
        assert bytes(out[i]) == hashlib.sha256(bytes(data[i])).digest()
