"""Batched BLAKE2s (RFC 7693) over uint32 lanes.

The reference delegates to RustCrypto's `blake2`
(/root/reference/crypto-primitives/src/prf/blake2s/mod.rs:18-49), including
the parameterized `Blake2sWithParameterBlock` variant (salt/personalization).
Here the full algorithm is a batched uint32 vector program: static message
length -> static block schedule; rotations (16,12,8,7) as shift+or on the
VPU (the same constants the reference's gadget mirrors,
src/prf/blake2s/constraints.rs:25-28).

Oracle = hashlib.blake2s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_IV = np.array(
    [
        0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
        0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
    ],
    dtype=np.uint32,
)

_SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _g(v, a, b, c, d, x, y):
    v[a] = v[a] + v[b] + x
    v[d] = _rotr(v[d] ^ v[a], 16)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 12)
    v[a] = v[a] + v[b] + y
    v[d] = _rotr(v[d] ^ v[a], 8)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 7)


def _compress(h, m, t: int, last: bool):
    """One BLAKE2s compression; h (..., 8), m (..., 16) uint32; t = byte counter.

    The 10 rounds run under `lax.scan` with the SIGMA permutation applied as
    a per-round gather — one compiled round body (the unrolled form trips a
    superlinear XLA CPU simplifier blowup, and scan is TPU-idiomatic anyway).
    """
    batch = h.shape[:-1]
    iv = jnp.broadcast_to(jnp.asarray(_IV), batch + (8,))
    v = jnp.concatenate([h, iv], axis=-1)
    v = v.at[..., 12].set(v[..., 12] ^ jnp.uint32(t & 0xFFFFFFFF))
    v = v.at[..., 13].set(v[..., 13] ^ jnp.uint32((t >> 32) & 0xFFFFFFFF))
    if last:
        v = v.at[..., 14].set(v[..., 14] ^ jnp.uint32(0xFFFFFFFF))

    sigma = jnp.asarray(np.array(_SIGMA, dtype=np.int32))  # (10, 16)

    def round_body(v, s):
        mp = jnp.take(m, s, axis=-1)  # message words in G-call order
        vl = [v[..., i] for i in range(16)]
        _g(vl, 0, 4, 8, 12, mp[..., 0], mp[..., 1])
        _g(vl, 1, 5, 9, 13, mp[..., 2], mp[..., 3])
        _g(vl, 2, 6, 10, 14, mp[..., 4], mp[..., 5])
        _g(vl, 3, 7, 11, 15, mp[..., 6], mp[..., 7])
        _g(vl, 0, 5, 10, 15, mp[..., 8], mp[..., 9])
        _g(vl, 1, 6, 11, 12, mp[..., 10], mp[..., 11])
        _g(vl, 2, 7, 8, 13, mp[..., 12], mp[..., 13])
        _g(vl, 3, 4, 9, 14, mp[..., 14], mp[..., 15])
        return jnp.stack(vl, axis=-1), None

    v, _ = jax.lax.scan(round_body, v, sigma)
    return h ^ v[..., :8] ^ v[..., 8:]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _blake2s_impl(
    data: jnp.ndarray,
    n: int,
    digest_size: int,
    key: bytes,
    salt: bytes,
    person: bytes,
) -> jnp.ndarray:
    assert 1 <= digest_size <= 32 and len(key) <= 32
    salt = (salt or b"").ljust(8, b"\0")
    person = (person or b"").ljust(8, b"\0")
    assert len(salt) == 8 and len(person) == 8
    batch = data.shape[:-1]

    # parameter block word 0: digest_len | key_len<<8 | fanout<<16 | depth<<24
    p0 = digest_size | (len(key) << 8) | (1 << 16) | (1 << 24)
    h = list(_IV.copy())
    h[0] ^= p0
    h[4] ^= int.from_bytes(salt[0:4], "little")
    h[5] ^= int.from_bytes(salt[4:8], "little")
    h[6] ^= int.from_bytes(person[0:4], "little")
    h[7] ^= int.from_bytes(person[4:8], "little")
    state = jnp.broadcast_to(
        jnp.asarray(np.array(h, dtype=np.uint32)), batch + (8,)
    )

    # assemble message: optional key block + data, zero-padded to 64B blocks
    if key:
        prefix = np.zeros((64,), dtype=np.uint8)
        prefix[: len(key)] = np.frombuffer(key, dtype=np.uint8)
        data = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(prefix), batch + (64,)), data], axis=-1
        )
        n_total = n + 64
    else:
        n_total = n

    if n_total == 0:
        nblocks = 1
        padded = jnp.zeros(batch + (64,), dtype=jnp.uint8)
    else:
        nblocks = -(-n_total // 64)
        padlen = nblocks * 64 - n_total
        padded = jnp.concatenate(
            [data, jnp.zeros(batch + (padlen,), dtype=jnp.uint8)], axis=-1
        )

    by = padded.reshape(batch + (nblocks, 16, 4)).astype(jnp.uint32)
    words = by[..., 0] | (by[..., 1] << 8) | (by[..., 2] << 16) | (by[..., 3] << 24)

    for i in range(nblocks):
        last = i == nblocks - 1
        # byte counter: bytes fed *including* this block (capped at total)
        if key and n == 0:
            t = 64  # keyed empty message: counter stays at the key block
        else:
            t = min((i + 1) * 64, n_total)
        state = _compress(state, words[..., i, :], t, last)

    out = jnp.stack(
        [(state >> (8 * k)) & 0xFF for k in range(4)], axis=-1
    ).astype(jnp.uint8)
    return out.reshape(batch + (32,))[..., :digest_size]


def blake2s(
    data: jnp.ndarray,
    digest_size: int = 32,
    key: bytes = b"",
    salt: bytes = b"",
    person: bytes = b"",
) -> jnp.ndarray:
    """BLAKE2s of a (..., N)-uint8 batch (static N); returns (..., digest_size)."""
    return _blake2s_impl(data, data.shape[-1], digest_size, bytes(key), bytes(salt), bytes(person))


def blake2s_host(
    data: bytes, digest_size: int = 32, key: bytes = b"", salt: bytes = b"", person: bytes = b""
) -> bytes:
    import hashlib

    return hashlib.blake2s(
        data, digest_size=digest_size, key=key, salt=salt, person=person
    ).digest()
