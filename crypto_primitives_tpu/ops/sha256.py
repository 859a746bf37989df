"""Batched SHA-256 over uint32 lanes.

The reference delegates native SHA-256 to RustCrypto's `sha2`
(/root/reference/crypto-primitives/src/crh/sha256/mod.rs:11-17); a TPU-native
framework needs its own: messages are a (batch, N)-uint8 array with a
*static* length N, so padding and the block count are trace-time constants
and the whole hash compiles to pure uint32 vector ops (rotations = shift+or
on the VPU), batched over thousands of messages.

FIPS 180-4 semantics; oracle = hashlib.sha256 (same oracle role as the
reference's RustCrypto comparison tests, src/crh/sha256/constraints.rs:412-437).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_K = np.array(
    [
        0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
        0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
        0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
        0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
        0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
        0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
        0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
        0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
        0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
        0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
        0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
    ],
    dtype=np.uint32,
)

_H0 = np.array(
    [
        0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
        0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
    ],
    dtype=np.uint32,
)


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _compress(state, block_words):
    """One SHA-256 compression; state (..., 8), block_words (..., 16) uint32.

    Both the message-schedule extension and the 64 rounds run under
    `lax.scan`, so the compiled program contains each body exactly once.
    (Unrolling them triggers a superlinear XLA simplifier blowup on the
    rotate/xor dataflow — and scan is the idiomatic TPU structure anyway.)
    """
    batch = block_words.shape[:-1]

    # --- message schedule: scan a rolling 16-word window, emit w[16..63] ---
    def sched_body(window, _):
        # window: (..., 16) holding w[i-16..i-1]
        w15 = window[..., 1]
        w2 = window[..., 14]
        s0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> 3)
        s1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> 10)
        new = window[..., 0] + s0 + window[..., 9] + s1
        window = jnp.concatenate([window[..., 1:], new[..., None]], axis=-1)
        return window, new

    _, w_ext = jax.lax.scan(sched_body, block_words, None, length=48)
    # w: (64, ...) scan-major layout
    w = jnp.concatenate([jnp.moveaxis(block_words, -1, 0), w_ext], axis=0)

    # --- 64 rounds: scan over (w_i, K_i) ---
    def round_body(vs, wk):
        a, b, c, d, e, f, g, h = (vs[..., i] for i in range(8))
        wi, ki = wk
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + ki + wi
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        return jnp.stack([t1 + t2, a, b, c, d + t1, e, f, g], axis=-1), None

    ks = jnp.asarray(_K)
    vs, _ = jax.lax.scan(round_body, state, (w, ks))
    return state + vs


def _pad_length(n: int) -> int:
    return ((n + 1 + 8 + 63) // 64) * 64


_KERNEL_OK: list = []


def _kernel_ok() -> bool:
    """First call on a TPU backend compiles a tiny Pallas SHA kernel and
    checks it against hashlib; any failure pins the XLA path (the two are
    interchangeable).  CPT_DISABLE_SHA_KERNEL=1 forces the XLA path."""
    import os

    if _KERNEL_OK:
        return _KERNEL_OK[0]
    ok = False
    if (
        jax.default_backend() == "tpu"
        and os.environ.get("CPT_DISABLE_SHA_KERNEL") != "1"
    ):
        try:
            import hashlib

            from crypto_primitives_tpu.ops.sha256_pallas import (
                sha256_state_pallas,
            )

            msg = bytes(range(32))
            padded = np.zeros(64, np.uint8)
            padded[:32] = np.frombuffer(msg, np.uint8)
            padded[32] = 0x80
            padded[-8:] = np.frombuffer((256).to_bytes(8, "big"), np.uint8)
            by = padded.reshape(1, 1, 16, 4).astype(np.uint32)
            w = (by[..., 0] << 24) | (by[..., 1] << 16) | (by[..., 2] << 8) | by[..., 3]
            st = np.asarray(sha256_state_pallas(jnp.asarray(w)))
            got = b"".join(int(v).to_bytes(4, "big") for v in st[0])
            ok = got == hashlib.sha256(msg).digest()
        except Exception:
            ok = False
    _KERNEL_OK.append(ok)
    return ok


@functools.partial(jax.jit, static_argnums=(1,))
def _sha256_impl(data: jnp.ndarray, n: int) -> jnp.ndarray:
    total = _pad_length(n)
    batch = data.shape[:-1]
    pad = np.zeros((total - n,), dtype=np.uint8)
    pad[0] = 0x80
    bitlen = (8 * n).to_bytes(8, "big")
    pad[-8:] = np.frombuffer(bitlen, dtype=np.uint8)
    padded = jnp.concatenate(
        [data, jnp.broadcast_to(jnp.asarray(pad), batch + (total - n,))], axis=-1
    )
    # bytes -> big-endian uint32 words, (.., nblocks, 16)
    nblocks = total // 64
    by = padded.reshape(batch + (nblocks, 16, 4)).astype(jnp.uint32)
    words = (by[..., 0] << 24) | (by[..., 1] << 16) | (by[..., 2] << 8) | by[..., 3]

    if _kernel_ok() and int(np.prod(batch)) >= 512 and nblocks <= 4:
        # fused Pallas path: the XLA scan round-trips the working state
        # through HBM every round; the kernel keeps the whole hash in VMEM
        from crypto_primitives_tpu.ops.sha256_pallas import sha256_state_pallas

        state = sha256_state_pallas(
            words.reshape((-1, nblocks, 16))
        ).reshape(batch + (8,))
    else:
        state = jnp.broadcast_to(jnp.asarray(_H0), batch + (8,))
        if nblocks <= 4:
            for i in range(nblocks):
                state = _compress(state, words[..., i, :])
        else:
            words_scan = jnp.moveaxis(words, -2, 0)

            def body(st, blk):
                return _compress(st, blk), None

            state, _ = jax.lax.scan(body, state, words_scan)

    # state words -> big-endian bytes
    out = jnp.stack(
        [
            (state >> 24) & 0xFF,
            (state >> 16) & 0xFF,
            (state >> 8) & 0xFF,
            state & 0xFF,
        ],
        axis=-1,
    ).astype(jnp.uint8)
    return out.reshape(batch + (32,))


def sha256(data: jnp.ndarray) -> jnp.ndarray:
    """SHA-256 of a (..., N)-uint8 batch (static N); returns (..., 32) uint8."""
    return _sha256_impl(data, data.shape[-1])


def sha256_host(data: bytes) -> bytes:
    import hashlib

    return hashlib.sha256(data).digest()
