"""Fused Pallas TPU kernel for batched SHA-256 compression.

The XLA scan path (ops/sha256.py) is memory-bound: every one of the 64
rounds round-trips the (B, 8) working state and schedule slice through
HBM (~70 B/element/round for ~30 u32 VPU ops).  This kernel keeps the
whole hash in VMEM/registers: variables are (bs, 128) batch tiles (batch
rides BOTH the sublane and lane axes, so every op is a full VPU tile),
the 64 rounds and the rolling 16-word message schedule are statically
unrolled (indices resolve at trace time — no dynamic slicing), and
multi-block messages chain inside the kernel.

Semantics: FIPS 180-4 compression over pre-padded big-endian words;
oracle = hashlib / the XLA path (tests/test_sha256_pallas.py).  Serves
the flagship Merkle workload (reference benches/merkle_tree.rs leaf and
two-to-one hashes of 32/80-byte messages).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crypto_primitives_tpu.ops.sha256 import _H0, _K

LANE = 128
DEFAULT_BLOCK = 1024


def _make_kernel(nblocks: int, bs: int):
    K_list = [int(k) for k in _K]
    H0 = [int(h) for h in _H0]

    def kernel(words_ref, kref, out_ref):
        # words_ref: (nblocks*16, 1, bs, LANE) u32; kref: (4, 16, 1, 1);
        # out_ref: (8, 1, bs, LANE).
        # Rounds are processed as 16-round chunks: the rolling 16-word
        # schedule window rotates exactly once per chunk, so all its
        # indices are STATIC inside the chunk; chunks 1..3 ride one
        # fori_loop (round constants via a dynamic kref row) — a fully
        # unrolled 64-round body blows up compile time.
        def rotr(x, n):
            return (x >> n) | (x << (32 - n))

        def round_step(st, wi, k):
            a, b, c, d, e, f, g, h = st
            s1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + s1 + ch + k + wi
            s0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            return (t1 + s0 + maj, a, b, c, d + t1, e, f, g)

        state = tuple(jnp.full((bs, LANE), np.uint32(h), jnp.uint32) for h in H0)
        for blk in range(nblocks):
            w = tuple(words_ref[blk * 16 + i, 0] for i in range(16))
            st = state
            for j in range(16):  # chunk 0: schedule is the message itself
                st = round_step(st, w[j], np.uint32(K_list[j]))

            def chunk(i, carry):
                st, w = carry
                ks = kref[i]  # (16, 1, 1)
                w = list(w)
                for j in range(16):
                    w15, w2 = w[(j + 1) % 16], w[(j + 14) % 16]
                    s0 = rotr(w15, 7) ^ rotr(w15, 18) ^ (w15 >> 3)
                    s1 = rotr(w2, 17) ^ rotr(w2, 19) ^ (w2 >> 10)
                    wi = w[j] + s0 + w[(j + 9) % 16] + s1
                    w[j] = wi
                    st = round_step(st, wi, ks[j])
                return st, tuple(w)

            st, _ = jax.lax.fori_loop(1, 4, chunk, (st, w))
            state = tuple(s + v for s, v in zip(state, st))
        for i in range(8):
            out_ref[i, 0] = state[i]

    return kernel


@functools.lru_cache(maxsize=16)
def _build_sha_kernel(nblocks: int, block_b: int, interpret: bool):
    bs = block_b // LANE
    kernel = _make_kernel(nblocks, bs)

    def run(words):
        # words: (B, nblocks*16) u32 -> (B, 8) u32
        B = words.shape[0]
        pad = (-B) % block_b
        if pad:
            words = jnp.concatenate(
                [words, jnp.zeros((pad, words.shape[1]), words.dtype)], axis=0
            )
        Bp = B + pad
        nb = Bp // block_b
        # (Bp, W) -> (W, nb, bs, LANE): per block, word i is a (bs, LANE)
        # batch tile
        wt = words.T.reshape(words.shape[1], nb, bs, LANE)
        kmat = jnp.asarray(np.asarray(_K).reshape(4, 16, 1, 1))
        out = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (nblocks * 16, 1, bs, LANE),
                    lambda i: (0, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (4, 16, 1, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (8, 1, bs, LANE), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((8, nb, bs, LANE), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(wt, kmat)
        return out.reshape(8, Bp).T[:B]

    # interpret mode stays EAGER: jitting it would hand XLA:CPU the fully
    # unrolled 64-round rotate/xor chain, which blows up its simplifier
    # (the exact trap ops/sha256.py's scan avoids); on TPU the unrolled
    # body is compiled by Mosaic inside the pallas_call instead.
    return run if interpret else jax.jit(run)


def sha256_state_pallas(
    words: jnp.ndarray, block_b: int = DEFAULT_BLOCK, interpret: bool = False
) -> jnp.ndarray:
    """words: (B, nblocks, 16) u32 pre-padded big-endian message words ->
    (B, 8) u32 digest state."""
    B, nblocks, _ = words.shape
    run = _build_sha_kernel(nblocks, block_b, interpret)
    return run(words.reshape(B, nblocks * 16))
