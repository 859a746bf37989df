"""Batched IPA-style Pedersen-opening folding argument — the curve-tier
protocol showcase (round-4 verdict task 8).

Sumcheck (models/protocols/sumcheck.py) composes the sponge tier into a
protocol; this module composes the CURVE tier with the RNS-resident
Fiat-Shamir transcript: a log-round Bulletproofs-style argument that a
prover knows the opening of a vector Pedersen commitment
``C = sum_i a_i * G_i`` (the commitment shape of
/root/reference/crypto-primitives/src/commitment/pedersen/mod.rs:62-105,
with the transcript flow its sponge layer exists for,
src/sponge/mod.rs:101-154 — the reference ships both pieces but no
protocol on top).

Per round the prover sends the cross commitments

    L = <a_lo, G_hi>,   R = <a_hi, G_lo>

(device MSMs on the RNS curve tier), the transcript absorbs their affine
coordinates and squeezes a challenge e (base-field element; the scalar
``c = e mod p_s`` and its inverse are formed host-side — one small
fetch per round), and both tables fold:

    a' = c * a_lo + c^{-1} * a_hi        (scalar-field RNS, on device)
    G' = c^{-1} * G_lo + c * G_hi        (curve-tier scalar muls, on device)

which preserves ``<a', G'> = C + c^2 L + c^{-2} R``.  After m = log2 n
rounds the prover reveals the single folded scalar ``a*``; the verifier
(pure python ints, fully independent) replays the transcript, folds the
generators, accumulates ``C' = C + sum_j (c_j^2 L_j + c_j^{-2} R_j)``
and accepts iff ``C' == a* . G*``.

B instances run as one array program; all curve work rides the fused /
XLA RNS tier through the curve-generic dispatch.  Parity + soundness:
tests/test_ipa_fold.py; runnable tour: examples/ipa_folding.py;
throughput: benches/ipa_fold.py.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.sponge.fiat_shamir import FiatShamirRns
from crypto_primitives_tpu.models.sponge.poseidon import (
    PoseidonConfig,
    PoseidonSponge,
)


def _scalar_field(curve):
    from crypto_primitives_tpu.ops import rns, rns_xla

    return rns_xla.RnsField(rns.build_plan(curve.scalar.p))


def _scalar_rows_to_bits(curve, f_s, rows: jnp.ndarray, bound: int) -> jnp.ndarray:
    """Scalar-field RNS rows (..., 2K_s) -> (..., nbits) LE bits, on
    device (standard-form limbs via the Kawamura CRT, then bit shifts)."""
    from crypto_primitives_tpu.ops import rns_xla

    limbs = rns_xla.to_mont_limbs(
        f_s.plan, curve.scalar, rows, bound, mont=False
    )  # (..., L) uint32 16-bit limbs
    shifts = jnp.arange(16, dtype=jnp.uint32)
    bits = (limbs[..., :, None] >> shifts) & jnp.uint32(1)
    nbits = curve.scalar.nbits
    return bits.reshape(bits.shape[:-2] + (-1,))[..., :nbits].astype(jnp.uint8)


def _msm_rows(curve, mod, pts: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """sum_i bits_i * P_i with per-instance points: (B, n, coords, 2K)
    points x (B, n, nbits) bits -> (B, coords, 2K)."""
    prods = mod.scalar_mul_bits_windowed_rns(curve, pts, bits)
    return mod.sum_rns(curve, prods)


def _absorb_affine(t: FiatShamirRns, mod, curve, pts: jnp.ndarray):
    """Affine-normalize device points and absorb (x, y) rows."""
    aff = mod.to_affine_rns(curve, pts)  # (B, 2, 2K), bound 3
    t.absorb(aff, bound=3)
    return aff


def ipa_fold_prove_rns(curve, config: PoseidonConfig, gens, scalars_host,
                       rep: Optional[str] = None):
    """Prover.  ``gens``: n host affine generator points (n = 2^m,
    shared across instances); ``scalars_host``: (B, n) python ints mod
    the curve's scalar field.  Returns a host-verifiable proof dict:

      * ``commitment``: (B,) affine int tuples  C_b = <a_b, G>
      * ``rounds``: m lists of ((B,) L affine tuples, (B,) R tuples)
      * ``a_star``: (B,) ints — the folded scalar
      * ``challenges``: (B, m) ints (redundant — verifier recomputes;
        exposed for transcript-parity tests)
    """
    from crypto_primitives_tpu.ops.curve_rns_any import rns_mod

    mod = rns_mod(curve)
    assert mod is not None, "curve has no RNS tier"
    f_s = _scalar_field(curve)
    p_s = curve.scalar.p
    B, n = len(scalars_host), len(scalars_host[0])
    m = n.bit_length() - 1
    assert n == 1 << m and m >= 1

    # device state: scalar rows (B, n, 2K_s) bound 1; generator points
    # (B, n, coords, 2K) bound <= 3
    a_rows = jnp.asarray(
        f_s.pack(np.asarray(scalars_host, dtype=object))
    )
    a_bound = 1
    packed_g = jnp.asarray(mod.pack_points_rns(curve, list(gens)))
    G_pts = jnp.broadcast_to(packed_g, (B,) + packed_g.shape)

    t = FiatShamirRns(config, batch_shape=(B,), rep=rep)

    bits = _scalar_rows_to_bits(curve, f_s, a_rows, a_bound)
    C = _msm_rows(curve, mod, G_pts, bits)
    C_aff = _absorb_affine(t, mod, curve, C)
    C_host = mod.unpack_affine_rns(curve, np.asarray(C))

    rounds: List[Tuple[np.ndarray, np.ndarray]] = []
    chals = np.empty((B, m), dtype=object)
    nbits = curve.scalar.nbits
    for j in range(m):
        half = a_rows.shape[1] // 2
        a_lo, a_hi = a_rows[:, :half], a_rows[:, half:]
        G_lo, G_hi = G_pts[:, :half], G_pts[:, half:]
        bits_lo = _scalar_rows_to_bits(curve, f_s, a_lo, a_bound)
        bits_hi = _scalar_rows_to_bits(curve, f_s, a_hi, a_bound)
        L = _msm_rows(curve, mod, G_hi, bits_lo)
        R = _msm_rows(curve, mod, G_lo, bits_hi)
        _absorb_affine(t, mod, curve, L)
        _absorb_affine(t, mod, curve, R)
        rounds.append(
            (
                mod.unpack_affine_rns(curve, np.asarray(L)),
                mod.unpack_affine_rns(curve, np.asarray(R)),
            )
        )
        e_row, eb = t.challenge()
        # the challenge leaves the device once per round: the scalar
        # c = e mod p_s and its inverse are host-side ints (python pow)
        e_host = t.field.unpack(np.asarray(e_row))
        c_host = np.asarray([int(v) % p_s for v in e_host], dtype=object)
        cinv_host = np.asarray(
            [pow(int(v), -1, p_s) for v in c_host], dtype=object
        )
        chals[:, j] = c_host
        c_rows = jnp.asarray(f_s.pack(c_host))[:, None, :]  # (B, 1, 2K_s)
        cinv_rows = jnp.asarray(f_s.pack(cinv_host))[:, None, :]
        # a' = c*a_lo + cinv*a_hi (scalar-field RNS, device)
        t0, b0 = f_s.mul(a_lo, a_bound, c_rows, 1)
        t1, b1 = f_s.mul(a_hi, a_bound, cinv_rows, 1)
        a_rows, a_bound = f_s.add(t0, b0, t1, b1)
        a_rows, a_bound = f_s.normalize(a_rows, a_bound)
        # G' = cinv*G_lo + c*G_hi (curve tier, device)
        def _sbits(host_vals):
            flat = np.zeros((B, nbits), np.uint8)
            for i, v in enumerate(host_vals):
                v = int(v)
                for kk in range(v.bit_length()):
                    flat[i, kk] = (v >> kk) & 1
            return jnp.asarray(flat)[:, None, :]  # broadcast over points

        Pl = mod.scalar_mul_bits_windowed_rns(curve, G_lo, _sbits(cinv_host))
        Ph = mod.scalar_mul_bits_windowed_rns(curve, G_hi, _sbits(c_host))
        G_pts = mod.add_rns(curve, Pl, Ph)

    a_star = [int(v) % p_s for v in f_s.unpack(np.asarray(a_rows[:, 0, :]))]
    return {
        "commitment": C_host,
        "rounds": rounds,
        "a_star": a_star,
        "challenges": chals,
    }


def _host_transcript_challenges(curve, config: PoseidonConfig, commitment,
                                rounds) -> list:
    """Replay the transcript on the host oracle sponge: absorb C, then
    per round (L, R); squeeze one challenge each round."""
    sp = PoseidonSponge(config)
    cx, cy = commitment
    sp.absorb_elements([int(cx), int(cy)])
    es = []
    for L, R in rounds:
        sp.absorb_elements([int(L[0]), int(L[1]), int(R[0]), int(R[1])])
        es.append(sp.squeeze_native_field_elements(1)[0])
    return es


def ipa_fold_verify_host(curve, config: PoseidonConfig, gens, commitment,
                         rounds, a_star: int) -> bool:
    """Host verifier (python ints, independent of the device stack):
    replays the transcript, folds the generators with c^{-1}/c, forms
    C' = C + sum_j (c_j^2 L_j + c_j^{-2} R_j), accepts iff
    C' == a_star * G_fold."""
    p_s = curve.scalar.p
    es = _host_transcript_challenges(curve, config, commitment, rounds)
    G = list(gens)
    acc = tuple(int(v) for v in commitment)
    for (L, R), e in zip(rounds, es):
        c = int(e) % p_s
        if c == 0:
            return False
        cinv = pow(c, -1, p_s)
        lterm = curve.scalar_mul_host(tuple(int(v) for v in L), c * c % p_s)
        rterm = curve.scalar_mul_host(
            tuple(int(v) for v in R), cinv * cinv % p_s
        )
        acc = curve.add_host(curve.add_host(acc, lterm), rterm)
        half = len(G) // 2
        G = [
            curve.add_host(
                curve.scalar_mul_host(G[i], cinv),
                curve.scalar_mul_host(G[half + i], c),
            )
            for i in range(half)
        ]
    return acc == curve.scalar_mul_host(G[0], int(a_star) % p_s)


def ipa_fold_prove_host(curve, config: PoseidonConfig, gens, scalars_host):
    """Host-oracle twin of the device prover (python ints end-to-end);
    same transcript schedule, used for bit-parity tests."""
    p_s = curve.scalar.p
    B = len(scalars_host)
    proofs = []
    for b in range(B):
        a = [int(v) % p_s for v in scalars_host[b]]
        G = list(gens)
        C = None
        for ai, Gi in zip(a, G):
            term = curve.scalar_mul_host(Gi, ai)
            C = term if C is None else curve.add_host(C, term)
        sp = PoseidonSponge(config)
        sp.absorb_elements([int(C[0]), int(C[1])])
        rounds = []
        while len(a) > 1:
            half = len(a) // 2
            L = R = None
            for i in range(half):
                lt = curve.scalar_mul_host(G[half + i], a[i])
                rt = curve.scalar_mul_host(G[i], a[half + i])
                L = lt if L is None else curve.add_host(L, lt)
                R = rt if R is None else curve.add_host(R, rt)
            sp.absorb_elements([int(L[0]), int(L[1]), int(R[0]), int(R[1])])
            rounds.append((L, R))
            e = sp.squeeze_native_field_elements(1)[0]
            c = int(e) % p_s
            cinv = pow(c, -1, p_s)
            a = [(c * a[i] + cinv * a[half + i]) % p_s for i in range(half)]
            G = [
                curve.add_host(
                    curve.scalar_mul_host(G[i], cinv),
                    curve.scalar_mul_host(G[half + i], c),
                )
                for i in range(half)
            ]
        proofs.append({"commitment": C, "rounds": rounds, "a_star": a[0]})
    return proofs
