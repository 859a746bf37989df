"""Schnorr signatures over any curve group (TE or SW) with a generic byte
digest — the reference is generic over ark-ec `CurveGroup` the same way.

Twin of /root/reference/crypto-primitives/src/signature/schnorr/mod.rs:
  * setup: random 32-byte salt + random generator (mod.rs:49-62)
  * sign: loop-sample k, r = k*G, e = H(salt || ser(r) || ser(msg)) mapped
    via from_random_bytes (retry on None); s = k - e*sk (mod.rs:77-115)
  * verify: r' = s*G + e*pk, recompute e (mod.rs:117-148)
  * randomize_public_key: pk + m*G; randomize_signature: s - e*m — both use
    the same multiplier m derived from the randomness bytes' MSB-first bit
    stream with weight 2^position (mod.rs:150-214; the pk path's
    reversed-stream double-and-add computes the same integer)

Serialization details that define the hash input (ark-serialize semantics):
salt = raw 32 bytes (fixed array, no prefix); r = compressed point (TE:
y bytes with x-sign flag in the top bit; SW: x bytes with SWFlags); msg =
u64 LE length prefix + bytes (slice impl).

TPU addition: `verify_batch` — the two scalar multiplications for B
signatures run as one batched device program; the cheap byte hashing
finishes on host.
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Callable, List, Tuple

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.ops import curve as cv
from crypto_primitives_tpu.ops import curve_rns as cr
from crypto_primitives_tpu.ops.curve_rns_any import rns_mod
from crypto_primitives_tpu.ops.curve import TECurveSpec


@dataclasses.dataclass
class SchnorrParameters:
    generator: Tuple[int, int]
    salt: bytes  # 32 bytes


@dataclasses.dataclass
class SchnorrSignature:
    prover_response: int  # s
    verifier_challenge: int  # e


def _randomness_multiplier(randomness: bytes) -> int:
    """Sum over the MSB-first bit stream with weight 2^position
    (mod.rs:187-194 / the equivalent reversed double-and-add at :160-169)."""
    m = 0
    pos = 0
    for byte in randomness:
        for i in range(8):
            bit = (byte >> (7 - i)) & 1
            m += bit << pos
            pos += 1
    return m


class Schnorr:
    def __init__(self, curve, digest: Callable[[bytes], bytes] = None):
        # curve: TECurveSpec or SWCurveSpec (duck-typed host + device tiers)
        self.curve = curve
        self.digest = digest or (lambda b: hashlib.sha256(b).digest())

    # -- core scheme --

    def setup(self, rng) -> SchnorrParameters:
        salt = bytes(rng.randrange(256) for _ in range(32))
        generator = self.curve.rand_point(rng)
        return SchnorrParameters(generator=generator, salt=salt)

    def keygen(self, params: SchnorrParameters, rng) -> Tuple[Tuple[int, int], int]:
        sk = rng.randrange(self.curve.scalar.p)
        pk = self.curve.scalar_mul_host(params.generator, sk)
        return pk, sk

    def _hash_input(self, params: SchnorrParameters, commitment: Tuple[int, int],
                    message: bytes) -> bytes:
        return (
            params.salt
            + self.curve.serialize_compressed(commitment)
            + len(message).to_bytes(8, "little")
            + bytes(message)
        )

    def _from_random_bytes(self, digest: bytes):
        """arkworks `F::from_random_bytes`: LE integer masked to
        MODULUS_BIT_SIZE bits, then None if >= p (FieldSpec.from_random_bytes
        has the exact masking rule)."""
        return self.curve.scalar.from_random_bytes(digest)

    def sign(self, params: SchnorrParameters, sk: int, message: bytes, rng) -> SchnorrSignature:
        r_order = self.curve.scalar.p
        while True:
            k = rng.randrange(r_order)
            commitment = self.curve.scalar_mul_host(params.generator, k)
            e = self._from_random_bytes(
                self.digest(self._hash_input(params, commitment, message))
            )
            if e is not None:
                break
        s = (k - e * sk) % r_order
        return SchnorrSignature(prover_response=s, verifier_challenge=e)

    def verify(self, params: SchnorrParameters, pk: Tuple[int, int], message: bytes,
               sig: SchnorrSignature) -> bool:
        r_prime = self.curve.add_host(
            self.curve.scalar_mul_host(params.generator, sig.prover_response % self.curve.scalar.p),
            self.curve.scalar_mul_host(pk, sig.verifier_challenge % self.curve.scalar.p),
        )
        e = self._from_random_bytes(self.digest(self._hash_input(params, r_prime, message)))
        if e is None:
            return False
        return e == sig.verifier_challenge

    # -- rerandomization (mod.rs:150-202) --

    def randomize_public_key(self, params: SchnorrParameters, public_key: Tuple[int, int],
                             randomness: bytes) -> Tuple[int, int]:
        m = _randomness_multiplier(randomness)
        return self.curve.add_host(
            self.curve.scalar_mul_host(params.generator, m), public_key
        )

    def randomize_signature(self, params: SchnorrParameters, sig: SchnorrSignature,
                            randomness: bytes) -> SchnorrSignature:
        m = _randomness_multiplier(randomness) % self.curve.scalar.p
        s = (sig.prover_response - sig.verifier_challenge * m) % self.curve.scalar.p
        return SchnorrSignature(
            prover_response=s, verifier_challenge=sig.verifier_challenge
        )

    # -- TPU-shaped batch verification --

    def _scalars_to_bits(self, scalars) -> np.ndarray:
        nbits = self.curve.scalar.nbits
        p = self.curve.scalar.p
        nbytes = (nbits + 7) // 8
        buf = b"".join((int(v) % p).to_bytes(nbytes, "little") for v in scalars)
        by = np.frombuffer(buf, np.uint8).reshape(len(scalars), nbytes)
        return np.unpackbits(by, axis=1, bitorder="little")[:, :nbits]

    def keygen_batch(self, params: SchnorrParameters, rng, n: int):
        """n keypairs with the pk scalar muls batched on device
        (fixed-base grouped tables); twin of n keygen calls (mod.rs:64-75)."""
        sks = [rng.randrange(self.curve.scalar.p) for _ in range(n)]
        mod = rns_mod(self.curve)
        if mod is not None:
            bits = jnp.asarray(self._scalars_to_bits(sks))
            pts = mod.fixed_base_mul_rns(self.curve, params.generator, bits)
            pks = [tuple(t) for t in mod.unpack_affine_rns(self.curve, pts)]
        else:
            bits = jnp.asarray(self._scalars_to_bits(sks))
            gen = jnp.asarray(self.curve.pack_points(params.generator))
            pts = self.curve.dev_scalar_mul_bits(
                jnp.broadcast_to(gen, (n,) + gen.shape), bits
            )
            pks = self.curve.unpack_points(np.asarray(pts))
        return list(zip(pks, sks))

    def sign_batch(self, params: SchnorrParameters, sks: List[int],
                   messages: List[bytes], rng,
                   candidates: int = 4) -> List[SchnorrSignature]:
        """Batch signing: all rejection-sampling candidates run as ONE
        constant-shape fixed-base device program.  Semantics per signature
        match `sign` (mod.rs:77-115): each message consumes its own stream
        of k draws in order and keeps the first whose challenge maps into
        the scalar field.

        ~45% of draws reject for a near-power-of-two modulus, so a
        round-per-retry scheme costs an expected ~log(B)/log(1/q)
        sequential device dispatches.  Instead we draw ``candidates`` k's
        per message up front — one (B*candidates)-row scalar-mul program,
        shape independent of the rejection pattern — and the ~q^candidates
        tail (4% of messages at the default 4) falls back to the host
        reference loop."""
        B = len(sks)
        assert len(messages) == B
        r_order = self.curve.scalar.p
        out: List[SchnorrSignature] = [None] * B

        def device_round(idxs, C, rows):
            """One device pass at the FIXED shape of ``rows`` total
            candidates: C per index in idxs, dummy-padded — every pass
            reuses the single compiled program regardless of the rejection
            pattern.  Returns the indexes whose candidates all rejected."""
            n = len(idxs)
            ks = [[rng.randrange(r_order) for _ in range(C)] for _ in range(n)]
            flat = [k for row in ks for k in row]
            assert len(flat) <= rows
            pad = rows - len(flat)
            bits = jnp.asarray(self._scalars_to_bits(flat + [1] * pad))
            pts = mod.fixed_base_mul_rns(self.curve, params.generator, bits)
            commits = mod.unpack_affine_rns(self.curve, pts)
            still = []
            for row, i in enumerate(idxs):
                for c in range(C):
                    pt = commits[row * C + c]
                    pt = tuple(pt) if pt is not None else None
                    e = self._from_random_bytes(
                        self.digest(self._hash_input(params, pt, messages[i]))
                    )
                    if e is not None:
                        s = (ks[row][c] - e * sks[i]) % r_order
                        out[i] = SchnorrSignature(
                            prover_response=s, verifier_challenge=e
                        )
                        break
                else:
                    still.append(i)
            return still

        mod = rns_mod(self.curve)
        if mod is not None and B > 0:
            C = max(2, candidates)
            rows = B * C
            still = device_round(list(range(B)), C, rows)
            retries = 0
            while still and len(still) * 2 * C <= rows and retries < 4:
                # retry passes for the ~q^C tail at the SAME row shape
                # (2C candidates each, dummy-padded): zero extra compiles
                still = device_round(still, 2 * C, rows)
                retries += 1
        # host reference loop: the non-RNS tier, plus the (vanishing) tail
        for i in range(B):
            if out[i] is None:
                out[i] = self.sign(params, sks[i], messages[i], rng)
        return out

    def verify_batch(self, params: SchnorrParameters, pks: List[Tuple[int, int]],
                     messages: List[bytes], sigs: List[SchnorrSignature]) -> List[bool]:
        """Batch the two variable-base scalar muls per signature on device,
        finish the byte hashing on host."""
        B = len(sigs)
        assert len(pks) == B and len(messages) == B
        s_bits = jnp.asarray(self._scalars_to_bits([s.prover_response for s in sigs]))
        e_bits = jnp.asarray(self._scalars_to_bits([s.verifier_challenge for s in sigs]))
        mod = rns_mod(self.curve)
        if mod is not None:
            pks_dev = jnp.asarray(mod.pack_points_rns(self.curve, list(pks)))
            # s*G is fixed-base (cached grouped doubling table); e*pk is
            # variable-base windowed double-and-add
            sg = mod.fixed_base_mul_rns(self.curve, params.generator, s_bits)
            epk = mod.scalar_mul_bits_windowed_rns(self.curve, pks_dev, e_bits)
            r_primes = mod.unpack_affine_rns(
                self.curve, mod.add_rns(self.curve, sg, epk)
            )
        else:
            gen = jnp.asarray(self.curve.pack_points(params.generator))
            gens = jnp.broadcast_to(gen, (B,) + gen.shape)
            pks_dev = jnp.asarray(self.curve.pack_points(list(pks)))
            sg = self.curve.dev_scalar_mul_bits(gens, s_bits)
            epk = self.curve.dev_scalar_mul_bits(pks_dev, e_bits)
            r_primes = self.curve.unpack_points(
                np.asarray(self.curve.dev_add(sg, epk))
            )
        out = []
        for i in range(B):
            rp = r_primes[i]
            rp = tuple(rp) if rp is not None else None  # SW identity is None
            e = self._from_random_bytes(
                self.digest(self._hash_input(params, rp, messages[i]))
            )
            out.append(e is not None and e == sigs[i].verifier_challenge)
        return out
