"""Curve-point ElGamal.

Twin of /root/reference/crypto-primitives/src/encryption/elgamal/mod.rs:
pk = sk*G; Enc(m; r) = (r*G, m + r*pk) (mod.rs:65-81);
Dec(c1, c2) = c2 - sk*c1 (mod.rs:83-99); the plaintext is a curve point.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.ops import curve as cv
from crypto_primitives_tpu.ops import curve_rns as cr
from crypto_primitives_tpu.ops.curve_rns_any import rns_mod
from crypto_primitives_tpu.ops.curve import TECurveSpec


@dataclasses.dataclass
class ElGamalParameters:
    generator: Tuple[int, int]


class ElGamal:
    def __init__(self, curve):
        # curve: TECurveSpec or SWCurveSpec (duck-typed host + device tiers)
        self.curve = curve

    def setup(self, rng) -> ElGamalParameters:
        return ElGamalParameters(generator=self.curve.rand_point(rng))

    def keygen(self, params: ElGamalParameters, rng) -> Tuple[Tuple[int, int], int]:
        sk = rng.randrange(self.curve.scalar.p)
        pk = self.curve.scalar_mul_host(params.generator, sk)
        return pk, sk

    def rand_randomness(self, rng) -> int:
        return rng.randrange(self.curve.scalar.p)

    def encrypt(self, params: ElGamalParameters, pk, message, randomness: int):
        s = self.curve.scalar_mul_host(pk, randomness)
        c1 = self.curve.scalar_mul_host(params.generator, randomness)
        c2 = self.curve.add_host(message, s)
        return (c1, c2)

    def decrypt(self, params: ElGamalParameters, sk: int, ciphertext):
        c1, c2 = ciphertext
        s = self.curve.scalar_mul_host(c1, sk)
        return self.curve.add_host(c2, self.curve.neg_host(s))

    # -- TPU-shaped batch APIs --

    def _scalars_to_bits(self, scalars) -> np.ndarray:
        nbits = self.curve.scalar.nbits
        p = self.curve.scalar.p
        nbytes = (nbits + 7) // 8
        buf = b"".join((int(v) % p).to_bytes(nbytes, "little") for v in scalars)
        by = np.frombuffer(buf, np.uint8).reshape(len(scalars), nbytes)
        return np.unpackbits(by, axis=1, bitorder="little")[:, :nbits]

    def encrypt_batch(self, params: ElGamalParameters, pk, messages: List, randomness: List[int]):
        """Batched Enc over B messages/randomness; returns list of ciphertexts."""
        B = len(messages)
        rbits = jnp.asarray(self._scalars_to_bits(randomness))
        mod = rns_mod(self.curve)
        if mod is not None:
            # the generator is always worth a cached grouped doubling
            # table; the recipient pk only amortizes its host precompute
            # (~250 doublings + subset sums) over a large batch — for
            # small batches / many distinct recipients use the windowed
            # variable-base path instead of churning the table cache
            c1 = mod.fixed_base_mul_rns(self.curve, params.generator, rbits)
            if B >= 32:
                s = mod.fixed_base_mul_rns(self.curve, tuple(pk), rbits)
            else:
                pkd = jnp.asarray(mod.pack_points_rns(self.curve, tuple(pk)))
                s = mod.scalar_mul_bits_windowed_rns(
                    self.curve, jnp.broadcast_to(pkd, (B,) + pkd.shape), rbits
                )
            msgs = jnp.asarray(mod.pack_points_rns(self.curve, list(messages)))
            c2 = mod.add_rns(self.curve, msgs, s)
            # one compact fetch for both components (int16 canonical
            # base-1 residues of affine coords; see unpack_affine_rns)
            both = mod.unpack_affine_rns(
                self.curve, jnp.stack([c1, c2], axis=1)
            )

            def _t(pt):
                return tuple(pt) if pt is not None else None

            return [(_t(both[i, 0]), _t(both[i, 1])) for i in range(B)]
        gen = jnp.asarray(self.curve.pack_points(params.generator))
        pkd = jnp.asarray(self.curve.pack_points(pk))
        c1 = self.curve.dev_scalar_mul_bits(
            jnp.broadcast_to(gen, (B,) + gen.shape), rbits
        )
        s = self.curve.dev_scalar_mul_bits(
            jnp.broadcast_to(pkd, (B,) + pkd.shape), rbits
        )
        msgs = jnp.asarray(self.curve.pack_points(list(messages)))
        c2 = self.curve.dev_add(msgs, s)
        c1h = self.curve.unpack_points(np.asarray(c1))
        c2h = self.curve.unpack_points(np.asarray(c2))

        def _t(p):  # SW identity unpacks to None
            return tuple(p) if p is not None else None

        return [(_t(c1h[i]), _t(c2h[i])) for i in range(B)]

    def decrypt_batch(self, params: ElGamalParameters, sk: int, ciphertexts: List):
        B = len(ciphertexts)
        sk_bits = jnp.asarray(self._scalars_to_bits([sk] * B))
        mod = rns_mod(self.curve)
        if mod is not None:
            c1 = jnp.asarray(mod.pack_points_rns(self.curve, [c[0] for c in ciphertexts]))
            c2 = jnp.asarray(mod.pack_points_rns(self.curve, [c[1] for c in ciphertexts]))
            s = mod.scalar_mul_bits_windowed_rns(self.curve, c1, sk_bits)
            m = mod.add_rns(self.curve, c2, mod.neg_rns(self.curve, s))
            mh = mod.unpack_affine_rns(self.curve, m)
            return [tuple(mh[i]) if mh[i] is not None else None for i in range(B)]
        c1 = jnp.asarray(self.curve.pack_points([c[0] for c in ciphertexts]))
        c2 = jnp.asarray(self.curve.pack_points([c[1] for c in ciphertexts]))
        s = self.curve.dev_scalar_mul_bits(c1, sk_bits)
        m = self.curve.dev_add(c2, self.curve.dev_neg(s))
        mh = self.curve.unpack_points(np.asarray(m))
        return [tuple(mh[i]) if mh[i] is not None else None for i in range(B)]
