"""Signatures, encryption, commitments, PRF — the scheme families.

One tour through the reference's `signature`, `encryption`,
`commitment`, and `prf` modules (src/signature/schnorr/mod.rs,
src/encryption/elgamal/mod.rs, src/commitment/pedersen/mod.rs,
src/prf/blake2s/mod.rs) on the JubJub curve.  Single-op calls run on
the compiled C++ host engine (crypto_primitives_tpu/native/cpmont.cpp) when available; the
`*_batch` twins run the same schemes as one XLA dispatch on device.

Run: python examples/sign_encrypt_commit.py
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_primitives_tpu.models.commitment.pedersen import PedersenCommitment
from crypto_primitives_tpu.models.crh.pedersen import Window
from crypto_primitives_tpu.models.encryption.elgamal import ElGamal
from crypto_primitives_tpu.models.prf.blake2s import Blake2sPRF
from crypto_primitives_tpu.models.signature.schnorr import Schnorr
from crypto_primitives_tpu.ops.curves_known import JUBJUB


def main():
    rng = random.Random(42)

    # -- Schnorr signatures (randomizable, like the reference's) --------
    sch = Schnorr(JUBJUB)
    params = sch.setup(rng)
    pk, sk = sch.keygen(params, rng)
    msg = b"hello tpu"
    sig = sch.sign(params, sk, msg, rng)
    assert sch.verify(params, pk, msg, sig)
    assert not sch.verify(params, pk, b"tampered", sig)
    rand = rng.randbytes(32)
    pk_r = sch.randomize_public_key(params, pk, rand)
    sig_r = sch.randomize_signature(params, sig, rand)
    assert sch.verify(params, pk_r, msg, sig_r)
    print("schnorr: sign/verify ok, tamper rejected, randomization verifies")

    # -- ElGamal encryption over curve points ---------------------------
    eg = ElGamal(JUBJUB)
    eparams = eg.setup(rng)
    epk, esk = eg.keygen(eparams, rng)
    message = JUBJUB.scalar_mul_host(JUBJUB.generator, rng.randrange(1, JUBJUB.scalar.p))
    ct = eg.encrypt(eparams, epk, message, eg.rand_randomness(rng))
    assert eg.decrypt(eparams, esk, ct) == message
    print("elgamal: point message round-trips through encrypt/decrypt")

    # -- Pedersen commitment (binding + hiding) --------------------------
    pc = PedersenCommitment(JUBJUB, Window(4, 192))  # up to 96-byte input
    cparams = pc.setup(rng)
    data = b"commit to this"
    r = pc.rand_randomness(rng)
    c = pc.commit(cparams, data, r)
    assert pc.commit(cparams, data, r) == c          # deterministic reopen
    assert pc.commit(cparams, data, pc.rand_randomness(rng)) != c  # hiding
    print(f"pedersen commitment: ({c[0] % 10**8:08d}..., ...) reopens correctly")

    # -- Blake2s PRF -----------------------------------------------------
    out = Blake2sPRF.evaluate(bytes(32), b"\x01" * 32)
    print(f"blake2s prf: {out.hex()[:16]}...")


if __name__ == "__main__":
    main()
