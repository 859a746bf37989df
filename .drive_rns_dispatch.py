"""Verify drive: the RNS fast path behind the public primitive APIs.

CPU-forced (axon TPU tunnel hung); fresh-process drive of Pedersen CRH /
commitment, Bowe-Hopwood, Schnorr verify_batch and ElGamal batch APIs —
all of which now dispatch onto ops/curve_rns.py — against host oracles.
"""

import random

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.crh.bowe_hopwood import BoweHopwoodCRH
from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window
from crypto_primitives_tpu.models.commitment.pedersen import PedersenCommitment
from crypto_primitives_tpu.models.encryption.elgamal import ElGamal
from crypto_primitives_tpu.models.signature.schnorr import Schnorr
from crypto_primitives_tpu.ops.curves_known import JUBJUB

rng = random.Random(4242)
B = 3

crh = PedersenCRH(JUBJUB, Window(4, 8))
params = crh.setup(rng)
msgs = [bytes(rng.randrange(256) for _ in range(4)) for _ in range(B)]
aff = np.asarray(crh.evaluate_batch(params, jnp.asarray([list(m) for m in msgs], dtype=jnp.uint8)))
vals = JUBJUB.base.unpack(aff)  # Montgomery limbs -> plain ints
for i, m in enumerate(msgs):
    assert (int(vals[i, 0]), int(vals[i, 1])) == crh.evaluate(params, m), i
print("Pedersen CRH batch (RNS path) OK", flush=True)

comm = PedersenCommitment(JUBJUB, Window(4, 9))
cparams = comm.setup(rng)
rs = [comm.rand_randomness(rng) for _ in range(B)]
inp = jnp.asarray([list(m) for m in msgs], dtype=jnp.uint8)
rbits = jnp.asarray(comm.randomness_to_bits(np.asarray(rs, dtype=object)))
out = JUBJUB.base.unpack(np.asarray(comm.commit_batch(cparams, inp, rbits)))
for i, m in enumerate(msgs):
    assert (int(out[i, 0]), int(out[i, 1])) == comm.commit(cparams, m, rs[i]), i
print("Pedersen commitment batch (RNS path) OK", flush=True)

bh = BoweHopwoodCRH(JUBJUB, Window(8, 12))
bparams = bh.setup(rng)
bx = JUBJUB.base.unpack(np.asarray(bh.evaluate_batch(bparams, inp)))
for i, m in enumerate(msgs):
    assert int(bx[i]) == bh.evaluate(bparams, m), i
print("Bowe-Hopwood batch (RNS path) OK", flush=True)

sch = Schnorr(JUBJUB)
sparams = sch.setup(rng)
pks, sigs = [], []
for m in msgs:
    pk, sk = sch.keygen(sparams, rng)
    pks.append(pk)
    sigs.append(sch.sign(sparams, sk, m, rng))
ok = sch.verify_batch(sparams, pks, msgs, sigs)
assert ok == [True] * B
sigs[0].prover_response ^= 1
assert sch.verify_batch(sparams, pks, msgs, sigs)[0] is False
print("Schnorr verify_batch (RNS path) OK", flush=True)

eg = ElGamal(JUBJUB)
eparams = eg.setup(rng)
epk, esk = eg.keygen(eparams, rng)
pts = [JUBJUB.rand_point(rng) for _ in range(B)]
rands = [rng.randrange(JUBJUB.scalar.p) for _ in range(B)]
cts = eg.encrypt_batch(eparams, epk, pts, rands)
dec = eg.decrypt_batch(eparams, esk, cts)
assert [tuple(d) for d in dec] == pts
print("ElGamal batch (RNS path) OK", flush=True)
print("DRIVE PASSED", flush=True)
