"""Drive: curve-generic primitives (SW + TE) through the public boundary
on the default platform (real TPU)."""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import random
import numpy as np
import jax.numpy as jnp

from crypto_primitives_tpu.models.commitment.pedersen import PedersenCommitment
from crypto_primitives_tpu.models.crh.pedersen import Window
from crypto_primitives_tpu.models.encryption.elgamal import ElGamal
from crypto_primitives_tpu.models.signature.schnorr import Schnorr
from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1 as G1, JUBJUB

print("platform:", jax.devices()[0].platform, flush=True)
rng = random.Random(7)

# --- SW Schnorr host + device batch verify ---
sch = Schnorr(G1)
params = sch.setup(rng)
pk, sk = sch.keygen(params, rng)
sig = sch.sign(params, sk, b"msg", rng)
assert sch.verify(params, pk, b"msg", sig)
assert not sch.verify(params, pk, b"bad", sig)
ok = sch.verify_batch(params, [pk, pk], [b"msg", b"other"], [sig, sig])
assert ok == [True, False], ok
print("SW schnorr ok", flush=True)

# --- SW Pedersen commitment batch vs host ---
comm = PedersenCommitment(G1, Window(window_size=4, num_windows=8))
cp = comm.setup(rng)
msgs = [bytes(rng.randrange(256) for _ in range(4)) for _ in range(2)]
rands = [comm.rand_randomness(rng) for _ in range(2)]
inputs = jnp.asarray(np.frombuffer(b"".join(msgs), dtype=np.uint8).reshape(2, 4))
got = G1.base.unpack(np.asarray(
    comm.commit_batch(cp, inputs, jnp.asarray(comm.randomness_to_bits(rands)))))
for i in range(2):
    assert (int(got[i][0]), int(got[i][1])) == comm.commit(cp, msgs[i], rands[i])
print("SW pedersen commitment ok", flush=True)

# --- SW ElGamal batch vs host ---
eg = ElGamal(G1)
ep = eg.setup(rng)
epk, esk = eg.keygen(ep, rng)
ms = [G1.rand_point(rng) for _ in range(2)]
rs = [eg.rand_randomness(rng) for _ in range(2)]
cts = eg.encrypt_batch(ep, epk, ms, rs)
for i in range(2):
    assert cts[i] == eg.encrypt(ep, epk, ms[i], rs[i])
assert eg.decrypt_batch(ep, esk, cts) == [tuple(m) for m in ms]
print("SW elgamal ok", flush=True)

# --- TE (RNS fast path) still green: Schnorr batch + commitment ---
scht = Schnorr(JUBJUB)
pt = scht.setup(rng)
tpk, tsk = scht.keygen(pt, rng)
tsig = scht.sign(pt, tsk, b"te msg", rng)
assert scht.verify_batch(pt, [tpk], [b"te msg"], [tsig]) == [True]
commt = PedersenCommitment(JUBJUB, Window(window_size=4, num_windows=8))
cpt = commt.setup(rng)
gott = JUBJUB.base.unpack(np.asarray(commt.commit_batch(
    cpt, inputs, jnp.asarray(commt.randomness_to_bits(rands)))))
for i in range(2):
    assert (int(gott[i][0]), int(gott[i][1])) == commt.commit(cpt, msgs[i], rands[i])
print("TE rns paths ok", flush=True)
print("DRIVE PASS", flush=True)
