"""Round-5 end-to-end drive through the public package boundary (real TPU).

Sections mirror the verify skill's flagship flows plus this round's
changes; each prints one OK line and asserts hard.
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import random

import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend())
rng = random.Random(5)

# 1. pinned arkworks Poseidon vector, host + device sponge
from crypto_primitives_tpu.models.sponge import (
    Felt,
    PoseidonSponge,
    PoseidonSpongeBatch,
    get_default_poseidon_parameters,
)
from crypto_primitives_tpu.ops import BLS12_381_FR as FR

cfg = get_default_poseidon_parameters(FR, 2, False)
s = PoseidonSponge(cfg)
s.absorb([Felt(0), Felt(1), Felt(2)])
PIN = 40442793463571304028337753002242186710310163897048962278675457993207843616876
assert s.squeeze_native_field_elements(3)[0] == PIN
B = 128
sb = PoseidonSpongeBatch(cfg, batch_shape=(B,))
elems = jnp.broadcast_to(
    jnp.asarray(FR.pack([[0], [1], [2]]))[None, :, 0, :], (B, 3, FR.num_limbs)
)
sb.absorb(elems)
out = FR.unpack(np.asarray(sb.squeeze_native_field_elements(3)))
assert all(int(out[b, 0]) == PIN for b in range(B))
print("OK 1: poseidon pinned vector host+device (rep=%s)" % sb.rep)

# 2. small-batch FiatShamirRns with NO rep argument (round-5 fix)
from crypto_primitives_tpu.models.sponge.fiat_shamir import (
    FiatShamirRns,
    fold_argument_host,
    fold_argument_rns,
)

coms = np.asarray(
    [[rng.randrange(FR.p) for _ in range(2)] for _ in range(8)], dtype=object
)
tag, z, _ = fold_argument_rns(cfg, coms)
th, zh = fold_argument_host(cfg, coms)
f = FiatShamirRns(cfg, batch_shape=(8,)).field
assert [int(v) for v in f.unpack(np.asarray(z))] == zh
assert [int(v) for v in FR.unpack(np.asarray(tag[:, 0, :]))] == th
print("OK 2: FiatShamirRns self-tiering at B=8, parity vs host oracle")

# 3. small-batch sumcheck, host verifier accepts + rejects tamper
from crypto_primitives_tpu.models.protocols.sumcheck import (
    sumcheck_prove_rns,
    sumcheck_verify_host,
)

tbl_host = [[rng.randrange(FR.p) for _ in range(8)] for _ in range(8)]
tbl = jnp.asarray(np.stack([f.pack(np.asarray(r, dtype=object)) for r in tbl_host]))
s_row, rounds, fin = sumcheck_prove_rns(cfg, tbl)
sh = f.unpack(np.asarray(s_row))
fh = f.unpack(np.asarray(fin))
msgs0 = [
    (int(f.unpack(np.asarray(p0))[0]), int(f.unpack(np.asarray(p1))[0]))
    for p0, p1 in rounds
]
assert sumcheck_verify_host(cfg, int(sh[0]), msgs0, int(fh[0]))
assert not sumcheck_verify_host(cfg, (int(sh[0]) + 1) % FR.p, msgs0, int(fh[0]))
print("OK 3: sumcheck B=8 no-rep, verifier accepts / rejects tamper")

# 4. SHA-256 device Merkle tree vs hashlib; wrong root -> False
import hashlib

from crypto_primitives_tpu.models.merkle_tree.device import sha256_device_tree

leaves = np.asarray(
    [[rng.randrange(256) for _ in range(16)] for _ in range(64)], dtype=np.uint8
)
tree = sha256_device_tree(jnp.asarray(leaves))
# reference semantics (sha256/mod.rs:66-78 + ByteDigestConverter): the
# bottom non-leaf layer hashes LENGTH-PREFIXED leaf digests (leaf->inner
# converter only); upper layers compress RAW digest pairs
level = [hashlib.sha256(bytes(l)).digest() for l in leaves]
pre = (32).to_bytes(8, "little")
level = [
    hashlib.sha256(pre + level[i] + pre + level[i + 1]).digest()
    for i in range(0, len(level), 2)
]
while len(level) > 1:
    level = [
        hashlib.sha256(level[i] + level[i + 1]).digest()
        for i in range(0, len(level), 2)
    ]
assert tree.root() == level[0]
idx = jnp.arange(64)
sib, auth = tree.proof_rows(idx)
ok = tree.verify_rows_batch(tree.root_row(), tree.leaf_digests, idx, sib, auth)
assert bool(np.all(np.asarray(ok)))
bad = jnp.zeros_like(tree.root_row())
okb = tree.verify_rows_batch(bad, tree.leaf_digests, idx, sib, auth)
assert not bool(np.any(np.asarray(okb)))
print("OK 4: sha256 device tree vs hashlib; bad root all-False")

# 5. Schnorr sign/verify + tamper reject (TE curve tier)
from crypto_primitives_tpu.models.signature.schnorr import Schnorr
from crypto_primitives_tpu.ops.curves_known import JUBJUB

sch = Schnorr(JUBJUB)
sp = sch.setup(rng)
pk, sk = sch.keygen(sp, rng)
msg = bytes(rng.randrange(256) for _ in range(32))
sig = sch.sign(sp, sk, msg, rng)
assert sch.verify(sp, pk, msg, sig)
assert not sch.verify(sp, pk, msg[:-1] + bytes([msg[-1] ^ 1]), sig)
print("OK 5: Schnorr sign/verify/tamper on JubJub")

# 6. error surface: mis-shaped absorb raises a self-explanatory error
try:
    sb2 = PoseidonSpongeBatch(cfg, batch_shape=(4,))
    sb2.absorb(jnp.zeros((5, 3), jnp.uint32))
    raise SystemExit("expected an error for mis-shaped absorb")
except (ValueError, AssertionError, TypeError) as e:
    print("OK 6: mis-shaped absorb raises:", type(e).__name__)

# 7. round-5: BLS12-381 G1 Pedersen CRH through the fused SW MSM kernel
from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window
from crypto_primitives_tpu.ops import curve_sw_rns as _sw
from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1 as G1

assert _sw.grouped_kernel_ok(G1), "fused SW kernel should engage on TPU"
crh_g1 = PedersenCRH(G1, Window(4, 16))
cp_g1 = crh_g1.setup(rng)
data = bytes(rng.randrange(256) for _ in range(8))
outb = np.asarray(
    crh_g1.evaluate_batch(cp_g1, jnp.asarray(np.frombuffer(data, np.uint8)[None]))
)
x, y = int(G1.base.unpack(outb[0][0])), int(G1.base.unpack(outb[0][1]))
assert (x, y) == crh_g1.evaluate(cp_g1, data)
print("OK 7: G1 Pedersen CRH via fused SW kernel == host oracle")

# 8. round-5: msm_many (one-dispatch N MSMs) parity vs single calls
from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH as _PC
from crypto_primitives_tpu.ops.curve_rns_any import rns_mod
from crypto_primitives_tpu.ops.curves_known import JUBJUB as _JJ

crh_jj = _PC(_JJ, Window(4, 8))
cpj = crh_jj.setup(rng)
ins = [
    jnp.asarray(
        np.asarray([[rng.randrange(256) for _ in range(4)]] * b, np.uint8)
    )
    for b in (1, 2)
]
many = crh_jj.evaluate_batch_rns_many([cpj, cpj], ins)
mod = rns_mod(_JJ)
for n in range(2):
    single = crh_jj.evaluate_batch_rns(cpj, ins[n])
    assert list(mod.unpack_affine_rns(_JJ, np.asarray(many[n]))) == list(
        mod.unpack_affine_rns(_JJ, np.asarray(single))
    )
print("OK 8: msm_many one-dispatch == per-call results")

# 9. round-5: 381-bit Poseidon sponge rides the generalized fused kernel
from crypto_primitives_tpu.models.sponge.poseidon import (
    PoseidonConfig,
    PoseidonSpongeBatch as _PSB,
    find_poseidon_ark_and_mds,
)
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FQ as FQ

arkq, mdsq = find_poseidon_ark_and_mds(FQ, 2, 8, 60, 0)
cfq = PoseidonConfig(field=FQ, full_rounds=8, partial_rounds=60, alpha=5,
                     ark=arkq, mds=mdsq, rate=2, capacity=1)
sq = _PSB(cfq, batch_shape=(64,))
assert sq.rep == "rns", sq.rep
val = rng.randrange(FQ.p)
sq.absorb(jnp.asarray(FQ.pack(np.asarray([[val]] * 64, dtype=object))))
gotq = FQ.unpack(np.asarray(sq.squeeze_native_field_elements(1)))
hq = PoseidonSponge(cfq)
hq.absorb_elements([val])
want = hq.squeeze_native_field_elements(1)[0]
assert all(int(gotq[b, 0]) == want for b in range(64))
print("OK 9: 381-bit-field sponge on the fused big-plan kernel == host")

print("ALL DRIVE SECTIONS GREEN")
