"""Round-4 judge drive: round-4 surfaces through the public package boundary."""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import random

import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend())
rng = random.Random(7)

# 1. pinned arkworks Poseidon vector, host + device RNS tier
from crypto_primitives_tpu.models.sponge import (
    Felt, PoseidonSponge, PoseidonSpongeBatch, get_default_poseidon_parameters)
from crypto_primitives_tpu.ops import BLS12_381_FR as FR

cfg = get_default_poseidon_parameters(FR, 2, False)
s = PoseidonSponge(cfg)
s.absorb([Felt(0), Felt(1), Felt(2)])
PIN = 40442793463571304028337753002242186710310163897048962278675457993207843616876
assert s.squeeze_native_field_elements(1)[0] == PIN
B = 128
batch = PoseidonSpongeBatch(cfg, batch_shape=(B,))
print("device sponge rep:", batch.rep)
batch.absorb(jnp.asarray(FR.pack([[0, 1, 2]] * B)))
dig = batch.squeeze_native_field_elements(1)
vals = FR.unpack(np.asarray(dig).reshape(B, -1))
assert all(int(v) == PIN for v in np.atleast_1d(vals)), "device sponge != pin"
print("OK 1: pinned Poseidon vector host + device (rep=%s)" % batch.rep)

# 2. BLS12-381 G1 on the big-plan RNS tier: Schnorr batch + tamper reject
from crypto_primitives_tpu.models.signature.schnorr import Schnorr
from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1
from crypto_primitives_tpu.ops.curve_rns_any import rns_mod

print("G1 rns plan:", rns_mod(BLS12_381_G1) is not None)
sch = Schnorr(BLS12_381_G1)
params = sch.setup(rng)
pk, sk = sch.keygen(params, rng)
msgs = [bytes([rng.randrange(256) for _ in range(32)]) for _ in range(8)]
sigs = sch.sign_batch(params, [sk] * len(msgs), msgs, rng)
oks = sch.verify_batch(params, [pk] * len(msgs), msgs, sigs)
assert all(oks), "G1 verify_batch failed"
bad = sch.verify_batch(params, [pk] * len(msgs), [b"x" + m[1:] for m in msgs], sigs)
assert not any(bad), "G1 tamper not rejected"
# single-op host path parity (native engine in play by default)
s1 = sch.sign(params, sk, msgs[0], rng)
assert sch.verify(params, pk, msgs[0], s1)
print("OK 2: BLS12-381 G1 Schnorr batch + tamper reject + single-op")

# 3. Fiat-Shamir RNS transcript parity vs host oracle
from crypto_primitives_tpu.models.sponge.fiat_shamir import (
    fold_argument_host, fold_argument_rns)

Bf, R = 8, 4
coms = np.asarray(
    [[rng.randrange(FR.p) for _ in range(R)] for _ in range(Bf)], dtype=object)
tag_limbs, z, bz = fold_argument_rns(cfg, coms, rep="rns")
tags_host, zs_host = fold_argument_host(cfg, coms)
tags_dev = [int(v) for v in np.atleast_1d(
    FR.unpack(np.asarray(tag_limbs).reshape(Bf, -1)))]
assert tags_dev == tags_host, "FS transcript tags mismatch"
print("OK 3: Fiat-Shamir RNS transcript bit-equal to host oracle")

# 4. Sumcheck: RNS prover transcript accepted by host verifier; tamper rejected
from crypto_primitives_tpu.models.protocols.sumcheck import (
    sumcheck_prove_host, sumcheck_prove_rns, sumcheck_verify_host)
from crypto_primitives_tpu.ops import rns, rns_xla

Bs, n = 4, 16
table_host = [[rng.randrange(FR.p) for _ in range(n)] for _ in range(Bs)]
f = rns_xla.RnsField(rns.build_plan(FR.p))
table = jnp.asarray(np.stack(
    [f.pack(np.asarray(row, dtype=object)) for row in table_host]))
s_row, rounds_rns, final_row = sumcheck_prove_rns(cfg, table, rep="rns")
hs, hr, hc, hf = sumcheck_prove_host(cfg, table_host)
for b in range(Bs):
    rr = [(int(f.unpack(np.asarray(p0)[b])), int(f.unpack(np.asarray(p1)[b])))
          for (p0, p1) in rounds_rns]
    assert rr == hr[b], "sumcheck rounds mismatch"
    assert sumcheck_verify_host(cfg, hs[b], rr, hf[b]), "verifier rejected"
    assert not sumcheck_verify_host(cfg, (hs[b] + 1) % FR.p, rr, hf[b]), \
        "tampered sum accepted"
print("OK 4: sumcheck RNS prover == host prover; host verifier accept/reject")

# 5. SHA-256 device tree 2^10: root vs hashlib oracle, batched verify, bad root
import hashlib
from crypto_primitives_tpu.models.merkle_tree.device import sha256_device_tree

nl = 1 << 10
leaves = np.asarray(
    [[rng.randrange(256) for _ in range(32)] for _ in range(nl)], dtype=np.uint8)
tree = sha256_device_tree(jnp.asarray(leaves))
def h(b): return hashlib.sha256(b).digest()
def conv(d): return (32).to_bytes(8, "little") + d  # ark Vec<u8> uncompressed
lv = [h(bytes(r)) for r in leaves]
# reference semantics: converter applies leaf->inner only; upper levels
# compress RAW digests (sha256/mod.rs:66-78 compress == evaluate on slices)
lv = [h(conv(lv[i]) + conv(lv[i + 1])) for i in range(0, len(lv), 2)]
while len(lv) > 1:
    lv = [h(lv[i] + lv[i + 1]) for i in range(0, len(lv), 2)]
assert tree.root() == lv[0], "device SHA tree root != hashlib oracle"
idx = jnp.arange(nl, dtype=jnp.int32)
sib, auth = tree.proof_rows(idx)
ok = tree.verify_rows_batch(tree.root_row(), tree.leaf_digests, idx, sib, auth)
assert bool(np.all(np.asarray(ok)))
badroot = jnp.asarray(
    np.frombuffer(h(b"not the root"), dtype=np.uint8))
bad = tree.verify_rows_batch(badroot, tree.leaf_digests[:4], idx[:4], sib[:4], auth[:4])
assert not bool(np.any(np.asarray(bad))), "bad root accepted"
print("OK 5: SHA-256 device tree root == independent oracle; verify/bad-root")

# 6. Byte-circuit batch synthesis: Blake2s one block, 21792 constraints,
#    small-domain check, digests == hashlib
from crypto_primitives_tpu.r1cs.batch import BatchConstraintSystem
from crypto_primitives_tpu.r1cs.gadgets.blake2s import Blake2sPRFGadget
from crypto_primitives_tpu.r1cs.vars import bytes_to_uint8s

N = 8
seeds = np.asarray(
    [[rng.randrange(256) for _ in range(32)] for _ in range(N)], np.uint8)
msgs2 = np.asarray(
    [[rng.randrange(256) for _ in range(32)] for _ in range(N)], np.uint8)
bcs = BatchConstraintSystem(FR, N)
sv = Blake2sPRFGadget.new_seed(bcs, seeds)
iv = bytes_to_uint8s(bcs, msgs2)
out = Blake2sPRFGadget.evaluate(bcs, sv, iv)
assert bcs.num_constraints == 21792, f"got {bcs.num_constraints}"
assert bcs.is_satisfied(), "batched Blake2s circuit unsatisfied"
got = out.value
for i in range(N):
    exp = hashlib.blake2s(seeds[i].tobytes() + msgs2[i].tobytes()).digest()
    assert got[i].tobytes() == exp, "blake2s gadget digest != hashlib"
print("OK 6: batched Blake2s byte circuit 21792 constraints, satisfied, parity")

# 7. native engine availability + three-way single-op parity (no timing here)
from crypto_primitives_tpu import native
print("native engine available:", native.available())
if native.available():
    from crypto_primitives_tpu.ops.curves_known import JUBJUB
    eng = native.curve_engine(JUBJUB)
    pt = JUBJUB.rand_point(rng)
    k = rng.randrange(JUBJUB.scalar.p)
    assert eng.scalar_mul(pt, k) == JUBJUB.scalar_mul_host(pt, k), \
        "native scalar mul != python-int"
    print("OK 7: native C++ scalar-mul == python-int oracle")

# 8. error surface: mis-shaped verify raises a clear error
try:
    tree.verify_rows_batch(tree.root_row(), tree.leaf_digests[:4], idx[:4],
                           sib[:2], auth[:4])
    print("FAIL 8: mis-shaped verify did not raise")
except (ValueError, AssertionError, TypeError) as e:
    print("OK 8: mis-shaped verify raises:", type(e).__name__)

print("ALL DRIVE CHECKS PASSED")
