"""Judge end-to-end drive (round 3): public package boundary on the real TPU."""
import hashlib
import random

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend())

from crypto_primitives_tpu.models.sponge import (
    Felt, PoseidonSponge, PoseidonSpongeBatch, get_default_poseidon_parameters)
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR

cfg = get_default_poseidon_parameters(FR, 2, False)

# 1. pinned arkworks vector, host oracle
s = PoseidonSponge(cfg)
s.absorb([Felt(0), Felt(1), Felt(2)])
host_out = s.squeeze_native_field_elements(3)
assert host_out[0] == 40442793463571304028337753002242186710310163897048962278675457993207843616876
print("1. host pinned vector OK")

# 2. device sponge at B=128: on TPU the generic tier must pick the RNS rep
B = 128
sp = PoseidonSpongeBatch(cfg, batch_shape=(B,))
print("   device sponge rep:", sp.rep)
assert sp.rep == ("rns" if jax.default_backend() == "tpu" else "limb")
sp.absorb(jnp.asarray(FR.pack([[0, 1, 2]] * B)))
out = FR.unpack(np.asarray(sp.squeeze_native_field_elements(3)))
assert all(out[b][i] == host_out[i] for b in range(B) for i in range(3))
print("2. device RNS sponge == pinned vector at B=128 OK")

# 3. generic two-to-one compress (the round-3 RNS wiring) vs host oracle
from crypto_primitives_tpu.models.crh.poseidon import PoseidonTwoToOneCRH
rng = random.Random(7)
two = PoseidonTwoToOneCRH(FR)
ls = [rng.randrange(FR.p) for _ in range(B)]
rs = [rng.randrange(FR.p) for _ in range(B)]
lcol = jnp.asarray(FR.pack([[v] for v in ls]))[:, 0, :]
rcol = jnp.asarray(FR.pack([[v] for v in rs]))[:, 0, :]
got = FR.unpack(np.asarray(two.evaluate_batch(cfg, lcol, rcol)))
for i in range(0, B, 17):
    g = got[i]
    g = int(g[0]) if isinstance(g, (list, np.ndarray)) else int(g)
    assert g == two.compress(cfg, ls[i], rs[i])
print("3. generic compress_batch (RNS tier) == host oracle OK")

# 4. SHA-256 device Merkle tree vs independent hashlib oracle
from crypto_primitives_tpu.models.merkle_tree.device import sha256_device_tree
n = 1 << 12
leaves_np = np.frombuffer(
    b"".join(bytes([i % 256] * 16) for i in range(n)), dtype=np.uint8
).reshape(n, 16).copy()
tree = sha256_device_tree(jnp.asarray(leaves_np))

def oracle_root():
    # ark ByteDigestConverter: leaf digest -> inner input via 8-byte LE length prefix? —
    # the repo pins leaf->inner boundary bytes; recompute independently:
    # ark ByteDigestConverter at the leaf->inner boundary ONLY: 8-byte LE
    # length prefix + digest (crh/sha256/mod.rs:67-78 semantics)
    digs = [hashlib.sha256(leaves_np[i].tobytes()).digest() for i in range(n)]
    def conv(d):
        return len(d).to_bytes(8, "little") + d
    level = [hashlib.sha256(conv(digs[i]) + conv(digs[i + 1])).digest() for i in range(0, n, 2)]
    while len(level) > 1:
        level = [hashlib.sha256(level[i] + level[i + 1]).digest() for i in range(0, len(level), 2)]
    return level[0]

assert tree.root() == oracle_root()
print("4. SHA-256 device tree root == independent hashlib oracle OK")

idx = jnp.arange(n, dtype=jnp.int32)
sib, auth = tree.proof_rows(idx)
ok = tree.verify_rows_batch(tree.root_row(), tree.leaf_digests, idx, sib, auth)
assert bool(np.all(np.asarray(ok)))
bad_root = np.asarray(tree.root_row()).copy()
bad_root[0] ^= 1
ok_bad = tree.verify_rows_batch(jnp.asarray(bad_root), tree.leaf_digests[:8], idx[:8], sib[:8], auth[:8])
assert not bool(np.any(np.asarray(ok_bad)))
print("5. batched device verify all-true; bad root all-false OK")

# 6. error-path probe: malformed shapes must raise a clear ValueError
try:
    tree.verify_rows_batch(tree.root_row(), jnp.asarray(leaves_np[:8]), idx[:8], sib[:8], auth[:8])
    raise SystemExit("expected ValueError for raw leaves")
except ValueError as e:
    assert "leaf hash" in str(e) or "digest rows" in str(e)
print("6. verify_rows_batch raw-leaf misuse -> clear ValueError OK")

# 7. Schnorr sign/verify batch on TE jubjub + tamper reject
from crypto_primitives_tpu.models.signature.schnorr import Schnorr
from crypto_primitives_tpu.ops.curves_known import JUBJUB
sch = Schnorr(JUBJUB)
sp_ = sch.setup(rng)
msgs = [bytes([i] * 32) for i in range(8)]
keys = [sch.keygen(sp_, rng) for _ in range(8)]
sigs = sch.sign_batch(sp_, [k[1] for k in keys], msgs, rng)
oks = sch.verify_batch(sp_, [k[0] for k in keys], msgs, sigs)
assert all(oks)
bad = sch.verify_batch(sp_, [k[0] for k in keys], [b"x" * 32] * 8, sigs)
assert not any(bad)
print("7. Schnorr sign/verify batch + tamper reject OK")

# 8. ElGamal on the SW Pallas curve (round-3 SW RNS tier), round trip
from crypto_primitives_tpu.models.encryption.elgamal import ElGamal
from crypto_primitives_tpu.ops.curves_known import PALLAS
eg = ElGamal(PALLAS)
ep = eg.setup(rng)
pk, sk = eg.keygen(ep, rng)
pts = [PALLAS.rand_point(rng) for _ in range(4)]
cts = eg.encrypt_batch(ep, pk, pts, [rng.randrange(PALLAS.scalar.p) for _ in range(4)])
dec = eg.decrypt_batch(ep, sk, cts)
assert list(dec) == pts
print("8. ElGamal SW-Pallas batch encrypt/decrypt round trip OK")

print("JUDGE DRIVE: ALL OK")
