import jax
if jax.default_backend() != "cpu":  # CPU AOT entries are machine-pinned
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np, random
from crypto_primitives_tpu.models.sponge import (
    Felt, PoseidonSponge, get_default_poseidon_parameters)
from crypto_primitives_tpu.ops import BLS12_381_FR as FR
from crypto_primitives_tpu.ops import rns
from crypto_primitives_tpu.ops.poseidon_rns_pallas import permute_rns

print("devices:", jax.devices())

# public sponge probe (regression)
cfg = get_default_poseidon_parameters(FR, 2, False)
s = PoseidonSponge(cfg); s.absorb([Felt(0), Felt(1), Felt(2)])
assert s.squeeze_native_field_elements(3)[0] == \
    40442793463571304028337753002242186710310163897048962278675457993207843616876
print("sponge pinned vector ok")

# RNS kernel on REAL TPU vs host oracle
P = FR.p
plan = rns.build_plan(P)
rng = random.Random(7)
B = 256
states = [[rng.randrange(P) for _ in range(cfg.t)] for _ in range(B)]
arr = np.asarray([[x * plan.M1 % P for x in row] for row in states], dtype=object)
r1, r2 = rns.to_rns(plan, arr)
dev = jnp.asarray(np.concatenate([r1, r2], axis=-1), dtype=jnp.float32)
out = np.asarray(permute_rns(plan, cfg, dev, block_b=256))
vals = rns.from_rns(plan, out[..., : rns.K])
invM1 = pow(plan.M1, -1, P)
ok = 0
for i in (0, 1, 17, 255):
    oracle = PoseidonSponge(cfg)
    oracle.state = list(states[i])
    oracle.permute()
    got = [int(v) * invM1 % P for v in vals[i]]
    assert got == oracle.state, f"row {i} mismatch"
    ok += 1
print(f"RNS TPU kernel parity ok on {ok} sampled rows of {B}")

# device-resident SHA-256 Merkle tree: build -> prove -> verify -> cross-check
from crypto_primitives_tpu.models.merkle_tree.device import sha256_device_tree
import hashlib
lv = np.frombuffer(bytes(range(256)) * 16, dtype=np.uint8).reshape(128, 32)
t = sha256_device_tree(jnp.asarray(lv))
p5 = t.generate_proof(5)
from crypto_primitives_tpu.models.merkle_tree import (
    MerkleTreeConfig, ByteDigestDomain, ByteDigestConverter)
from crypto_primitives_tpu.models.crh.sha256 import Sha256CRH, Sha256TwoToOneCRH
cfg_b = MerkleTreeConfig(
    leaf_hash=Sha256CRH(), two_to_one_hash=Sha256TwoToOneCRH(),
    leaf_domain=ByteDigestDomain(32), inner_domain=ByteDigestDomain(32),
    leaf_inner_converter=ByteDigestConverter(32))
assert p5.verify(cfg_b, None, None, t.root(), bytes(lv[5]))
assert not p5.verify(cfg_b, None, None, b"\0" * 32, bytes(lv[5]))
idx = jnp.asarray([0, 5, 77, 127], dtype=jnp.int32)
sib, auth = t.proof_rows(idx)
from crypto_primitives_tpu.ops.sha256 import sha256
ok = t.verify_rows_batch(t.root_row(), sha256(jnp.asarray(lv)[np.asarray(idx)]), idx, sib, auth)
assert np.asarray(ok).all()
print("device SHA merkle tree: build/prove/verify ok on TPU")

# device sponge byte/bit/fork tier on TPU vs host oracle
from crypto_primitives_tpu.models.sponge import PoseidonSpongeBatch
db = PoseidonSpongeBatch(cfg, batch_shape=(4,))
db.absorb(jnp.asarray(FR.pack([[i, i + 1] for i in range(4)])))
got_bytes = np.asarray(db.squeeze_bytes(33))
hs = PoseidonSponge(cfg); hs.absorb_elements([2, 3])
assert bytes(got_bytes[2]) == hs.squeeze_bytes(33)
gf = db.fork(b"d").squeeze_native_field_elements(1)
hf = PoseidonSponge(cfg); hf.absorb_elements([2, 3])
assert [int(v) for v in FR.unpack(np.asarray(gf)[2])] == hf.fork(b"d").squeeze_native_field_elements(1)
print("device sponge byte/fork tier ok on TPU")

# canonical serde: proof round-trips bytes and verifies in a fresh context
from crypto_primitives_tpu.utils import canonical as cser
codec = cser.byte_digest_codec()
blob = cser.serialize_path(p5, codec, codec)
p5b = cser.deserialize_path(blob, codec, codec)
assert p5b.verify(cfg_b, None, None, t.root(), bytes(lv[5]))
print("canonical path serde roundtrip ok")
