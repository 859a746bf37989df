"""Round-3 verify drive: the generic sponge/CRH tier on the RNS kernel,
through public package imports, on the real TPU."""

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.sponge import (
    Felt,
    PoseidonSponge,
    PoseidonSpongeBatch,
    get_default_poseidon_parameters,
)
from crypto_primitives_tpu.ops import BLS12_381_FR as FR

assert jax.default_backend() == "tpu", jax.default_backend()
cfg = get_default_poseidon_parameters(FR, 2, False)

# 1. pinned arkworks vector through the DEVICE sponge at B=128 (RNS rep)
B = 128
dev = PoseidonSpongeBatch(cfg, batch_shape=(B,))
assert dev.rep == "rns", f"expected RNS rep on TPU at B={B}, got {dev.rep}"
dev.absorb(jnp.asarray(FR.pack([[0, 1, 2]] * B)))
out = np.asarray(dev.squeeze_native_field_elements(3))
pinned = 40442793463571304028337753002242186710310163897048962278675457993207843616876
vals = [int(v) for v in FR.unpack(out[0])]
assert vals[0] == pinned, vals[0]
assert all(
    [int(v) for v in FR.unpack(out[i])] == vals for i in range(B)
), "batch rows diverge"
print("1. pinned arkworks squeeze vector on RNS device sponge: OK")

# 2. mode-switch schedule parity vs host oracle (squeeze->absorb->squeeze)
r = random.Random(7)
ins = [[r.randrange(FR.p) for _ in range(2)] for _ in range(B)]
dev2 = PoseidonSpongeBatch(cfg, batch_shape=(B,))
dev2.absorb(jnp.asarray(FR.pack(ins)))
b1 = np.asarray(dev2.squeeze_bytes(19))
dev2.absorb(jnp.asarray(FR.pack([[5]] * B)))
b2 = np.asarray(dev2.squeeze_bits(31))
for i in (0, 17, B - 1):
    h = PoseidonSponge(cfg)
    h.absorb_elements(ins[i])
    assert bytes(b1[i]) == h.squeeze_bytes(19)
    h.absorb_elements([5])
    assert b2[i].tolist() == h.squeeze_bits(31)
print("2. mode-switch schedule (bytes->absorb->bits) vs oracle: OK")

# 3. generic TwoToOne compress on device == host compress (the Merkle
#    inner loop, now on the RNS kernel)
from crypto_primitives_tpu.models.crh.poseidon import PoseidonTwoToOneCRH

two = PoseidonTwoToOneCRH(FR)
ls = [r.randrange(FR.p) for _ in range(B)]
rs = [r.randrange(FR.p) for _ in range(B)]
l = jnp.asarray(FR.pack([[x] for x in ls]))[:, 0, :]
rr = jnp.asarray(FR.pack([[x] for x in rs]))[:, 0, :]
got = np.asarray(two.compress_batch(cfg, l, rr))
for i in (0, 3, B - 1):
    assert int(FR.unpack(got[i])) == two.compress(cfg, ls[i], rs[i])
print("3. generic compress_batch on RNS tier == host compress: OK")

# 4. full generic Poseidon Merkle tree on device (leaves hashed + levels
#    compressed through the RNS sponge), root == host tree, proof verifies
from crypto_primitives_tpu.models.crh.poseidon import PoseidonCRH
from crypto_primitives_tpu.models.merkle_tree import (
    FieldDigestDomain,
    IdentityDigestConverter,
    MerkleTree,
    MerkleTreeConfig,
)

mcfg = MerkleTreeConfig(
    PoseidonCRH(FR),
    PoseidonTwoToOneCRH(FR),
    FieldDigestDomain(FR),
    FieldDigestDomain(FR),
    IdentityDigestConverter(),
)
leaves_host = [[r.randrange(FR.p)] for _ in range(256)]
tree = MerkleTree.new(mcfg, cfg, cfg, jnp.asarray(FR.pack(leaves_host)))
root = tree.root()
path = tree.generate_proof(77)
assert path.verify(mcfg, cfg, cfg, root, leaves_host[77]) is True
assert path.verify(mcfg, cfg, cfg, (root + 1) % FR.p, leaves_host[77]) is False
print("4. generic Poseidon Merkle (device build, 256 leaves) + wrong-root reject: OK")

# 5. unsupported absorb type raises
try:
    PoseidonSponge(cfg).absorb(object())
    raise SystemExit("expected TypeError")
except TypeError:
    print("5. absorbing an unsupported type raises TypeError: OK")

# 6. empty-sponge squeeze parity
d0 = PoseidonSpongeBatch(cfg, batch_shape=(64,))
h0 = PoseidonSponge(cfg)
g0 = np.asarray(d0.squeeze_native_field_elements(2))
assert [int(v) for v in FR.unpack(g0[0])] == h0.squeeze_native_field_elements(2)
print("6. empty-sponge squeeze: OK")

print("ALL DRIVE PROBES PASSED (backend=%s)" % jax.default_backend())
