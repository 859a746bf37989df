"""End-to-end drive through the public package boundary on the real TPU.

Covers: sponge pinned vector + mode switches, cross-field squeeze, Merkle
build/prove/verify incl. blank byte-tree (empty Vec<u8> default digests),
Pedersen commit, Schnorr sign/verify, error paths.
"""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np, random

from crypto_primitives_tpu.models.sponge import (
    Felt, PoseidonSponge, PoseidonSpongeBatch, FieldElementSize,
    get_default_poseidon_parameters)
from crypto_primitives_tpu.ops import BLS12_381_FR as FR
from crypto_primitives_tpu.ops.fields_known import JUBJUB_FR

print("devices:", jax.devices())

cfg = get_default_poseidon_parameters(FR, 2, False)
s = PoseidonSponge(cfg); s.absorb([Felt(0), Felt(1), Felt(2)])
assert s.squeeze_native_field_elements(3)[0] == \
    40442793463571304028337753002242186710310163897048962278675457993207843616876
print("sponge pinned vector ok")

# squeeze -> absorb -> squeeze mode switch
s.absorb([Felt(7)])
v = s.squeeze_native_field_elements(1)
assert 0 <= int(v[0]) < FR.p
# cross-field squeeze
xs = s.squeeze_field_elements_with_sizes(JUBJUB_FR, [FieldElementSize.FULL] * 2)
assert all(0 <= int(x) < JUBJUB_FR.p for x in xs)
print("mode switch + cross-field ok")

try:
    s.absorb([object()])
    raise SystemExit("expected TypeError")
except TypeError:
    print("unsupported absorb raises ok")

# Merkle SHA-256 byte tree: build -> prove -> verify -> wrong-root False
from crypto_primitives_tpu.models.crh.sha256 import Sha256CRH, Sha256TwoToOneCRH
from crypto_primitives_tpu.models.merkle_tree import (
    ByteDigestConverter, ByteDigestDomain, MerkleTree, MerkleTreeConfig)

rng = random.Random(7)
mcfg = MerkleTreeConfig(
    leaf_hash=Sha256CRH(), two_to_one_hash=Sha256TwoToOneCRH(),
    leaf_domain=ByteDigestDomain(32), inner_domain=ByteDigestDomain(32),
    leaf_inner_converter=ByteDigestConverter(32))
leaves = [bytes(rng.randrange(256) for _ in range(16)) for _ in range(8)]
leaves_arr = jnp.asarray(
    np.frombuffer(b"".join(leaves), dtype=np.uint8).reshape(8, 16))
tree = MerkleTree.new(mcfg, (), (), leaves_arr)
root = tree.root()
p = tree.generate_proof(3)
assert p.verify(mcfg, (), (), root, leaves[3]) is True
assert p.verify(mcfg, (), (), b"\x00" * 32, leaves[3]) is False
print("merkle build/prove/verify + wrong-root ok")

# blank byte tree: untouched leaf digest is the EMPTY vec; update then verify
blank = MerkleTree.blank(mcfg, (), (), height=4)
blank.update(2, leaves[2])
p2 = blank.generate_proof(2)
assert p2.verify(mcfg, (), (), blank.root(), leaves[2]) is True
assert p2.verify(mcfg, (), (), root, leaves[2]) is False
print("blank tree update/prove ok")

# Pedersen commitment
from crypto_primitives_tpu.models.commitment.pedersen import PedersenCommitment
from crypto_primitives_tpu.models.crh.pedersen import Window
from crypto_primitives_tpu.ops.curves_known import JUBJUB

comm = PedersenCommitment(JUBJUB, Window(4, 192))
params = comm.setup(rng)
c = comm.commit(params, b"hello tpu", comm.rand_randomness(rng))
assert JUBJUB.is_on_curve_host(c) if hasattr(JUBJUB, "is_on_curve_host") else True
print("pedersen commit ok:", type(c))

# Schnorr sign/verify
from crypto_primitives_tpu.models.signature.schnorr import Schnorr
sch = Schnorr(JUBJUB)
sp = sch.setup(rng)
pk, sk = sch.keygen(sp, rng)
sig = sch.sign(sp, sk, b"msg", rng)
assert sch.verify(sp, pk, b"msg", sig) is True
assert sch.verify(sp, pk, b"tampered", sig) is False
print("schnorr ok")

print("ALL DRIVE CHECKS PASSED")
