import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import random

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.sponge import (
    Felt, PoseidonSponge, PoseidonSpongeBatch, get_default_poseidon_parameters)
from crypto_primitives_tpu.ops import BLS12_381_FR as FR

# pinned arkworks vector still green after the base repin + twisted kernel
cfg = get_default_poseidon_parameters(FR, 2, False)
s = PoseidonSponge(cfg)
s.absorb([Felt(0), Felt(1), Felt(2)])
assert s.squeeze_native_field_elements(3)[0] == \
    40442793463571304028337753002242186710310163897048962278675457993207843616876
print("pinned sponge vector: OK")

# device sponge batch (rides the RNS kernel on TPU) == host oracle
rng = random.Random(11)
B = 512
rows = [[rng.randrange(FR.p) for _ in range(5)] for _ in range(B)]
dev = PoseidonSpongeBatch(cfg, batch_shape=(B,))
dev.absorb(jnp.asarray(FR.pack(rows)))
got = np.asarray(dev.squeeze_native_field_elements(2))
for i in (0, 1, B // 2, B - 1):
    h = PoseidonSponge(cfg)
    h.absorb_elements(rows[i])
    want = h.squeeze_native_field_elements(2)
    assert [int(FR.unpack(got[i, j])) for j in range(2)] == want, i
print(f"device sponge batch (B={B}) == host oracle")

# device Merkle tree on the Poseidon RNS path still round-trips
from crypto_primitives_tpu.models.merkle_tree.device import poseidon_rns_device_tree
from crypto_primitives_tpu.ops import rns
plan = rns.build_plan(FR.p)
leaves = [rng.randrange(FR.p) for _ in range(1 << 10)]
arr = np.asarray([x * plan.M1 % FR.p for x in leaves], dtype=object)
r1, r2 = rns.to_rns(plan, arr)
leaf_rns = jnp.asarray(np.concatenate([r1, r2], axis=-1), jnp.float32)
t = poseidon_rns_device_tree(FR, cfg, leaf_rns)
root = int(t.root())
from crypto_primitives_tpu.models.crh.poseidon import PoseidonCRH, PoseidonTwoToOneCRH

lvl = [PoseidonCRH(FR).evaluate(cfg, [x]) for x in leaves]
two = PoseidonTwoToOneCRH(FR)
while len(lvl) > 1:
    lvl = [two.compress(cfg, lvl[i], lvl[i + 1]) for i in range(0, len(lvl), 2)]
assert root == lvl[0], "device tree root != host fold root"
print("2^10-leaf Poseidon device tree root == host fold root")
print("DRIVE OK")
