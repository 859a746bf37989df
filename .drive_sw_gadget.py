"""Drive: SW gadget vars through the public package boundary."""
import os
import sys

import jax

if jax.default_backend() != "cpu":  # CPU AOT entries are machine-pinned
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("DRIVE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import random

from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window
from crypto_primitives_tpu.models.sponge import PoseidonSponge, get_default_poseidon_parameters
from crypto_primitives_tpu.models.sponge.absorb import SWPointAbsorb, to_sponge_field_elements
from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1 as G1
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FQ as FQ, BLS12_381_FR as FR
from crypto_primitives_tpu.r1cs import ConstraintSystem
from crypto_primitives_tpu.r1cs.gadgets.absorb import absorb_gadget
from crypto_primitives_tpu.r1cs.gadgets.curve import SWProjectiveVar
from crypto_primitives_tpu.r1cs.gadgets.pedersen import PedersenCRHGadget
from crypto_primitives_tpu.r1cs.vars import bytes_to_uint8s

print("devices:", jax.devices())
rng = random.Random(7)

# 1. SW projective var algebra vs host oracle
cs = ConstraintSystem(FQ)
p1, p2 = G1.rand_point(rng), G1.rand_point(rng)
v1 = SWProjectiveVar.new_witness(cs, G1, p1)
v2 = SWProjectiveVar.new_witness(cs, G1, p2)
assert v1.add(v2).value == G1.add_host(p1, p2)
assert v1.add(v1.negate()).value is None

# 2. absorb gadget == native Absorb encoding (+ the host sponge accepts it)
native = to_sponge_field_elements(SWPointAbsorb(p1[0], p1[1]), FQ)
assert [g.value for g in absorb_gadget(cs, v1)] == native

# 3. unsupported type still raises
try:
    absorb_gadget(cs, object())
    raise SystemExit("expected TypeError")
except TypeError:
    pass

# 4. Pedersen CRH gadget over the SW curve vs native
win = Window(window_size=4, num_windows=8)
crh = PedersenCRH(G1, win)
params = crh.setup(rng)
msg = bytes(rng.randrange(256) for _ in range(4))
out = PedersenCRHGadget(G1, win).evaluate(
    ConstraintSystem(FQ), params, bytes_to_uint8s(ConstraintSystem(FQ), msg)
)
# evaluate needs vars from the same cs; redo properly
cs2 = ConstraintSystem(FQ)
out = PedersenCRHGadget(G1, win).evaluate(cs2, params, bytes_to_uint8s(cs2, msg))
assert out.value == crh.evaluate(params, msg)
assert cs2.is_satisfied()

# 5. a device-tier smoke (exercises the default platform): pinned squeeze
from crypto_primitives_tpu.models.sponge import Felt, PoseidonSpongeBatch
import numpy as np

cfg = get_default_poseidon_parameters(FR, 2, False)
s = PoseidonSponge(cfg)
s.absorb([Felt(0), Felt(1), Felt(2)])
assert (
    s.squeeze_native_field_elements(3)[0]
    == 40442793463571304028337753002242186710310163897048962278675457993207843616876
)
b = PoseidonSpongeBatch(cfg, batch_shape=(4,))
b.absorb(FR.pack([0, 1, 2, 3]))  # (k=4, L): same 4 elems on every lane
got = FR.unpack(np.asarray(b.squeeze_native_field_elements(1)))
h = PoseidonSponge(cfg)
h.absorb([Felt(0), Felt(1), Felt(2), Felt(3)])
want = int(h.squeeze_native_field_elements(1)[0])
assert all(int(got[lane][0]) == want for lane in range(4))
print("DRIVE OK on", jax.default_backend())
