import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import random

from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.ops import BLS12_381_FR as FR
from crypto_primitives_tpu.r1cs.cs import ConstraintSystem
from crypto_primitives_tpu.r1cs.device_check import check_satisfied_device
from crypto_primitives_tpu.r1cs.gadgets.poseidon import PoseidonTwoToOneCRHGadget
from crypto_primitives_tpu.r1cs.vars import FpVar

rng = random.Random(1)
cfg = get_default_poseidon_parameters(FR, 2, False)
g = PoseidonTwoToOneCRHGadget(cfg)
cs = ConstraintSystem(FR)
x = FpVar.new_witness(cs, rng.randrange(FR.p))
for _ in range(8):
    x = g.compress(cs, x, x)
assert cs.is_satisfied()
assert check_satisfied_device(cs)
cs.assignments[5] = (cs.assignments[5] + 1) % FR.p
assert not check_satisfied_device(cs)
print(f"device check on TPU: {cs.num_constraints} constraints, "
      "satisfied + corruption caught")
print("DRIVE OK")
