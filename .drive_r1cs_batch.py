import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import random

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.sponge import (
    Felt, PoseidonSponge, get_default_poseidon_parameters)
from crypto_primitives_tpu.ops import BLS12_381_FR as FR
from crypto_primitives_tpu.r1cs.batch import BatchConstraintSystem
from crypto_primitives_tpu.r1cs.cs import ConstraintSystem
from crypto_primitives_tpu.r1cs.gadgets.poseidon import PoseidonTwoToOneCRHGadget
from crypto_primitives_tpu.r1cs.vars import FpVar

# pinned arkworks sponge vector still green through the public boundary
cfg = get_default_poseidon_parameters(FR, 2, False)
s = PoseidonSponge(cfg)
s.absorb([Felt(0), Felt(1), Felt(2)])
assert s.squeeze_native_field_elements(3)[0] == \
    40442793463571304028337753002242186710310163897048962278675457993207843616876
print("pinned sponge vector: OK")

rng = random.Random(7)
g = PoseidonTwoToOneCRHGadget(cfg)
N = 256
ls = [rng.randrange(FR.p) for _ in range(N)]
rs = [rng.randrange(FR.p) for _ in range(N)]

# scalar synthesis of instance 0 (ground truth structure + output)
scs = ConstraintSystem(FR)
out_s = g.compress(scs, FpVar.new_witness(scs, ls[0]), FpVar.new_witness(scs, rs[0]))
assert scs.is_satisfied()

# batched synthesis of all N instances as one trace
bcs = BatchConstraintSystem(FR, N)
lcol = jnp.asarray(FR.pack([[x] for x in ls]))[:, 0, :]
rcol = jnp.asarray(FR.pack([[x] for x in rs]))[:, 0, :]
out_b = g.compress(bcs, FpVar.new_witness(bcs, lcol), FpVar.new_witness(bcs, rcol))

assert bcs.num_constraints == scs.num_constraints, (
    bcs.num_constraints, scs.num_constraints)
assert bcs.num_witness == scs.num_witness
print(f"constraint counts identical per instance: {bcs.num_constraints}")

# instance-0 output value matches the scalar synthesis
assert bcs.value_host(out_b.value, 0) == out_s.value
# every instance matches the host oracle compress
from crypto_primitives_tpu.models.crh.poseidon import PoseidonTwoToOneCRH
for i in (0, 1, N - 1):
    want = PoseidonTwoToOneCRH(FR).compress(cfg, ls[i], rs[i])
    assert bcs.value_host(out_b.value, i) == want, i
print("batched outputs == host oracle (spot instances)")

# whole-batch device satisfaction + a corrupted instance is caught
ok = bcs.satisfied_per_instance()
assert ok.shape == (N,) and bool(jnp.all(ok))
bad = np.asarray(bcs.assignments[3])
bad = np.array(np.broadcast_to(bad, (N, FR.num_limbs)))
bad[17] = (bad[17] + 1) % 65536
bcs.assignments[3] = jnp.asarray(bad)
ok2 = np.asarray(bcs.satisfied_per_instance())
assert not ok2[17] and ok2[(np.arange(N) != 17)].all()
print("device check: all satisfied; corrupted instance 17 caught")

# misuse probe: host eval path should raise a clear error
try:
    bcs.eval_lc(None)
    raise SystemExit("expected NotImplementedError")
except NotImplementedError as e:
    print(f"eval_lc misuse raises: {e}")
print("DRIVE OK")

# scalar-tier device check through the public boundary (pair-dedup path)
from crypto_primitives_tpu.r1cs.device_check import check_satisfied_device
assert check_satisfied_device(scs)
scs.assignments[2] = (scs.assignments[2] + 1) % FR.p
assert not check_satisfied_device(scs)
print("scalar device check: satisfied + corruption caught")
print("DRIVE2 OK")
