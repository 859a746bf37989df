"""Round-4 verify drive: run every examples/ script on the REAL TPU
(default platform) in one process, plus the pinned arkworks sponge vector
through the public boundary."""

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import runpy

print("devices:", jax.devices())

from crypto_primitives_tpu.models.sponge import (
    Felt, PoseidonSponge, get_default_poseidon_parameters)
from crypto_primitives_tpu.ops import BLS12_381_FR as FR

cfg = get_default_poseidon_parameters(FR, 2, False)
s = PoseidonSponge(cfg)
s.absorb([Felt(0), Felt(1), Felt(2)])
assert s.squeeze_native_field_elements(3)[0] == \
    40442793463571304028337753002242186710310163897048962278675457993207843616876
print("pinned arkworks sponge vector: ok")

for name in ("quickstart_sponge", "merkle_membership",
             "sign_encrypt_commit", "sumcheck_protocol"):
    print(f"--- examples/{name}.py ---")
    runpy.run_path(f"/root/repo/examples/{name}.py", run_name="__main__")

# the multichip example pins its own virtual CPU mesh -> fresh process
import os, subprocess, sys
print("--- examples/multichip_sharding.py (subprocess) ---")
env = dict(os.environ); env.pop("XLA_FLAGS", None)
subprocess.run([sys.executable, "/root/repo/examples/multichip_sharding.py"],
               check=True, env=env, timeout=300)
print("ALL EXAMPLES PASS ON", jax.devices()[0].platform)
