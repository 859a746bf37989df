"""Capture an XProf/TensorBoard trace of the RNS Poseidon kernel.

Writes `profiles/plugins/profile/<run>/*.xplane.pb` — open with
TensorBoard's profile plugin (or xprof) to see the Mosaic kernel's device
timeline and per-op cost attribution.  Run on the real TPU via the driver
environment; also works on CPU (interpreter kernel) for smoke checks.

Usage: PYTHONPATH=/root/repo python tools/profile_rns.py [batch]
"""

import sys

import jax

if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.ops import rns
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.ops.poseidon_rns_pallas import permute_rns
from crypto_primitives_tpu.utils import profiling


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    on_tpu = jax.default_backend() == "tpu"
    cfg = get_default_poseidon_parameters(FR, 2, False)
    plan = rns.build_plan(FR.p)
    state = jnp.zeros((B, cfg.t, 2 * rns.K), jnp.float32)
    kw = dict(block_b=2048 if on_tpu else 128, interpret=not on_tpu)
    # warm (compile outside the trace window)
    np.asarray(jnp.sum(permute_rns(plan, cfg, state, **kw)))
    with profiling.capture("profiles") as d:
        with profiling.annotate("poseidon_rns_permute"):
            out = permute_rns(plan, cfg, state, **kw)
            np.asarray(jnp.sum(out))  # force through the tunnel
    print(f"trace written under {d}/plugins/profile/")


if __name__ == "__main__":
    main()
