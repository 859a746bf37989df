"""Verify drive: public-boundary sanity + the bench.py variant machinery.

The axon TPU tunnel is currently hung (jax.devices() blocks), so this
drive forces CPU — it exercises the same public package surface bench.py
and tools/bench_rns_kernel.py touch, plus the standard probes.
"""

import jax

jax.config.update("jax_platforms", "cpu")
# no persistent cache here: CPU-forced runs would write machine-pinned
# XLA:CPU AOT entries into the TPU cache (SIGILL on other hosts)

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.sponge import (
    Felt,
    PoseidonSponge,
    PoseidonSpongeBatch,
    get_default_poseidon_parameters,
)
from crypto_primitives_tpu.ops import BLS12_381_FR as FR
from crypto_primitives_tpu.ops import rns
from crypto_primitives_tpu.ops.poseidon_rns_pallas import _build_rns_permute

cfg = get_default_poseidon_parameters(FR, 2, False)

# pinned arkworks vector through the public sponge
s = PoseidonSponge(cfg)
s.absorb([Felt(0), Felt(1), Felt(2)])
assert s.squeeze_native_field_elements(3)[0] == (
    40442793463571304028337753002242186710310163897048962278675457993207843616876
)
print("pinned squeeze vector OK", flush=True)

# squeeze -> absorb -> squeeze mode switch
s2 = PoseidonSponge(cfg)
s2.absorb([Felt(7)])
_ = s2.squeeze_native_field_elements(1)
s2.absorb([Felt(8)])
v = s2.squeeze_native_field_elements(1)
assert 0 < v[0] < FR.p
print("mode-switch probe OK", flush=True)

# the exact builder bench.py uses: dense and sparse variants, interpret
# mode (no TPU), bit-exact vs the host oracle on a random batch
plan = rns.build_plan(FR.p)
import random

rng = random.Random(1234)
B = 4
states = [[rng.randrange(FR.p) for _ in range(cfg.t)] for _ in range(B)]
expect = []
for st in states:
    sp = PoseidonSponge(cfg)
    sp.state = list(st)
    sp.permute()
    expect.append(list(sp.state))

M1 = plan.M1
arr = np.asarray([[x * M1 % FR.p for x in row] for row in states], dtype=object)
r1, r2 = rns.to_rns(plan, arr)
dev = jnp.asarray(np.concatenate([r1, r2], axis=-1), dtype=jnp.float32)
inv = pow(M1, -1, FR.p)
for name, sparse in (("dense", False), ("sparse", True)):
    perm = _build_rns_permute(plan, cfg, B, True, sparse=sparse)
    out = np.asarray(perm(dev))
    vals = rns.from_rns(plan, out[..., : rns.K])
    got = [[int(v) * inv % FR.p for v in row] for row in vals.tolist()]
    assert got == expect, name
    print(f"RNS {name} variant bit-exact vs host oracle (interpret)", flush=True)

# wrong-type absorb must raise
try:
    PoseidonSponge(cfg).absorb(object())
    raise AssertionError("expected TypeError")
except TypeError:
    print("unsupported-absorb TypeError OK", flush=True)

print("DRIVE PASSED", flush=True)
