"""Round-5 end-to-end drive through the public package boundary (real TPU).

Sections mirror the verify skill's flagship flows plus this round's
changes; each prints one OK line and asserts hard.
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import random

import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend())
rng = random.Random(5)

# 7. round-5: BLS12-381 G1 Pedersen CRH through the fused SW MSM kernel
from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window
from crypto_primitives_tpu.ops import curve_sw_rns as _sw
from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1 as G1

assert _sw.grouped_kernel_ok(G1), "fused SW kernel should engage on TPU"
crh_g1 = PedersenCRH(G1, Window(4, 16))
cp_g1 = crh_g1.setup(rng)
data = bytes(rng.randrange(256) for _ in range(8))
outb = np.asarray(
    crh_g1.evaluate_batch(cp_g1, jnp.asarray(np.frombuffer(data, np.uint8)[None]))
)
x, y = int(G1.base.unpack(outb[0][0])), int(G1.base.unpack(outb[0][1]))
assert (x, y) == crh_g1.evaluate(cp_g1, data)
print("OK 7: G1 Pedersen CRH via fused SW kernel == host oracle")

# 8. round-5: msm_many (one-dispatch N MSMs) parity vs single calls
from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH as _PC
from crypto_primitives_tpu.ops.curve_rns_any import rns_mod
from crypto_primitives_tpu.ops.curves_known import JUBJUB as _JJ

crh_jj = _PC(_JJ, Window(4, 8))
cpj = crh_jj.setup(rng)
ins = [
    jnp.asarray(
        np.asarray([[rng.randrange(256) for _ in range(4)]] * b, np.uint8)
    )
    for b in (1, 2)
]
many = crh_jj.evaluate_batch_rns_many([cpj, cpj], ins)
mod = rns_mod(_JJ)
for n in range(2):
    single = crh_jj.evaluate_batch_rns(cpj, ins[n])
    assert list(mod.unpack_affine_rns(_JJ, np.asarray(many[n]))) == list(
        mod.unpack_affine_rns(_JJ, np.asarray(single))
    )
print("OK 8: msm_many one-dispatch == per-call results")

# 9. round-5: 381-bit Poseidon sponge rides the generalized fused kernel
from crypto_primitives_tpu.models.sponge.poseidon import (
    PoseidonConfig,
    PoseidonSponge,
    PoseidonSpongeBatch as _PSB,
    find_poseidon_ark_and_mds,
)
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FQ as FQ

arkq, mdsq = find_poseidon_ark_and_mds(FQ, 2, 8, 60, 0)
cfq = PoseidonConfig(field=FQ, full_rounds=8, partial_rounds=60, alpha=5,
                     ark=arkq, mds=mdsq, rate=2, capacity=1)
sq = _PSB(cfq, batch_shape=(64,))
assert sq.rep == "rns", sq.rep
val = rng.randrange(FQ.p)
sq.absorb(jnp.asarray(FQ.pack(np.asarray([[val]] * 64, dtype=object))))
gotq = FQ.unpack(np.asarray(sq.squeeze_native_field_elements(1)))
hq = PoseidonSponge(cfq)
hq.absorb_elements([val])
want = hq.squeeze_native_field_elements(1)[0]
assert all(int(gotq[b, 0]) == want for b in range(64))
print("OK 9: 381-bit-field sponge on the fused big-plan kernel == host")

print("ALL DRIVE SECTIONS GREEN")
