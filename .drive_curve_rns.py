"""Verify drive: RNS curve path through the public package boundary.

CPU-forced (axon TPU tunnel hung this session); exercises the new
ops/rns_xla.py + ops/curve_rns.py modules end-to-end: pack -> conditional
sum -> device CRT conversion to limb points -> affine, vs the host oracle.
"""

import random

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.ops import curve_rns as cr
from crypto_primitives_tpu.ops.curves_known import JUBJUB

curve = JUBJUB
rng = random.Random(99)
pts = [curve.rand_point(rng) for _ in range(16)]
bits_np = np.asarray([[rng.randrange(2) for _ in range(16)] for _ in range(3)], np.uint8)

table = jnp.asarray(cr.pack_points_rns(curve, pts))
acc = cr.te_conditional_sum_rns(curve, table, jnp.asarray(bits_np), chunk=8)
limbs = np.asarray(cr.to_limb_points(curve, acc))
aff = curve.unpack_points(limbs)
for i in range(3):
    want = curve.zero_host()
    for j in range(16):
        if bits_np[i, j]:
            want = curve.add_host(want, pts[j])
    assert aff[i] == want, i
print("conditional-sum + device CRT conversion OK", flush=True)

k = rng.randrange(curve.scalar.p)
bits = jnp.asarray([(k >> i) & 1 for i in range(curve.scalar.p.bit_length())], jnp.uint8)
got = cr.te_scalar_mul_bits_rns(curve, jnp.asarray(cr.pack_points_rns(curve, pts[0])), bits)
assert cr.unpack_points_rns(curve, np.asarray(got)) == curve.scalar_mul_host(pts[0], k)
print("scalar-mul OK", flush=True)
print("DRIVE PASSED", flush=True)
