"""Curve-model dispatch for the RNS fast tier.

The primitives (Pedersen, Schnorr, ElGamal, ...) are generic over the
curve model, the way the reference is generic over ark-ec `CurveGroup`
(e.g. /root/reference/crypto-primitives/src/signature/schnorr/mod.rs:30).
`rns_mod(curve)` returns the ops module implementing the shared RNS API
for that curve (twisted-Edwards: ops/curve_rns.py with the fused Pallas
MSM kernel; short-Weierstrass: ops/curve_sw_rns.py, RCB complete
addition) or None when the modulus exceeds the plan (381-bit BLS12-381
G1 -> limb tier).  Both modules expose: pack_points_rns,
unpack_affine_rns, unpack_points_rns, identity_rns, add_rns, neg_rns,
select_rns, sum_rns, fixed_base_mul_rns, scalar_mul_bits_windowed_rns,
conditional_sum_grouped_auto, msm_many (N MSMs in one device program,
amortizing the per-call dispatch floor), pack_table_grouped,
pack_combos_kernel, to_affine_rns, to_limb_points.
"""

from crypto_primitives_tpu.ops import curve_rns as _te
from crypto_primitives_tpu.ops import curve_sw_rns as _sw


def rns_mod(curve):
    if _te.supports_rns(curve):
        return _te
    if _sw.supports_rns(curve):
        return _sw
    return None
