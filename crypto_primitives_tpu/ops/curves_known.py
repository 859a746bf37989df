"""Known twisted-Edwards curve instances.

The reference's test/bench curves (dev-deps,
/root/reference/crypto-primitives/Cargo.toml:60-65): ed-on-bls12-381 (JubJub)
and ed-on-bls12-377.  Both have a = -1 (square) and d nonsquare, so the
unified TE addition law is complete.

NOTE on generators: our deterministic base points are derived from the curve
equation (smallest admissible x, even y, cofactor-cleared); the reference's
named GENERATOR_X/Y constants are not reproduced.  Nothing in the primitive
layer depends on the standard generator — every scheme's `setup` samples its
own generators from an RNG (e.g. src/crh/pedersen/mod.rs:40-56,
src/signature/schnorr/mod.rs setup).
"""

import functools

from crypto_primitives_tpu.ops.curve import TECurveSpec
from crypto_primitives_tpu.ops.fields_known import (
    BLS12_377_FR,
    BLS12_381_FR,
    ED_ON_BLS12_377_FR,
    JUBJUB_FR,
)

_q381 = BLS12_381_FR.p
# JubJub: a = -1, d = -(10240/10241) mod q
JUBJUB = TECurveSpec(
    "jubjub",
    base=BLS12_381_FR,
    scalar=JUBJUB_FR,
    a=-1,
    d=(-10240 * pow(10241, -1, _q381)) % _q381,
    cofactor=8,
)

# ed-on-bls12-377: a = -1, d = 3021
ED_ON_BLS12_377 = TECurveSpec(
    "ed_on_bls12_377",
    base=BLS12_377_FR,
    scalar=ED_ON_BLS12_377_FR,
    a=-1,
    d=3021,
    cofactor=4,
)


@functools.cache
def deterministic_generator(curve: TECurveSpec):
    """Smallest-x admissible prime-order point (even y), cofactor-cleared."""
    p = curve.base.p
    x = 1
    while True:
        denom = (1 - curve.d * x * x) % p
        if denom != 0:
            y2 = (1 - curve.a * x * x) * pow(denom, -1, p) % p
            y = curve.sqrt_host(y2)
            if y is not None:
                y = min(y, p - y)
                pt = curve.scalar_mul_host((x, y), curve.cofactor)
                if pt != (0, 1):
                    return pt
        x += 1


JUBJUB.generator = deterministic_generator(JUBJUB)
ED_ON_BLS12_377.generator = deterministic_generator(ED_ON_BLS12_377)


# ----------------------------------------------------------------------
# Short-Weierstrass instances (ops/curve_sw.py) — the reference's
# primitives are generic over any ark-ec CurveGroup incl. SW
# (src/sponge/absorb.rs:263-282); BLS12-381 G1 is the canonical example.
# ----------------------------------------------------------------------

from crypto_primitives_tpu.ops.curve_sw import SWCurveSpec
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FQ

BLS12_381_G1 = SWCurveSpec(
    "bls12_381_g1",
    base=BLS12_381_FQ,
    scalar=BLS12_381_FR,
    a=0,
    b=4,
    cofactor=0x396C8C005555E1568C00AAAB0000AAAB,
    generator=(
        3685416753713387016781088315183077757961620795782546409894578378688607592378376318836054947676345821548104185464507,
        1339506544944476473020471379941921221584933875938349620426543736416511423956333506472724655353366534992391756441569,
    ),
)
assert BLS12_381_G1.is_on_curve(BLS12_381_G1.generator)


# Pallas (the ZCash "pasta" cycle half): y^2 = x^3 + 5 over a 255-bit
# base field — an SW curve whose modulus FITS the RNS-Montgomery plan
# (ops/rns.py covers ~256-bit primes), so SW-instantiated primitives get
# the same fast tier TE curves do (ops/curve_sw_rns.py).  Generator
# (-1, 2), cofactor 1 (prime order).
from crypto_primitives_tpu.ops.field import FieldSpec

PALLAS_FP = FieldSpec(
    "pallas_fp",
    0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001,
)
PALLAS_FQ = FieldSpec(
    "pallas_fq",
    0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001,
)

PALLAS = SWCurveSpec(
    "pallas",
    base=PALLAS_FP,
    scalar=PALLAS_FQ,
    a=0,
    b=5,
    cofactor=1,
    generator=(PALLAS_FP.p - 1, 2),
)
assert PALLAS.is_on_curve(PALLAS.generator)
