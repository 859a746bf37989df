"""Well-known field instances used across the framework.

The reference's test/bench fields (dev-deps at
/root/reference/crypto-primitives/Cargo.toml:60-65): BLS12-381 Fr (in-tree at
src/sponge/test.rs:5-11), ed-on-bls12-381 (JubJub, base field = BLS12-381 Fr),
ed-on-bls12-377 (base field = BLS12-377 Fr).
"""

from crypto_primitives_tpu.ops.field import FieldSpec

# BLS12-381 scalar field (255 bits) — the sponge test field
# (/root/reference/crypto-primitives/src/sponge/test.rs:6: modulus, generator=7)
BLS12_381_FR = FieldSpec(
    "bls12_381_fr",
    52435875175126190479447740508185965837690552500527637822603658699938581184513,
    generator=7,
)

# JubJub (= ed-on-bls12-381) scalar field, 252 bits
JUBJUB_FR = FieldSpec(
    "jubjub_fr",
    6554484396890773809930967563523245729705921265872317281365359162392183254199,
    generator=6,
)

# BLS12-377 scalar field (253 bits) — the base field of ed-on-bls12-377,
# the curve used by the reference's Pedersen benches
# (/root/reference/crypto-primitives/benches/crh.rs:12).
BLS12_377_FR = FieldSpec(
    "bls12_377_fr",
    8444461749428370424248824938781546531375899335154063827935233455917409239041,
    generator=22,
)

# ed-on-bls12-377 scalar field, 251 bits
ED_ON_BLS12_377_FR = FieldSpec(
    "ed_on_bls12_377_fr",
    2111115437357092606062206234695386632838870926408408195193685246394721360383,
)

ALL_FIELDS = [BLS12_381_FR, JUBJUB_FR, BLS12_377_FR, ED_ON_BLS12_377_FR]

# BLS12-381 base field (381 bits) — the SW G1 coordinate field
BLS12_381_FQ = FieldSpec(
    "bls12_381_fq",
    0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB,
)
