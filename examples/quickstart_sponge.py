"""Quickstart: the Poseidon sponge, host tier and batched device tier.

The host `PoseidonSponge` is the exact python-int oracle (the twin of the
reference's `PoseidonSponge<F>`, src/sponge/poseidon/mod.rs:124-186); the
`PoseidonSpongeBatch` runs B independent sponges as one array program on
the fastest representation the platform admits (the fused RNS-Montgomery
Pallas kernel on TPU).  Outputs are bit-identical across tiers.

Run: python examples/quickstart_sponge.py
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.sponge import (
    PoseidonSponge,
    PoseidonSpongeBatch,
    get_default_poseidon_parameters,
)
from crypto_primitives_tpu.ops import BLS12_381_FR as FR


def main():
    rng = random.Random(0)
    cfg = get_default_poseidon_parameters(FR, 2, False)  # rate 2, x^17 s-box

    # -- host tier: one sponge, exact ints ------------------------------
    s = PoseidonSponge(cfg)
    inputs = [rng.randrange(FR.p) for _ in range(4)]
    s.absorb_elements(inputs)
    fields = s.squeeze_native_field_elements(2)
    tail = s.squeeze_bytes(16)
    print(f"host squeeze: {fields[0] % 10**8:08d}... + {tail.hex()[:16]}...")

    # -- device tier: B sponges, one dispatch ---------------------------
    B = 4
    rows = [[rng.randrange(FR.p) for _ in range(4)] for _ in range(B)]
    dev = PoseidonSpongeBatch(cfg, batch_shape=(B,))
    dev.absorb(jnp.asarray(FR.pack(rows)))
    dev_fields = dev.squeeze_native_field_elements(2)   # (B, 2, L) limbs
    dev_bytes = np.asarray(dev.squeeze_bytes(16))       # (B, 16) uint8

    # parity: every lane equals its own host oracle
    for i in range(B):
        h = PoseidonSponge(cfg)
        h.absorb_elements(rows[i])
        want = h.squeeze_native_field_elements(2)
        got = [int(v) for v in FR.unpack(np.asarray(dev_fields[i]))]
        assert got == want, (i, got, want)
        assert bytes(dev_bytes[i]) == h.squeeze_bytes(16)
    print(f"device tier ({dev.rep} rep): {B} lanes bit-equal to the host oracle")


if __name__ == "__main__":
    main()
