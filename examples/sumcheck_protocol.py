"""A full interactive-oracle protocol on the TPU fast tier: sumcheck.

This is what the sponge module exists for downstream (the reference's
`CryptographicSponge` powers Fiat-Shamir in Marlin/Groth16 pipelines,
src/sponge/mod.rs:101-154): a batched multilinear sumcheck whose prover
runs entirely in RNS residues on the Poseidon transcript
(`FiatShamirRns`) — commitments absorbed, challenges squeezed, rounds
folded — without ever leaving the fast representation, and whose
transcript is bit-identical to the exact python-int host prover.

Run: python examples/sumcheck_protocol.py
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.protocols.sumcheck import (
    sumcheck_prove_host,
    sumcheck_prove_rns,
    sumcheck_verify_host,
)
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.models.sponge.fiat_shamir import FiatShamirRns
from crypto_primitives_tpu.ops import BLS12_381_FR as FR


def main():
    rng = random.Random(3)
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B, m = 2, 3  # two instances over {0,1}^3, proven in parallel

    table = np.asarray(
        [[rng.randrange(FR.p) for _ in range(1 << m)] for _ in range(B)],
        dtype=object,
    )

    # device prover: one array program, transcript in residues end-to-end
    f = FiatShamirRns(cfg, batch_shape=(B,), rep="rns").field
    s_row, rounds, final_row = sumcheck_prove_rns(cfg, jnp.asarray(f.pack(table)), rep="rns")

    # host oracle twin: exact ints, same transcript schedule
    sums, rounds_h, chals, finals = sumcheck_prove_host(cfg, table)

    s_dev = [int(v) for v in f.unpack(np.asarray(s_row))]
    fin_dev = [int(v) for v in f.unpack(np.asarray(final_row))]
    assert s_dev == list(sums) and fin_dev == list(finals)
    print(f"claimed sums match across tiers: {[s % 10**8 for s in s_dev]}...")

    # the host verifier accepts the device prover's transcript...
    per_instance_msgs = []
    for b in range(B):
        msgs = [
            (int(f.unpack(np.asarray(p0))[b]), int(f.unpack(np.asarray(p1))[b]))
            for p0, p1 in rounds
        ]
        per_instance_msgs.append(msgs)
        assert sumcheck_verify_host(cfg, s_dev[b], msgs, fin_dev[b])
    # ...and rejects a forged claimed sum against that SAME instance's own
    # round messages and final value (soundness via Fiat-Shamir)
    assert not sumcheck_verify_host(
        cfg, (s_dev[0] + 1) % FR.p, per_instance_msgs[0], fin_dev[0]
    )
    print(f"{B} sumcheck transcripts verified; forged claim rejected")


if __name__ == "__main__":
    main()
