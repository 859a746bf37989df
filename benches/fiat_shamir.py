"""RNS-resident Fiat-Shamir transcript throughput (round-3 verdict
item 9): an R-round folding transcript that never leaves residues
(models/sponge/fiat_shamir.py) vs the raw fused-kernel permutation rate.

The transcript costs R+1 permutations per instance (one per
absorb->squeeze mode switch plus the tag) and ~2 Montgomery reductions
per round of RnsField arithmetic; the claim under test is that the
-14.5% limb<->RNS conversion tax of the generic sponge tier vanishes
for chained pipelines — effective perm/s within ~5% of the raw kernel.
Sponge-based downstream usage being matched:
/root/reference/crypto-primitives/src/sponge/mod.rs:101-154.
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benches._util import emit, timed
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.models.sponge.fiat_shamir import FiatShamirRns
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR


def main():
    rng = random.Random(0)
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B = int(os.environ.get("BENCH_BATCH", "8192"))
    R = int(os.environ.get("BENCH_ROUNDS", "8"))
    rep = None if jax.default_backend() == "tpu" else "rns"

    probe = FiatShamirRns(cfg, batch_shape=(B,), rep=rep)
    f = probe.field
    coms = np.asarray(
        [[rng.randrange(FR.p) for _ in range(R)] for _ in range(B)],
        dtype=object,
    )
    com_rows = jnp.asarray(
        np.stack([f.pack(coms[:, r]) for r in range(R)], axis=0)
    )  # (R, B, 2K)

    def transcript(rows):
        t = FiatShamirRns(cfg, batch_shape=(B,), rep=rep)
        z, bz = None, 0
        for r in range(R):
            row = rows[r]
            t.absorb(row[:, None, :], bound=1)
            c, bc = t.challenge()
            if r == 0:
                z, bz = row, 1
            else:
                z, bz = t.field.mul(z, bz, c, bc)
                z, bz = t.field.add(z, bz, row, 1)
        z, bz = t.field.normalize(z, bz)
        t.absorb(z[:, None, :], bound=bz)
        return t.finalize(1)

    # scalar-sum fetch: a full-result fetch rides the ~15 MB/s tunnel and
    # would dominate the measurement (benches/_util.py caveat)
    jt = jax.jit(lambda rows: jnp.sum(transcript(rows)))
    t_fs = timed(jt, com_rows)
    perms = R + 1  # one per absorb->squeeze switch, plus the tag
    fs_rate = perms * B / t_fs
    emit("fiat_shamir_rns_perm_rate", fs_rate, "perm/s")
    emit("fiat_shamir_transcripts", B / t_fs, "transcripts/s")

    # raw kernel rate on the same shapes/block size
    from crypto_primitives_tpu.ops import rns
    from crypto_primitives_tpu.ops.poseidon_rns_pallas import permute_rns

    plan = rns.build_plan(FR.p)
    states = jnp.zeros((B, cfg.t, 2 * rns.K), jnp.float32)
    blk = 2048 if B >= 2048 else max(128, B)
    interp = jax.default_backend() != "tpu"

    def raw(s):
        # the same number of chained permutations as the transcript, so
        # both sides amortize launch overhead identically
        for _ in range(perms):
            s = permute_rns(plan, cfg, s, block_b=blk, interpret=interp)
        return jnp.sum(s)

    t_raw = timed(jax.jit(raw), states)
    raw_rate = perms * B / t_raw
    emit("poseidon_rns_raw_perm_rate", raw_rate, "perm/s")
    emit("fiat_shamir_vs_raw_kernel", fs_rate / raw_rate, "ratio")


if __name__ == "__main__":
    main()
