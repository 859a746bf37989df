"""Pedersen commitment bench — twin of benches/comm.rs:9-52
(ed-on-bls12-377, window 250x8, random blinding)."""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from benches._util import emit, timed
from crypto_primitives_tpu.models.commitment.pedersen import PedersenCommitment
from crypto_primitives_tpu.models.crh.pedersen import Window
from crypto_primitives_tpu.ops.curves_known import ED_ON_BLS12_377


def main():
    rng = random.Random(0)
    comm = PedersenCommitment(ED_ON_BLS12_377, Window(window_size=250, num_windows=8))
    t0 = time.perf_counter()
    params = comm.setup(rng)
    emit("pedersen_comm_setup", time.perf_counter() - t0, "s")

    B = int(os.environ.get("BENCH_BATCH", "128"))
    msgs = np.frombuffer(
        bytes(rng.randrange(256) for _ in range(B * 128)), dtype=np.uint8
    ).reshape(B, 128)
    rand = [comm.rand_randomness(rng) for _ in range(B)]
    rbits = jnp.asarray(comm.randomness_to_bits(rand))
    dev = jnp.asarray(msgs)
    t = timed(lambda d, r: comm.commit_batch(params, d, r), dev, rbits)
    emit("pedersen_comm_throughput", B / t, "commits/s")


if __name__ == "__main__":
    main()
