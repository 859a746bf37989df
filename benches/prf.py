"""Blake2s PRF bench — twin of benches/prf.rs:8-23 (32B seed + 32B input)."""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from benches._util import emit, timed
from crypto_primitives_tpu.models.prf.blake2s import Blake2sPRF


def main():
    rng = random.Random(0)
    B = int(os.environ.get("BENCH_BATCH", "65536"))
    seeds = jnp.asarray(
        np.frombuffer(bytes(rng.randrange(256) for _ in range(B * 32)), np.uint8).reshape(B, 32)
    )
    inputs = jnp.asarray(
        np.frombuffer(bytes(rng.randrange(256) for _ in range(B * 32)), np.uint8).reshape(B, 32)
    )
    t = timed(Blake2sPRF.evaluate_batch, seeds, inputs)
    emit("blake2s_prf_throughput", B / t, "evals/s")


if __name__ == "__main__":
    main()
