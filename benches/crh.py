"""Pedersen CRH bench — twin of the reference's criterion harness
(/root/reference/crypto-primitives/benches/crh.rs:12-49: ed-on-bls12-377,
window 250x8, 128-byte input).  Measures batched device throughput."""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from benches._util import emit, timed
from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window
from crypto_primitives_tpu.ops.curves_known import ED_ON_BLS12_377


def main():
    rng = random.Random(0)
    crh = PedersenCRH(ED_ON_BLS12_377, Window(window_size=250, num_windows=8))
    t_setup_start = __import__("time").perf_counter()
    params = crh.setup(rng)
    t_setup = __import__("time").perf_counter() - t_setup_start
    emit("pedersen_crh_setup", t_setup, "s")

    B = int(os.environ.get("BENCH_BATCH", "256"))
    msgs = np.frombuffer(
        bytes(rng.randrange(256) for _ in range(B * 128)), dtype=np.uint8
    ).reshape(B, 128)
    dev = jnp.asarray(msgs)
    t = timed(lambda d: crh.evaluate_batch(params, d), dev)
    emit("pedersen_crh_eval_throughput", B / t, "hashes/s")

    # Bowe-Hopwood CRH evaluate over the same curve (the reference's other
    # CRH workload; src/crh/bowe_hopwood/mod.rs:114-187).  Window sized so
    # the 128-byte input fits the per-segment chunk cap.
    from crypto_primitives_tpu.models.crh.bowe_hopwood import BoweHopwoodCRH

    bh = BoweHopwoodCRH(ED_ON_BLS12_377, Window(window_size=63, num_windows=6))
    bh_params = bh.setup(rng)
    t = timed(lambda d: bh.evaluate_batch(bh_params, d), dev)
    emit("bowe_hopwood_crh_eval_throughput", B / t, "hashes/s")


if __name__ == "__main__":
    main()
