"""Schnorr bench — twin of benches/signature.rs:10-89
(ed-on-bls12-377, 128-byte message; setup/keygen/sign/verify/randomize)."""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches._util import emit
from crypto_primitives_tpu.models.signature.schnorr import Schnorr
from crypto_primitives_tpu.ops.curves_known import ED_ON_BLS12_377


def main():
    rng = random.Random(0)
    scheme = Schnorr(ED_ON_BLS12_377)
    msg = bytes(rng.randrange(256) for _ in range(128))

    t0 = time.perf_counter(); params = scheme.setup(rng)
    emit("schnorr_setup", time.perf_counter() - t0, "s")
    t0 = time.perf_counter(); pk, sk = scheme.keygen(params, rng)
    emit("schnorr_keygen", time.perf_counter() - t0, "s")
    t0 = time.perf_counter(); sig = scheme.sign(params, sk, msg, rng)
    emit("schnorr_sign", time.perf_counter() - t0, "s")
    t0 = time.perf_counter(); ok = scheme.verify(params, pk, msg, sig)
    emit("schnorr_verify_host", time.perf_counter() - t0, "s")
    assert ok
    randomness = bytes(rng.randrange(256) for _ in range(32))
    t0 = time.perf_counter(); scheme.randomize_public_key(params, pk, randomness)
    emit("schnorr_randomize_pk", time.perf_counter() - t0, "s")
    t0 = time.perf_counter(); scheme.randomize_signature(params, sig, randomness)
    emit("schnorr_randomize_sig", time.perf_counter() - t0, "s")

    # TPU-shaped addition: batched device verification
    B = int(os.environ.get("BENCH_BATCH", "64"))
    keys = [scheme.keygen(params, rng) for _ in range(B)]
    msgs = [bytes(rng.randrange(256) for _ in range(128)) for _ in range(B)]
    sigs = scheme.sign_batch(params, [k[1] for k in keys], msgs, rng)  # warmup
    t0 = time.perf_counter()
    sigs = scheme.sign_batch(params, [k[1] for k in keys], msgs, rng)
    emit("schnorr_sign_batch_throughput", B / (time.perf_counter() - t0), "signs/s")
    scheme.verify_batch(params, [k[0] for k in keys], msgs, sigs)  # warmup/compile
    t0 = time.perf_counter()
    oks = scheme.verify_batch(params, [k[0] for k in keys], msgs, sigs)
    dt = time.perf_counter() - t0
    assert all(oks)
    emit("schnorr_verify_batch_throughput", B / dt, "verifies/s")


if __name__ == "__main__":
    main()
