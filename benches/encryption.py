"""ElGamal bench — the reference has no criterion file for encryption
(src/encryption/elgamal/mod.rs has tests only); this mirrors the signature
bench's shape: single-op latencies plus TPU-shaped batch throughput
(encrypt_batch = two fixed-base MSMs + point add; decrypt_batch = one
variable-base scalar mul + sub per ciphertext)."""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches._util import emit
from crypto_primitives_tpu.models.encryption.elgamal import ElGamal
from crypto_primitives_tpu.ops.curves_known import ED_ON_BLS12_377


def main():
    rng = random.Random(0)
    scheme = ElGamal(ED_ON_BLS12_377)

    t0 = time.perf_counter(); params = scheme.setup(rng)
    emit("elgamal_setup", time.perf_counter() - t0, "s")
    t0 = time.perf_counter(); pk, sk = scheme.keygen(params, rng)
    emit("elgamal_keygen", time.perf_counter() - t0, "s")
    msg = ED_ON_BLS12_377.rand_point(rng)
    r = scheme.rand_randomness(rng)
    t0 = time.perf_counter(); ct = scheme.encrypt(params, pk, msg, r)
    emit("elgamal_encrypt", time.perf_counter() - t0, "s")
    t0 = time.perf_counter(); pt = scheme.decrypt(params, sk, ct)
    emit("elgamal_decrypt", time.perf_counter() - t0, "s")
    assert pt == msg

    B = int(os.environ.get("BENCH_BATCH", "64"))
    msgs = [ED_ON_BLS12_377.rand_point(rng) for _ in range(B)]
    rands = [scheme.rand_randomness(rng) for _ in range(B)]
    cts = scheme.encrypt_batch(params, pk, msgs, rands)  # warmup/compile
    t0 = time.perf_counter()
    cts = scheme.encrypt_batch(params, pk, msgs, rands)
    emit("elgamal_encrypt_batch_throughput", B / (time.perf_counter() - t0), "enc/s")
    pts = scheme.decrypt_batch(params, sk, cts)  # warmup/compile
    t0 = time.perf_counter()
    pts = scheme.decrypt_batch(params, sk, cts)
    dt = time.perf_counter() - t0
    assert pts == msgs
    emit("elgamal_decrypt_batch_throughput", B / dt, "dec/s")


if __name__ == "__main__":
    main()
