"""BLS12-381 G1 (381-bit base, big RNS plan) vs Pallas (255-bit, legacy
plan) batch rates on the chip — VERDICT r3 task 1 done-gate: G1 within
~3x of the Pallas-curve rates.

Run on the real TPU: python tools/bench_g1_rns.py [B]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def bench_curve(curve, name, B, rng):
    from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window
    from crypto_primitives_tpu.models.encryption.elgamal import ElGamal
    from crypto_primitives_tpu.models.signature.schnorr import Schnorr

    import jax.numpy as jnp

    rows = {}
    sch = Schnorr(curve)
    sp = sch.setup(rng)
    keys = sch.keygen_batch(sp, rng, B)  # warm
    t0 = time.perf_counter()
    keys = sch.keygen_batch(sp, rng, B)
    rows["keygen"] = B / (time.perf_counter() - t0)
    msgs = [bytes(rng.randrange(256) for _ in range(128)) for _ in range(B)]
    sigs = sch.sign_batch(sp, [k[1] for k in keys], msgs, rng)  # warm
    t0 = time.perf_counter()
    sigs = sch.sign_batch(sp, [k[1] for k in keys], msgs, rng)
    rows["sign"] = B / (time.perf_counter() - t0)
    oks = sch.verify_batch(sp, [k[0] for k in keys], msgs, sigs)  # warm
    assert all(oks)
    t0 = time.perf_counter()
    sch.verify_batch(sp, [k[0] for k in keys], msgs, sigs)
    rows["verify"] = B / (time.perf_counter() - t0)

    eg = ElGamal(curve)
    ep = eg.setup(rng)
    epk, esk = eg.keygen(ep, rng)
    m_pts = [curve.rand_point(rng) for _ in range(B)]
    rs = [rng.randrange(curve.scalar.p) for _ in range(B)]
    cts = eg.encrypt_batch(ep, epk, m_pts, rs)  # warm
    t0 = time.perf_counter()
    cts = eg.encrypt_batch(ep, epk, m_pts, rs)
    rows["encrypt"] = B / (time.perf_counter() - t0)
    eg.decrypt_batch(ep, esk, cts)  # warm
    t0 = time.perf_counter()
    got = eg.decrypt_batch(ep, esk, cts)
    rows["decrypt"] = B / (time.perf_counter() - t0)
    assert list(got) == m_pts

    crh = PedersenCRH(curve, Window(8, 250))
    cp = crh.setup(rng)
    data = np.random.default_rng(0).integers(0, 256, size=(B, 128)).astype(np.uint8)
    out = crh.evaluate_batch(cp, jnp.asarray(data))  # warm
    np.asarray(out)
    t0 = time.perf_counter()
    np.asarray(crh.evaluate_batch(cp, jnp.asarray(data)))
    rows["pedersen_crh_128B"] = B / (time.perf_counter() - t0)

    for k, v in rows.items():
        print(f"{name:10s} {k:20s} {v:10.1f} /s")
    return rows


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    print("backend:", jax.default_backend(), " B =", B)
    from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1, PALLAS

    rng = random.Random(0)
    pal = bench_curve(PALLAS, "pallas", B, rng)
    g1 = bench_curve(BLS12_381_G1, "g1", B, rng)
    print("\nratio (pallas/g1, gate <= ~3x):")
    for k in pal:
        print(f"  {k:20s} {pal[k] / g1[k]:6.2f}x")


if __name__ == "__main__":
    main()
