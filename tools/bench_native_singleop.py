"""Single-op host latencies: native C++ engine vs python-int tier.

VERDICT r3 task 2 done-gate: sign/verify < 1 ms (was 30/56 ms).
Run: python tools/bench_native_singleop.py
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n=20):
    fn()  # warm (engine build, caches)
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3  # ms


def run(tier: str):
    os.environ["CPT_NATIVE"] = "1" if tier == "native" else "0"
    rng = random.Random(42)

    from crypto_primitives_tpu.models.commitment.pedersen import PedersenCommitment
    from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window
    from crypto_primitives_tpu.models.crh.poseidon import PoseidonTwoToOneCRH
    from crypto_primitives_tpu.models.encryption.elgamal import ElGamal
    from crypto_primitives_tpu.models.signature.schnorr import Schnorr
    from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
    from crypto_primitives_tpu.ops.curves_known import ED_ON_BLS12_377 as TE
    from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR

    msg = bytes(range(128))
    sch = Schnorr(TE)
    sp = sch.setup(rng)
    pk, sk = sch.keygen(sp, rng)
    sig = sch.sign(sp, sk, msg, rng)
    rows = {}
    rows["schnorr_sign"] = timeit(lambda: sch.sign(sp, sk, msg, rng))
    rows["schnorr_verify"] = timeit(lambda: sch.verify(sp, pk, msg, sig))

    eg = ElGamal(TE)
    ep = eg.setup(rng)
    epk, esk = eg.keygen(ep, rng)
    m = TE.rand_point(rng)
    r = rng.randrange(TE.scalar.p)
    ct = eg.encrypt(ep, epk, m, r)
    rows["elgamal_encrypt"] = timeit(lambda: eg.encrypt(ep, epk, m, r))
    rows["elgamal_decrypt"] = timeit(lambda: eg.decrypt(ep, esk, ct))

    crh = PedersenCRH(TE, Window(8, 250))  # the reference bench window shape
    cp = crh.setup(rng)
    data = bytes(rng.randrange(256) for _ in range(128))
    rows["pedersen_crh_eval_128B"] = timeit(lambda: crh.evaluate(cp, data), n=5)

    com = PedersenCommitment(TE, Window(8, 250))
    comp = com.setup(rng)
    rr = rng.randrange(TE.scalar.p)
    rows["pedersen_commit_128B"] = timeit(lambda: com.commit(comp, data, rr), n=5)

    cfg = get_default_poseidon_parameters(FR, 2, False)
    two = PoseidonTwoToOneCRH(FR)
    rows["poseidon_compress"] = timeit(lambda: two.compress(cfg, 123, 456), n=50)
    return rows


if __name__ == "__main__":
    nat = run("native")
    py = run("python")
    print(f"{'workload':28s} {'native ms':>10s} {'python ms':>10s} {'speedup':>8s}")
    for k in nat:
        print(f"{k:28s} {nat[k]:10.3f} {py[k]:10.3f} {py[k]/nat[k]:7.1f}x")
