"""Search RNS base-1 prime sets whose Kawamura quotient coefficients are
all quadratic residues (the v6.6 sqrt-sigma twisted s-box domain).

The RNS-Montgomery quotient stage computes, per base-1 residue,
    s1_i = w_i * sigma_i mod m_i,   sigma_i = -p^{-1} (M1/m_i)^{-1} mod m_i
(ops/rns.py c_sigma).  If every sigma_i is a QR mod m_i, operands can be
stored pre-twisted by sqrt(sigma_i): the product of two twisted operands
IS the quotient coefficient, and the per-mont-op const-mul + second
Barrett red on the base-1 rows disappear (~12% of s-box lane-ops).

sigma_i depends on the whole base through M1, so each candidate set is an
independent ~2^-K coin flip; the search is random restarts with early
exit on the first non-residue.  Found sets are meant to be pinned into
ops/rns.py SIGMA_QR_BASES.

Usage: python tools/find_sigma_qr_bases.py [field_name ...]
"""

import random
import sys
import time

sys.path.insert(0, "/root/repo")

from crypto_primitives_tpu.ops import fields_known as fk
from crypto_primitives_tpu.ops.rns import K


def primes_in(lo, hi):
    out = []
    for x in range(lo, hi):
        if x > 1 and all(x % d for d in range(2, int(x**0.5) + 1)):
            out.append(x)
    return out


def search(p: int, seed: int = 0, max_trials: int = 60_000_000):
    """Find (b1, b2): all sigma_i QR mod m_i over b1; M1 > 56p (the curve
    tier's bound_a*bound_b <= M1//p = 55 domain must survive the repin);
    M2 > 16p (beta=4 fixpoint); b2 = the largest remaining primes.
    Returns (b1, b2, trials) or None."""
    pool = primes_in(1025, 2048)
    pool.sort(reverse=True)
    # M1 needs ~2^260.8 and M2 ~2^259: both bases must come from the very
    # top of the 11-bit range, with the split slightly M1-heavy
    cand = pool[:50]
    m1_floor = 56 * p
    m2_floor = 16 * p
    rng = random.Random(seed)
    t0 = time.time()
    for trial in range(max_trials):
        b1 = rng.sample(cand, K)
        M1 = 1
        for m in b1:
            M1 *= m
        if M1 <= m1_floor:
            continue
        rest = [q for q in pool if q not in b1]
        b2 = rest[:K]
        M2 = 1
        for m in b2:
            M2 *= m
        if M2 <= m2_floor:
            continue
        ok = True
        for m in b1:
            # sigma = -p^{-1} (M1/m)^{-1} mod m ; QR test via Euler
            s = (-pow(p, -1, m) * pow(M1 // m, -1, m)) % m
            if s == 0 or pow(s, (m - 1) // 2, m) != 1:
                ok = False
                break
        if not ok:
            continue
        dt = time.time() - t0
        print(f"found after {trial + 1} trials ({dt:.0f}s); "
              f"M1//p={M1 // p} M2//p={M2 // p}")
        return sorted(b1, reverse=True), b2, trial + 1
    return None


def main():
    names = sys.argv[1:] or ["BLS12_381_FR"]
    for name in names:
        spec = getattr(fk, name)
        p = spec.p
        print(f"== {name} (p ~ 2^{p.bit_length()}) ==")
        res = search(p)
        if res is None:
            print("no set found")
            continue
        b1, b2, _ = res
        print(f"    {p}: (")
        print(f"        {tuple(b1)},")
        print(f"        {tuple(b2)},")
        print(f"    ),")


if __name__ == "__main__":
    main()
