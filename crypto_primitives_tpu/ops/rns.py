"""RNS-Montgomery plan for f32/bf16 TPU field multiplication.

Represents BLS12-381 Fr elements (and any odd-prime field < 2^{~268}) in a
residue number system over two bases of K eleven-bit primes each.  Field
multiplication becomes per-residue f32 work (products < 2^24 stay exact in
f32) plus two Kawamura-style base extensions, each a single exact bf16
matmul over 6-bit digit planes — MXU work.  This is the TPU-native
replacement for CPU Montgomery limb arithmetic; semantics match the
Montgomery-domain muls behind arkworks' Poseidon permutation
(reference: crypto-primitives/src/sponge/poseidon/mod.rs:98-121).

Key invariants (validated in tools/rns_design.py and tests):
  * residues are stored "lazy" in [0, 2m) with m < 2^11, so all f32
    products of residues are < 2^24 (exact);
  * Barrett reduction r = w - floor(w * inv_m) * m with inv_m rounded
    toward zero never produces negative values and lands in [0, 2m);
  * base-2 residues are stored tau-twisted (tau_j = (M2/m_j)^{-1} mod
    m_j), which lets the second base extension consume stored values
    directly; the twist is folded into the ext1 matrix (tau^2) and the
    M1^{-1} constant (tau^{-1});
  * mont_mul closes over values < BETA*p with BETA = 4 (needs M1, M2 >
    16p, guaranteed by the interleaved prime split);
  * lambda (the CRT overflow count) rides extra matmul rows; delta
    offsets: ext1 uses -1/16 (one-sided underestimate, q_hat in
    {q, q+M1}), ext2 uses +1/2 (exact, since result/M2 < 0.2 and the
    approximation error is < 0.05).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

K = 24  # residues per base
DIGIT = 6  # bits per matmul digit plane
LAM_SHIFT = 20  # lambda approximation scale
DELTA1 = -0.0625  # ext1 offset: one-sided (never overestimate lambda)
DELTA2 = 0.5  # ext2 offset: exact extension

# Pinned base-1/base-2 prime sets whose quotient coefficients sigma_i =
# -p^{-1} (M1/m_i)^{-1} mod m_i are ALL quadratic residues mod m_i
# (found by tools/find_sigma_qr_bases.py, a ~2^-K random-restart search).
# For these fields the plan carries sqrt_sigma, enabling the v6.6
# sqrt-sigma-twisted s-box domain in the Poseidon kernel: operands stored
# as y_i = x_i*sqrt(sigma_i) make y_a*y_b the quotient coefficient
# directly, deleting the per-mont-op c_sigma mul + second Barrett red on
# the base-1 rows.  Fields not pinned here fall back to the untwisted
# path (identical semantics, ~7% slower kernel).
SIGMA_QR_BASES: dict[int, tuple[tuple, tuple]] = {
    # BLS12-381 Fr (found after 15.7M trials; M1//p=66 keeps the curve
    # tier's bound_a*bound_b <= 55 mul domain, M2//p=41 > 16 keeps beta=4)
    52435875175126190479447740508185965837690552500527637822603658699938581184513: (
        (2039, 2029, 2027, 2003, 1999, 1993, 1979, 1973, 1951, 1949, 1913,
         1879, 1877, 1873, 1871, 1847, 1831, 1801, 1741, 1721, 1709, 1699,
         1693, 1663),
        (2017, 2011, 1997, 1987, 1933, 1931, 1907, 1901, 1889, 1867, 1861,
         1823, 1811, 1789, 1787, 1783, 1777, 1759, 1753, 1747, 1733, 1723,
         1697, 1669),
    ),
}


def _small_primes_desc(bound: int, count: int) -> list[int]:
    out = []
    x = bound - 1
    while len(out) < count:
        is_p = x > 1 and all(x % d for d in range(2, int(x**0.5) + 1))
        if is_p:
            out.append(x)
        x -= 1
    return out


def _inv(a: int, m: int) -> int:
    return pow(a, -1, m)


def _digits(v: np.ndarray, ndig: int) -> list[np.ndarray]:
    out = []
    v = v.astype(np.int64)
    for _ in range(ndig):
        out.append(v & ((1 << DIGIT) - 1))
        v = v >> DIGIT
    return out


@dataclass(frozen=True, eq=False)  # identity hash: fields are numpy arrays
class RNSPlan:
    """All constants for RNS-Montgomery mul over a prime p.  Arrays are
    numpy; the Pallas kernel loads them as (rows, 1) f32 / bf16 operands."""

    p: int
    m1: np.ndarray  # (K,) int64 base-1 moduli
    m2: np.ndarray  # (K,) base-2 moduli
    M1: int
    M2: int
    inv_m1: np.ndarray  # (K,) f32, rounded toward zero
    inv_m2: np.ndarray
    c_sigma: np.ndarray  # (K,) f32: (-p^-1 * (M1/m_i)^-1) mod m_i
    p2: np.ndarray  # (K,) f32: p mod m2_j
    c2: np.ndarray  # (K,) f32: M1^-1 * tau^-1 mod m2_j
    p2c2: np.ndarray  # (K,) f32: (p * c2) mod m2_j (merged t0/omega stage)
    tau: np.ndarray  # (K,) int64: (M2/m_j)^-1 mod m2_j
    negM1: np.ndarray  # (K,) f32: (-M1 * tau^2) mod m2_j
    negM2: np.ndarray  # (K,) f32: -M2 mod m1_i
    ext1_w: np.ndarray  # (K + 1, 3K + 2? ) see build: bf16 matmul weights
    ext2_w: np.ndarray
    mont_one: tuple  # RNS residues of M1 mod p (Montgomery one)
    # v6.6 sqrt-sigma twisted domain (None unless p is in SIGMA_QR_BASES):
    # sqrt_sigma_i^2 = c_sigma_i mod m1_i; ext2s_w/negM2s are the ext2
    # weights with sqrt_sigma folded into each OUTPUT row (the extension
    # then emits twisted base-1 residues directly)
    sqrt_sigma: np.ndarray | None = None  # (K,) f32
    inv_sqrt_sigma: np.ndarray | None = None  # (K,) f32
    ext2s_w: np.ndarray | None = None
    negM2s: np.ndarray | None = None
    # geometry (round 4): K=24/ls=20/mid_red=False is the legacy ~268-bit
    # plan the Pallas kernels hard-code; bigger moduli (e.g. the 381-bit
    # BLS12-381 G1 base field) get k > 24 residues per base, a larger
    # lambda shift, and a mid Barrett reduction of the extension's U1
    # digit block (the 64-fold would overflow the 2^24 f32-exact budget
    # at k > 24 — see _ext_matrix)
    k: int = K
    ls: int = LAM_SHIFT
    mid_red: bool = False

    @property
    def rows(self) -> int:
        return 2 * self.k


def _ext_matrix(c_cols: np.ndarray, m_out: np.ndarray, lam_w: np.ndarray,
                ls: int = LAM_SHIFT, fold64: bool = True):
    """Build the digit-split extension matmul weights (folded-S2 form).

    Input vector (per batch lane): [s_d0 (K rows); s_d1 (K rows)] — the two
    6-bit digits of the K source residues (values < 2^12).

    The true per-row sum is T = sum_i s_i*c[j,i] = S0 + 64*S1 + 4096*S2
    with S_d the digit-plane partial sums.  Instead of reducing S2 on the
    VPU and recombining with a k12 constant (one Barrett red + one fma per
    extension), fold the 4096 scale into the weights mod m_j:
        f[j,i] = (4096 * c1[j,i]) mod m_j = f0 + 64*f1   (f < m < 2^11)
    and emit two MERGED output blocks
        U0[j] = sum_i d0*c0 + d1*f0          (weights < 64)
        U1[j] = sum_i d0*(64*c1) + d1*(64*(c0 + f1))
    with the 64 recombine scale pre-folded into the U1 weight rows (an
    integer < 2^7 times a power of two is bf16-exact), so that
        X = U0 + U1 + lam*negM  ==  T (mod m_j)
    needs NO mid red and no recombine scaling:
    X < 24*63*126 + 64*24*63*125 + 49*2047 < 12.5M < 2^24 (f32-exact).

    Output rows: [U0 (K); U1 (K); L0; L1; L2], lambda rows as before:
    lam_v = L0 + 64*L1 + 4096*L2 ~= sum_i s_i * lam_w_i.
    Returns W shape (2*K_out + 3, 2*K_in) float32, entries < 2^7.
    """
    k_out, k_in = c_cols.shape
    c0, c1 = _digits(c_cols, 2)
    f = (4096 * c1) % m_out[:, None]
    f0, f1 = _digits(f, 2)
    w0, w1 = _digits(lam_w, 2)
    W = np.zeros((2 * k_out + 3, 2 * k_in), dtype=np.float32)
    # U0 = d0 @ c0.T + d1 @ f0.T
    W[0:k_out, 0:k_in] = c0
    W[0:k_out, k_in : 2 * k_in] = f0
    # U1 = d0 @ c1.T + d1 @ (c0 + f1).T; fold64 pre-scales the rows by the
    # 64 recombine factor (legacy K=24 plans: the X accumulation then needs
    # no mid reduction).  Big plans (fold64=False) keep raw U1 rows — the
    # 64-fold would push the f32 matmul accumulation past 2^24 at k > 24 —
    # and Barrett-reduce U1 before the 64-scale recombine (plan.mid_red).
    scale_u1 = 64.0 if fold64 else 1.0
    W[k_out : 2 * k_out, 0:k_in] = scale_u1 * c1
    W[k_out : 2 * k_out, k_in : 2 * k_in] = scale_u1 * (c0 + f1)
    # lambda rows with the recombine scales folded in as power-of-two
    # factors (exact in bf16/f32: same mantissas, shifted exponents), so the
    # kernel computes lam_v = L0 + L1 + L2 with two adds and no scaling:
    #   L0 = 2^-S * d0@w0;  L1 = 2^-S*64 * (d0@w1 + d1@w0);
    #   L2 = 2^-S*4096 * d1@w1          (S = ls)
    sc = 2.0**-ls
    W[2 * k_out, 0:k_in] = w0 * sc
    W[2 * k_out + 1, 0:k_in] = w1 * (64 * sc)
    W[2 * k_out + 1, k_in : 2 * k_in] = w0 * (64 * sc)
    W[2 * k_out + 2, k_in : 2 * k_in] = w1 * (4096 * sc)
    # every entry must be bf16-exact: an integer < 2^8 (U0 rows), or such
    # an integer times a power of two (U1 / lambda rows)
    assert np.all(W >= 0)
    u0 = W[:k_out]
    assert np.all(u0 < 128) and np.all(u0 == np.floor(u0))
    u1 = W[k_out : 2 * k_out] / scale_u1
    assert np.all(u1 < 128) and np.all(u1 == np.floor(u1))
    lam_ints = W[2 * k_out :] * 2.0**ls
    assert np.all(lam_ints == np.floor(lam_ints))
    assert np.all((w0 < 64) & (w1 < 64))
    return W


def _geometry(p: int):
    """Pick (k, ls, mid_red, b1, b2) for a modulus.

    The legacy K=24 / ls=20 / fold64 geometry covers odd primes to ~2^264
    (M1, M2 > 16p) and is what the fused Pallas kernels hard-code.  Bigger
    moduli (up to ~2^19 bits of product headroom, in practice the 381-bit
    BLS12-381 G1 base field and anything else < ~2^430) get more residues
    per base, ls=22 (the lambda estimate error k*2^11/2^ls must stay under
    the 1/16 one-sided delta budget), and the mid-red extension variant."""
    pinned = SIGMA_QR_BASES.get(p)
    if pinned is not None:
        return K, LAM_SHIFT, False, list(pinned[0]), list(pinned[1])
    primes = _small_primes_desc(2048, 2 * K)
    b1, b2 = primes[0::2], primes[1::2]
    prod = lambda xs: functools.reduce(lambda a, b: a * b, xs, 1)
    # The legacy geometry is admitted only when M1 clears 64p (not just
    # the 16p beta-fixpoint margin): the curve tiers' value-bound ledgers
    # peak at 54 (TE HWCD) / 36 (SW RCB), and a plan that admits the
    # modulus but not the ledger used to crash every device curve op at
    # trace time (ed25519's 2^255-19 lands at M1//p = 49, secp256r1 at
    # 24 — round-5 fix: both now get a big plan and ride the fused
    # kernels instead).
    if prod(b1) > 64 * p and prod(b2) > 16 * p:
        return K, LAM_SHIFT, False, b1, b2
    # big geometry: grow k until BOTH interleaved bases clear the margin.
    # M1 needs extra headroom: curve tiers need bound_a*bound_b <= M1//p
    # (TE HWCD peaks at 54), so demand M1 > 64p.  k stays a multiple of 8:
    # the fused Pallas kernels slice/concat (K, B) row blocks, and Mosaic
    # requires the sublane offsets of lane-concat operands to agree — an
    # 8-aligned K keeps every per-base row block tile-aligned (f32 tiles
    # are (8, 128)); the few extra residues cost ~the same as padding
    # would, with none of the kernel complexity.
    for k in range(K + 8, 49, 8):
        primes = _small_primes_desc(2048, 2 * k)
        b1, b2 = primes[0::2], primes[1::2]
        if prod(b1) > 64 * p and prod(b2) > 16 * p:
            assert min(b1 + b2) > 1024, "11-bit prime pool exhausted"
            return k, 22, True, b1, b2
    raise AssertionError(f"modulus too large for the RNS prime pool: {p.bit_length()} bits")


@functools.cache
def build_plan(p: int) -> RNSPlan:
    pinned = SIGMA_QR_BASES.get(p)
    k, ls, mid_red, b1, b2 = _geometry(p)
    m1 = np.array(b1, dtype=np.int64)
    m2 = np.array(b2, dtype=np.int64)
    M1 = 1
    for m in b1:
        M1 *= m
    M2 = 1
    for m in b2:
        M2 *= m
    assert M1 > 16 * p and M2 > 16 * p, "bases too small for beta=4 fixpoint"
    mmax = max(max(b1), max(b2))
    if not mid_red:
        # no-mid-red recombine exactness (see _ext_matrix): X = U0 + 64*U1
        # + lam*negM + ark must stay < 2^24 for all bases
        xmax = (
            k * (63 * 63 + 63 * 63)  # U0 = d0*c0 + d1*f0
            + 64 * k * (63 * 31 + 63 * (63 + 31))  # 64*U1 = d0*c1 + d1*(c0+f1)
            + (2 * k + 1) * mmax  # lam*negM
            + 2 * mmax  # folded ark
        )
        assert xmax < 1 << 24, f"recombine overflow: {xmax}"
    else:
        # mid-red variant: the U0 / raw-U1 matmul outputs must each be
        # f32-exact, and X = U0 + 64*red(U1) + lam*negM + extra < 2^24
        umax = 2 * k * 63 * 127
        assert umax < 1 << 24, f"ext matmul overflow: {umax}"
        xmax = umax + 64 * (2 * mmax - 1) + (2 * k + 1) * mmax + 2 * mmax
        assert xmax < 1 << 24, f"recombine overflow: {xmax}"
    # lambda estimate error: per-term rounding of round(2^ls/m) is
    # <= 2^-(ls+1), times lazy residues < 2^12, over k terms — must stay
    # inside the one-sided DELTA1 = 1/16 budget (with slack for the f32
    # matmul accumulation rounding of the lambda rows)
    assert k * (1 << 11) / (1 << ls) < 0.06, "lambda error budget exceeded"
    inv_m1 = np.nextafter((1.0 / m1).astype(np.float32), np.float32(0))
    inv_m2 = np.nextafter((1.0 / m2).astype(np.float32), np.float32(0))
    c_sigma = np.array(
        [(-_inv(p, m) * _inv(M1 // m, m)) % m for m in b1], dtype=np.int64
    )
    tau = np.array([_inv(M2 // m, m) for m in b2], dtype=np.int64)
    C1 = np.array([[(M1 // mi) % mj for mi in b1] for mj in b2], dtype=np.int64)
    C1 = (C1 * (tau[:, None] ** 2 % m2[:, None])) % m2[:, None]
    negM1 = np.array(
        [((-M1) % int(m)) * (int(t) ** 2 % int(m)) % int(m) for m, t in zip(b2, tau)],
        dtype=np.int64,
    )
    p2 = np.array([p % m for m in b2], dtype=np.int64)
    c2 = np.array(
        [(_inv(M1, m) * _inv(int(t), m)) % m for m, t in zip(b2, tau)],
        dtype=np.int64,
    )
    p2c2 = (p2 * c2) % m2
    C2 = np.array([[(M2 // mj) % mi for mj in b2] for mi in b1], dtype=np.int64)
    negM2 = np.array([(-M2) % m for m in b1], dtype=np.int64)
    lam_w1 = np.array([round(2**ls / m) for m in b1], dtype=np.int64)
    lam_w2 = np.array([round(2**ls / m) for m in b2], dtype=np.int64)
    fold64 = not mid_red
    ext1_w = _ext_matrix(C1, m2, lam_w1, ls, fold64)
    ext2_w = _ext_matrix(C2, m1, lam_w2, ls, fold64)
    # exact recombine bound per output row: digits <= 63, lam <= 2k+1
    for Wm, nM in ((ext1_w, negM1), (ext2_w, negM2)):
        u0 = 63.0 * Wm[:k].sum(axis=1)
        u1 = 63.0 * Wm[k : 2 * k].sum(axis=1)
        if mid_red:
            # U0 and raw U1 are separate f32-exact matmul outputs; X sums
            # U0 with the REDUCED U1 (< 2m) under the 64 scale
            assert max(u0.max(), u1.max()) < 1 << 24, "ext matmul overflow"
            xb = u0 + 64.0 * (2 * mmax - 1) + (2 * k + 1) * nM.max() + 2 * mmax
        else:
            xb = u0 + u1 + (2 * k + 1) * nM.max() + 2 * mmax
        assert xb.max() < 1 << 24, f"recombine overflow: {xb.max()}"
    # c2_ready/lazy-MDS bound (poseidon_rns_pallas.mds_ark): a pair-grouped
    # accumulation leaves w lazy <= (2m-1)*m; the omega stage then adds
    # qh*p2c2 and a folded ark without any const-mul on w2
    w_lazy = (2 * mmax - 1) * mmax
    assert w_lazy + (2 * mmax - 1) * (mmax - 1) + (mmax - 1) < 1 << 24
    # and each pair-grouped accumulation step stays f32-exact
    assert (2 * mmax - 1) + 2 * (2 * mmax - 1) * (mmax - 1) < 1 << 24
    # v6.5 sparse partial rounds (poseidon_rns_pallas.sparse_mds_ark): the
    # omega stage takes a VARIABLE addend (a lazy state residue < 2m-1,
    # the sparse round's identity contribution) on top of the constant
    # fold; raw w_j = const*z products (< (2m-1)(m-1)) ride the w1_lazy
    # budget unchanged
    assert w_lazy + (2 * mmax - 1) * (mmax - 1) + (2 * mmax - 1) + (
        mmax - 1
    ) < 1 << 24
    mont_one_int = M1 % p
    sqrt_sigma = inv_sqrt_sigma = ext2s_w = negM2s = None
    if pinned is not None:
        # every sigma_i is a QR by construction of the pinned set; take the
        # smaller root (m < 2^11: brute-force search is instant)
        roots = []
        for s, m in zip(c_sigma, b1):
            r = next(r for r in range(1, m) if r * r % m == int(s))
            roots.append(min(r, m - r))
        sq = np.array(roots, dtype=np.int64)
        inv_sq = np.array([_inv(int(r), m) for r, m in zip(sq, b1)], np.int64)
        # fold sqrt_sigma into each ext2 OUTPUT row: the extension then
        # emits twisted base-1 residues (and the lam*negM correction gets
        # the same per-row scale)
        C2s = (C2 * sq[:, None]) % m1[:, None]
        negM2s_i = (negM2 * sq) % m1
        ext2s_w = _ext_matrix(C2s, m1, lam_w2)
        u0 = 63.0 * ext2s_w[:K].sum(axis=1)
        u1 = 63.0 * ext2s_w[K : 2 * K].sum(axis=1)
        xb = u0 + u1 + (2 * K + 1) * negM2s_i.max() + 2 * mmax
        assert xb.max() < 1 << 24, f"twisted recombine overflow: {xb.max()}"
        sqrt_sigma = sq.astype(np.float32)
        inv_sqrt_sigma = inv_sq.astype(np.float32)
        negM2s = negM2s_i.astype(np.float32)
    plan = RNSPlan(
        p=p,
        m1=m1,
        m2=m2,
        M1=M1,
        M2=M2,
        inv_m1=inv_m1,
        inv_m2=inv_m2,
        c_sigma=c_sigma.astype(np.float32),
        p2=p2.astype(np.float32),
        c2=c2.astype(np.float32),
        p2c2=p2c2.astype(np.float32),
        tau=tau,
        negM1=negM1.astype(np.float32),
        negM2=negM2.astype(np.float32),
        ext1_w=ext1_w,
        ext2_w=ext2_w,
        mont_one=(),
        sqrt_sigma=sqrt_sigma,
        inv_sqrt_sigma=inv_sqrt_sigma,
        ext2s_w=ext2s_w,
        negM2s=negM2s,
        k=k,
        ls=ls,
        mid_red=mid_red,
    )
    object.__setattr__(plan, "mont_one", to_rns(plan, mont_one_int))
    return plan


def to_rns(plan: RNSPlan, x) -> tuple[np.ndarray, np.ndarray]:
    """Python int (or array of objects) -> (r1, r2) f32 residues, r2
    tau-twisted.  NOT Montgomery: pass x*M1 %% p yourself for Mont form."""
    xs = np.asarray(x, dtype=object).reshape(-1)
    k = plan.k
    r1 = np.empty((len(xs), k), dtype=np.float32)
    r2 = np.empty((len(xs), k), dtype=np.float32)
    for n, v in enumerate(xs):
        v = int(v)
        r1[n] = [v % int(m) for m in plan.m1]
        r2[n] = [(v * int(t)) % int(m) for m, t in zip(plan.m2, plan.tau)]
    shape = np.asarray(x, dtype=object).shape
    return r1.reshape(shape + (k,)), r2.reshape(shape + (k,))


def from_rns(plan: RNSPlan, r1: np.ndarray):
    """Base-1 residues -> python ints mod M1 (callers reduce mod p)."""
    r = np.asarray(r1, dtype=np.int64)
    flat = r.reshape(-1, plan.k)
    out = np.empty(flat.shape[0], dtype=object)
    pre = [
        (plan.M1 // int(m)) * _inv(plan.M1 // int(m), int(m)) for m in plan.m1
    ]
    for n in range(flat.shape[0]):
        acc = 0
        for ri, mi, c in zip(flat[n], plan.m1, pre):
            acc += (int(ri) % int(mi)) * c
        out[n] = acc % plan.M1
    return out.reshape(r.shape[:-1])


# ---------------------------------------------------------------------------
# Faithful numpy-f32 emulation of the kernel ops (reference for tests).
# Every operation below maps 1:1 onto a Pallas kernel op.
# ---------------------------------------------------------------------------

F = np.float32


def red(w, inv_m, m):
    """Barrett reduce, exact f32 emulation: result in [0, 2m)."""
    q = np.floor(F(w) * F(inv_m))
    return F(F(w) - F(q) * F(m))


def _ext(plan: RNSPlan, s, W, negM, inv_out, m_out, delta, extra=None):
    """Base extension: s (..., K) lazy residues -> (..., K) residues of the
    represented integer (+ {0,1} * M_src for ext1's one-sided delta).

    Folded-S2 recombine (see _ext_matrix): X = U0 + 64*U1 + lam*negM
    (+ extra) is < ~12.6M < 2^24, f32-exact — no mid Barrett red.  Big
    (mid_red) plans carry raw U1 rows instead and Barrett-reduce U1 before
    the 64-scale recombine (X < ~1.1M, still exact)."""
    k = plan.k
    s = F(s)
    s0 = F(np.floor(s * F(2.0**-DIGIT)))
    d0 = F(s - s0 * F(2.0**DIGIT))  # low digit
    x = np.concatenate([d0, s0], axis=-1)  # (..., 2K)
    out = F(x @ W.T.astype(np.float32))  # kernel: bf16 matmul, f32 accum
    U0, U1 = out[..., :k], out[..., k : 2 * k]
    L0, L1, L2 = out[..., 2 * k], out[..., 2 * k + 1], out[..., 2 * k + 2]
    lam = np.floor(F(F(L0 + L1) + L2) + F(delta))[..., None]  # scales in W
    if plan.mid_red:
        U1 = F(F(2.0**DIGIT) * red(U1, inv_out, m_out))
    X = F(F(U0 + U1) + F(lam) * F(negM))  # else U1's 64 scale folded in W
    if extra is not None:
        X = F(X + F(extra))
    return red(X, inv_out, m_out)


def mont_reduce_np(plan: RNSPlan, w, ark2=None, s1_ready=False,
                   c2_ready=False, w1_lazy=False, b1_twisted=False):
    """Montgomery-reduce a residue pair (w1, w2 tau^2-twisted) representing
    an integer W < p*M1: returns residues of W*M1^{-1} mod p (value < 3p).

    ark2: optional tau-twisted B2 residues of a constant a < p, folded into
    the omega reduction — the result then represents W*M1^{-1} + a (< 4p)
    in BOTH bases (ext2 re-extends the ark-included omega).
    s1_ready: w1 already carries the sigma twist (MDS constants are stored
    pre-multiplied by sigma in base 1), skipping the s1 const-mul.
    c2_ready: w2 already carries the c2 twist (MDS B2 constants stored
    pre-multiplied by tau*c2), skipping the omega-stage const-mul.
    w1_lazy: w1 is a pair-grouped lazy accumulation < (2m-1)*m (odd-width
    MDS rows), needing one Barrett red before the ext1 digit split."""
    w1, w2 = w
    if s1_ready:
        s1 = red(F(w1), plan.inv_m1, F(plan.m1)) if w1_lazy else F(w1)
    else:
        s1 = red(F(w1) * plan.c_sigma, plan.inv_m1, F(plan.m1))
    qh = _ext(plan, s1, plan.ext1_w, plan.negM1, plan.inv_m2, F(plan.m2), DELTA1)
    # merged t0/omega: omega = (w2 + qh*p2)*c2 = w2*c2 + qh*(p2*c2 mod m);
    # bound 2*(2m-1)*(m-1) + (2m-1) = 16.62M < 2^24, exact.  With c2_ready,
    # w2 is lazy < (2m-1)*m and the bound is (2m-1)*m + (2m-1)*(m-1) + m
    # = 16.62M < 2^24 (asserted in build_plan).
    if c2_ready:
        om_pre = F(F(w2) + qh * plan.p2c2)
    else:
        om_pre = F(F(F(w2) * plan.c2) + qh * plan.p2c2)
    if ark2 is not None:
        om_pre = F(om_pre + F(ark2))
    omega = red(om_pre, plan.inv_m2, F(plan.m2))
    if b1_twisted:  # emit sqrt-sigma-twisted base-1 residues (v6.6)
        r1 = _ext(plan, omega, plan.ext2s_w, plan.negM2s, plan.inv_m1,
                  F(plan.m1), DELTA2)
    else:
        r1 = _ext(plan, omega, plan.ext2_w, plan.negM2, plan.inv_m1,
                  F(plan.m1), DELTA2)
    return r1, omega


def mont_mul_np(plan: RNSPlan, a, b):
    """(a1, a2twisted) x (b1, b2twisted) -> result pair; value < 4p."""
    a1, a2 = a
    b1, b2 = b
    w1 = red(F(a1) * F(b1), plan.inv_m1, F(plan.m1))
    w2 = red(F(a2) * F(b2), plan.inv_m2, F(plan.m2))
    return mont_reduce_np(plan, (w1, w2))


def twist_b1_np(plan: RNSPlan, r1):
    """Plain base-1 residues -> sqrt-sigma-twisted (v6.6 domain entry)."""
    return red(F(r1) * plan.sqrt_sigma, plan.inv_m1, F(plan.m1))


def untwist_b1_np(plan: RNSPlan, r1):
    """Twisted base-1 residues -> plain (v6.6 domain exit)."""
    return red(F(r1) * plan.inv_sqrt_sigma, plan.inv_m1, F(plan.m1))


def mont_mul_np_twisted(plan: RNSPlan, a, b):
    """mont_mul in the twisted domain: base-1 halves of a and b carry the
    sqrt-sigma twist, so the reduced product IS the quotient coefficient
    (no c_sigma mul / second red); the result's base-1 half comes out
    twisted via ext2s_w."""
    a1, a2 = a
    b1, b2 = b
    w1 = red(F(a1) * F(b1), plan.inv_m1, F(plan.m1))
    w2 = red(F(a2) * F(b2), plan.inv_m2, F(plan.m2))
    return mont_reduce_np(plan, (w1, w2), s1_ready=True, b1_twisted=True)


def add_np(plan: RNSPlan, a, b):
    """Lazy add: (a1+b1, a2+b2) reduced back under 2m per base."""
    a1, a2 = a
    b1, b2 = b
    return (
        red(F(a1) + F(b1), plan.inv_m1, F(plan.m1)),
        red(F(a2) + F(b2), plan.inv_m2, F(plan.m2)),
    )
