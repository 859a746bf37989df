"""Short-Weierstrass curve ops on the RNS-Montgomery fast tier.

The SW twin of ops/curve_rns.py: points are (..., 3, 2K) float32 RNS
projective coordinates (X : Y : Z), identity (0 : 1 : 0), every stored
coordinate < BOUND*p.  Addition is the same complete Renes-Costello-
Batina Algorithm 1 as the limb tier (ops/curve_sw.py sw_add), re-planned
for the RNS value-bound budget: the four cross terms {U, V, t1', t4'}
and the three outputs are re-normalized (one stacked Montgomery mul by
one each) so every product stays inside the bound_a*bound_b <= M1//p
Montgomery domain — 25 Montgomery ops per addition vs the TE tier's 11,
all asserted at trace time by RnsField.

This is what lets SW-instantiated primitives (Pedersen/Bowe-Hopwood
commitments and CRHs, Schnorr, ElGamal — generic over `CurveGroup` in
the reference, e.g. /root/reference/crypto-primitives/src/signature/
schnorr/mod.rs:30-47) run at RNS rates for any modulus the plan pool
covers — legacy 2x24 plans to ~256 bits, big mid-red plans beyond
(381-bit BLS12-381 G1 included).  On TPU the grouped conditional-sum
MSM additionally rides the fused Pallas kernel
(ops/msm_sw_rns_pallas.py) via conditional_sum_grouped_auto.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.ops import rns, rns_xla
from crypto_primitives_tpu.ops.curve_rns import (
    BOUND,
    curve_field,
    subset_groups,
)


def supports_rns(curve) -> bool:
    """RNS plan availability for an SW curve (CPT_DISABLE_RNS_CURVE=1
    forces the limb tier, read per call like the TE twin)."""
    from crypto_primitives_tpu.ops.curve_sw import SWCurveSpec

    if os.environ.get("CPT_DISABLE_RNS_CURVE") == "1":
        return False
    if not isinstance(curve, SWCurveSpec):
        return False
    try:
        plan = rns.build_plan(curve.base.p)
    except AssertionError:
        return False
    # the complete RCB ledger peaks at 6*6 = 36 (sw_add_rns round 1);
    # defense-in-depth — _geometry's 64p margin already guarantees it
    return plan.M1 // plan.p >= 36


@functools.cache
def _sw_consts(curve):
    """(a, 3b, a^2) packed RNS rows (bound 1) and the identity point;
    numpy so the cache never captures jit tracers."""
    f = curve_field(curve)
    p = curve.base.p
    a = f.pack(np.asarray([curve.a], dtype=object))[0]
    b3 = f.pack(np.asarray([3 * curve.b % p], dtype=object))[0]
    a2 = f.pack(np.asarray([curve.a * curve.a % p], dtype=object))[0]
    one = f.pack(np.asarray([1], dtype=object))[0]
    ident = np.stack(
        [np.zeros_like(one), one, np.zeros_like(one)], axis=0
    )  # (3, 2K)
    return a, b3, a2, one, ident


def pack_points_rns(curve, pts) -> np.ndarray:
    """Host affine tuples (None = infinity) -> (..., 3, 2K) f32 projective
    RNS points (bound 1)."""
    f = curve_field(curve)
    single = pts is None or (
        isinstance(pts, tuple) and len(pts) == 2 and not isinstance(pts[0], tuple)
    )
    if single:
        pts = [pts]
    coords = np.empty((len(pts), 3), dtype=object)
    for i, pt in enumerate(pts):
        coords[i] = [0, 1, 0] if pt is None else [int(pt[0]), int(pt[1]), 1]
    out = f.pack(coords)
    return out[0] if single else out


def identity_rns(curve, shape=()) -> jnp.ndarray:
    ident = _sw_consts(curve)[4]
    return jnp.broadcast_to(jnp.asarray(ident), shape + ident.shape)


@functools.partial(jax.jit, static_argnums=(0,))
def sw_add_rns(curve, p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Complete projective RCB addition over RNS residues.

    Bound ledger (units of p, inputs <= BOUND = 3, every product pair
    asserted <= M1//p = 55 by RnsField.mul):
      round 1   sums 6x6 = 36         -> mont outs 3
      s_* lazy  3+3+3 = 9
      round 2   consts 9x1            -> 3
      U/V 9, t1' 12, t4' 9            -> normalized to 3 (stacked mul-by-1)
      round 3   max 9x3 = 27          -> 3
      outputs   3+3 = 6               -> normalized to 3 (stacked)
    """
    f = curve_field(curve)
    a_c, b3_c, a2_c, one_c, _ = _sw_consts(curve)
    p1, p2 = jnp.broadcast_arrays(p1, p2)
    X1, Y1, Z1 = (p1[..., i, :] for i in range(3))
    X2, Y2, Z2 = (p2[..., i, :] for i in range(3))
    B = BOUND

    def add(a, ba, b, bb):
        return f.add(a, ba, b, bb)

    sx1, bs = add(X1, B, Y1, B)
    sy1, _ = add(Y1, B, Z1, B)
    sz1, _ = add(X1, B, Z1, B)
    sx2, _ = add(X2, B, Y2, B)
    sy2, _ = add(Y2, B, Z2, B)
    sz2, _ = add(X2, B, Z2, B)
    lhs = jnp.stack([X1, Y1, Z1, sx1, sz1, sy1], axis=-2)
    rhs = jnp.stack([X2, Y2, Z2, sx2, sz2, sy2], axis=-2)
    r1, _ = f.mul(lhs, bs, rhs, bs)  # 6x6 = 36 <= 55
    m0, m1, m2, A, Bv, C = (r1[..., i, :] for i in range(6))
    M = f.MUL_OUT  # 3
    s_xy, b_s = f.sub(*f.sub(A, M, m0, M), m1, M)  # X1Y2 + X2Y1, bound 9
    s_xz, _ = f.sub(*f.sub(Bv, M, m0, M), m2, M)
    s_yz, _ = f.sub(*f.sub(C, M, m1, M), m2, M)
    consts = jnp.broadcast_to(
        jnp.asarray(np.stack([a_c, b3_c, a_c, b3_c, a_c, a2_c])),
        m0.shape[:-1] + (6, m0.shape[-1]),
    )
    vars_ = jnp.stack([s_xz, m2, m2, s_xz, m0, m2], axis=-2)
    r2, _ = f.mul(vars_, b_s, consts, 1)  # 9x1
    a_sxz, b3_m2, a_m2, b3_sxz, a_m0, a2_m2 = (r2[..., i, :] for i in range(6))
    Zp, bz = add(b3_m2, M, a_sxz, M)  # 6
    U, bu = f.sub(m1, M, Zp, bz)  # 9
    V, bv = add(m1, M, Zp, bz)  # 9
    t1p, bt1 = add(*add(*add(m0, M, m0, M), m0, M), a_m2, M)  # 12
    t4p, bt4 = add(b3_sxz, M, *f.sub(a_m0, M, a2_m2, M))  # 9
    # re-normalize the four cross terms (one stacked mul by Montgomery one)
    cross = jnp.stack([U, V, t1p, t4p], axis=-2)
    ones = jnp.broadcast_to(jnp.asarray(one_c), cross.shape)
    crossn, _ = f.mul(cross, max(bu, bv, bt1, bt4), ones, 1)  # 12x1
    U, V, t1p, t4p = (crossn[..., i, :] for i in range(4))
    lhs3 = jnp.stack([U, t1p, s_xy, s_yz, s_yz, s_xy], axis=-2)
    rhs3 = jnp.stack([V, t4p, U, t4p, V, t1p], axis=-2)
    r3, _ = f.mul(lhs3, b_s, rhs3, M)  # max 9x3 = 27
    Y3, by3 = add(r3[..., 0, :], M, r3[..., 1, :], M)
    X3, bx3 = f.sub(r3[..., 2, :], M, r3[..., 3, :], M)
    Z3, bz3 = add(r3[..., 4, :], M, r3[..., 5, :], M)
    outs = jnp.stack([X3, Y3, Z3], axis=-2)
    ones3 = jnp.broadcast_to(jnp.asarray(one_c), outs.shape)
    outsn, _ = f.mul(outs, max(bx3, by3, bz3), ones3, 1)  # 6x1
    return outsn


def sw_select_rns(mask: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(mask[..., None, None], p1, p2)


@functools.partial(jax.jit, static_argnums=(0,))
def sw_neg_rns(curve, p1: jnp.ndarray) -> jnp.ndarray:
    f = curve_field(curve)
    X, Y, Z = (p1[..., i, :] for i in range(3))
    nY, _ = f.sub(jnp.zeros_like(Y), 0, Y, BOUND)
    # keep the stored bound invariant (<= BOUND): 0 - Y lands at bound 3
    return jnp.stack([X, nY, Z], axis=-2)


@functools.partial(jax.jit, static_argnums=(0,))
def sw_sum_rns(curve, pts: jnp.ndarray) -> jnp.ndarray:
    """Sum along axis -3 by log-depth pairwise reduction."""
    pts = jnp.moveaxis(pts, -3, 0)
    n = pts.shape[0]
    while n > 1:
        if n % 2 == 1:
            pad = identity_rns(curve, pts.shape[1:-2])[None]
            pts = jnp.concatenate([pts, pad], axis=0)
            n += 1
        pts = sw_add_rns(curve, pts[0::2], pts[1::2])
        n //= 2
    return pts[0]


@functools.partial(jax.jit, static_argnums=(0, 3))
def sw_conditional_sum_rns(
    curve, table: jnp.ndarray, bits: jnp.ndarray, chunk: int = 512
) -> jnp.ndarray:
    """sum_j bits[..., j] * table[j] over an RNS point table (N, 3, 2K)."""
    n = table.shape[0]
    batch = bits.shape[:-1]
    acc = identity_rns(curve, batch)
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        tb = table[start:end]
        bb = bits[..., start:end]
        sel = sw_select_rns(
            bb != 0,
            jnp.broadcast_to(tb, batch + tb.shape),
            identity_rns(curve, batch + (end - start,)),
        )
        acc = sw_add_rns(curve, acc, sw_sum_rns(curve, sel))
    return acc


@functools.lru_cache(maxsize=64)
def _pack_table_grouped_cached(curve, pts: tuple, w: int) -> np.ndarray:
    groups = subset_groups(curve, list(pts), w)
    flat = [pt for grp in groups for pt in grp]
    arr = pack_points_rns(curve, flat)  # (G*2^w, 3, 2K)
    k = curve_field(curve).plan.k
    return arr.reshape(len(groups), 1 << w, 3, 2 * k)


def pack_table_grouped(curve, pts, w: int = 3) -> np.ndarray:
    """Host points -> (G, 2^w, 3, 2K) subset-sum combo table (the SW twin
    of curve_rns.pack_table_grouped; subset_groups is curve-agnostic)."""
    return _pack_table_grouped_cached(curve, tuple(pts), w)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def sw_conditional_sum_grouped_rns(
    curve, combos: jnp.ndarray, bits: jnp.ndarray, w: int = 3, chunk: int = 256
) -> jnp.ndarray:
    """Grouped conditional sum: one 2^w-way select + 1/w the additions."""
    G = combos.shape[0]
    batch = bits.shape[:-1]
    n = bits.shape[-1]
    if n < G * w:
        bits = jnp.concatenate(
            [bits, jnp.zeros(batch + (G * w - n,), bits.dtype)], axis=-1
        )
    grp_bits = bits.reshape(batch + (G, w)).astype(jnp.int32)
    weights = jnp.asarray([1 << i for i in range(w)], jnp.int32)
    idx = jnp.sum(grp_bits * weights, axis=-1)
    acc = identity_rns(curve, batch)
    for start in range(0, G, chunk):
        end = min(start + chunk, G)
        cb = combos[start:end]
        ix = idx[..., start:end]
        sel = jnp.broadcast_to(cb[:, 0], batch + cb[:, 0].shape)
        for e in range(1, 1 << w):
            sel = jnp.where((ix == e)[..., None, None], cb[:, e], sel)
        acc = sw_add_rns(curve, acc, sw_sum_rns(curve, sel))
    return acc


_KERNEL_PROBE: dict = {}


def grouped_kernel_ok(curve) -> bool:
    """Fused SW MSM kernel availability (ops/msm_sw_rns_pallas.py): real
    TPU backend + RNS plan + a passing self-probe against the host
    oracle — Mosaic rejection or garbage output silently keeps workloads
    on the interchangeable XLA grouped path (the TE twin's pattern,
    curve_rns.grouped_kernel_ok)."""
    if (
        jax.default_backend() != "tpu"
        or not supports_rns(curve)
        or os.environ.get("CPT_DISABLE_MSM_KERNEL") == "1"
    ):
        return False
    ok = _KERNEL_PROBE.get(curve)
    if ok is None:
        ok = _probe_kernel(curve)
        _KERNEL_PROBE[curve] = ok
    return ok


def _probe_kernel(curve) -> bool:
    import random as _random

    from crypto_primitives_tpu.ops import msm_sw_rns_pallas as mk

    try:
        base = curve.rand_point(_random.Random(1))
        pts = [curve.scalar_mul_host(base, k) for k in (1, 2, 3, 4)]
        combos = jnp.asarray(mk.pack_combos_sw_kernel(curve, pts, 2))
        bits = jnp.asarray(np.array([[1, 0, 1, 1]], np.uint8))
        out = mk.grouped_msm_sw_pallas(curve, combos, bits, 2, block_b=8)
        got = unpack_affine_rns(curve, np.asarray(out))[0]
        want = curve.add_host(curve.add_host(pts[0], pts[2]), pts[3])
        return got == want
    except Exception:
        return False


def pack_combos_kernel(curve, pts, w: int = 3) -> np.ndarray:
    """Kernel-layout subset-sum table (curve-model-dispatched name shared
    with curve_rns; see msm_sw_rns_pallas.pack_combos_sw_kernel)."""
    from crypto_primitives_tpu.ops import msm_sw_rns_pallas as mk

    return mk.pack_combos_sw_kernel(curve, pts, w)



@functools.lru_cache(maxsize=32)
def _device_table_cached(params_like, w: int, kernel: bool):
    if kernel:
        return jnp.asarray(params_like.packed_grouped_kernel(w))
    return jnp.asarray(params_like.packed_grouped_rns(w))


def _device_table(params_like, w: int, kernel: bool):
    """Device-resident grouped table cache.  jnp.asarray of a (cached)
    NUMPY table re-uploads it on every call — ~8 MB through the tunnel
    dominated every whole-call MSM row (measured B-independent ~108 ms
    per Pedersen evaluate at window 250x8, round 5); the jax.Array here
    uploads once per (params, w, layout) and lives in HBM.  Under an
    active trace (jit/shard_map body) the cache is BYPASSED — caching a
    traced constant would leak the tracer (the repo-wide trace-safe
    caching rule) — and the table embeds as a constant like before."""
    from jax._src import core as _core

    if not _core.trace_state_clean():
        tab = (
            params_like.packed_grouped_kernel(w)
            if kernel
            else params_like.packed_grouped_rns(w)
        )
        return jnp.asarray(tab)
    return _device_table_cached(params_like, w, kernel)


def conditional_sum_grouped_auto(curve, params_like, bits, w: int):
    """SW twin of curve_rns.conditional_sum_grouped_auto: fused Pallas
    kernel on TPU (ops/msm_sw_rns_pallas.py — complete RCB additions in
    VMEM), XLA grouped path elsewhere."""
    if grouped_kernel_ok(curve):
        from crypto_primitives_tpu.ops import msm_sw_rns_pallas as mk

        return mk.grouped_msm_sw_pallas(
            curve, _device_table(params_like, w, True), bits, w
        )
    return sw_conditional_sum_grouped_rns(
        curve, _device_table(params_like, w, False), bits, w
    )


@functools.lru_cache(maxsize=16)
def _many_runner(curve, w: int, use_kernel: bool):
    if use_kernel:
        from crypto_primitives_tpu.ops import msm_sw_rns_pallas as mk

        def one(combos, bits):
            return mk.grouped_msm_sw_pallas(curve, combos, bits, w)

    else:

        def one(combos, bits):
            return sw_conditional_sum_grouped_rns(curve, combos, bits, w)

    @jax.jit
    def run_all(combos_t, bits_t):
        return tuple(one(c, b) for c, b in zip(combos_t, bits_t))

    return run_all


def msm_many(curve, params_list, bits_list, w: int = 3):
    """SW twin of curve_rns.msm_many: N grouped MSMs in ONE device
    program, amortizing the per-call dispatch floor (round-4 verdict
    weak #3)."""
    use_kernel = grouped_kernel_ok(curve)
    tables = tuple(_device_table(p, w, use_kernel) for p in params_list)
    run = _many_runner(curve, w, use_kernel)
    return list(run(tables, tuple(jnp.asarray(b) for b in bits_list)))


@functools.lru_cache(maxsize=64)
def _fixed_base_powers(curve, pt: tuple, nbits: int) -> tuple:
    powers = []
    base = pt
    for _ in range(nbits):
        powers.append(base)
        base = curve.double_host(base)
    return tuple(powers)


@functools.lru_cache(maxsize=64)
def fixed_base_grouped_table(curve, pt: tuple, nbits: int, w: int = 3) -> np.ndarray:
    return pack_table_grouped(
        curve, list(_fixed_base_powers(curve, pt, nbits)), w
    )


@functools.lru_cache(maxsize=64)
def fixed_base_kernel_table(curve, pt: tuple, nbits: int, w: int = 3) -> np.ndarray:
    from crypto_primitives_tpu.ops import msm_sw_rns_pallas as mk

    return mk.pack_combos_sw_kernel(
        curve, list(_fixed_base_powers(curve, pt, nbits)), w
    )


@functools.lru_cache(maxsize=64)
def _device_fixed_base_cached(curve, pt: tuple, nbits: int, w: int, kernel: bool):
    if kernel:
        return jnp.asarray(fixed_base_kernel_table(curve, pt, nbits, w))
    return jnp.asarray(fixed_base_grouped_table(curve, pt, nbits, w))


def _device_fixed_base(curve, pt: tuple, nbits: int, w: int, kernel: bool):
    """Device-resident fixed-base table cache (see _device_table; the
    cache is bypassed under an active trace)."""
    from jax._src import core as _core

    if not _core.trace_state_clean():
        tab = (
            fixed_base_kernel_table(curve, pt, nbits, w)
            if kernel
            else fixed_base_grouped_table(curve, pt, nbits, w)
        )
        return jnp.asarray(tab)
    return _device_fixed_base_cached(curve, pt, nbits, w, kernel)


def sw_fixed_base_mul_rns(
    curve, pt: tuple, bits: jnp.ndarray, w: int = 3
) -> jnp.ndarray:
    """pt (host affine) times scalars given as bits (..., NBITS) LSB-first
    via the cached grouped doubling table (fused Pallas kernel on TPU,
    XLA grouped path elsewhere)."""
    nbits = bits.shape[-1]
    if grouped_kernel_ok(curve):
        from crypto_primitives_tpu.ops import msm_sw_rns_pallas as mk

        table = _device_fixed_base(curve, tuple(pt), nbits, w, True)
        return mk.grouped_msm_sw_pallas(curve, table, bits, w)
    table = _device_fixed_base(curve, tuple(pt), nbits, w, False)
    return sw_conditional_sum_grouped_rns(curve, table, bits, w)


@functools.partial(jax.jit, static_argnums=(0, 3))
def sw_scalar_mul_bits_windowed_rns(
    curve, base_pt: jnp.ndarray, bits: jnp.ndarray, w: int = 4
) -> jnp.ndarray:
    """Windowed variable-base scalar mul (device-built 2^w table +
    MSB-first window scan), the SW twin of
    curve_rns.te_scalar_mul_bits_windowed_rns."""
    nbits = bits.shape[-1]
    batch = base_pt.shape[:-2]
    pad = (-nbits) % w
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), bits.dtype)], axis=-1
        )
        nbits += pad
    G = nbits // w
    rows = [identity_rns(curve, batch), base_pt]
    for _ in range(2, 1 << w):
        rows.append(sw_add_rns(curve, rows[-1], base_pt))
    table = jnp.stack(rows, axis=0)
    weights = jnp.asarray([1 << i for i in range(w)], jnp.int32)
    vals = jnp.sum(
        bits.reshape(bits.shape[:-1] + (G, w)).astype(jnp.int32) * weights,
        axis=-1,
    )
    vals_scan = jnp.moveaxis(vals, -1, 0)[::-1]

    def body(acc, v):
        for _ in range(w):
            acc = sw_add_rns(curve, acc, acc)
        sel = table[0]
        for e in range(1, 1 << w):
            sel = sw_select_rns(v == e, table[e], sel)
        return sw_add_rns(curve, acc, sel), None

    acc0 = identity_rns(curve, batch)
    acc, _ = jax.lax.scan(body, acc0, vals_scan)
    return acc


@functools.partial(jax.jit, static_argnums=(0,))
def sw_to_affine_rns(curve, pts: jnp.ndarray) -> jnp.ndarray:
    """Normalize Z -> 1 in RNS (batched Fermat inversion); the identity
    (Z = 0) maps to (0, 0) — detect it host-side (not on the curve for
    b != 0).  Returns (..., 2, 2K)."""
    f = curve_field(curve)
    Z = pts[..., 2, :]
    Zi, bz = f.inv(Z, BOUND)
    xy, _ = f.mul(pts[..., 0:2, :], BOUND, Zi[..., None, :], bz)
    return xy


@functools.partial(jax.jit, static_argnums=(0,))
def _affine_r1_compact_sw(curve, pts: jnp.ndarray) -> jnp.ndarray:
    """Device half of unpack_affine_rns: affine-normalize, canonical int16
    base-1 residues (minimal tunnel bytes).  The identity (Z ≡ 0 mod p)
    surfaces as affine (0, 0): Fermat inversion maps Z to 0 mod p, so both
    products vanish — unambiguous for curves with b != 0."""
    f = curve_field(curve)
    xy = sw_to_affine_rns(curve, pts)  # (..., 2, 2K)
    r1 = xy[..., : f.plan.k]
    m1 = jnp.asarray(f.c.m1)
    r1 = r1 - m1 * (r1 >= m1)
    return r1.astype(jnp.int16)


def unpack_affine_rns(curve, pts) -> np.ndarray:
    """Device projective RNS points (..., 3, 2K) -> host affine tuples
    (None = infinity), int16 compact fetch (see the TE twin)."""
    assert curve.b != 0, "(0, 0) infinity encoding requires b != 0"
    f = curve_field(curve)
    host = np.asarray(_affine_r1_compact_sw(curve, pts))
    vals = rns.from_rns(f.plan, host)
    p, inv = f.plan.p, pow(f.plan.M1, -1, f.plan.p)
    flat = vals.reshape(-1, 2)
    out = np.empty((flat.shape[0],), dtype=object)
    for i in range(flat.shape[0]):
        x = int(flat[i][0]) * inv % p
        y = int(flat[i][1]) * inv % p
        out[i] = None if x == 0 and y == 0 else (x, y)
    if host.ndim == 2:
        return out[0]
    return out.reshape(host.shape[:-2])


def unpack_points_rns(curve, arr):
    """(..., 3, 2K) -> host affine tuples (oracle-side inverse: full f32
    fetch + host CRT + host Z-inversion; use unpack_affine_rns on the
    production path)."""
    f = curve_field(curve)
    vals = f.unpack(np.asarray(arr))
    flat = vals.reshape(-1, 3)
    p = curve.base.p
    out = np.empty((flat.shape[0],), dtype=object)
    for i in range(flat.shape[0]):
        x, y, z = (int(v) for v in flat[i])
        if z == 0:
            out[i] = None
        else:
            zi = pow(z, -1, p)
            out[i] = (x * zi % p, y * zi % p)
    if np.asarray(arr).ndim == 2:
        return out[0]
    return out.reshape(np.asarray(arr).shape[:-2])


@functools.partial(jax.jit, static_argnums=(0,))
def to_limb_points(curve, pts: jnp.ndarray) -> jnp.ndarray:
    """RNS projective points (..., 3, 2K) -> canonical Montgomery uint32
    limb points (..., 3, L) (ops/curve_sw.py representation), on device."""
    plan = rns.build_plan(curve.base.p)
    return rns_xla.to_mont_limbs(plan, curve.base, pts, BOUND)

# Curve-model-agnostic aliases (shared names with ops/curve_rns.py)
add_rns = sw_add_rns
neg_rns = sw_neg_rns
sum_rns = sw_sum_rns
select_rns = sw_select_rns
fixed_base_mul_rns = sw_fixed_base_mul_rns
scalar_mul_bits_windowed_rns = sw_scalar_mul_bits_windowed_rns
to_affine_rns = sw_to_affine_rns
conditional_sum_rns = sw_conditional_sum_rns
