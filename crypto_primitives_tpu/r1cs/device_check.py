"""Batched on-device R1CS satisfaction check.

The reference's tests call `cs.is_satisfied()` (host, per-constraint); the
TPU-shaped equivalent verifies  Az o Bz == Cz  for the whole constraint
matrix as one device program (SURVEY.md §7.7): COO gather of z, one
Montgomery product per nonzero, relaxed segment-sum per row, lazy
reduction, and a single vector equality.

Table-driven gadgets (Pedersen/Bowe-Hopwood windowed sums) produce
millions of nonzeros but only thousands of DISTINCT (column, coefficient)
pairs — the cond-select accumulator LCs repeat their whole prefix per row
(the same density arkworks' matrix inlining yields).  The checker
therefore (a) Montgomery-packs each distinct coefficient once, (b)
computes one mont_mul per distinct (col, coeff) PAIR and gathers the
products into the nonzero slots, and (c) runs as ONE jitted program with
the COO data as runtime arguments — no multi-megabyte baked constants,
no per-op eager dispatch, and schoolbook work proportional to the
distinct-pair count, not the nonzero count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.ops import field as ff
from crypto_primitives_tpu.ops.field import _carry_canon, _int_to_limbs, _sub_limbs


def _coeff_ids(coeffs):
    """coefficient list -> (distinct values, (nnz,) int32 index)."""
    uniq: dict = {}
    idx = np.empty(len(coeffs), np.int32)
    vals = []
    for i, c in enumerate(coeffs):
        j = uniq.get(c)
        if j is None:
            j = uniq[c] = len(vals)
            vals.append(c)
        idx[i] = j
    return vals, idx


def _pack_matrix(spec, rows_idx, cols_idx, coeffs):
    """Host-side COO prep: returns (rows, pair_idx, pair_cols,
    pair_coeff_m, max_terms) with one Montgomery-packed coefficient row
    per distinct (col, coeff) pair."""
    if len(coeffs) == 0:
        rows_idx, cols_idx, coeffs = [0], [0], [0]
    vals, cidx = _coeff_ids(coeffs)
    packed = spec.pack(vals)  # (C, L)
    cols = np.asarray(cols_idx, np.int64)
    key = (cols << 32) | cidx
    pkeys, pidx = np.unique(key, return_inverse=True)
    pair_cols = (pkeys >> 32).astype(np.int32)
    pair_coeff_m = packed[(pkeys & 0xFFFFFFFF).astype(np.int32)]
    rows = np.asarray(rows_idx, np.int32)
    max_terms = int(np.bincount(rows).max())
    return (
        jnp.asarray(rows),
        jnp.asarray(pidx.astype(np.int32)),
        jnp.asarray(pair_cols),
        jnp.asarray(pair_coeff_m),
        max_terms,
    )


def _rows_core(spec, rows_idx, pair_idx, pair_cols, pair_coeff_m, z_mont,
               num_rows, max_terms):
    """Traceable core: evaluate <M_i, z> for all rows i; returns
    (num_rows, L) (or (num_rows, N, L) for a batched witness matrix)."""
    L = spec.num_limbs
    zg = z_mont[pair_cols]  # (P, L) or (P, N, L)
    cm = pair_coeff_m[:, None, :] if zg.ndim == 3 else pair_coeff_m
    prods_p = ff.mont_mul(spec, cm, zg)  # one product per distinct pair
    prods = prods_p[pair_idx]  # scatter to the nonzero slots
    # relaxed segment sum: canonical 16-bit limbs summed as uint32
    sums = jax.ops.segment_sum(prods, rows_idx, num_segments=num_rows)
    # reduce each row < max_terms * p back below p
    u = _carry_canon(sums, L + 2)
    j = max(int(max_terms).bit_length() - 1, 0)
    while j >= 0:
        c = jnp.asarray(_int_to_limbs(spec.p << j, L + 2))
        d, borrow = _sub_limbs(u, jnp.broadcast_to(c, u.shape))
        u = jnp.where((borrow != 0)[..., None], u, d)
        j -= 1
    return u[..., :L]


def _matrix_rows_device(spec, rows_idx, cols_idx, coeffs, z_mont, num_rows):
    """Evaluate <M_i, z> from host COO lists (r1cs/batch.py jits over this
    with the constraint structure closed over)."""
    L = spec.num_limbs
    if len(coeffs) == 0:
        return jnp.zeros((num_rows,) + z_mont.shape[1:-1] + (L,), jnp.uint32)
    rows, pidx, pcols, pcoef, mt = _pack_matrix(spec, rows_idx, cols_idx, coeffs)
    return _rows_core(spec, rows, pidx, pcols, pcoef, z_mont, num_rows, mt)


@functools.partial(jax.jit, static_argnames=("spec", "n", "mts"))
def _check_jit(spec, n, mts, z, a_arrs, b_arrs, c_arrs):
    a = _rows_core(spec, *a_arrs, z, n, mts[0])
    b = _rows_core(spec, *b_arrs, z, n, mts[1])
    c = _rows_core(spec, *c_arrs, z, n, mts[2])
    ab = ff.mont_mul(spec, a, b)  # mont(a*b)
    return jnp.all(ab == c)


def check_satisfied_device(cs) -> bool:
    """Device-evaluated `is_satisfied` (bit-exact)."""
    spec = cs.field
    n = cs.num_constraints
    if n == 0:
        return True
    coo = cs.to_coo()
    z = jnp.asarray(spec.pack(cs.assignments))  # Montgomery
    packed, mts = [], []
    for m in "abc":
        *arrs, mt = _pack_matrix(spec, *coo[m])
        packed.append(tuple(arrs))
        mts.append(mt)
    return bool(_check_jit(spec, n, tuple(mts), z, *packed))
