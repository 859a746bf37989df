"""Batched on-device R1CS satisfaction check.

The reference's tests call `cs.is_satisfied()` (host, per-constraint); the
TPU-shaped equivalent verifies  Az o Bz == Cz  for the whole constraint
matrix as one device program (SURVEY.md §7.7): COO gather of z, one
Montgomery product per nonzero, relaxed segment-sum per row, lazy
reduction, and a single vector equality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.ops import field as ff
from crypto_primitives_tpu.ops.field import _carry_canon, _int_to_limbs, _sub_limbs


def _matrix_rows_device(spec, rows_idx, cols_idx, coeffs, z_mont, num_rows):
    """Evaluate <M_i, z> for all rows i; returns (num_rows, L) Montgomery."""
    L = spec.num_limbs
    if len(coeffs) == 0:
        return jnp.zeros((num_rows,) + z_mont.shape[1:-1] + (L,), jnp.uint32)
    coeff_m = jnp.asarray(spec.pack(list(coeffs)))  # (nnz, L) Montgomery
    zg = z_mont[jnp.asarray(cols_idx)]  # gather (nnz, L) or (nnz, N, L)
    if zg.ndim == 3:  # batched witness matrix (r1cs/batch.py)
        coeff_m = coeff_m[:, None, :]
    prods = ff.mont_mul(spec, coeff_m, zg)  # mont(coeff * z), canonical
    # relaxed segment sum: canonical 16-bit limbs summed as uint32
    sums = jax.ops.segment_sum(prods, jnp.asarray(rows_idx), num_segments=num_rows)
    # reduce each row < nterms * p back below p
    max_terms = int(np.bincount(rows_idx).max()) if len(rows_idx) else 1
    u = _carry_canon(sums, L + 2)
    j = max(max_terms.bit_length() - 1, 0)
    while j >= 0:
        c = jnp.asarray(_int_to_limbs(spec.p << j, L + 2))
        d, borrow = _sub_limbs(u, jnp.broadcast_to(c, u.shape))
        u = jnp.where((borrow != 0)[..., None], u, d)
        j -= 1
    return u[..., :L]


def check_satisfied_device(cs) -> bool:
    """Device-evaluated `is_satisfied` (bit-exact)."""
    spec = cs.field
    n = cs.num_constraints
    if n == 0:
        return True
    coo = cs.to_coo()
    z = jnp.asarray(spec.pack(cs.assignments))  # Montgomery
    a = _matrix_rows_device(spec, *coo["a"], z, n)
    b = _matrix_rows_device(spec, *coo["b"], z, n)
    c = _matrix_rows_device(spec, *coo["c"], z, n)
    ab = ff.mont_mul(spec, a, b)  # mont(a*b)
    return bool(jnp.all(ab == c))
