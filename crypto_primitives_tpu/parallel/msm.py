"""Sharded fixed-base multi-scalar multiplication.

The Pedersen window sums (/root/reference/crypto-primitives/src/crh/pedersen/
mod.rs:113-124, rayon over windows) become: shard the (table, bits) pairs
across the mesh along the table axis, accumulate a per-device partial sum
with the conditional-sum kernel, all-gather the D partial points (tiny) and
fold them locally — the group operation is not a `psum`, so the reduction is
an explicit gather + log-depth complete-addition tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from crypto_primitives_tpu.ops import curve as cv
from crypto_primitives_tpu.ops.curve import TECurveSpec


def sharded_fixed_base_msm(
    curve: TECurveSpec,
    table: jnp.ndarray,
    bits: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
) -> jnp.ndarray:
    """sum_j bits[..., j] * table[j], table axis sharded over the mesh.

    table: (N, 4, L); bits: (..., N) with N divisible by mesh size.
    Returns replicated (..., 4, L) extended points.
    """
    n_dev = mesh.shape[axis_name]
    assert table.shape[0] % n_dev == 0

    def shard_fn(table_shard, bits_shard):
        partial = cv.te_conditional_sum(curve, table_shard, bits_shard)
        gathered = jax.lax.all_gather(partial, axis_name)  # (D, ..., 4, L)
        return cv.te_sum(curve, jnp.moveaxis(gathered, 0, -3))

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis_name), P(*([None] * (bits.ndim - 1) + [axis_name]))),
        out_specs=P(),
        check_vma=False,
    )
    return fn(table, bits)


def sharded_fixed_base_msm_rns(
    curve: TECurveSpec,
    table_rns: jnp.ndarray,
    bits: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
) -> jnp.ndarray:
    """RNS fast-path twin of :func:`sharded_fixed_base_msm`.

    table_rns: (N, 4, 2K) residues (ops/curve_rns.pack_points_rns); returns
    replicated extended limb points (..., 4, L) — per-device partials stay
    in RNS, only the final fold converts (one Kawamura CRT per output).
    """
    from crypto_primitives_tpu.ops import curve_rns as cr

    n_dev = mesh.shape[axis_name]
    assert table_rns.shape[0] % n_dev == 0

    def shard_fn(table_shard, bits_shard):
        partial = cr.te_conditional_sum_rns(curve, table_shard, bits_shard)
        gathered = jax.lax.all_gather(partial, axis_name)  # (D, ..., 4, 2K)
        acc = cr.te_sum_rns(curve, jnp.moveaxis(gathered, 0, -3))
        return cr.to_limb_points(curve, acc)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis_name), P(*([None] * (bits.ndim - 1) + [axis_name]))),
        out_specs=P(),
        check_vma=False,
    )
    return fn(table_rns, bits)


def sharded_fixed_base_msm_sw_rns(
    curve,
    table_rns: jnp.ndarray,
    bits: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
) -> jnp.ndarray:
    """SW twin of :func:`sharded_fixed_base_msm_rns` (round 5): shard the
    projective RNS table over the mesh, per-device partials via the
    complete-RCB conditional sum, gather the D partial points and fold
    with the log-depth complete-addition tree.

    table_rns: (N, 3, 2K) residues (ops/curve_sw_rns.pack_points_rns);
    returns replicated projective limb points (..., 3, L).  This is the
    multi-chip shape for BLS12-381 G1 Pedersen/fixed-base workloads.
    """
    from crypto_primitives_tpu.ops import curve_sw_rns as sw

    n_dev = mesh.shape[axis_name]
    assert table_rns.shape[0] % n_dev == 0

    def shard_fn(table_shard, bits_shard):
        partial = sw.sw_conditional_sum_rns(curve, table_shard, bits_shard)
        gathered = jax.lax.all_gather(partial, axis_name)  # (D, ..., 3, 2K)
        acc = sw.sw_sum_rns(curve, jnp.moveaxis(gathered, 0, -3))
        return sw.to_limb_points(curve, acc)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis_name), P(*([None] * (bits.ndim - 1) + [axis_name]))),
        out_specs=P(),
        check_vma=False,
    )
    return fn(table_rns, bits)
