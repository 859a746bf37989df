"""Vectorized R1CS synthesis: N circuit instances as ONE array program.

SURVEY.md §7 plan (D) — "synthesis as a vectorized trace, not
per-variable object allocation" — and round-2 verdict item 5.  The scalar
tier (r1cs/cs.py) computes witnesses with per-instance python ints; here
the SAME gadget code (every value-arithmetic step routes through the
ConstraintSystem `v_*` hooks) runs once, recording the constraint
structure a single time while every witness value is an (N, L) Montgomery
limb array computed by batched device ops.  Constraint counts are
trivially identical per instance — it is literally the same synthesis
trace — and satisfaction checks run as one device program over the
(V, N, L) witness matrix (the batched extension of
device_check.check_satisfied_device).

Scope: field-native circuits (FpVar/Boolean — Poseidon sponge/CRH
gadgets, field Merkle PathVar, select/is_eq).  Byte-oriented vars
(UInt8/UInt32 gadgets) remain scalar-tier.

Reference usage being re-expressed: cs.is_satisfied() over per-instance
circuits, e.g. /root/reference/crypto-primitives/src/merkle_tree/tests/
constraints.rs:92-147.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.ops import field as ff
from crypto_primitives_tpu.ops.field import FieldSpec
from crypto_primitives_tpu.r1cs.cs import ConstraintSystem


class BatchConstraintSystem(ConstraintSystem):
    """ConstraintSystem whose assignment values are (N, L) Montgomery limb
    arrays (constants stay python ints — they are instance-independent).
    """

    def __init__(self, field: FieldSpec, batch: int):
        super().__init__(field)
        self.batch = batch
        self._const_cache: dict = {}

    # -- helpers --

    def _packed_const(self, c: int) -> np.ndarray:
        c %= self.field.p
        hit = self._const_cache.get(c)
        if hit is None:
            hit = self.field.pack([[c]])[0, 0]  # (L,) Montgomery
            self._const_cache[c] = hit
        return hit

    def _promote(self, v) -> jnp.ndarray:
        """int constant -> broadcast (N, L) Montgomery rows."""
        if isinstance(v, (int, np.integer)):
            return jnp.broadcast_to(
                jnp.asarray(self._packed_const(int(v))),
                (self.batch, self.field.num_limbs),
            )
        return v

    # -- value hooks (batched) --

    def v_norm(self, v):
        if isinstance(v, (int, np.integer)):
            return int(v) % self.field.p
        assert v.shape == (self.batch, self.field.num_limbs), v.shape
        return v

    def v_add(self, a, b):
        if isinstance(a, (int, np.integer)) and isinstance(b, (int, np.integer)):
            return (int(a) + int(b)) % self.field.p
        return ff.add(self.field, self._promote(a), self._promote(b))

    def v_scale(self, a, c: int):
        if isinstance(a, (int, np.integer)):
            return (int(a) * c) % self.field.p
        return ff.mont_mul(
            self.field, a, jnp.asarray(self._packed_const(c))
        )

    def v_mul(self, a, b):
        if isinstance(a, (int, np.integer)) and isinstance(b, (int, np.integer)):
            return (int(a) * int(b)) % self.field.p
        return ff.mont_mul(self.field, self._promote(a), self._promote(b))

    def v_inv0(self, a):
        if isinstance(a, (int, np.integer)):
            return super().v_inv0(int(a))
        return ff.inv(self.field, a)  # Fermat: inv(0) == 0, the convention

    def v_is_zero(self, a):
        if isinstance(a, (int, np.integer)):
            return int(a) % self.field.p == 0
        return ff.is_zero(self.field, a)  # (N,) bool

    def v_bits(self, a, nbits: int):
        if isinstance(a, (int, np.integer)):
            return super().v_bits(int(a), nbits)
        std = ff.from_mont_device(self.field, a)  # (N, L) 16-bit limbs
        b = (std[..., None] >> jnp.arange(16, dtype=jnp.uint32)) & 1
        b = b.reshape(std.shape[:-1] + (-1,))[..., :nbits] == 1  # (N, nbits)
        return [b[:, i] for i in range(nbits)]

    def v_bool(self, b):
        if isinstance(b, (bool, int, np.bool_, np.integer)):
            return bool(b)
        return b  # (N,) bool array

    def v_from_bool(self, b):
        if isinstance(b, (bool, int, np.bool_, np.integer)):
            return int(bool(b))
        one = jnp.asarray(self._packed_const(1))
        return jnp.where(
            jnp.asarray(b)[:, None], one[None, :],
            jnp.zeros_like(one)[None, :],
        )

    def v_not(self, b):
        if isinstance(b, (bool, np.bool_)):
            return not b
        return jnp.logical_not(b)

    def v_and(self, a, b):
        if isinstance(a, (bool, np.bool_)) and isinstance(b, (bool, np.bool_)):
            return a and b
        return jnp.logical_and(a, b)

    def v_xor(self, a, b):
        if isinstance(a, (bool, np.bool_)) and isinstance(b, (bool, np.bool_)):
            return a ^ b
        return jnp.logical_xor(a, b)

    # -- witness matrix + checks --

    def stack_assignments(self) -> jnp.ndarray:
        """(V, N, L) Montgomery witness matrix (constants broadcast)."""
        rows = [self._promote(v) for v in self.assignments]
        return jnp.stack(rows, axis=0)

    def value_host(self, v, instance: int) -> int:
        """One instance's value of an assignment-style value, as an int."""
        if isinstance(v, (int, np.integer)):
            return int(v) % self.field.p
        return int(self.field.unpack(np.asarray(v[instance])))

    def eval_lc(self, lc):  # pragma: no cover - host path unsupported
        raise NotImplementedError(
            "BatchConstraintSystem is checked on device: is_satisfied()/"
            "check_satisfied_device"
        )

    def which_unsatisfied(self):
        raise NotImplementedError("use is_satisfied() (device check)")

    def is_satisfied(self) -> bool:
        """ALL instances satisfied, one device program (the batched twin of
        device_check.check_satisfied_device)."""
        return bool(jnp.all(self.satisfied_per_instance()))

    def satisfied_per_instance(self, chunk: int = None) -> jnp.ndarray:
        """(N,) bool.  Instances are processed in chunks sized so the
        schoolbook intermediates of the COO products stay ~HBM-friendly
        (nnz * chunk * (2L+1) limb planes)."""
        from crypto_primitives_tpu.r1cs.device_check import _matrix_rows_device

        spec = self.field
        n = self.num_constraints
        if n == 0:
            return jnp.ones((self.batch,), bool)
        z = self.stack_assignments()  # (V, N, L)
        check = getattr(self, "_check_fn", None)
        if check is None or self._check_n != n:
            coo = self.to_coo()
            nnz = sum(len(coo[m][0]) for m in "abc")
            self._check_chunk = max(
                16, min(self.batch, (1 << 21) // max(nnz, 1))
            )

            @jax.jit
            def check(zc):
                a = _matrix_rows_device(spec, *coo["a"], zc, n)
                b = _matrix_rows_device(spec, *coo["b"], zc, n)
                c = _matrix_rows_device(spec, *coo["c"], zc, n)
                ab = ff.mont_mul(spec, a, b)
                return jnp.all(ab == c, axis=(0, 2))

            # cache per constraint count so repeated checks reuse the
            # compiled program (a fresh jit wrapper would recompile)
            self._check_fn, self._check_n = check, n
        if chunk is None:
            chunk = self._check_chunk

        outs = []
        for s in range(0, self.batch, chunk):
            e = min(s + chunk, self.batch)
            zc = z[:, s:e]
            if e - s < chunk:  # pad the tail so at most 2 programs compile
                pad = chunk - (e - s)
                zc = jnp.concatenate(
                    [zc, jnp.repeat(z[:, e - 1 : e], pad, axis=1)], axis=1
                )
                outs.append(check(zc)[: e - s])
            else:
                outs.append(check(zc))
        return jnp.concatenate(outs)
