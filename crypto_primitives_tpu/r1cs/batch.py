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
gadgets, field Merkle PathVar, select/is_eq) AND byte circuits
(UInt8/UInt32 — SHA-256/Blake2s gadgets): word allocation/packing rides
the ``v_word_*`` hooks with a host-resident numpy bool plane, so the
dense bitwise traffic of a hash circuit never queues per-bit device ops;
only field-plane ops (addmany packing/decomposition, witness rows) touch
the device.

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


class SmallWord:
    """Standard-domain small field value: an (N,) int64 numpy array of
    centered residues mod p with a tracked magnitude bound.

    The byte-circuit tier (UInt8/UInt32 — SHA-256/Blake2s gadgets) keeps
    every bit/word value in this host-resident representation, so the
    dense bitwise traffic of a hash circuit synthesizes as pure numpy
    with ZERO per-op device dispatches; ``stack_assignments`` converts
    all SmallWord rows to Montgomery limbs in one batched device program
    at check time."""

    __slots__ = ("v", "bound")

    def __init__(self, v: np.ndarray, bound: int):
        self.v = v
        self.bound = bound


_SMALL_LIMIT = 1 << 62  # int64-safe magnitude ceiling


class BatchConstraintSystem(ConstraintSystem):
    """ConstraintSystem whose assignment values are (N, L) Montgomery limb
    arrays or SmallWord rows (constants stay python ints — they are
    instance-independent).
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

    def _centered(self, c: int):
        """Centered representative of c mod p (small iff c or p-c is)."""
        c %= self.field.p
        return c - self.field.p if c > self.field.p // 2 else c

    @staticmethod
    def _small(v: np.ndarray) -> "SmallWord":
        """SmallWord with its bound taken from the ACTUAL magnitudes.
        Symbolic bound products compound (a 256-term conjunction of
        bound-2 booleans would claim 2^256 and force the Montgomery
        fallback) while the values stay 0/1; pre-op guards still use the
        operand bounds, so int64 can never overflow mid-op."""
        return SmallWord(v, int(np.abs(v).max(initial=0)))

    def _small_to_mont(self, vals: np.ndarray) -> jnp.ndarray:
        """(..., N) int64 centered values -> (..., N, L) Montgomery rows
        (one device program for the whole stack)."""
        mag = np.abs(vals.astype(np.int64))
        L = self.field.num_limbs
        limbs = np.zeros(vals.shape + (L,), np.uint32)
        for j in range(4):  # |v| < 2^62 spans <= 4 16-bit limbs
            limbs[..., j] = ((mag >> (16 * j)) & 0xFFFF).astype(np.uint32)
        m = ff.to_mont_device(self.field, jnp.asarray(limbs))
        return jnp.where(
            jnp.asarray(vals < 0)[..., None], ff.neg(self.field, m), m
        )

    def _promote(self, v) -> jnp.ndarray:
        """int constant / SmallWord -> (N, L) Montgomery rows."""
        if isinstance(v, (int, np.integer)):
            return jnp.broadcast_to(
                jnp.asarray(self._packed_const(int(v))),
                (self.batch, self.field.num_limbs),
            )
        if isinstance(v, SmallWord):
            return self._small_to_mont(v.v)
        return v

    # -- value hooks (batched) --

    def v_norm(self, v):
        if isinstance(v, (int, np.integer)):
            return int(v) % self.field.p
        if isinstance(v, SmallWord):
            assert v.v.shape == (self.batch,), v.v.shape
            return v
        assert v.shape == (self.batch, self.field.num_limbs), v.shape
        return v

    def v_add(self, a, b):
        if isinstance(a, (int, np.integer)) and isinstance(b, (int, np.integer)):
            return (int(a) + int(b)) % self.field.p
        # SmallWord fast paths: stay in host int64 while bounds allow
        if isinstance(a, SmallWord) or isinstance(b, SmallWord):
            if isinstance(a, (int, np.integer)):
                a, b = b, a
            if isinstance(b, (int, np.integer)):
                cc = self._centered(int(b))
                if isinstance(a, SmallWord) and abs(cc) + a.bound < _SMALL_LIMIT:
                    return self._small(a.v + cc)
            elif isinstance(a, SmallWord) and isinstance(b, SmallWord):
                if a.bound + b.bound < _SMALL_LIMIT:
                    return self._small(a.v + b.v)
        return ff.add(self.field, self._promote(a), self._promote(b))

    def v_scale(self, a, c: int):
        if isinstance(a, (int, np.integer)):
            return (int(a) * c) % self.field.p
        if isinstance(a, SmallWord):
            cc = self._centered(c)
            if abs(cc) * a.bound < _SMALL_LIMIT:
                return self._small(a.v * cc)
        return ff.mont_mul(
            self.field, self._promote(a), jnp.asarray(self._packed_const(c))
        )

    def v_mul(self, a, b):
        if isinstance(a, (int, np.integer)) and isinstance(b, (int, np.integer)):
            return (int(a) * int(b)) % self.field.p
        if isinstance(a, SmallWord) and isinstance(b, SmallWord):
            if a.bound * b.bound < _SMALL_LIMIT:
                return self._small(a.v * b.v)
        return ff.mont_mul(self.field, self._promote(a), self._promote(b))

    def v_inv0(self, a):
        if isinstance(a, (int, np.integer)):
            return super().v_inv0(int(a))
        return ff.inv(self.field, self._promote(a))  # Fermat: inv(0) == 0

    def v_is_zero(self, a):
        if isinstance(a, (int, np.integer)):
            return int(a) % self.field.p == 0
        if isinstance(a, SmallWord):
            # |a| < 2^62 << p/2: the centered residue is 0 iff value == 0
            return a.v == 0
        return ff.is_zero(self.field, a)  # (N,) bool

    def v_bits(self, a, nbits: int):
        if isinstance(a, (int, np.integer)):
            return super().v_bits(int(a), nbits)
        if isinstance(a, SmallWord):
            # host path: addmany decompositions of nonnegative word sums
            assert a.bound < (1 << nbits) or (
                (a.v >= 0).all() and (a.v < (1 << nbits)).all()
            ), "value does not fit requested bits"
            assert (a.v >= 0).all(), "bit decomposition of negative residue"
            v = a.v.astype(np.uint64)
            return [((v >> np.uint64(i)) & 1) != 0 for i in range(nbits)]
        # device path (field-plane decompositions): stays lazy jnp — no
        # host sync; the byte-circuit plane never reaches this branch
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
        if isinstance(b, np.ndarray):
            # host bool plane (byte circuits): 0/1 SmallWord rows, no
            # device dispatch per bit allocation
            return SmallWord(b.astype(np.int64), 1)
        # device bool plane (field circuits): stay lazy on device
        one = jnp.asarray(self._packed_const(1))
        return jnp.where(
            jnp.asarray(b)[:, None], one[None, :],
            jnp.zeros_like(one)[None, :],
        )

    def v_not(self, b):
        if isinstance(b, (bool, np.bool_)):
            return not b
        if isinstance(b, np.ndarray):
            return np.logical_not(b)
        return jnp.logical_not(b)

    def v_and(self, a, b):
        if isinstance(a, (bool, np.bool_)) and isinstance(b, (bool, np.bool_)):
            return a and b
        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            return np.logical_and(np.asarray(a), np.asarray(b))
        return jnp.logical_and(a, b)

    def v_xor(self, a, b):
        if isinstance(a, (bool, np.bool_)) and isinstance(b, (bool, np.bool_)):
            return a ^ b
        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            return np.logical_xor(np.asarray(a), np.asarray(b))
        return jnp.logical_xor(a, b)

    # word-level hooks: the byte-circuit tier (round-3 verdict item 3).
    # Word values are (N,) numpy uint64 arrays; bit values are (N,) numpy
    # bool arrays; scalars stay python (instance-independent constants).

    def v_word_bits(self, value, n: int):
        if isinstance(value, (int, np.integer)):
            return super().v_word_bits(int(value), n)
        v = np.asarray(value)
        assert v.shape == (self.batch,), v.shape
        return [((v.astype(np.uint64) >> np.uint64(i)) & 1) != 0 for i in range(n)]

    def v_pack_word(self, bit_vals):
        if all(isinstance(b, (bool, np.bool_)) for b in bit_vals):
            return super().v_pack_word(bit_vals)
        acc = np.zeros((self.batch,), np.uint64)
        for i, b in enumerate(bit_vals):
            acc |= np.asarray(b, np.uint64) << np.uint64(i)
        return acc

    def v_word_to_field(self, word):
        if isinstance(word, (int, np.integer)):
            return super().v_word_to_field(word)
        v = np.asarray(word, np.uint64)
        assert (v < _SMALL_LIMIT).all()
        return SmallWord(v.astype(np.int64), int(v.max(initial=0)) + 1)

    def v_select(self, c, a, b):
        if isinstance(c, (bool, np.bool_)):
            return a if c else b
        if isinstance(c, np.ndarray):
            return np.where(c, a, b)
        return jnp.where(c, a, b)

    # -- witness matrix + checks --

    def stack_assignments(self) -> jnp.ndarray:
        """(V, N, L) Montgomery witness matrix (constants broadcast).

        All SmallWord rows (the byte-circuit value plane) convert to
        Montgomery limbs in ONE batched device program rather than one
        dispatch per variable."""
        small_idx = [
            i for i, v in enumerate(self.assignments)
            if isinstance(v, SmallWord)
        ]
        small_rows = None
        if small_idx:
            vals = np.stack(
                [self.assignments[i].v for i in small_idx], axis=0
            )  # (Vs, N)
            # chunk over vars: to_mont's schoolbook intermediates are
            # O(rows * N * L^2) and a 20k-var hash circuit at N=1024
            # would otherwise materialize tens of GB on device
            vc = max(1, (1 << 21) // max(self.batch, 1))
            small_rows = jnp.concatenate(
                [
                    self._small_to_mont(vals[s : s + vc])
                    for s in range(0, vals.shape[0], vc)
                ],
                axis=0,
            )  # (Vs, N, L)
        rows = []
        si = 0
        for i, v in enumerate(self.assignments):
            if isinstance(v, SmallWord):
                rows.append(small_rows[si])
                si += 1
            else:
                rows.append(self._promote(v))
        return jnp.stack(rows, axis=0)

    def value_host(self, v, instance: int) -> int:
        """One instance's value of an assignment-style value, as an int."""
        if isinstance(v, (int, np.integer)):
            return int(v) % self.field.p
        if isinstance(v, SmallWord):
            return int(v.v[instance]) % self.field.p
        return int(self.field.unpack(np.asarray(v[instance])))

    def eval_lc(self, lc):  # pragma: no cover - host path unsupported
        raise NotImplementedError(
            "BatchConstraintSystem is checked on device: is_satisfied()/"
            "check_satisfied_device"
        )

    def which_unsatisfied(self, instance: int = None):
        """First failing constraint index — as an (N,) int array of
        per-instance indices (-1 = satisfied), or one instance's index /
        None when ``instance`` is given (the scalar-tier debugging twin).
        Small-domain circuits only; field circuits use the scalar tier
        per instance."""
        sd = self._small_check_data()
        if sd is None:
            raise NotImplementedError(
                "per-constraint debugging needs the small-domain check; "
                "re-synthesize the failing instance on the scalar tier"
            )
        n = self.num_constraints
        rows = np.empty((len(self.assignments), self.batch), np.int64)
        for i, v in enumerate(self.assignments):
            rows[i] = v.v if isinstance(v, SmallWord) else self._centered(int(v))
        with jax.enable_x64():
            z = jnp.asarray(rows)

            def ev(tri):
                ri, ci, cc = tri
                prods = jnp.asarray(cc)[:, None] * z[ci]
                return jax.ops.segment_sum(
                    prods, jnp.asarray(ri), num_segments=n
                )

            a, b, c = (ev(t) for t in sd)
            bad = a * b != c  # (n, N)
            first = jnp.where(
                bad.any(axis=0),
                jnp.argmax(bad, axis=0),
                -1,
            )
            out = np.asarray(first)
        if instance is None:
            return out
        idx = int(out[instance])
        return None if idx < 0 else idx

    def is_satisfied(self) -> bool:
        """ALL instances satisfied, one device program (the batched twin of
        device_check.check_satisfied_device)."""
        return bool(jnp.all(self.satisfied_per_instance()))

    # -- small-domain fast check (byte circuits) --

    def _small_check_data(self):
        """Precompute the exact-int64 COO check, or None when any value,
        coefficient, row bound, or product bound exceeds the int64-exact
        budget.  Soundness: with every LC evaluation |a|,|b|,|c| < 2^55
        and |a*b| < 2^62 << p, the R1CS relation a*b == c (mod p) holds
        iff it holds over the integers, so no Montgomery arithmetic is
        needed at all — the whole check is int64 gather/mul/segment-sum.
        Byte circuits (SHA-256/Blake2s: booleanity, xor, and, word
        packing) always qualify; field circuits fall back."""
        LIM_V = 1 << 40  # value / coefficient magnitude budget
        LIM_R = 1 << 55  # per-row LC bound
        vmax = np.empty(len(self.assignments), np.float64)
        for i, v in enumerate(self.assignments):
            if isinstance(v, SmallWord):
                m = int(np.abs(v.v).max(initial=0))
            elif isinstance(v, (int, np.integer)):
                m = abs(self._centered(int(v)))
            else:
                return None
            if m >= LIM_V:
                return None
            vmax[i] = float(m)
        # centered COO coefficients are value-independent: cache per
        # constraint count (the python centering pass over ~nnz coeffs is
        # the expensive part); value bounds re-validate on EVERY call so
        # later assignment tampering can never silently overflow int64
        cached = getattr(self, "_small_coo", None)
        if cached is None or self._small_coo_n != self.num_constraints:
            coo = self.to_coo()
            cached = []
            for name in "abc":
                ri, ci, coeffs = coo[name]
                cc = np.empty(len(coeffs), np.int64)
                for j, c in enumerate(coeffs):
                    cen = self._centered(int(c))
                    if abs(cen) >= LIM_V:
                        self._small_coo, self._small_coo_n = (
                            False, self.num_constraints,
                        )
                        return None
                    cc[j] = cen
                cached.append((ri, ci, cc))
            self._small_coo = cached
            self._small_coo_n = self.num_constraints
        if cached is False:
            return None
        out = []
        bounds = []
        for ri, ci, cc in cached:
            rb = np.zeros(self.num_constraints, np.float64)
            if len(ri):
                np.add.at(rb, ri, np.abs(cc).astype(np.float64) * vmax[ci])
            if rb.size and rb.max() >= LIM_R:
                return None
            bounds.append(rb)
            # numpy, NOT jnp: converting int64 outside the x64 scope
            # would silently downcast the coefficients to int32
            out.append((ri, ci, cc))
        if self.num_constraints and (
            (bounds[0] * bounds[1]).max() >= float(1 << 61)
        ):
            return None
        return tuple(out)

    def _satisfied_small(self, sd, chunk: int = None) -> jnp.ndarray:
        n = self.num_constraints
        rows = np.empty((len(self.assignments), self.batch), np.int64)
        for i, v in enumerate(self.assignments):
            if isinstance(v, SmallWord):
                rows[i] = v.v
            else:
                rows[i] = self._centered(int(v))
        check = getattr(self, "_small_fn", None)
        if check is None or self._small_n != n:
            sd_np = tuple(
                (np.asarray(ri), np.asarray(ci), np.asarray(cc))
                for ri, ci, cc in sd
            )

            @jax.jit
            def check(zc, sd=sd_np):
                def ev(tri):
                    ri, ci, cc = tri
                    prods = jnp.asarray(cc)[:, None] * zc[ci]
                    return jax.ops.segment_sum(
                        prods, jnp.asarray(ri), num_segments=n
                    )

                a, b, c = (ev(t) for t in sd)
                return jnp.all(a * b == c, axis=0)

            self._small_fn, self._small_n = check, n
        nnz = max(1, int(sum(np.asarray(t[0]).shape[0] for t in sd)))
        if chunk is None:
            chunk = max(16, min(self.batch, (1 << 24) // nnz))
        outs = []
        # the whole evaluation needs exact int64 (values up to ~2^55);
        # jax downcasts to int32 outside the x64 scope
        with jax.enable_x64():
            z = jnp.asarray(rows)  # (V, N) int64
            for s in range(0, self.batch, chunk):
                e = min(s + chunk, self.batch)
                zc = z[:, s:e]
                if e - s < chunk:  # pad the tail: at most 2 programs
                    pad = chunk - (e - s)
                    zc = jnp.concatenate(
                        [zc, jnp.repeat(z[:, e - 1 : e], pad, axis=1)],
                        axis=1,
                    )
                    outs.append(np.asarray(check(zc)[: e - s]))
                else:
                    outs.append(np.asarray(check(zc)))
        return jnp.concatenate([jnp.asarray(o) for o in outs])

    def satisfied_per_instance(self, chunk: int = None) -> jnp.ndarray:
        """(N,) bool.  Byte circuits take the exact-int64 small-domain
        check (_small_check_data); otherwise instances are processed in
        chunks sized so the schoolbook intermediates of the COO products
        stay ~HBM-friendly (nnz * chunk * (2L+1) limb planes)."""
        sd = self._small_check_data()
        if sd is not None:
            return self._satisfied_small(sd, chunk)
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
