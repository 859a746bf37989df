"""Poseidon permutation, duplex sponge, and default parameter derivation.

Twin of /root/reference/crypto-primitives/src/sponge/poseidon/{mod.rs,traits.rs}.

Two tiers (SURVEY.md §7.2):
  * ``PoseidonSponge`` — host oracle over python ints, a line-for-line
    behavioral mirror of the reference duplex bookkeeping **including its
    squeeze-at-rate-boundary permutation-skip quirk**
    (src/sponge/poseidon/tests.rs:12-65); used as the parity oracle and for
    setup-time hashing.
  * ``PoseidonSpongeBatch`` — the TPU path: state is a (batch, t, L) uint32
    Montgomery limb array, or (batch, t, 2K) float32 RNS-Montgomery residues
    when the fused RNS kernel is available (the headline 1.1e7 perm/s path;
    see the class docstring).  Absorb/squeeze schedules are static at trace
    time so the whole duplex computation jit-compiles to pure array ops.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.sponge.grain_lfsr import PoseidonGrainLFSR
from crypto_primitives_tpu.ops import field as ff
from crypto_primitives_tpu.ops.field import FieldSpec


@dataclasses.dataclass
class PoseidonConfig:
    """Round constants/MDS over python ints (host canonical form).

    Mirrors `PoseidonConfig` (src/sponge/poseidon/mod.rs:27-45); the device
    representation is obtained via :meth:`packed`.
    """

    field: FieldSpec
    full_rounds: int
    partial_rounds: int
    alpha: int
    ark: list  # [full+partial][t] ints
    mds: list  # [t][t] ints
    rate: int
    capacity: int

    def __post_init__(self):
        t = self.rate + self.capacity
        assert len(self.ark) == self.full_rounds + self.partial_rounds
        assert all(len(row) == t for row in self.ark)
        assert len(self.mds) == t and all(len(row) == t for row in self.mds)

    @property
    def t(self) -> int:
        return self.rate + self.capacity

    @functools.cache
    def packed(self) -> "PackedPoseidon":
        # NOTE: tables are cached as NUMPY arrays (never jnp) so that a first
        # call from inside a jit/shard_map trace cannot memoize tracers;
        # jax embeds them as constants at each trace site.
        spec = self.field
        rf2 = self.full_rounds // 2
        ark = np.asarray(spec.pack(self.ark))  # (rounds, t, L) Montgomery
        return PackedPoseidon(
            config=self,
            ark_full1=ark[:rf2],
            ark_partial=ark[rf2 : rf2 + self.partial_rounds],
            ark_full2=ark[rf2 + self.partial_rounds :],
            mds=np.asarray(spec.pack(self.mds)),
        )

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@dataclasses.dataclass(eq=False)
class PackedPoseidon:
    """Device-resident constant tables (Montgomery limbs), replicated."""

    config: PoseidonConfig
    ark_full1: jnp.ndarray  # (R_F/2, t, L)
    ark_partial: jnp.ndarray  # (R_P, t, L)
    ark_full2: jnp.ndarray  # (R_F/2, t, L)
    mds: jnp.ndarray  # (t, t, L)

    def __hash__(self):
        return id(self)


# ----------------------------------------------------------------------
# Device permutation (the inner hot loop everywhere — SURVEY.md §3.3)
# ----------------------------------------------------------------------


def _round(spec: FieldSpec, alpha: int, mds, state, ark_row, full: bool):
    """ark -> s-box -> MDS, exactly the reference round order
    (src/sponge/poseidon/mod.rs:98-121)."""
    state = ff.add(spec, state, ark_row)
    if full:
        state = ff.pow_const(spec, state, alpha)
    else:
        x0 = ff.pow_const(spec, state[..., 0:1, :], alpha)
        state = jnp.concatenate([x0, state[..., 1:, :]], axis=-2)
    # MDS: new[i] = sum_j mds[i][j] * state[j] with one lazy Montgomery
    # reduction per output element (mont_dot) — t*t limb-products ride the VPU.
    t = state.shape[-2]
    s_b = jnp.broadcast_to(state[..., None, :, :], state.shape[:-2] + (t, t, state.shape[-1]))
    return ff.mont_dot(spec, mds, s_b)


@functools.partial(jax.jit, static_argnums=(0, 1))
def permute(spec: FieldSpec, packed: PackedPoseidon, state: jnp.ndarray) -> jnp.ndarray:
    """Apply the Poseidon permutation to ``state`` of shape (..., t, L).

    Full/partial round phases are `lax.scan`s over the ark tables, so the
    traced program is three small round bodies regardless of round count.
    """
    cfg = packed.config
    alpha, mds = cfg.alpha, packed.mds

    def full_body(s, ark_row):
        return _round(spec, alpha, mds, s, ark_row, True), None

    def partial_body(s, ark_row):
        return _round(spec, alpha, mds, s, ark_row, False), None

    state, _ = jax.lax.scan(full_body, state, packed.ark_full1)
    state, _ = jax.lax.scan(partial_body, state, packed.ark_partial)
    state, _ = jax.lax.scan(full_body, state, packed.ark_full2)
    return state


def _bits_le_to_field(bits: jnp.ndarray, spec) -> jnp.ndarray:
    """(..., nb) LE bits -> (..., L) Montgomery limbs of spec
    (from_le_bytes_mod_order semantics; nb <= spec.nbits so at most one
    conditional subtraction is needed)."""
    nb = bits.shape[-1]
    L = spec.num_limbs
    assert nb <= spec.nbits
    pad = 16 * L - nb
    if pad:
        b = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), bits.dtype)], axis=-1
        )
    else:
        b = bits
    groups = b.reshape(b.shape[:-1] + (L, 16)).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(16, dtype=jnp.uint32))
    std = jnp.sum(groups * weights, axis=-1).astype(jnp.uint32)
    std = ff._cond_sub_p(spec, std)
    return ff.to_mont_device(spec, std)


@functools.cache
def _rns_supported(spec: FieldSpec) -> bool:
    """True when ops/rns.py can build a plan for the modulus.  The fused
    kernel is parameterized by the plan geometry (round 5) — legacy 2x24
    and big mid-red plans (>256-bit fields, e.g. the BLS12-381 base
    field) both ride it; only moduli past the 11-bit prime pool fall
    back to the limb tier."""
    try:
        from crypto_primitives_tpu.ops import rns

        rns.build_plan(spec.p)
        return True
    except (AssertionError, ValueError):
        return False


def _sponge_rep(spec: FieldSpec, batch: int) -> str:
    """Pick the sponge state representation: "rns" rides the fused
    RNS-Montgomery Pallas kernel (ops/poseidon_rns_pallas.py, the 1.1e7
    perm/s headline path); "limb" is the uint32 Montgomery fallback.
    CPT_SPONGE_RNS=0/1 forces either (read per call, like other CPT_*)."""
    import os

    env = os.environ.get("CPT_SPONGE_RNS", "")
    if env == "0":
        return "limb"
    if not _rns_supported(spec):
        return "limb"
    if env == "1":
        return "rns"
    return (
        "rns"
        if jax.default_backend() == "tpu" and batch >= 64
        else "limb"
    )


class PoseidonSpongeBatch:
    """Batched duplex sponge on device; static absorb/squeeze schedule.

    The duplex mode bookkeeping (absorb/squeeze indices) is *python-level*
    state because input/output lengths are static under jit — so it traces
    away entirely, leaving a fixed sequence of adds/permutes (the TPU
    re-expression of src/sponge/poseidon/mod.rs:124-186).  All methods mirror
    the reference's exact permutation scheduling, quirk included.

    Two state representations behind one API (rep picked by _sponge_rep):
      * "limb": (..., t, L) uint32 Montgomery limbs, permuted by the XLA
        scan path or the round-1 limb Pallas kernel;
      * "rns": (..., t, 2K) float32 RNS-Montgomery residues, permuted by
        the fused RNS kernel — the headline 1.1e7 perm/s path.  Absorbed
        limb elements convert at the boundary (rns_xla.from_mont_limbs, one
        byte matmul + mont_reduce); squeezed elements convert back
        (rns_xla.to_mont_limbs), so callers see Montgomery limbs either
        way and results are bit-identical.  Static per-rate-slot value
        bounds (units of p) are tracked python-side; each slot receives at
        most one bound-3 add between permutes, so the kernel entry bound
        (state 3 + elem 3 + ark 1)^2 = 49 stays inside the M1//p = 55
        Montgomery domain (asserted per permute).
    """

    def __init__(self, config: PoseidonConfig, batch_shape=(), state=None,
                 rep: Optional[str] = None):
        self.config = config
        self.spec = config.field
        self.packed = config.packed()
        self.batch_shape = tuple(batch_shape)
        batch = int(np.prod(self.batch_shape)) if self.batch_shape else 1
        if rep is None:
            if state is not None:
                rep = "rns" if state.dtype == jnp.float32 else "limb"
            else:
                rep = _sponge_rep(self.spec, batch)
        self.rep = rep
        if self.rep == "rns":
            from crypto_primitives_tpu.ops import rns

            self._plan = rns.build_plan(self.spec.p)
            self._bounds = [3] * config.t  # conservative for imported state
        if state is None:
            if self.rep == "rns":
                state = jnp.zeros(
                    self.batch_shape + (config.t, 2 * self._plan.k),
                    jnp.float32,
                )
                self._bounds = [0] * config.t
            else:
                state = ff.zeros(self.spec, self.batch_shape + (config.t,))
        self.state = state
        self.mode = "absorbing"
        self.index = 0  # next_absorb_index or next_squeeze_index

    # -- state import/export (SpongeExt twin, src/sponge/mod.rs:184-191) --
    def into_state(self):
        st = {
            "state": self.state,
            "mode": self.mode,
            "index": self.index,
            "rep": self.rep,
        }
        if self.rep == "rns":
            st["bounds"] = list(self._bounds)
        return st

    @classmethod
    def from_state(cls, st, config: PoseidonConfig):
        sponge = cls(
            config,
            batch_shape=st["state"].shape[:-2],
            state=st["state"],
            rep=st.get("rep"),
        )
        sponge.mode, sponge.index = st["mode"], st["index"]
        if sponge.rep == "rns" and "bounds" in st:
            sponge._bounds = list(st["bounds"])
        return sponge

    def _permute(self):
        batch = int(np.prod(self.batch_shape)) if self.batch_shape else 1
        if self.rep == "rns":
            # fused RNS-Montgomery kernel (the 1.1e7 perm/s headline path);
            # interpreter off-TPU so CPU tests stay bit-exact
            from crypto_primitives_tpu.ops.poseidon_rns_pallas import permute_rns

            assert max(self._bounds) <= 6, (
                f"sponge state bound {max(self._bounds)} exceeds the RNS "
                "kernel entry budget"
            )
            blk = 2048 if batch >= 2048 else max(128, batch)
            st = self.state.reshape((batch,) + self.state.shape[-2:])
            st = permute_rns(
                self._plan, self.config, st, block_b=blk,
                interpret=jax.default_backend() != "tpu",
            )
            self.state = st.reshape(self.state.shape)
            self._bounds = [3] * self.config.t
        elif jax.default_backend() == "tpu" and batch >= 256:
            # round-1 fused limb kernel (ops/poseidon_pallas.py)
            from crypto_primitives_tpu.ops.poseidon_pallas import permute_pallas

            blk = 1024 if batch >= 1024 else 256
            st = self.state.reshape((batch,) + self.state.shape[-2:])
            st = permute_pallas(self.spec, self.config, st, block_b=blk)
            self.state = st.reshape(self.state.shape)
        else:
            self.state = permute(self.spec, self.packed, self.state)

    def _to_rep(self, elems: jnp.ndarray) -> jnp.ndarray:
        """Bring absorbed elements into the state representation."""
        if self.rep == "rns" and elems.dtype != jnp.float32:
            from crypto_primitives_tpu.ops import rns_xla

            return rns_xla.from_mont_limbs(self._plan, self.spec, elems)
        if self.rep == "limb" and elems.dtype == jnp.float32:
            from crypto_primitives_tpu.ops import rns, rns_xla

            plan = rns.build_plan(self.spec.p)
            return rns_xla.to_mont_limbs(plan, self.spec, elems, bound=3)
        return elems

    def _slot_add(self, lo: int, hi: int, elems: jnp.ndarray):
        """state[..., cap+lo:cap+hi, :] += elems in the active rep."""
        cap = self.config.capacity
        cur = self.state[..., cap + lo : cap + hi, :]
        if self.rep == "rns":
            from crypto_primitives_tpu.ops import rns_xla

            c = rns_xla.plan_consts(self._plan)
            new = rns_xla.add_raw(c, cur, elems)
            for i in range(lo, hi):
                self._bounds[cap + i] += 3
        else:
            new = ff.add(self.spec, cur, elems)
        self.state = self.state.at[..., cap + lo : cap + hi, :].set(new)

    def _absorb_internal(self, rate_start: int, elems: jnp.ndarray):
        """elems: (..., k, D) in the state rep; mirrors absorb_internal
        (src/sponge/poseidon/mod.rs:124-153)."""
        rate = self.config.rate
        k = elems.shape[-2]
        pos = 0
        while True:
            remaining = k - pos
            if rate_start + remaining <= rate:
                self._slot_add(
                    rate_start, rate_start + remaining, elems[..., pos:, :]
                )
                self.mode, self.index = "absorbing", rate_start + remaining
                return
            n = rate - rate_start
            self._slot_add(rate_start, rate, elems[..., pos : pos + n, :])
            self._permute()
            pos += n
            rate_start = 0

    def absorb(self, elems: jnp.ndarray):
        """Absorb field elements of shape (..., k, L) (Montgomery limbs) or
        (..., k, 2K) float32 (RNS residues, bound <= 3)."""
        if elems.shape[-2] == 0:
            return
        elems = self._to_rep(elems)
        if self.mode == "absorbing":
            idx = self.index
            if idx == self.config.rate:
                self._permute()
                idx = 0
            self._absorb_internal(idx, elems)
        else:
            self._absorb_internal(0, elems)

    def _squeeze_internal(self, rate_start: int, n: int) -> jnp.ndarray:
        """Mirrors squeeze_internal (src/sponge/poseidon/mod.rs:156-186),
        including the no-permute-on-exact-boundary behavior."""
        rate, cap = self.config.rate, self.config.capacity
        outs = []
        remaining = n
        while True:
            if rate_start + remaining <= rate:
                outs.append(self.state[..., cap + rate_start : cap + rate_start + remaining, :])
                self.mode, self.index = "squeezing", rate_start + remaining
                return jnp.concatenate(outs, axis=-2)
            k = rate - rate_start
            outs.append(self.state[..., cap + rate_start : cap + rate, :])
            remaining -= k
            if remaining > 0:
                self._permute()
            rate_start = 0

    def _squeeze_native_rows(self, n: int) -> jnp.ndarray:
        """(..., n, D) rows in the state representation."""
        if self.mode == "absorbing":
            self._permute()
            return self._squeeze_internal(0, n)
        idx = self.index
        if idx == self.config.rate:
            self._permute()
            idx = 0
        return self._squeeze_internal(idx, n)

    def squeeze_native_field_elements(self, n: int) -> jnp.ndarray:
        """Returns (..., n, L) Montgomery limbs; mirrors
        squeeze_native_field_elements (src/sponge/poseidon/mod.rs:324-344).
        On the RNS tier the rows convert at this boundary
        (rns_xla.to_mont_limbs: small-scalar CRT, canonical limbs)."""
        rows = self._squeeze_native_rows(n)
        if self.rep == "rns":
            from crypto_primitives_tpu.ops import rns_xla

            return rns_xla.to_mont_limbs(self._plan, self.spec, rows, bound=3)
        return rows

    def squeeze_native_rns(self, n: int) -> jnp.ndarray:
        """RNS-resident squeeze: (..., n, 2K) float32 residues (bound 3),
        for pipelines that stay on the RNS tier (device Merkle trees,
        Fiat-Shamir loops); requires rep == "rns"."""
        assert self.rep == "rns", "squeeze_native_rns requires the RNS tier"
        return self._squeeze_native_rows(n)

    # -- CryptographicSponge byte/bit tier (src/sponge/mod.rs:101-154),
    # -- batched device twins of the host-oracle methods below ------------

    def _squeeze_canonical_bytes_le(self, num_elements: int) -> jnp.ndarray:
        """num_elements native squeezes -> (..., n, 2L) canonical LE bytes."""
        spec = self.spec
        elems = self.squeeze_native_field_elements(num_elements)
        std = ff.from_mont_device(spec, elems)  # canonical 16-bit limbs
        lo = (std & 0xFF).astype(jnp.uint8)
        hi = ((std >> 8) & 0xFF).astype(jnp.uint8)
        return jnp.stack([lo, hi], axis=-1).reshape(elems.shape[:-1] + (-1,))

    def squeeze_bytes(self, num_bytes: int) -> jnp.ndarray:
        """(..., num_bytes) uint8; twin of the host oracle's squeeze_bytes
        (src/sponge/poseidon/mod.rs:259-273)."""
        spec = self.spec
        usable = (spec.nbits - 1) // 8
        n = -(-num_bytes // usable)
        by = self._squeeze_canonical_bytes_le(n)  # (..., n, 2L)
        by = by[..., :usable].reshape(by.shape[:-2] + (n * usable,))
        return by[..., :num_bytes]

    def squeeze_bits(self, num_bits: int) -> jnp.ndarray:
        """(..., num_bits) bool, LE bit order per element
        (src/sponge/poseidon/mod.rs:275-289)."""
        spec = self.spec
        usable = spec.nbits - 1
        n = -(-num_bits // usable)
        elems = self.squeeze_native_field_elements(n)
        std = ff.from_mont_device(spec, elems)  # (..., n, L) 16-bit limbs
        bits = (std[..., None] >> jnp.arange(16, dtype=jnp.uint32)) & 1
        bits = bits.reshape(std.shape[:-1] + (-1,))[..., :usable]
        return bits.reshape(bits.shape[:-2] + (n * usable,))[..., :num_bits] == 1

    def squeeze_field_elements_with_sizes(self, target_spec, sizes) -> jnp.ndarray:
        """Cross-field squeeze via bit truncation (src/sponge/mod.rs:57-96).
        Returns (..., len(sizes), L_target) Montgomery limbs of target_spec.
        All sizes must currently share one bit-length per call when packing
        on device; heterogeneous sizes are handled by slicing per size."""
        from crypto_primitives_tpu.models.sponge import FieldElementSize

        if not sizes:
            return jnp.zeros(self.batch_shape + (0, target_spec.num_limbs), jnp.uint32)
        if target_spec.p == self.spec.p and all(
            s == FieldElementSize.FULL for s in sizes
        ):
            return self.squeeze_native_field_elements(len(sizes))
        nbs = [FieldElementSize.num_bits(s, target_spec) for s in sizes]
        bits = self.squeeze_bits(sum(nbs))
        outs = []
        window = 0
        for nb in nbs:
            chunk = bits[..., window : window + nb]
            window += nb
            outs.append(_bits_le_to_field(chunk, target_spec))
        return jnp.stack(outs, axis=-2)

    def fork(self, domain: bytes) -> "PoseidonSpongeBatch":
        """Domain separation (src/sponge/mod.rs:145-153): clone + absorb
        len-prefixed domain bytes (the prefix/domain field elements are
        static, computed host-side and broadcast over the batch)."""
        from crypto_primitives_tpu.models.sponge.absorb import (
            Usize,
            to_sponge_bytes,
            to_sponge_field_elements,
        )

        new = PoseidonSpongeBatch(
            self.config, batch_shape=self.batch_shape, state=self.state,
            rep=self.rep,
        )
        new.mode, new.index = self.mode, self.index
        if self.rep == "rns":
            new._bounds = list(self._bounds)
        inp = to_sponge_bytes(Usize(len(domain)), self.spec) + bytes(domain)
        vals = to_sponge_field_elements(inp, self.spec)
        packed = jnp.asarray(self.spec.pack([vals]))[0]  # (k, L)
        new.absorb(jnp.broadcast_to(packed, self.batch_shape + packed.shape))
        return new


# ----------------------------------------------------------------------
# Host oracle sponge (python ints, exact reference semantics)
# ----------------------------------------------------------------------


class PoseidonSponge:
    """Host-side duplex sponge over python ints (the parity oracle)."""

    def __init__(self, config: PoseidonConfig):
        self.config = config
        self.p = config.field.p
        self.state = [0] * config.t
        self.mode = "absorbing"
        self.index = 0

    def clone(self) -> "PoseidonSponge":
        s = PoseidonSponge(self.config)
        s.state = list(self.state)
        s.mode, s.index = self.mode, self.index
        return s

    # SpongeExt twin
    def into_state(self):
        return (list(self.state), self.mode, self.index)

    @classmethod
    def from_state(cls, state, config):
        s = cls(config)
        s.state, s.mode, s.index = list(state[0]), state[1], state[2]
        return s

    def permute(self):
        """Compiled C++ permutation when the native engine is loaded (the
        reference's native tier is compiled Rust; ours is crypto_primitives_tpu/native/cpmont.cpp),
        python-int rounds otherwise.  CPT_NATIVE=0 forces the python path,
        which stays the parity oracle (_permute_python)."""
        from crypto_primitives_tpu import native

        eng = native.poseidon_engine(self.config)
        if eng is not None:
            self.state = eng.permute([self.state])[0]
            return
        self._permute_python()

    def _permute_python(self):
        cfg, p = self.config, self.p
        state = list(self.state)
        rf2 = cfg.full_rounds // 2

        def rnd(i, full):
            nonlocal state
            state = [(s + a) % p for s, a in zip(state, cfg.ark[i])]
            if full:
                state = [pow(s, cfg.alpha, p) for s in state]
            else:
                state[0] = pow(state[0], cfg.alpha, p)
            state = [
                sum(m * s for m, s in zip(row, state)) % p for row in cfg.mds
            ]

        for i in range(rf2):
            rnd(i, True)
        for i in range(rf2, rf2 + cfg.partial_rounds):
            rnd(i, False)
        for i in range(rf2 + cfg.partial_rounds, cfg.partial_rounds + cfg.full_rounds):
            rnd(i, True)
        self.state = state

    def _absorb_internal(self, rate_start: int, elems: Sequence[int]):
        cfg = self.config
        pos = 0
        while True:
            remaining = len(elems) - pos
            if rate_start + remaining <= cfg.rate:
                for i in range(remaining):
                    self.state[cfg.capacity + rate_start + i] = (
                        self.state[cfg.capacity + rate_start + i] + elems[pos + i]
                    ) % self.p
                self.mode, self.index = "absorbing", rate_start + remaining
                return
            n = cfg.rate - rate_start
            for i in range(n):
                self.state[cfg.capacity + rate_start + i] = (
                    self.state[cfg.capacity + rate_start + i] + elems[pos + i]
                ) % self.p
            self.permute()
            pos += n
            rate_start = 0

    def absorb_elements(self, elems: Sequence[int]):
        """Absorb raw field elements (already encoded)."""
        if not elems:
            return
        if self.mode == "absorbing":
            idx = self.index
            if idx == self.config.rate:
                self.permute()
                idx = 0
            self._absorb_internal(idx, elems)
        else:
            self._absorb_internal(0, elems)

    def absorb(self, value):
        """Absorb any encodable value (see models/sponge/absorb.py)."""
        from crypto_primitives_tpu.models.sponge.absorb import to_sponge_field_elements

        self.absorb_elements(to_sponge_field_elements(value, self.config.field))

    def _squeeze_internal(self, rate_start: int, n: int) -> list:
        cfg = self.config
        out = []
        remaining = n
        while True:
            if rate_start + remaining <= cfg.rate:
                out.extend(
                    self.state[cfg.capacity + rate_start : cfg.capacity + rate_start + remaining]
                )
                self.mode, self.index = "squeezing", rate_start + remaining
                return out
            k = cfg.rate - rate_start
            out.extend(self.state[cfg.capacity + rate_start : cfg.capacity + cfg.rate])
            remaining -= k
            if remaining > 0:
                self.permute()
            rate_start = 0

    def squeeze_native_field_elements(self, n: int) -> list:
        if self.mode == "absorbing":
            self.permute()
            return self._squeeze_internal(0, n)
        idx = self.index
        if idx == self.config.rate:
            self.permute()
            idx = 0
        return self._squeeze_internal(idx, n)

    def squeeze_bytes(self, num_bytes: int) -> bytes:
        """src/sponge/poseidon/mod.rs:259-273."""
        spec = self.config.field
        usable_bytes = (spec.nbits - 1) // 8
        num_elements = -(-num_bytes // usable_bytes)
        elems = self.squeeze_native_field_elements(num_elements)
        out = b"".join(spec.to_bytes_le(e)[:usable_bytes] for e in elems)
        return out[:num_bytes]

    def squeeze_bits(self, num_bits: int) -> list:
        """src/sponge/poseidon/mod.rs:275-289 (LE bit order per element)."""
        spec = self.config.field
        usable_bits = spec.nbits - 1
        num_elements = -(-num_bits // usable_bits)
        elems = self.squeeze_native_field_elements(num_elements)
        bits = []
        for e in elems:
            bits.extend(bool((e >> i) & 1) for i in range(usable_bits))
        return bits[:num_bits]

    def squeeze_field_elements_with_sizes(self, target_spec: FieldSpec, sizes) -> list:
        """Cross-field squeeze via bit truncation
        (src/sponge/mod.rs:57-96; sizes are FieldElementSize values)."""
        from crypto_primitives_tpu.models.sponge import FieldElementSize

        if target_spec.p == self.config.field.p:
            return [
                e % target_spec.p
                for e in self._squeeze_native_with_sizes(sizes, target_spec)
            ]
        if not sizes:
            return []
        total_bits = sum(FieldElementSize.num_bits(s, target_spec) for s in sizes)
        bits = self.squeeze_bits(total_bits)
        out = []
        window = 0
        for s in sizes:
            nb = FieldElementSize.num_bits(s, target_spec)
            chunk = bits[window : window + nb]
            window += nb
            # bits (LE) -> bytes -> from_le_bytes_mod_order
            value = 0
            for j in range(0, len(chunk), 8):
                byte = 0
                for i, b in enumerate(chunk[j : j + 8]):
                    byte |= int(b) << i
                value |= byte << j
            out.append(value % target_spec.p)
        return out

    def _squeeze_native_with_sizes(self, sizes, spec) -> list:
        from crypto_primitives_tpu.models.sponge import FieldElementSize

        if all(s == FieldElementSize.FULL for s in sizes):
            return self.squeeze_native_field_elements(len(sizes))
        # default impl path even for native field
        saved_field = self.config.field
        if not sizes:
            return []
        total_bits = sum(FieldElementSize.num_bits(s, saved_field) for s in sizes)
        bits = self.squeeze_bits(total_bits)
        out = []
        window = 0
        for s in sizes:
            nb = FieldElementSize.num_bits(s, saved_field)
            chunk = bits[window : window + nb]
            window += nb
            value = 0
            for j in range(0, len(chunk), 8):
                byte = 0
                for i, b in enumerate(chunk[j : j + 8]):
                    byte |= int(b) << i
                value |= byte << j
            out.append(value % saved_field.p)
        return out

    def squeeze_field_elements(self, n: int, target_spec: Optional[FieldSpec] = None) -> list:
        from crypto_primitives_tpu.models.sponge import FieldElementSize

        if target_spec is None or target_spec.p == self.config.field.p:
            return self.squeeze_native_field_elements(n)
        return self.squeeze_field_elements_with_sizes(
            target_spec, [FieldElementSize.FULL] * n
        )

    def fork(self, domain: bytes) -> "PoseidonSponge":
        """Domain separation (src/sponge/mod.rs:145-153)."""
        from crypto_primitives_tpu.models.sponge.absorb import Usize, to_sponge_bytes

        new = self.clone()
        inp = to_sponge_bytes(Usize(len(domain)), self.config.field) + bytes(domain)
        new.absorb(inp)  # Vec<u8> semantics
        return new


# ----------------------------------------------------------------------
# Default parameters (traits.rs twin)
# ----------------------------------------------------------------------

# (rate, alpha, full_rounds, partial_rounds, skip_matrices) tables for
# BLS12-381 Fr, from the reference's in-tree instance
# (/root/reference/crypto-primitives/src/sponge/test.rs:13-32).
BLS12_381_FR_PARAMS_OPT_FOR_CONSTRAINTS = [
    (2, 17, 8, 31, 0),
    (3, 5, 8, 56, 0),
    (4, 5, 8, 56, 0),
    (5, 5, 8, 57, 0),
    (6, 5, 8, 57, 0),
    (7, 5, 8, 57, 0),
    (8, 5, 8, 57, 0),
]
BLS12_381_FR_PARAMS_OPT_FOR_WEIGHTS = [
    (2, 257, 8, 13, 0),
    (3, 257, 8, 13, 0),
    (4, 257, 8, 13, 0),
    (5, 257, 8, 13, 0),
    (6, 257, 8, 13, 0),
    (7, 257, 8, 13, 0),
    (8, 257, 8, 13, 0),
]

_DEFAULT_PARAM_TABLES = {
    "bls12_381_fr": (
        BLS12_381_FR_PARAMS_OPT_FOR_CONSTRAINTS,
        BLS12_381_FR_PARAMS_OPT_FOR_WEIGHTS,
    ),
}


def find_poseidon_ark_and_mds(
    spec: FieldSpec,
    rate: int,
    full_rounds: int,
    partial_rounds: int,
    skip_matrices: int,
):
    """Derive (ark, mds) from the Grain LFSR; mds is the Cauchy matrix
    1/(x_i + y_j) (src/sponge/poseidon/traits.rs:105-146)."""
    p = spec.p
    t = rate + 1
    lfsr = PoseidonGrainLFSR(False, spec.nbits, t, full_rounds, partial_rounds)
    ark = [
        lfsr.get_field_elements_rejection_sampling(p, t)
        for _ in range(full_rounds + partial_rounds)
    ]
    for _ in range(skip_matrices):
        lfsr.get_field_elements_mod_p(p, 2 * t)
    xs = lfsr.get_field_elements_mod_p(p, t)
    ys = lfsr.get_field_elements_mod_p(p, t)
    mds = [[pow((x + y) % p, -1, p) for y in ys] for x in xs]
    return ark, mds


@functools.cache
def get_default_poseidon_parameters(
    spec: FieldSpec, rate: int, optimized_for_weights: bool = False
) -> Optional[PoseidonConfig]:
    """traits.rs:69-102 twin (capacity always 1)."""
    tables = _DEFAULT_PARAM_TABLES.get(spec.name)
    if tables is None:
        return None
    params_set = tables[1] if optimized_for_weights else tables[0]
    for (r, alpha, full_r, partial_r, skip) in params_set:
        if r == rate:
            ark, mds = find_poseidon_ark_and_mds(spec, rate, full_r, partial_r, skip)
            return PoseidonConfig(
                field=spec,
                full_rounds=full_r,
                partial_rounds=partial_r,
                alpha=alpha,
                ark=ark,
                mds=mds,
                rate=rate,
                capacity=1,
            )
    return None
