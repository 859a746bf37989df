"""Device-resident Merkle trees: every node level lives in HBM.

This is the TPU re-design of the reference's rayon-parallel tree
(/root/reference/crypto-primitives/src/merkle_tree/mod.rs:417-515) for the
flagship 2^20-leaf benchmark (benches/merkle_tree.rs:4,36-209): build,
proof extraction, verification, and updates are all batched device
programs; the host sees digests only at explicit conversion points
(root(), generate_proof()).

Two concrete instantiations:
  * sha256_device_tree — byte digests (n, 32) uint8, SHA-256 compress
    (ops/sha256.py scan kernel);
  * poseidon_rns_device_tree — digests as RNS-Montgomery residue rows
    (n, 2K) float32, compressed by ONE fused Pallas permutation per node
    (ops/poseidon_rns_pallas.py): compress(l, r) = permute([0, l, r])[1],
    the exact duplex schedule of the reference sponge CRH
    (src/crh/poseidon/mod.rs:58-79 over src/sponge/poseidon/mod.rs:124-186).
"""

from __future__ import annotations

import functools
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.models.merkle_tree import Path, tree_height


_BUILD_CACHE: dict = {}


@functools.lru_cache(maxsize=256)
def _multipath_schedule(idx: tuple, n_levels: int):
    """Host-side gather plan for the deduplicated MultiPath verify: per
    level, (prev-buffer width, left sources, right sources) where sources
    < k_prev point at computed digests (LUT-first precedence) and sources
    >= k_prev at proof-supplied rows (offset by the proving leaf's row).
    Cached per (index set, height) — the index math runs once, the hash
    work is all device-side."""
    m = len(idx)
    assert len(set(idx)) == m, "indexes must be distinct"
    schedule = []
    known = {p: s for s, p in enumerate(idx)}
    reps = list(range(m))
    for _ in range(n_levels + 1):
        parents = sorted({p >> 1 for p in known})
        lsrc, rsrc, new_reps = [], [], []
        for p in parents:
            srcs = []
            for c in (2 * p, 2 * p + 1):
                if c in known:
                    srcs.append(known[c])  # computed: cur buffer
                else:
                    # sibling supplied by the proof of the known child
                    srcs.append(len(known) + reps[known[c ^ 1]])
            lsrc.append(srcs[0])
            rsrc.append(srcs[1])
            child = 2 * p if 2 * p in known else 2 * p + 1
            new_reps.append(reps[known[child]])
        # ONE [lefts… | rights…] gather per level, split by contiguous
        # halves (TPU gathers cost ~0.8 ms each at this width, and strided
        # interleave slices relayout — both matter in the latency-bound
        # small-subset regime)
        schedule.append((len(known), jnp.asarray(lsrc + rsrc, jnp.int32)))
        known = {p: s for s, p in enumerate(parents)}
        reps = new_reps
    assert list(known) == [0], "paths did not converge to the root"
    return tuple(schedule)


def _build_levels(leaf_hash_batch, compress_batch, leaf_convert,
                  compress_level_batch=None):
    """One jitted whole-tree build per (hash-fn triple); jax.jit handles
    per-shape specialization underneath.

    compress_level_batch, when given, compresses a whole level (B, D) ->
    (B//2, D) from the CONTIGUOUS pair layout (children of node i are
    adjacent rows 2i, 2i+1, so `reshape(B//2, 2, D)` is free) — the
    strided `[0::2]`/`[1::2]` interleave gathers otherwise cost ~40% of
    level time on TPU (PERFORMANCE.md)."""
    key = (
        id(leaf_hash_batch), id(compress_batch), id(leaf_convert),
        id(compress_level_batch),
    )
    fn = _BUILD_CACHE.get(key)
    if fn is None:
        level = compress_level_batch or (
            lambda cur: compress_batch(cur[0::2], cur[1::2])
        )

        @jax.jit
        def fn(leaves):
            leaf_digests = leaf_hash_batch(leaves)
            cur = level(leaf_convert(leaf_digests))
            levels = [cur]
            while cur.shape[0] > 1:
                cur = level(cur)
                levels.append(cur)
            levels.reverse()
            return leaf_digests, tuple(levels)

        # keep the hash closures alive so ids stay unique while cached
        fn._refs = (leaf_hash_batch, compress_batch, leaf_convert,
                    compress_level_batch)
        _BUILD_CACHE[key] = fn
    return fn


class DeviceMerkleTree:
    """levels[0] is the root level (1 row); levels[-1] is the bottom inner
    level (n/2 rows); leaf_digests is (n, D).  All jnp arrays."""

    def __init__(
        self,
        compress_batch: Callable,
        leaf_digests: jnp.ndarray,
        inner_levels: List[jnp.ndarray],
        to_host: Callable,
        leaf_convert: Callable = lambda x: x,
        canonicalize: Callable = None,
    ):
        self.compress_batch = compress_batch
        self.leaf_digests = leaf_digests
        self.inner_levels = inner_levels
        self.to_host = to_host
        # LeafInnerDigestConverter twin (mod.rs:60-88): applied to leaf
        # digests before the bottom inner hash only
        self.leaf_convert = leaf_convert
        # digest rows -> canonical device rows (identity for byte digests;
        # RNS trees map lazy residues to canonical Montgomery limbs) so
        # roots can be compared across processes (utils/canonical.py)
        # without per-node host round-trips
        self.canonicalize = canonicalize or (lambda rows: rows)
        self.height = tree_height(int(leaf_digests.shape[0]))

    # -- construction ---------------------------------------------------

    @classmethod
    def build(
        cls,
        leaf_hash_batch: Callable,
        compress_batch: Callable,
        leaves: jnp.ndarray,
        to_host: Callable,
        leaf_convert: Callable = lambda x: x,
        compress_level_batch: Callable = None,
        canonicalize: Callable = None,
    ) -> "DeviceMerkleTree":
        n = int(leaves.shape[0])
        assert n > 1 and (n & (n - 1)) == 0
        # the whole level scan compiles to ONE device program (level count
        # is static); jit caches per (fns, shape) via _build_levels
        leaf_digests, levels = _build_levels(
            leaf_hash_batch, compress_batch, leaf_convert,
            compress_level_batch,
        )(leaves)
        return cls(compress_batch, leaf_digests, list(levels), to_host,
                   leaf_convert, canonicalize)

    # -- accessors -------------------------------------------------------

    def root_row(self) -> jnp.ndarray:
        return self.inner_levels[0][0]

    def root(self):
        return self.to_host(np.asarray(self.root_row()))

    def canonical_root_row(self) -> jnp.ndarray:
        """Device root in canonical digest form — bit-comparable with a
        root arriving from another process (deserialized via
        utils/canonical.py and packed for device), unlike root_row()'s
        internal representation (RNS trees hold lazy residues that only
        compare equal within one pipeline).  Twin of Path::verify's root
        equality (reference mod.rs:207-211) at the canonical layer."""
        return self.canonicalize(self.root_row())

    # -- proofs ----------------------------------------------------------

    def proof_rows(self, indexes: jnp.ndarray):
        """Batched auth-path gather, fully on device.

        indexes: (B,) int32 leaf indexes.  Returns (leaf_sibling (B, D),
        auth (B, height-2, D) root-first) — the array twin of
        Path.auth_path (reference mod.rs:547-569), one gather per level.
        """
        idx = jnp.asarray(indexes, dtype=jnp.int32)
        leaf_sib = jnp.take(self.leaf_digests, idx ^ 1, axis=0)
        auth = []
        node = idx >> 1  # index at the bottom inner level
        # bottom inner level is levels[-1]; auth path excludes the root
        for level in self.inner_levels[:0:-1]:  # bottom ... level 1
            auth.append(jnp.take(level, node ^ 1, axis=0))
            node = node >> 1
        auth.reverse()  # root-first
        if not auth:  # 2-leaf tree: path is just the leaf sibling
            return leaf_sib, jnp.zeros(
                (idx.shape[0], 0) + self.leaf_digests.shape[1:],
                self.leaf_digests.dtype,
            )
        return leaf_sib, jnp.stack(auth, axis=1)

    def generate_proof(self, index: int) -> Path:
        """Canonical host Path (interoperates with Path.verify and the
        R1CS PathVar)."""
        leaf_sib, auth = self.proof_rows(jnp.asarray([index]))
        return Path(
            leaf_sibling_hash=self.to_host(np.asarray(leaf_sib[0])),
            auth_path=[self.to_host(r) for r in np.asarray(auth[0])],
            leaf_index=index,
        )

    def verify_rows_batch(
        self,
        root_row: jnp.ndarray,
        leaf_digests: jnp.ndarray,
        indexes: jnp.ndarray,
        leaf_sib: jnp.ndarray,
        auth: jnp.ndarray,
        root_canonical: bool = False,
    ) -> jnp.ndarray:
        """Batched device verification from already-hashed leaf digests
        (use the tree's leaf hash first for raw leaves); returns (B,) bool
        (Ok(false)-style, mod.rs:252-294).

        Equality is bitwise on digest rows.  SHA byte digests are always
        canonical; RNS digest rows are lazy residues that compare equal
        only within one pipeline — for a root that arrived from ANOTHER
        process (utils/canonical.py), pass ``root_canonical=True`` with
        the root in canonical form (e.g. packed Montgomery limbs): the
        recomputed root is canonicalized on device before the compare, no
        host round-trips per node."""
        idx = jnp.asarray(indexes, dtype=jnp.int32)
        B = idx.shape[0]
        d = self.leaf_digests.shape[1:]
        if leaf_digests.shape != (B,) + d or leaf_sib.shape != (B,) + d:
            raise ValueError(
                f"leaf_digests/leaf_sib must be (B, D) = {(B,) + d} digest "
                f"rows (got {leaf_digests.shape} / {leaf_sib.shape}); hash "
                "raw leaves with the tree's leaf hash first"
            )
        if auth.ndim != 2 + len(d) or auth.shape[0] != B:
            raise ValueError(
                f"auth must be (B, height-2, D) as returned by proof_rows "
                f"(got {auth.shape})"
            )

        def pick(cond, a, b):
            return jnp.where(cond[..., None], a, b)

        is_left = (idx & 1) == 0
        own = self.leaf_convert(leaf_digests)
        sib = self.leaf_convert(leaf_sib)
        curr = self.compress_batch(
            pick(is_left, own, sib), pick(is_left, sib, own)
        )
        node = idx >> 1
        n_levels = auth.shape[1]
        for level in range(n_levels - 1, -1, -1):
            sib = auth[:, level]
            is_left = (node & 1) == 0
            curr = self.compress_batch(
                pick(is_left, curr, sib), pick(is_left, sib, curr)
            )
            node = node >> 1
        if root_canonical:
            curr = self.canonicalize(curr)
        if root_row.shape != curr.shape[1:]:
            raise ValueError(
                f"root_row must be one digest row of shape {curr.shape[1:]}"
                f" (got {root_row.shape});"
                " use canonical_root_row()/root_canonical=True for roots"
                " from another process"
            )
        return jnp.all(curr == root_row[None, :], axis=-1)

    def multipath_verify_rows(
        self,
        root_row: jnp.ndarray,
        leaf_digests: jnp.ndarray,
        indexes: Sequence[int],
        leaf_sib: jnp.ndarray,
        auth: jnp.ndarray,
    ) -> jnp.ndarray:
        """Deduplicated batch verification — the device twin of MultiPath's
        memoized-LUT verify (reference mod.rs:272-330): every shared
        internal node is hashed ONCE, and computed digests take precedence
        over proof-supplied siblings (the reference's LUT-first lookup).

        indexes must be distinct HOST ints: the per-level gather schedule is
        planned on host and baked into the compiled program (static shapes,
        one compile per index pattern — the TPU-idiomatic split: index math
        on host, hash work on device).  leaf_sib (m, D) and auth
        (m, height-2, D) root-first as returned by proof_rows; total
        compress count equals the LUT algorithm's distinct-node count.
        Returns a scalar bool."""
        n_levels = int(auth.shape[1])
        schedule = _multipath_schedule(tuple(int(i) for i in indexes), n_levels)

        # ---- device execution ----
        cur = self.leaf_convert(leaf_digests)
        sib0 = self.leaf_convert(leaf_sib)
        for li, (k_prev, src) in enumerate(schedule):
            # auth rows for this level: leaf siblings at the bottom, then
            # auth columns bottom-up (root-first storage)
            rows = sib0 if li == 0 else auth[:, n_levels - li]
            buf = jnp.concatenate([cur[:k_prev], rows], axis=0)
            # the barrier stops XLA from fusing (and thus duplicating) the
            # gather into both half-slice consumers
            both = jax.lax.optimization_barrier(jnp.take(buf, src, axis=0))
            k = src.shape[0] // 2
            cur = self.compress_batch(both[:k], both[k:])
        return jnp.all(cur[0] == root_row)

    # -- updates ----------------------------------------------------------

    def update_batch(self, indexes: Sequence[int], new_leaf_digests: jnp.ndarray):
        """Scatter new leaf digests and recompute the touched ancestors,
        level by level (duplicate parents recompute the same value, so no
        dedup pass is needed).  Device twin of mod.rs:629-680."""
        idx = jnp.asarray(indexes, dtype=jnp.int32)
        self.leaf_digests = self.leaf_digests.at[idx].set(new_leaf_digests)
        node = idx >> 1
        for li in range(len(self.inner_levels) - 1, -1, -1):
            child = (
                self.leaf_convert(self.leaf_digests)
                if li == len(self.inner_levels) - 1
                else self.inner_levels[li + 1]
            )
            left = jnp.take(child, node * 2, axis=0)
            right = jnp.take(child, node * 2 + 1, axis=0)
            new = self.compress_batch(left, right)
            self.inner_levels[li] = self.inner_levels[li].at[node].set(new)
            node = node >> 1


# --------------------------------------------------------------------------
# SHA-256 byte tree (the reference's flagship bench configuration)
# --------------------------------------------------------------------------


def _sha_leaf_hash(lv):
    from crypto_primitives_tpu.ops.sha256 import sha256

    return sha256(lv)


def _sha_compress(l, r):
    from crypto_primitives_tpu.ops.sha256 import sha256

    return sha256(jnp.concatenate([l, r], axis=-1))


def _sha_compress_level(cur):
    """Whole-level compress from the contiguous pair layout: the l||r
    concatenation is just a reshape of adjacent digest rows."""
    from crypto_primitives_tpu.ops.sha256 import sha256

    return sha256(cur.reshape(cur.shape[0] // 2, 2 * cur.shape[1]))


@functools.cache
def _sha_convert():
    from crypto_primitives_tpu.models.merkle_tree import ByteDigestConverter

    return ByteDigestConverter(32).convert_batch


def sha256_device_tree(leaves: jnp.ndarray) -> DeviceMerkleTree:
    """leaves: (n, L) uint8.  Digests are (32,) uint8 rows; semantics match
    the generic MerkleTree with Sha256CRH + ByteDigestConverter."""
    return DeviceMerkleTree.build(
        _sha_leaf_hash,
        _sha_compress,
        leaves,
        to_host=lambda row: row.tobytes(),
        leaf_convert=_sha_convert(),
        compress_level_batch=_sha_compress_level,
    )


# --------------------------------------------------------------------------
# Poseidon field tree, RNS-resident (fast path for the 1e7-perm/s kernel)
# --------------------------------------------------------------------------


@functools.cache
def _rns_compress_fns(spec, config):
    from crypto_primitives_tpu.ops import rns
    from crypto_primitives_tpu.ops.poseidon_rns_pallas import permute_rns

    plan = rns.build_plan(spec.p)
    K = plan.k  # plan geometry (legacy 24, or a big mid-red plan's k)
    t = config.t
    assert config.rate >= 2 and config.capacity == 1
    interp = jax.default_backend() != "tpu"  # pallas interpreter off-TPU

    def blk(B):
        return 2048 if B >= 2048 else max(128, B)

    @jax.jit
    def compress(l, r):
        # sponge duplex: fresh state, absorb [l, r] into rate slots 1..2,
        # one permutation, squeeze state[1] (src/sponge/poseidon/mod.rs)
        B = l.shape[0]
        state = jnp.zeros((B, t, 2 * K), jnp.float32)
        state = state.at[:, 1, :].set(l).at[:, 2, :].set(r)
        out = permute_rns(plan, config, state, block_b=blk(B), interpret=interp)
        return out[:, 1, :]

    @jax.jit
    def compress_level(cur):
        # whole-level compress: adjacent digest rows (2i, 2i+1) become rate
        # slots 1..2 via a free contiguous reshape (no interleave gather)
        B2 = cur.shape[0] // 2
        pairs = cur.reshape(B2, 2, 2 * K)
        state = jnp.concatenate(
            [jnp.zeros((B2, 1, 2 * K), jnp.float32), pairs]
            + [jnp.zeros((B2, t - 3, 2 * K), jnp.float32)] * (t > 3),
            axis=1,
        )
        out = permute_rns(plan, config, state, block_b=blk(B2), interpret=interp)
        return out[:, 1, :]

    @jax.jit
    def leaf_hash(x):
        # CRH of a single field element: absorb [x], permute, squeeze
        B = x.shape[0]
        state = jnp.zeros((B, t, 2 * K), jnp.float32)
        state = state.at[:, 1, :].set(x)
        out = permute_rns(plan, config, state, block_b=blk(B), interpret=interp)
        return out[:, 1, :]

    return plan, leaf_hash, compress, compress_level


def poseidon_rns_device_tree(spec, config, leaf_elements) -> DeviceMerkleTree:
    """leaf_elements: python ints (field values), or a pre-converted
    (n, 2K) float32 RNS array of Montgomery-form values.  Digest rows hold
    RNS residues of Montgomery-form field elements; root()/generate_proof()
    convert to canonical ints matching the generic Poseidon MerkleTree."""
    from crypto_primitives_tpu.ops import rns

    plan, leaf_hash, compress, compress_level = _rns_compress_fns(spec, config)
    K = plan.k

    if not isinstance(leaf_elements, (jnp.ndarray, np.ndarray)):
        mont = np.asarray(
            [int(x) * plan.M1 % spec.p for x in leaf_elements], dtype=object
        )
        r1, r2 = rns.to_rns(plan, mont)
        leaf_elements = jnp.asarray(np.concatenate([r1, r2], axis=-1))

    inv_M1 = pow(plan.M1, -1, spec.p)

    def to_host(row) -> int:
        v = int(rns.from_rns(plan, np.asarray(row)[:K]))
        return v * inv_M1 % spec.p

    from crypto_primitives_tpu.ops import rns_xla

    @jax.jit
    def canonicalize(rows):
        # lazy RNS residues -> canonical Montgomery limbs: the device-side
        # canonical digest form, bit-comparable with spec.pack(root) of a
        # root deserialized from utils/canonical.py in another process
        return rns_xla.to_mont_limbs(plan, spec, rows, bound=3)

    return DeviceMerkleTree.build(
        leaf_hash, compress, leaf_elements, to_host,
        compress_level_batch=compress_level, canonicalize=canonicalize,
    )


# --------------------------------------------------------------------------
# Pedersen byte tree, RNS-resident (the reference's primary byte-tree
# config, src/merkle_tree/tests/mod.rs:5-50: Pedersen leaf + inner over a
# TE curve, ByteDigestConverter = x||y uncompressed bytes)
# --------------------------------------------------------------------------


def _bits_dev(data: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """jnp twin of crh.pedersen.bytes_to_bits_batch (LE per byte), usable
    under jit: (..., NB) uint8 -> (..., nbits) uint8."""
    b = data.astype(jnp.uint8)
    bits = (b[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
    bits = bits.reshape(b.shape[:-1] + (b.shape[-1] * 8,))
    if bits.shape[-1] < nbits:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (nbits - bits.shape[-1],), jnp.uint8)],
            axis=-1,
        )
    return bits


def _std_limbs_to_bytes(limbs: jnp.ndarray, nbytes: int) -> jnp.ndarray:
    """(..., L) standard-form uint32 16-bit limbs -> (..., nbytes) uint8 LE."""
    lo = (limbs & 0xFF).astype(jnp.uint8)
    hi = ((limbs >> 8) & 0xFF).astype(jnp.uint8)
    by = jnp.stack([lo, hi], axis=-1).reshape(limbs.shape[:-1] + (2 * limbs.shape[-1],))
    return by[..., :nbytes]


@functools.cache
def pedersen_tree_fns(curve, leaf_params, two_params, leaf_window, two_window):
    """(leaf_hash, compress, compress_level, to_host) closures for the
    RNS-resident Pedersen byte tree — shared by the single-device build
    and the sharded tier (parallel/merkle_tree_sharded.py)."""
    from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH
    from crypto_primitives_tpu.ops import curve_rns as cr

    crh = PedersenCRH(curve, leaf_window)
    w = crh.GROUP_W
    leaf_bits = crh.input_size_bits
    two_bits = two_window.window_size * two_window.num_windows
    nbytes = 2 * curve.base.bigint_bytes
    assert 2 * nbytes * 8 <= two_bits, "two-to-one window too small for digests"

    def _digest_bytes(acc_rns):
        aff = cr.te_to_affine_rns(curve, acc_rns)  # (..., 2, 2K)
        std = cr.to_std_limbs(curve, aff)  # (..., 2, L) standard form
        return _std_limbs_to_bytes(std, curve.base.bigint_bytes).reshape(
            std.shape[:-2] + (nbytes,)
        )

    @jax.jit
    def leaf_hash(lv):
        acc = cr.conditional_sum_grouped_auto(
            curve, leaf_params, _bits_dev(lv, leaf_bits), w
        )
        return _digest_bytes(acc)

    @jax.jit
    def compress(l, r):
        buf = jnp.concatenate([l, r], axis=-1)
        acc = cr.conditional_sum_grouped_auto(
            curve, two_params, _bits_dev(buf, two_bits), w
        )
        return _digest_bytes(acc)

    @jax.jit
    def compress_level(cur):
        # contiguous pairing: children of node i are adjacent rows, so the
        # l||r byte concatenation is a free reshape (PERFORMANCE.md)
        buf = cur.reshape(cur.shape[0] // 2, 2 * cur.shape[1])
        acc = cr.conditional_sum_grouped_auto(
            curve, two_params, _bits_dev(buf, two_bits), w
        )
        return _digest_bytes(acc)

    cb = curve.base.bigint_bytes

    def to_host(row) -> tuple:
        b = bytes(np.asarray(row).astype(np.uint8))
        return (
            int.from_bytes(b[:cb], "little"),
            int.from_bytes(b[cb : 2 * cb], "little"),
        )

    return leaf_hash, compress, compress_level, to_host


def pedersen_device_tree(
    curve, leaf_params, two_params, leaf_window, two_window, leaves: jnp.ndarray
) -> DeviceMerkleTree:
    """leaves: (n, LB) uint8.  Digest rows are the x||y uncompressed bytes
    (2*bigint_bytes,) of affine Pedersen outputs; the whole build runs on
    the RNS fast path (grouped conditional-sum MSM + RNS Fermat
    normalization), one compiled program per tree.  Host digests (root(),
    Path fields) are affine (x, y) tuples, interoperable with the generic
    MerkleTree's PointDigestDomain config."""
    leaf_hash, compress, compress_level, to_host = pedersen_tree_fns(
        curve, leaf_params, two_params, leaf_window, two_window
    )
    return DeviceMerkleTree.build(
        leaf_hash, compress, leaves, to_host,
        compress_level_batch=compress_level,
    )
