"""Vectorized R1CS synthesis (r1cs/batch.py, round-2 verdict item 5).

The SAME gadget code synthesizes N instances as one array trace; these
tests pin (a) constraint-count identity with the scalar tier, (b) witness
parity per instance against scalar synthesis / native evaluation, (c) the
batched device satisfaction check including per-instance dissatisfaction.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.r1cs.batch import BatchConstraintSystem
from crypto_primitives_tpu.r1cs.cs import ConstraintSystem
from crypto_primitives_tpu.r1cs.gadgets.poseidon import (
    PoseidonCRHGadget,
    PoseidonSpongeVar,
    PoseidonTwoToOneCRHGadget,
)
from crypto_primitives_tpu.r1cs.vars import FpVar


def _col(vals):
    return jnp.asarray(FR.pack([[v] for v in vals]))[:, 0, :]


def test_batched_two_to_one_matches_scalar(rng):
    cfg = get_default_poseidon_parameters(FR, 2, False)
    N = 8
    ls = [rng.randrange(FR.p) for _ in range(N)]
    rs = [rng.randrange(FR.p) for _ in range(N)]
    g = PoseidonTwoToOneCRHGadget(cfg)

    bcs = BatchConstraintSystem(FR, N)
    out = g.compress(bcs, FpVar.new_witness(bcs, _col(ls)), FpVar.new_witness(bcs, _col(rs)))
    assert bcs.is_satisfied()

    scs = ConstraintSystem(FR)
    sout = g.compress(
        scs, FpVar.new_witness(scs, ls[0]), FpVar.new_witness(scs, rs[0])
    )
    assert scs.is_satisfied()
    assert bcs.num_constraints == scs.num_constraints
    assert bcs.num_witness == scs.num_witness
    assert bcs.value_host(out.value, 0) == sout.value
    from crypto_primitives_tpu.models.crh.poseidon import PoseidonTwoToOneCRH

    native = PoseidonTwoToOneCRH(FR)
    for i in range(N):
        assert bcs.value_host(out.value, i) == native.compress(cfg, ls[i], rs[i])


def test_batched_sponge_squeeze_bits(rng):
    """Covers the batched bit-decomposition hook (v_bits) + booleanity."""
    cfg = get_default_poseidon_parameters(FR, 2, False)
    N = 4
    ins = [rng.randrange(FR.p) for _ in range(N)]
    bcs = BatchConstraintSystem(FR, N)
    sp = PoseidonSpongeVar(bcs, cfg)
    sp.absorb([FpVar.new_witness(bcs, _col(ins))])
    bits = sp.squeeze_bits(19)
    assert bcs.is_satisfied()
    from crypto_primitives_tpu.models.sponge.poseidon import PoseidonSponge

    for i in range(N):
        h = PoseidonSponge(cfg)
        h.absorb_elements([ins[i]])
        want = h.squeeze_bits(19)
        got = [bool(np.asarray(b.value)[i]) for b in bits]
        assert got == want


def test_batched_merkle_pathvar(rng):
    """N Merkle membership circuits as one trace (the reference test
    pattern at src/merkle_tree/tests/constraints.rs:92-147, vectorized)."""
    from crypto_primitives_tpu.models.crh.poseidon import (
        PoseidonCRH,
        PoseidonTwoToOneCRH,
    )
    from crypto_primitives_tpu.models.merkle_tree import (
        FieldDigestDomain,
        IdentityDigestConverter,
        MerkleTree,
        MerkleTreeConfig,
    )
    from crypto_primitives_tpu.r1cs.gadgets.merkle import PathVar

    cfg = get_default_poseidon_parameters(FR, 2, False)
    mcfg = MerkleTreeConfig(
        PoseidonCRH(FR), PoseidonTwoToOneCRH(FR),
        FieldDigestDomain(FR), FieldDigestDomain(FR), IdentityDigestConverter(),
    )
    leaves = [[rng.randrange(FR.p)] for _ in range(16)]
    tree = MerkleTree.new(mcfg, cfg, cfg, jnp.asarray(FR.pack(leaves)))
    root = tree.root()
    N = 6
    idxs = [0, 3, 7, 8, 12, 15]
    paths = [tree.generate_proof(i) for i in idxs]

    leaf_g, two_g = PoseidonCRHGadget(cfg), PoseidonTwoToOneCRHGadget(cfg)

    bcs = BatchConstraintSystem(FR, N)
    pv = PathVar.new_witness_batch(bcs, paths)
    leaf_vars = [FpVar.new_witness(bcs, _col([leaves[i][0] for i in idxs]))]
    root_var = FpVar.new_input(bcs, _col([root] * N))
    ok = pv.verify_membership(leaf_g, two_g, root_var, leaf_vars)
    assert bcs.is_satisfied()
    assert np.asarray(ok.value).tolist() == [True] * N

    # scalar twin: identical constraint count
    scs = ConstraintSystem(FR)
    spv = PathVar.new_witness(scs, paths[0])
    sok = spv.verify_membership(
        leaf_g, two_g,
        FpVar.new_input(scs, root),
        [FpVar.new_witness(scs, leaves[idxs[0]][0])],
    )
    assert scs.is_satisfied() and sok.value is True
    assert bcs.num_constraints == scs.num_constraints
    assert bcs.num_witness == scs.num_witness

    # one instance against the wrong root: per-instance False, still
    # satisfiable (Ok(false) semantics, constraints.rs:228-237)
    bcs2 = BatchConstraintSystem(FR, N)
    pv2 = PathVar.new_witness_batch(bcs2, paths)
    bad_roots = [root] * N
    bad_roots[2] = (root + 1) % FR.p
    ok2 = pv2.verify_membership(
        leaf_g, two_g,
        FpVar.new_input(bcs2, _col(bad_roots)),
        [FpVar.new_witness(bcs2, _col([leaves[i][0] for i in idxs]))],
    )
    assert bcs2.is_satisfied()
    want = [True] * N
    want[2] = False
    assert np.asarray(ok2.value).tolist() == want


def test_batched_per_instance_dissatisfaction():
    bcs = BatchConstraintSystem(FR, 3)
    a = FpVar.new_witness(bcs, _col([3, 4, 5]))
    b = a * a
    k = list(b.lc.terms)[0]
    bcs.assignments[k] = bcs.assignments[k].at[1].set(
        jnp.asarray(FR.pack([[7]]))[0, 0]
    )
    assert np.asarray(bcs.satisfied_per_instance()).tolist() == [
        True, False, True,
    ]
    assert not bcs.is_satisfied()


# ---- byte circuits (UInt8/UInt32 value hooks — round-3 verdict item 3) ----


def test_batched_blake2s_prf_digests(rng):
    """N Blake2s one-block PRF instances as one trace: constraint count
    identical to the scalar tier (the reference's pinned 21792,
    src/prf/blake2s/constraints.rs:416), per-instance digests equal to
    hashlib.blake2s."""
    import hashlib

    from crypto_primitives_tpu.r1cs.gadgets.blake2s import Blake2sPRFGadget
    from crypto_primitives_tpu.r1cs.vars import bytes_to_uint8s

    N = 32
    seeds = np.asarray(
        [[rng.randrange(256) for _ in range(32)] for _ in range(N)], np.uint8
    )
    msgs = np.asarray(
        [[rng.randrange(256) for _ in range(32)] for _ in range(N)], np.uint8
    )
    bcs = BatchConstraintSystem(FR, N)
    sv = Blake2sPRFGadget.new_seed(bcs, seeds)
    iv = bytes_to_uint8s(bcs, msgs)
    out = Blake2sPRFGadget.evaluate(bcs, sv, iv)
    assert bcs.num_constraints == 21792
    got = out.value  # (N, 32) uint8
    for i in range(N):
        want = hashlib.blake2s(seeds[i].tobytes() + msgs[i].tobytes()).digest()
        assert got[i].tobytes() == want

    # scalar twin: identical counts
    scs = ConstraintSystem(FR)
    ssv = Blake2sPRFGadget.new_seed(scs, seeds[0].tobytes())
    siv = bytes_to_uint8s(scs, msgs[0].tobytes())
    sout = Blake2sPRFGadget.evaluate(scs, ssv, siv)
    assert scs.is_satisfied()
    assert sout.value == got[0].tobytes()
    assert bcs.num_constraints == scs.num_constraints
    assert bcs.num_witness == scs.num_witness


def test_batched_sha256_crh_digests(rng):
    """N SHA-256 CRH instances (55-byte messages: one padded block) as one
    trace, vs hashlib + the scalar tier."""
    import hashlib

    from crypto_primitives_tpu.r1cs.gadgets.sha256 import Sha256CRHGadget
    from crypto_primitives_tpu.r1cs.vars import bytes_to_uint8s

    N = 16
    data = np.asarray(
        [[rng.randrange(256) for _ in range(55)] for _ in range(N)], np.uint8
    )
    bcs = BatchConstraintSystem(FR, N)
    dv = Sha256CRHGadget().evaluate(bcs, bytes_to_uint8s(bcs, data))
    got = dv.value
    for i in range(N):
        assert got[i].tobytes() == hashlib.sha256(data[i].tobytes()).digest()
    assert bcs.is_satisfied()  # small-domain exact-int64 check

    scs = ConstraintSystem(FR)
    sdv = Sha256CRHGadget().evaluate(
        scs, bytes_to_uint8s(scs, data[0].tobytes())
    )
    assert sdv.value == got[0].tobytes()
    assert bcs.num_constraints == scs.num_constraints
    assert bcs.num_witness == scs.num_witness


def test_batched_uint32_select(rng):
    """UIntN.select routes condition values through v_select (array-valued
    conditions must not hit python truthiness)."""
    from crypto_primitives_tpu.r1cs.vars import Boolean, UInt32

    N = 5
    xs = [rng.randrange(1 << 32) for _ in range(N)]
    ys = [rng.randrange(1 << 32) for _ in range(N)]
    cond = [bool(i % 2) for i in range(N)]
    bcs = BatchConstraintSystem(FR, N)
    xv = UInt32.new_witness(bcs, np.asarray(xs, np.uint64))
    yv = UInt32.new_witness(bcs, np.asarray(ys, np.uint64))
    cv = Boolean.new_witness(bcs, np.asarray(cond))
    sel = UInt32.select(cv, xv, yv)
    assert bcs.is_satisfied()
    got = np.asarray(sel.value)
    for i in range(N):
        assert int(got[i]) == (xs[i] if cond[i] else ys[i])


@pytest.mark.slow
def test_batched_blake2s_device_check(rng):
    """The batched device satisfaction check over a byte circuit,
    including per-instance dissatisfaction when one instance's bit
    witness is tampered."""
    import hashlib

    from crypto_primitives_tpu.r1cs.batch import SmallWord
    from crypto_primitives_tpu.r1cs.gadgets.blake2s import Blake2sPRFGadget
    from crypto_primitives_tpu.r1cs.vars import bytes_to_uint8s

    N = 4
    seeds = np.asarray(
        [[rng.randrange(256) for _ in range(32)] for _ in range(N)], np.uint8
    )
    msgs = np.asarray(
        [[rng.randrange(256) for _ in range(32)] for _ in range(N)], np.uint8
    )
    bcs = BatchConstraintSystem(FR, N)
    sv = Blake2sPRFGadget.new_seed(bcs, seeds)
    iv = bytes_to_uint8s(bcs, msgs)
    out = Blake2sPRFGadget.evaluate(bcs, sv, iv)
    for i in range(N):
        want = hashlib.blake2s(seeds[i].tobytes() + msgs[i].tobytes()).digest()
        assert out.value[i].tobytes() == want
    assert bcs.is_satisfied()

    # tamper one digest bit's witness in instance 2: packing breaks there
    k = list(out.bytes[0].bits[0].fp.lc.terms)[0]
    w = bcs.assignments[k]
    assert isinstance(w, SmallWord)
    w.v[2] ^= 1
    per = np.asarray(bcs.satisfied_per_instance()).tolist()
    assert per[2] is False or per[2] == False  # noqa: E712
    assert all(per[i] for i in range(N) if i != 2)


def test_batched_which_unsatisfied_byte_circuit(rng):
    """Per-instance first-failing-constraint debugging on the
    small-domain check (the scalar tier's which_unsatisfied twin)."""
    from crypto_primitives_tpu.r1cs.batch import SmallWord
    from crypto_primitives_tpu.r1cs.vars import UInt32

    N = 4
    xs = [rng.randrange(1 << 32) for _ in range(N)]
    bcs = BatchConstraintSystem(FR, N)
    a = UInt32.new_witness(bcs, np.asarray(xs, np.uint64))
    b = UInt32.new_witness(bcs, np.asarray(xs, np.uint64))
    c = a ^ b  # all-zero result, one constraint per bit pair
    assert np.asarray(bcs.which_unsatisfied()).tolist() == [-1] * N
    assert bcs.which_unsatisfied(2) is None
    # flip one xor output bit in instance 2: its constraint must be named
    k = list(c.bits[5].fp.lc.terms)[0]
    w = bcs.assignments[k]
    assert isinstance(w, SmallWord)
    w.v[2] ^= 1
    out = np.asarray(bcs.which_unsatisfied()).tolist()
    assert out[2] >= 0 and all(out[i] == -1 for i in range(N) if i != 2)
    assert bcs.which_unsatisfied(2) == out[2]
