"""Byte-config Merkle path gadget (SHA-256 tree) + BH two-to-one and
commitment compressor gadgets."""

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.models.commitment.injective_map import (
    PedersenCommitmentCompressor,
)
from crypto_primitives_tpu.models.crh.bowe_hopwood import BoweHopwoodTwoToOneCRH
from crypto_primitives_tpu.models.crh.pedersen import Window
from crypto_primitives_tpu.models.crh.sha256 import Sha256CRH, Sha256TwoToOneCRH
from crypto_primitives_tpu.models.merkle_tree import (
    ByteDigestConverter,
    ByteDigestDomain,
    MerkleTree,
    MerkleTreeConfig,
)
from crypto_primitives_tpu.ops.curves_known import JUBJUB
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.r1cs import ConstraintSystem
from crypto_primitives_tpu.r1cs.gadgets.merkle import BytePathVar
from crypto_primitives_tpu.r1cs.gadgets.pedersen import (
    BoweHopwoodTwoToOneCRHGadget,
    PedersenCommitmentCompressorGadget,
)
from crypto_primitives_tpu.r1cs.gadgets.sha256 import (
    DigestVar,
    Sha256CRHGadget,
    Sha256TwoToOneCRHGadget,
)
from crypto_primitives_tpu.r1cs.vars import UInt8, bytes_to_uint8s


def test_sha256_merkle_path_gadget(rng):
    """Byte-tree membership circuit vs the native tree (the reference's
    byte-config constraints test, merkle_tree/tests/constraints.rs:55-147)."""
    cfg = MerkleTreeConfig(
        Sha256CRH(), Sha256TwoToOneCRH(),
        ByteDigestDomain(32), ByteDigestDomain(32), ByteDigestConverter(32),
    )
    n = 8
    leaves = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(n)]
    dev = jnp.asarray(np.frombuffer(b"".join(leaves), dtype=np.uint8).reshape(n, 32))
    tree = MerkleTree.new(cfg, None, None, dev)
    root = tree.root()
    i = 5
    proof = tree.generate_proof(i)
    cs = ConstraintSystem(FR)
    pv = BytePathVar.new_witness(cs, proof)
    root_var = DigestVar(cs, bytes_to_uint8s(cs, root, "input"))
    ok = pv.verify_membership(
        Sha256CRHGadget(), Sha256TwoToOneCRHGadget(), root_var,
        bytes_to_uint8s(cs, leaves[i], "witness"),
    )
    assert ok.value is True
    from crypto_primitives_tpu.r1cs.vars import FpVar

    ok.fp.enforce_equal(FpVar.constant(cs, 1))
    assert cs.is_satisfied()
    # wrong root -> unsatisfied when enforced
    cs2 = ConstraintSystem(FR)
    pv2 = BytePathVar.new_witness(cs2, proof)
    bad = DigestVar(cs2, bytes_to_uint8s(cs2, b"\x00" * 32, "input"))
    ok2 = pv2.verify_membership(
        Sha256CRHGadget(), Sha256TwoToOneCRHGadget(), bad,
        bytes_to_uint8s(cs2, leaves[i], "witness"),
    )
    assert ok2.value is False
    ok2.fp.enforce_equal(FpVar.constant(cs2, 1))
    assert not cs2.is_satisfied()


def test_bowe_hopwood_two_to_one_gadget(rng):
    w = Window(window_size=58, num_windows=6)
    two = BoweHopwoodTwoToOneCRH(JUBJUB, w)
    params = two.setup(rng)
    l = bytes(rng.randrange(256) for _ in range(32))
    r = bytes(rng.randrange(256) for _ in range(32))
    native = two.evaluate(params, l, r)
    cs = ConstraintSystem(FR)
    g = BoweHopwoodTwoToOneCRHGadget(JUBJUB, w)
    out = g.evaluate(cs, params, bytes_to_uint8s(cs, l, "witness"), bytes_to_uint8s(cs, r, "witness"))
    assert out.value == native
    # compress path
    native2 = two.compress(params, native, native)
    out2 = g.compress(cs, params, out, out)
    assert out2.value == native2
    assert cs.is_satisfied()


def test_pedersen_commitment_compressor_gadget(rng):
    comp = PedersenCommitmentCompressor(JUBJUB, Window(4, 96))
    params = comp.setup(rng)
    msg = bytes(rng.randrange(256) for _ in range(16))
    r = comp.rand_randomness(rng)
    native = comp.commit(params, msg, r)
    cs = ConstraintSystem(FR)
    g = PedersenCommitmentCompressorGadget(JUBJUB, Window(4, 96))
    out = g.commit(cs, params, bytes_to_uint8s(cs, msg, "witness"), g.randomness_bits(cs, r))
    assert out.value == native
    assert cs.is_satisfied()


@pytest.mark.slow
def test_sha256_merkle_path_gadget_batched(rng):
    """N byte-tree membership circuits as ONE vectorized trace (the byte
    extension of the r1cs/batch.py tier, round-3 verdict item 3): counts
    identical to the scalar tier, per-instance booleans correct incl. a
    deliberately wrong root on one instance."""
    from crypto_primitives_tpu.r1cs.batch import BatchConstraintSystem

    cfg = MerkleTreeConfig(
        Sha256CRH(), Sha256TwoToOneCRH(),
        ByteDigestDomain(32), ByteDigestDomain(32), ByteDigestConverter(32),
    )
    n = 8
    leaves = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(n)]
    dev = jnp.asarray(
        np.frombuffer(b"".join(leaves), dtype=np.uint8).reshape(n, 32)
    )
    tree = MerkleTree.new(cfg, None, None, dev)
    root = tree.root()
    idxs = [0, 3, 5, 6]
    N = len(idxs)
    proofs = [tree.generate_proof(i) for i in idxs]

    bcs = BatchConstraintSystem(FR, N)
    pv = BytePathVar.new_witness_batch(bcs, proofs)
    roots = np.frombuffer(root * N, dtype=np.uint8).reshape(N, 32).copy()
    roots[2] ^= 0xFF  # instance 2 gets a corrupted root
    root_var = DigestVar(bcs, bytes_to_uint8s(bcs, roots, "input"))
    leaf_rows = np.frombuffer(
        b"".join(leaves[i] for i in idxs), dtype=np.uint8
    ).reshape(N, 32)
    ok = pv.verify_membership(
        Sha256CRHGadget(), Sha256TwoToOneCRHGadget(), root_var,
        bytes_to_uint8s(bcs, leaf_rows, "witness"),
    )
    got = np.asarray(ok.value).tolist()
    assert got == [True, True, False, True]
    # the membership circuit itself stays satisfied either way (Ok(false)
    # semantics); checked via the small-domain exact-int64 path
    assert bcs.is_satisfied()

    # scalar twin: identical constraint structure
    cs = ConstraintSystem(FR)
    spv = BytePathVar.new_witness(cs, proofs[0])
    sok = spv.verify_membership(
        Sha256CRHGadget(), Sha256TwoToOneCRHGadget(),
        DigestVar(cs, bytes_to_uint8s(cs, root, "input")),
        bytes_to_uint8s(cs, leaves[idxs[0]], "witness"),
    )
    assert sok.value is True
    assert bcs.num_constraints == cs.num_constraints
    assert bcs.num_witness == cs.num_witness
