"""Multi-chip sharding on the virtual 8-device CPU mesh: sharded results
must be bit-equal to the single-device oracle (SURVEY.md §4: the
'native vs. distributed bit-equal' pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.models.crh.poseidon import PoseidonCRH, PoseidonTwoToOneCRH
from crypto_primitives_tpu.models.merkle_tree import (
    FieldDigestDomain,
    IdentityDigestConverter,
    MerkleTree,
    MerkleTreeConfig,
)
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.ops import curve as cv
from crypto_primitives_tpu.ops.curves_known import JUBJUB
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.parallel import (
    make_mesh,
    sharded_fixed_base_msm,
    sharded_fixed_base_msm_rns,
    sharded_merkle_root,
)

pytestmark = pytest.mark.slow  # device-oracle fuzz tier (run_tests.sh)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_merkle_root_matches_single_device(rng):
    cfg = MerkleTreeConfig(
        PoseidonCRH(FR), PoseidonTwoToOneCRH(FR),
        FieldDigestDomain(FR), FieldDigestDomain(FR), IdentityDigestConverter(),
    )
    params = get_default_poseidon_parameters(FR, 2, False)
    n = 64
    leaves_host = [[rng.randrange(FR.p)] for _ in range(n)]
    leaves = jnp.asarray(FR.pack(leaves_host))
    single = MerkleTree.new(cfg, params, params, leaves).root()
    mesh = make_mesh(8)
    root_row = sharded_merkle_root(cfg, params, params, leaves, mesh)
    assert int(FR.unpack(np.asarray(root_row))) == single


def test_sharded_msm_matches_single_device(rng):
    n = 32
    pts = [JUBJUB.rand_point(rng) for _ in range(n)]
    table = jnp.asarray(JUBJUB.pack_points(pts))
    bits = np.asarray([[rng.randrange(2) for _ in range(n)] for _ in range(3)], dtype=np.uint8)
    single = cv.te_conditional_sum(JUBJUB, table, jnp.asarray(bits))
    mesh = make_mesh(8)
    sharded = sharded_fixed_base_msm(JUBJUB, table, jnp.asarray(bits), mesh)
    single_aff = JUBJUB.unpack_points(np.asarray(single))
    sharded_aff = JUBJUB.unpack_points(np.asarray(sharded))
    assert list(single_aff) == list(sharded_aff)


def test_sharded_msm_rns_matches_single_device(rng):
    """The RNS fast-path sharded MSM returns the same limb points."""
    from crypto_primitives_tpu.ops import curve_rns as cr

    n = 32
    pts = [JUBJUB.rand_point(rng) for _ in range(n)]
    table = jnp.asarray(JUBJUB.pack_points(pts))
    table_rns = jnp.asarray(cr.pack_points_rns(JUBJUB, pts))
    bits = np.asarray([[rng.randrange(2) for _ in range(n)] for _ in range(3)], dtype=np.uint8)
    single = cv.te_conditional_sum(JUBJUB, table, jnp.asarray(bits))
    mesh = make_mesh(8)
    sharded = sharded_fixed_base_msm_rns(JUBJUB, table_rns, jnp.asarray(bits), mesh)
    single_aff = JUBJUB.unpack_points(np.asarray(single))
    sharded_aff = JUBJUB.unpack_points(np.asarray(sharded))
    assert list(single_aff) == list(sharded_aff)


def test_sharded_msm_sw_rns_g1_matches_host(rng):
    """Round 5: the SW/G1 tier on the multi-chip surface — projective RNS
    table sharded over 8 devices, partials folded with the complete RCB
    tree, bit-equal to the host oracle."""
    from crypto_primitives_tpu.ops import curve_sw as csw
    from crypto_primitives_tpu.ops import curve_sw_rns as sw
    from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1 as G1
    from crypto_primitives_tpu.parallel import sharded_fixed_base_msm_sw_rns

    n = 16
    pts = [G1.rand_point(rng) for _ in range(n)]
    table_rns = jnp.asarray(sw.pack_points_rns(G1, pts))
    bits = np.asarray(
        [[rng.randrange(2) for _ in range(n)] for _ in range(2)],
        dtype=np.uint8,
    )
    mesh = make_mesh(8)
    sharded = sharded_fixed_base_msm_sw_rns(
        G1, table_rns, jnp.asarray(bits), mesh
    )
    aff = csw.sw_to_affine(G1, sharded)
    vals = G1.base.unpack(np.asarray(aff))
    for row in range(2):
        exp = None
        for j, p in enumerate(pts):
            if bits[row, j]:
                exp = p if exp is None else G1.add_host(exp, p)
        assert (int(vals[row][0]), int(vals[row][1])) == exp, row


def test_sharded_msm_4_devices(rng):
    n = 16
    pts = [JUBJUB.rand_point(rng) for _ in range(n)]
    table = jnp.asarray(JUBJUB.pack_points(pts))
    bits = jnp.asarray(np.ones((2, n), dtype=np.uint8))
    mesh = make_mesh(4)
    sharded = sharded_fixed_base_msm(JUBJUB, table, bits, mesh)
    expect = (0, 1)
    for p in pts:
        expect = JUBJUB.add_host(expect, p)
    assert list(JUBJUB.unpack_points(np.asarray(sharded))) == [expect, expect]


def test_sharded_build_prove_all_matches_single_device(rng):
    """Full sharded tree: root AND every auth path bit-equal to the
    single-device DeviceMerkleTree (merkle_tree_sharded.py)."""
    from crypto_primitives_tpu.models.merkle_tree.device import (
        _sha_compress,
        _sha_convert,
        _sha_leaf_hash,
        sha256_device_tree,
    )
    from crypto_primitives_tpu.parallel import sharded_merkle_build_prove_all

    n = 64
    leaves = jnp.asarray(
        np.asarray(
            [[rng.randrange(256) for _ in range(16)] for _ in range(n)],
            dtype=np.uint8,
        )
    )
    mesh = make_mesh(8)
    root, leaf_sib, auth = sharded_merkle_build_prove_all(
        _sha_leaf_hash, _sha_compress, leaves, mesh, leaf_convert=_sha_convert()
    )
    single = sha256_device_tree(leaves)
    sib1, auth1 = single.proof_rows(jnp.arange(n))
    assert np.asarray(root).tobytes() == single.root()
    assert np.array_equal(np.asarray(leaf_sib), np.asarray(sib1))
    assert np.array_equal(np.asarray(auth), np.asarray(auth1))


def test_sharded_permute_batch_matches_unsharded(rng):
    from crypto_primitives_tpu.models.sponge import (
        get_default_poseidon_parameters,
    )
    from crypto_primitives_tpu.models.sponge.poseidon import permute
    from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
    from crypto_primitives_tpu.parallel import sharded_permute_batch

    cfg = get_default_poseidon_parameters(FR, 2, False)
    packed = cfg.packed()
    B = 16
    states = [[rng.randrange(FR.p) for _ in range(cfg.t)] for _ in range(B)]
    dev = jnp.asarray(FR.pack(states))
    mesh = make_mesh(8)
    out = sharded_permute_batch(
        lambda s: permute(FR, packed, s), dev, mesh
    )
    exp = permute(FR, packed, dev)
    assert np.array_equal(np.asarray(out), np.asarray(exp))
