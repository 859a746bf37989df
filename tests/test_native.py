"""Native C++ engine vs the python-int oracle and the JAX path — a third
independent implementation for cross-model testing."""

import pytest

from crypto_primitives_tpu import native
from crypto_primitives_tpu.models.sponge import PoseidonSponge, get_default_poseidon_parameters
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR

pytestmark = pytest.mark.skipif(not native.available(), reason="g++ engine unavailable")


def test_native_mont_mul(rng):
    nf = native.NativeField(FR)
    xs = [rng.randrange(FR.p) for _ in range(20)] + [0, 1, FR.p - 1]
    ys = [rng.randrange(FR.p) for _ in range(20)] + [FR.p - 1, FR.p - 1, FR.p - 1]
    got = nf.mont_mul_batch(xs, ys)
    for g, x, y in zip(got, xs, ys):
        assert g == x * y % FR.p


def test_native_poseidon_permute(rng):
    cfg = get_default_poseidon_parameters(FR, 2, False)
    np_engine = native.NativePoseidon(cfg)
    states = [[rng.randrange(FR.p) for _ in range(3)] for _ in range(5)]
    got = np_engine.permute(states)
    for st, g in zip(states, got):
        oracle = PoseidonSponge(cfg)
        oracle.state = list(st)
        oracle.permute()
        assert g == oracle.state


@pytest.mark.slow
def test_native_two_to_one_and_merkle(rng):
    cfg = get_default_poseidon_parameters(FR, 2, False)
    eng = native.NativePoseidon(cfg)
    from crypto_primitives_tpu.models.crh.poseidon import PoseidonTwoToOneCRH

    two = PoseidonTwoToOneCRH(FR)
    ls = [rng.randrange(FR.p) for _ in range(4)]
    rs = [rng.randrange(FR.p) for _ in range(4)]
    got = eng.two_to_one(ls, rs)
    for g, l, r in zip(got, ls, rs):
        assert g == two.compress(cfg, l, r)

    # full tree build matches the device-built MerkleTree layout
    import jax.numpy as jnp

    from crypto_primitives_tpu.models.crh.poseidon import PoseidonCRH
    from crypto_primitives_tpu.models.merkle_tree import (
        FieldDigestDomain,
        IdentityDigestConverter,
        MerkleTree,
        MerkleTreeConfig,
    )

    mcfg = MerkleTreeConfig(
        PoseidonCRH(FR), PoseidonTwoToOneCRH(FR),
        FieldDigestDomain(FR), FieldDigestDomain(FR), IdentityDigestConverter(),
    )
    leaves = [[rng.randrange(FR.p)] for _ in range(8)]
    tree = MerkleTree.new(mcfg, cfg, cfg, jnp.asarray(FR.pack(leaves)))
    leaf_digests = [mcfg.leaf_hash.evaluate(cfg, l) for l in leaves]
    native_nodes = eng.merkle_non_leaf(leaf_digests)
    dev_nodes = [mcfg.inner_domain.to_host(row) for row in tree.non_leaf_nodes]
    assert native_nodes == dev_nodes
