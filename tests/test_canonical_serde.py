"""CanonicalSerialize/Deserialize round trips (utils/canonical.py) —
every persistent object crosses a process boundary: params, configs,
Path/MultiPath, signatures, ciphertexts.  Layout pins keep the wire format
stable (ark-serialize 0.4 rules)."""

import jax.numpy as jnp
import pytest

from crypto_primitives_tpu.errors import SerializationError
from crypto_primitives_tpu.models.merkle_tree import MerkleTree
from crypto_primitives_tpu.models.signature.schnorr import Schnorr
from crypto_primitives_tpu.models.encryption.elgamal import ElGamal
from crypto_primitives_tpu.models.sponge import get_default_poseidon_parameters
from crypto_primitives_tpu.ops.curves_known import JUBJUB
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.utils import canonical as c

from test_merkle_tree import build_poseidon_tree, sha256_tree_config


def test_field_roundtrip_and_bounds(rng):
    for _ in range(5):
        v = rng.randrange(FR.p)
        data = c.write_field(FR, v)
        assert len(data) == FR.bigint_bytes
        r = c.Reader(data)
        assert c.read_field(FR, r) == v
        r.finish()
    # out-of-range rejected
    bad = c.Reader((FR.p).to_bytes(FR.bigint_bytes, "little"))
    with pytest.raises(SerializationError):
        c.read_field(FR, bad)


def test_te_point_roundtrip(rng):
    for _ in range(5):
        pt = JUBJUB.rand_point(rng)
        comp = c.write_te_compressed(JUBJUB, pt)
        assert len(comp) == JUBJUB.base.bigint_bytes
        assert c.read_te_compressed(JUBJUB, c.Reader(comp)) == pt
        unc = c.write_te_uncompressed(JUBJUB, pt)
        assert c.read_te_uncompressed(JUBJUB, c.Reader(unc)) == pt
    # invalid y (not on curve) rejected
    with pytest.raises(SerializationError):
        c.read_te_compressed(JUBJUB, c.Reader(b"\x02" + b"\x00" * 31))


def test_poseidon_config_roundtrip():
    cfg = get_default_poseidon_parameters(FR, 2, False)
    data = c.serialize_poseidon_config(cfg)
    back = c.deserialize_poseidon_config(FR, data)
    # PoseidonConfig uses identity equality (jit cache key); compare fields
    assert (back.full_rounds, back.partial_rounds, back.alpha, back.rate,
            back.capacity) == (cfg.full_rounds, cfg.partial_rounds, cfg.alpha,
                               cfg.rate, cfg.capacity)
    assert back.ark == cfg.ark and back.mds == cfg.mds
    # trailing garbage rejected
    with pytest.raises(SerializationError):
        c.deserialize_poseidon_config(FR, data + b"\x00")


def test_path_roundtrip_cross_object(rng):
    """A proof generated from one tree object verifies after a byte
    round-trip against a second, independently-deserialized context."""
    cfg, params, leaves_host, leaves_dev, tree = build_poseidon_tree(rng, 8)
    codec = c.field_digest_codec(FR)
    proof = tree.generate_proof(5)
    data = c.serialize_path(proof, codec, codec)
    back = c.deserialize_path(data, codec, codec)
    assert back.leaf_sibling_hash == proof.leaf_sibling_hash
    assert back.auth_path == proof.auth_path
    assert back.leaf_index == proof.leaf_index
    assert back.verify(cfg, params, params, tree.root(), leaves_host[5])


def test_byte_path_roundtrip(rng):
    import numpy as np

    cfg = sha256_tree_config()
    leaves = np.frombuffer(
        bytes(rng.randrange(256) for _ in range(8 * 20)), dtype=np.uint8
    ).reshape(8, 20)
    tree = MerkleTree.new(cfg, None, None, jnp.asarray(leaves))
    codec = c.byte_digest_codec()
    proof = tree.generate_proof(3)
    back = c.deserialize_path(c.serialize_path(proof, codec, codec), codec, codec)
    assert back.verify(cfg, None, None, tree.root(), bytes(leaves[3]))


def test_multipath_roundtrip(rng):
    cfg, params, leaves_host, leaves_dev, tree = build_poseidon_tree(rng, 8)
    codec = c.field_digest_codec(FR)
    mp = tree.generate_multi_proof(range(8))
    data = c.serialize_multipath(mp, codec, codec)
    back = c.deserialize_multipath(data, codec, codec)
    assert back.auth_paths_prefix_lenghts == mp.auth_paths_prefix_lenghts
    assert back.leaf_indexes == mp.leaf_indexes
    assert back.verify(cfg, params, params, tree.root(), leaves_host)


def test_schnorr_roundtrip(rng):
    sch = Schnorr(JUBJUB)
    params = sch.setup(rng)
    pk, sk = sch.keygen(params, rng)
    sig = sch.sign(params, sk, b"hello tpu", rng)
    data_p = c.serialize_schnorr_params(JUBJUB, params)
    assert len(data_p) == JUBJUB.base.bigint_bytes + 32
    params2 = c.deserialize_schnorr_params(JUBJUB, data_p)
    sig2 = c.deserialize_schnorr_signature(
        JUBJUB, c.serialize_schnorr_signature(JUBJUB, sig)
    )
    pk2 = c.deserialize_public_key(JUBJUB, c.serialize_public_key(JUBJUB, pk))
    # full round trip verifies in a "fresh process" context
    assert sch.verify(params2, pk2, b"hello tpu", sig2)
    assert not sch.verify(params2, pk2, b"hello tpx", sig2)


def test_elgamal_ciphertext_roundtrip(rng):
    eg = ElGamal(JUBJUB)
    params = eg.setup(rng)
    pk, sk = eg.keygen(params, rng)
    msg = JUBJUB.rand_point(rng)
    randomness = rng.randrange(JUBJUB.scalar.p)
    ct = eg.encrypt(params, pk, msg, randomness)
    ct2 = c.deserialize_elgamal_ciphertext(
        JUBJUB, c.serialize_elgamal_ciphertext(JUBJUB, ct)
    )
    assert eg.decrypt(params, sk, ct2) == msg


def test_pedersen_params_roundtrip(rng):
    from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window

    win = Window(num_windows=4, window_size=3)
    crh = PedersenCRH(JUBJUB, win)
    params = crh.setup(rng)
    data = c.serialize_pedersen_crh_params(params)
    back = c.deserialize_pedersen_crh_params(JUBJUB, data)
    assert back.generators == params.generators


def test_layout_pins():
    """Wire-format stability pins (lengths + prefix rules)."""
    assert c.write_u64(5) == b"\x05" + b"\x00" * 7
    assert c.write_vec([], c.write_u64) == b"\x00" * 8
    data = c.write_bytes_vec(b"ab")
    assert data == b"\x02" + b"\x00" * 7 + b"ab"
    cfg = get_default_poseidon_parameters(FR, 2, False)
    blob = c.serialize_poseidon_config(cfg)
    t, rounds = 3, cfg.full_rounds + cfg.partial_rounds
    expect = 8 * 3 + (8 + rounds * (8 + t * 32)) + (8 + t * (8 + t * 32)) + 16
    assert len(blob) == expect
