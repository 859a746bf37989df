"""Fused Pallas Poseidon kernel vs the host oracle (interpreter mode on CPU;
the same kernel is compiled for real on TPU by bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.models.sponge import PoseidonSponge, get_default_poseidon_parameters
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.ops.poseidon_pallas import permute_pallas

pytestmark = pytest.mark.slow  # device-oracle fuzz tier (run_tests.sh)


def test_pallas_kernel_interpret_matches_oracle(rng):
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B = 4
    states = [[rng.randrange(FR.p) for _ in range(3)] for _ in range(B)]
    dev = jnp.asarray(FR.pack(states))
    out = np.asarray(permute_pallas(FR, cfg, dev, block_b=128, interpret=True))
    for i in range(B):
        oracle = PoseidonSponge(cfg)
        oracle.state = list(states[i])
        oracle.permute()
        assert [int(v) for v in FR.unpack(out[i])] == oracle.state


def test_pallas_kernel_padding(rng):
    """Batch not divisible by the block: padded rows must not corrupt
    real rows."""
    cfg = get_default_poseidon_parameters(FR, 2, False)
    states = [[rng.randrange(FR.p) for _ in range(3)] for _ in range(3)]
    dev = jnp.asarray(FR.pack(states))
    out = np.asarray(permute_pallas(FR, cfg, dev, block_b=128, interpret=True))
    assert out.shape == (3, 3, 16)
    oracle = PoseidonSponge(cfg)
    oracle.state = list(states[2])
    oracle.permute()
    assert [int(v) for v in FR.unpack(out[2])] == oracle.state


@pytest.mark.parametrize("rate", [3, 8])
def test_pallas_kernel_wide_rates(rng, rate):
    """t=4 and t=9 exercise the chunked MDS matmul and the 8-digit
    compression pass (f32-exactness bounds); the interior rates add no
    new layout regime (each costs ~45s of XLA:CPU interpret time — the
    RNS-kernel tier covers rates 2-8 in tests/test_poseidon_rns.py)."""
    cfg = get_default_poseidon_parameters(FR, rate, False)
    states = [[rng.randrange(FR.p) for _ in range(cfg.t)] for _ in range(2)]
    dev = jnp.asarray(FR.pack(states))
    out = np.asarray(permute_pallas(FR, cfg, dev, block_b=128, interpret=True))
    for i in range(2):
        oracle = PoseidonSponge(cfg)
        oracle.state = list(states[i])
        oracle.permute()
        assert [int(v) for v in FR.unpack(out[i])] == oracle.state
