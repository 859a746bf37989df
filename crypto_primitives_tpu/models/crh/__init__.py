"""CRH layer: collision-resistant hash schemes.

Twin of /root/reference/crypto-primitives/src/crh/mod.rs:18-51, which defines
`CRHScheme{setup, evaluate}` and `TwoToOneCRHScheme{setup, evaluate, compress}`.

TPU re-design: every scheme is an *instance* (configured with its field or
curve) exposing two tiers —
  * host tier (`evaluate`, `evaluate_two_to_one`, `compress`): python values,
    exact, used for setup/one-off hashing and as the oracle;
  * device tier (`evaluate_batch`, `compress_batch`): arrays with a leading
    batch axis, jit-compiled, the path Merkle trees and bulk workloads use.
"""

from crypto_primitives_tpu.models.crh.poseidon import PoseidonCRH, PoseidonTwoToOneCRH
from crypto_primitives_tpu.models.crh.sha256 import Sha256CRH, Sha256TwoToOneCRH


class CRHScheme:
    """Abstract base; see module docstring."""

    def setup(self, rng):
        raise NotImplementedError

    def evaluate(self, params, input_):
        raise NotImplementedError

    def evaluate_batch(self, params, inputs):
        raise NotImplementedError


class TwoToOneCRHScheme:
    def setup(self, rng):
        raise NotImplementedError

    def evaluate(self, params, left, right):
        raise NotImplementedError

    def compress(self, params, left, right):
        raise NotImplementedError

    def evaluate_batch(self, params, left, right):
        raise NotImplementedError

    def compress_batch(self, params, left, right):
        raise NotImplementedError
