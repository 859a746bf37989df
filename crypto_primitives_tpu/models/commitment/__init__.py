"""Commitment layer.

Twin of /root/reference/crypto-primitives/src/commitment/mod.rs:15-27:
`CommitmentScheme{Parameters, Randomness, Output; setup, commit}`.
"""

from crypto_primitives_tpu.models.commitment.blake2s import Blake2sCommitment
from crypto_primitives_tpu.models.commitment.injective_map import (
    PedersenCommitmentCompressor,
)
from crypto_primitives_tpu.models.commitment.pedersen import (
    PedersenCommitment,
    PedersenCommitmentParameters,
)


class CommitmentScheme:
    def setup(self, rng):
        raise NotImplementedError

    def commit(self, params, input_, randomness):
        raise NotImplementedError

    def commit_batch(self, params, inputs, randomness):
        raise NotImplementedError
