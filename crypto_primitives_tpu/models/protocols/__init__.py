"""Interactive-protocol showcases built from the primitive layer.

The reference stops at the sponge (its README positions
`CryptographicSponge` as the building block downstream protocols drive,
/root/reference/crypto-primitives/src/sponge/mod.rs:101-154); this
package demonstrates the TPU-native stack composing into a real
transcript-driven protocol end-to-end: the multilinear sumcheck prover/
verifier over the RNS-resident Fiat-Shamir transcript."""

from crypto_primitives_tpu.models.protocols.sumcheck import (  # noqa: F401
    sumcheck_prove_host,
    sumcheck_prove_rns,
    sumcheck_verify_host,
)
