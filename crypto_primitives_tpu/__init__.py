"""crypto_primitives_tpu — a TPU-native cryptographic-primitives framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
`ark-crypto-primitives` (reference mounted read-only at /root/reference):
sponges (Poseidon, transcript adapters), CRHs (Pedersen, Bowe–Hopwood,
Poseidon, SHA-256, injective-map compressors), commitments (Pedersen,
Blake2s), PRFs (Blake2s), signatures (Schnorr), encryption (ElGamal), Merkle
trees (Path/MultiPath), and an R1CS constraint-synthesis layer with gadget
twins for each primitive — built TPU-first: batched limb arithmetic on the
VPU/MXU, `lax.scan` round structures, `jax.sharding` meshes for multi-chip
Merkle/MSM workloads.
"""

from crypto_primitives_tpu.errors import CryptoError

__version__ = "0.1.0"
