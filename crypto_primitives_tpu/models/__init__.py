"""Primitive model families: sponge, crh, commitment, prf, signature,
encryption, merkle_tree — the TPU twins of the reference's L2-L4 layers
(SURVEY.md §1)."""
