"""multilinear-tpu: a TPU-native multilinear proving framework.

Brand-new JAX/XLA/Pallas implementation with the full capability surface of
the Rust reference `fr34za/multilinear`: GF(p) limb arithmetic
(p = 2^128 - 45*2^40 + 1), multilinear polynomials, sumcheck, radix-2
NTT/Reed-Solomon, SHA-256 Merkle commitments, FRI (plain + batched), a
FRI-based multilinear PCS (plain + batched), and an AIR-style constraint
system under a Fiat-Shamir transcript.
"""

__version__ = "0.1.0"

__all__ = [
    "batched_fri",
    "batched_pcs",
    "config",
    "field",
    "fri",
    "merkle",
    "mle",
    "native",
    "ntt",
    "parallel",
    "pcs",
    "poly",
    "serialize",
    "sha256",
    "sumcheck",
    "system",
    "transcript",
    "utils",
]
