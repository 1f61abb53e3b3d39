"""TPU-native BLS12-381 framework (batch-first, JAX/XLA/Pallas).

Re-designed from scratch for TPU hardware with the capabilities of the
zkcrypto/bls12_381 Rust crate (reference layout documented in SURVEY.md).
"""

__version__ = "0.1.0"
