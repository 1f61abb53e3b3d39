"""TPU-native BLS12-381 framework (batch-first, JAX/XLA/Pallas).

A ground-up redesign with the full capabilities of the zkcrypto/bls12_381
Rust crate (structure documented in SURVEY.md): base/scalar fields, the
Fp2/Fp6/Fp12 tower, G1/G2 group law with endomorphisms and serialization,
the optimal-ate pairing, draft-16 hash-to-curve, plus TPU-first throughput
layers (Pippenger MSM, radix-2 NTT) and multi-chip sharding.

Layers:
  hostmath   — pure-Python oracle (validated against the reference's vectors)
  limbs      — batched 16-bit-limb Montgomery arithmetic (uint32 tensors)
  fields     — Fp, Fr, and the extension tower
  curves     — G1/G2 (complete RCB formulas, batched)
  pairing    — G2 preparation, Miller loop, final exponentiation
  hash_to_curve — SSWU + isogeny maps (expansion on host)
  ops        — MSM, NTT
  parallel   — mesh helpers and sharded MSM/NTT/pairing

All device values are Montgomery-form 16-bit limbs in uint32 tensors with
the limb axis first ([L, *batch]); see bls12_381_tpu.limbs for the design.
"""

__version__ = "0.1.0"

from . import params  # noqa: F401
from . import hostmath  # noqa: F401


def __getattr__(name):
    # lazy imports so `import bls12_381_tpu` works without jax initialized
    import importlib

    if name in (
        "limbs",
        "fields",
        "curves",
        "pairing",
        "hash_to_curve",
        "ops",
        "parallel",
        "config",
        "utils",
    ):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
