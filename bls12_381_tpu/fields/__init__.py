"""Field layers: Fp, Fr (scalar), and the Fp2/Fp6/Fp12 tower.

All elements are batched limb tensors (see bls12_381_tpu.limbs): Fp/Fr are
uint32[L, *batch]; tower elements are nested tuples of Fp tensors (pytrees).
"""

from . import fp, fr, tower  # noqa: F401
