"""Batched curve groups G1 (over Fp) and G2 (over Fp2).

Points are pytrees of field tensors: projective (x, y, z) triples, affine
(x, y, inf_mask).  The group law uses the complete projective formulas of
Renes-Costello-Batina (ePrint 2015/1060) — the same algorithm family as the
reference (g1.rs:638-751, g2.rs:709-833) — which handle identity and doubling
without branches, a perfect fit for batched masked execution on TPU.
"""

from . import g1, g2  # noqa: F401
