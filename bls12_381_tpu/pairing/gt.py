"""Gt — the pairing target group, written additively (pairings.rs:204-337).

Elements are Fp12 values in the cyclotomic subgroup (order q); the additive
API mirrors the reference's `Gt` wrapper:

    add      = Fp12 multiplication          (pairings.rs:266-272)
    neg      = conjugation (unitary inverse, pairings.rs:260-263)
    double   = cyclotomic squaring          (pairings.rs:297-302 analog)
    scalar   = fixed-width double-and-add   (pairings.rs:304-322)

All ops are batched over trailing axes like the rest of the framework.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import params
from ..fields import fr as fr_mod, tower as tw
from ..limbs import FR

identity = tw.fp12_one
add = tw.fp12_mul
neg = tw.fp12_conjugate
double = tw.fp12_cyclotomic_sqr
eq = tw.fp12_eq
select = tw.fp12_select


def sub(a, b):
    return add(a, neg(b))


def generator(batch_shape=()):
    """e(G1_gen, G2_gen), the hardcoded generator (pairings.rs:359-475)."""
    from .. import hostmath as hm

    gt = hm.pairing(params.G1_GEN, params.G2_GEN)
    flat = [c for c6 in gt for c2 in c6 for c in c2]
    from ..fields import fp

    enc = fp.from_ints(np.array(flat, dtype=object))  # [L, 12]
    def pick(i):
        v = enc[:, i]
        return jnp.broadcast_to(
            v.reshape(v.shape + (1,) * len(batch_shape)),
            v.shape + tuple(batch_shape),
        )
    k = iter(range(12))
    return tuple(
        tuple((pick(next(k)), pick(next(k))) for _ in range(3))
        for _ in range(2)
    )


def scalar_mul(gt, scalars_mont):
    """[k] a for a batch of Gt elements and Fr scalars: 255-step
    double-and-add over the canonical scalar bits (pairings.rs:304-322),
    using cyclotomic squarings for the doublings."""
    import jax

    from .. import limbs

    canon = limbs.from_mont(FR, scalars_mont)  # [16, *batch] 16-bit limbs
    batch = canon.shape[1:]
    # broadcast the Gt element to the scalar batch shape
    gt = jax.tree.map(
        lambda x: jnp.broadcast_to(
            x.reshape(x.shape + (1,) * (1 + len(batch) - x.ndim)),
            x.shape[:1] + batch,
        )
        if x.ndim < 1 + len(batch)
        else x,
        gt,
    )
    n_bits = 255

    def bit_at(i):
        limb = i // 16
        return ((canon[limb] >> jnp.uint32(i % 16)) & jnp.uint32(1)).astype(
            bool
        )

    bits = jnp.stack([bit_at(n_bits - 1 - i) for i in range(n_bits)])

    def step(acc, bit):
        acc = double(acc)
        with_a = add(acc, gt)
        acc = select(jnp.broadcast_to(bit, batch), with_a, acc)
        return acc, None

    acc, _ = jax.lax.scan(step, identity(batch), bits)
    return acc


def is_identity(a):
    one = identity(a[0][0][0].shape[1:])
    import jax.numpy as _j

    flat_eq = [
        tw_eq
        for c6a, c6b in zip(a, one)
        for c2a, c2b in zip(c6a, c6b)
        for tw_eq in [
            _j.all(c2a[0] == c2b[0], axis=0) & _j.all(c2a[1] == c2b[1], axis=0)
        ]
    ]
    out = flat_eq[0]
    for e in flat_eq[1:]:
        out = out & e
    return out
