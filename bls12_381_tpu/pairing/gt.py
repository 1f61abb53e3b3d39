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


frobenius = tw.fp12_frobenius  # acts as [p] = [z] on the order-q subgroup


def _broadcast_to_batch(gt, batch):
    import jax

    return jax.tree.map(
        lambda x: jnp.broadcast_to(
            x.reshape(x.shape + (1,) * (1 + len(batch) - x.ndim)),
            x.shape[:1] + batch,
        )
        if x.ndim < 1 + len(batch)
        else x,
        gt,
    )


def _lookup(table, digit, window):
    """Binary select tree over stacked table leaves (take_along_axis gathers
    are an order of magnitude slower on TPU lanes)."""
    import jax

    def take(leaf):
        sel = leaf
        for b in range(window - 1, -1, -1):
            bit = ((digit >> b) & 1).astype(bool)
            mask = bit[(None,) * (sel.ndim - 1 - bit.ndim) + (...,)]
            half = sel.shape[0] // 2
            sel = jnp.where(mask, sel[half:], sel[:half])
        return sel[0]

    return jax.tree.map(take, table)


def _multi_scalar_windowed(elems, digits_list, batch, window=4):
    """sum_i [k_i] f_i with shared cyclotomic doublings (Straus windows) —
    the Gt analog of Weierstrass.multi_scalar_mul_windowed."""
    import jax

    m = 1 << window
    tables = []
    for e in elems:
        tbl = [identity(batch), e]
        for _ in range(2, m):
            tbl.append(add(tbl[-1], e))
        tables.append(jax.tree.map(lambda *xs: jnp.stack(xs), *tbl))
    stacked = jnp.stack(digits_list, axis=1)  # [n_steps, n_elems, *batch]

    def step(acc, digs):
        for _ in range(window):
            acc = double(acc)
        for i, tbl in enumerate(tables):
            acc = add(acc, _lookup(tbl, digs[i], window))
        return acc, None

    acc, _ = jax.lax.scan(step, identity(batch), stacked)
    return acc


def scalar_mul(gt, scalars_mont):
    """[k] a for Gt elements and Fr scalar batches, via the 4-way GLS split
    (beyond-reference; pairings.rs:304-322 is a plain 255-step ladder).

    The Frobenius x -> x^p is multiplication by p ≡ z (mod q) on the order-q
    cyclotomic subgroup — the same eigenvalue psi has on G2 — so
    k = c0 + c1|z| + c2|z|^2 + c3|z|^3 gives

        [k]f = [c0]f + [c1](-frob f) + [c2]frob^2 f + [c3](-frob^3 f)

    evaluated with SHARED cyclotomic doublings over four 64-bit
    mini-scalars: 64 doublings instead of 255 (~4x).  Valid exactly on Gt
    (order-q elements); use scalar_mul_generic otherwise.
    """
    from .. import limbs, params as pp

    canon = limbs.from_mont(FR, scalars_mont)  # [16, *batch]
    batch = canon.shape[1:]
    gt = _broadcast_to_batch(gt, batch)

    x = pp.BLS_X
    q3, r3 = limbs.barrett_divmod(canon, x**3, 5)  # c3 < |z| < 2^64
    q2, r2 = limbs.barrett_divmod(r3, x**2, 5)
    q1, c0 = limbs.barrett_divmod(r2, x, 5)

    f1 = gt
    ff = frobenius(gt)
    f2 = neg(ff)            # [|z|] f   (z = -|z|)
    f3 = frobenius(ff)      # [|z|^2] f
    f4 = neg(frobenius(f3))  # [|z|^3] f
    digits = [
        limbs.digits4_msb(c0, 64),
        limbs.digits4_msb(q1, 64),
        limbs.digits4_msb(q2, 64),
        limbs.digits4_msb(q3, 64),
    ]
    return _multi_scalar_windowed([f1, f2, f3, f4], digits, batch)


def scalar_mul_generic(gt, scalars_mont):
    """255-step double-and-add over the canonical scalar bits — the direct
    analog of the reference ladder (pairings.rs:304-322), kept for non-GLS
    validation."""
    import jax

    from .. import limbs

    canon = limbs.from_mont(FR, scalars_mont)  # [16, *batch] 16-bit limbs
    batch = canon.shape[1:]
    gt = _broadcast_to_batch(gt, batch)
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
