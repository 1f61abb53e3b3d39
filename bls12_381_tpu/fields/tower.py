"""Batched extension tower Fp2 / Fp6 / Fp12 on device.

Same tower as the reference (SURVEY.md §2):
  Fp2  = Fp[u]/(u^2+1)            elements: (c0, c1) tuples of Fp tensors
  Fp6  = Fp2[v]/(v^3 - (u+1))     elements: (c0, c1, c2) tuples of Fp2
  Fp12 = Fp6[w]/(w^2 - v)         elements: (c0, c1) tuples of Fp6

Multiplications are built on fused Fp sum-of-products (limbs.sum_of_products)
with preprocessed operand combinations — the TPU analog of the reference's
mul_interleaved (fp6.rs:195-274, ePrint 2022/367 §5): every output Fp
component is ONE fused T<=6-term Montgomery accumulation.

Frobenius coefficients are computed by the host oracle (hostmath) and embedded
as Montgomery-form device constants.
"""

from __future__ import annotations

from .. import hostmath as hm
from . import fp

# =========================================================================
# Fp2
# =========================================================================


def fp2_add(a, b):
    return (fp.add(a[0], b[0]), fp.add(a[1], b[1]))


def fp2_sub(a, b):
    return (fp.sub(a[0], b[0]), fp.sub(a[1], b[1]))


def fp2_neg(a):
    return (fp.neg(a[0]), fp.neg(a[1]))


class _Combos:
    """Per-expression cache of derived operand forms (negations and the
    xi-combinations y0-y1 / y0+y1), so each is traced at most once."""

    def __init__(self):
        self._neg = {}
        self._pm = {}

    def neg(self, x):
        key = id(x)
        if key not in self._neg:
            self._neg[key] = (fp.neg(x), x)  # keep x alive for id stability
        return self._neg[key][0]

    def pm(self, y):
        """(y0 - y1, y0 + y1) for an fp2 operand."""
        key = (id(y[0]), id(y[1]))
        if key not in self._pm:
            self._pm[key] = (fp.sub(y[0], y[1]), fp.add(y[0], y[1]), y)
        return self._pm[key][:2]


def _fp2_term_groups(terms, cb: _Combos):
    """Build the (c0_group, c1_group) Fp-level sop groups for
    sum_i [xi *]? (x_i * y_i) over Fp2.

    terms: list of (x, y, use_xi); each contributes 2 products per component:
      plain:  c0 += x0 y0 - x1 y1          c1 += x0 y1 + x1 y0
      xi:     c0 += x0 (y0-y1) - x1 (y0+y1) c1 += x0 (y0+y1) + x1 (y0-y1)
    """
    c0g, c1g = [], []
    for x, y, use_xi in terms:
        if use_xi:
            ym, yp = cb.pm(y)
            c0g += [(x[0], ym), (x[1], cb.neg(yp))]
            c1g += [(x[0], yp), (x[1], ym)]
        else:
            c0g += [(x[0], y[0]), (x[1], cb.neg(y[1]))]
            c1g += [(x[0], y[1]), (x[1], y[0])]
    return c0g, c1g


def fp2_mul(a, b):
    """(a0 b0 - a1 b1, a0 b1 + a1 b0) as one fused fold
    (reference fp2.rs:205-222)."""
    cb = _Combos()
    c0g, c1g = _fp2_term_groups([(a, b, False)], cb)
    c0, c1 = fp.sop_fold([c0g, c1g])
    return (c0, c1)


def fp2_sqr(a):
    """Complex squaring: ((a0+a1)(a0-a1), 2 a0 a1) (fp2.rs:182-203)."""
    s = fp.add(a[0], a[1])
    d = fp.sub(a[0], a[1])
    t0, t1 = fp.mul_many([(s, d), (a[0], a[1])])
    return (t0, fp.add(t1, t1))


def fp2_mul_many(pairs):
    """Independent Fp2 products folded into one reduction; returns a list."""
    cb = _Combos()
    groups = []
    for a, b in pairs:
        c0g, c1g = _fp2_term_groups([(a, b, False)], cb)
        groups += [c0g, c1g]
    flat = fp.sop_fold(groups)
    return [(flat[2 * i], flat[2 * i + 1]) for i in range(len(pairs))]


def fp2_mul_fp(a, s):
    return (fp.mul(a[0], s), fp.mul(a[1], s))


def fp2_mul_by_nonresidue(a):
    """Multiply by u+1: (c0 - c1, c0 + c1) (fp2.rs:156-166)."""
    return (fp.sub(a[0], a[1]), fp.add(a[0], a[1]))


def fp2_conjugate(a):
    return (a[0], fp.neg(a[1]))


fp2_frobenius = fp2_conjugate  # u^p = -u since p = 3 mod 4 (fp2.rs:141-153)


def fp2_inv(a):
    """1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2) (fp2.rs:300-319)."""
    norm = fp.sop([(a[0], a[0]), (a[1], a[1])])
    ninv = fp.inv(norm)
    return (fp.mul(a[0], ninv), fp.neg(fp.mul(a[1], ninv)))


def fp2_batch_inv(a):
    """fp2_inv with the Fp norm inversion amortized over the last batch axis
    (one product-tree inversion for the whole batch, g1.rs:806-839 analog)."""
    norm = fp.sop([(a[0], a[0]), (a[1], a[1])])
    ninv = fp.batch_inv(norm)
    t0, t1 = fp.mul_many([(a[0], ninv), (a[1], ninv)])
    return (t0, fp.neg(t1))


def fp2_select(mask, a, b):
    return (fp.select(mask, a[0], b[0]), fp.select(mask, a[1], b[1]))


def fp2_is_zero(a):
    return fp.is_zero(a[0]) & fp.is_zero(a[1])


def fp2_eq(a, b):
    return fp.eq(a[0], b[0]) & fp.eq(a[1], b[1])


def fp2_zero(batch=()):
    return (fp.zero(batch), fp.zero(batch))


def fp2_one(batch=()):
    return (fp.one(batch), fp.zero(batch))


def fp2_const(c, batch=()):
    """Embed a host (c0, c1) integer pair as a broadcast device constant."""
    return (fp.const(c[0], batch), fp.const(c[1], batch))


def fp2_lexicographically_largest(a):
    """c1-major lexicographic order (fp2.rs:171-180)."""
    c1_large = fp.lexicographically_largest(a[1])
    c0_large = fp.lexicographically_largest(a[0])
    c1_zero = fp.is_zero(a[1])
    return c1_large | (c1_zero & c0_large)


def fp2_sgn0(a):
    """sgn0 for m=2 (draft-16 §4.1; map_g2.rs:381-388)."""
    s0 = fp.sgn0_mont(a[0])
    z0 = fp.is_zero(a[0])
    s1 = fp.sgn0_mont(a[1])
    return (s0 != 0) | (z0 & (s1 != 0))


def fp2_sop(terms):
    """Fused sum of Fp2 products: sum_i x_i * y_i with one Montgomery
    reduction per output component.  len(terms) <= 4 (Fp-level T <= 8)."""
    assert len(terms) <= 4
    cb = _Combos()
    c0g, c1g = _fp2_term_groups([(x, y, False) for x, y in terms], cb)
    c0, c1 = fp.sop_fold([c0g, c1g])
    return (c0, c1)


def fp2_sqrt(a):
    """Square root in Fp2, constant-schedule (ePrint 2012/685 Alg. 9; the
    algorithm family of reference fp2.rs:245-295).

    Returns (root, ok).  All branches are computed and mask-selected.
    """
    from .. import params

    a1 = fp2_pow(a, (params.P - 3) // 4)
    alpha = fp2_mul(fp2_sqr(a1), a)
    x0 = fp2_mul(a1, a)
    # branch alpha == -1: root = u * x0
    minus_one = fp2_neg(fp2_one(batch=a[0].shape[1:]))
    is_m1 = fp2_eq(alpha, minus_one)
    root_m1 = (fp.neg(x0[1]), x0[0])
    # general branch: root = (1 + alpha)^((p-1)/2) * x0
    b = fp2_pow(fp2_add(fp2_one(batch=a[0].shape[1:]), alpha), (params.P - 1) // 2)
    root_gen = fp2_mul(b, x0)
    root = fp2_select(is_m1, root_m1, root_gen)
    # zero maps to zero
    root = fp2_select(fp2_is_zero(a), fp2_zero(batch=a[0].shape[1:]), root)
    ok = fp2_eq(fp2_sqr(root), a)
    return root, ok


def fp2_pow(a, e: int):
    """a^e for a static public exponent (square-and-multiply, trace-time
    schedule via lax.scan like limbs.pow_fixed; zero-padded to 381 bits so
    all Fp2 pows share one compiled body)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .. import params

    if e == 0:
        return fp2_one(batch=a[0].shape[1:])
    width = max(e.bit_length(), params.P.bit_length())
    bits = np.array([(e >> (width - 1 - i)) & 1 for i in range(width)],
                    dtype=np.bool_)

    def step(acc, bit):
        acc = fp2_sqr(acc)
        mul_a = fp2_mul(acc, a)
        acc = fp2_select(jnp.broadcast_to(bit, acc[0].shape[1:]), mul_a, acc)
        return acc, None

    acc, _ = jax.lax.scan(step, fp2_one(batch=a[0].shape[1:]),
                          jnp.asarray(bits))
    return acc


# =========================================================================
# Fp6
# =========================================================================


def fp6_add(a, b):
    return tuple(fp2_add(x, y) for x, y in zip(a, b))


def fp6_sub(a, b):
    return tuple(fp2_sub(x, y) for x, y in zip(a, b))


def fp6_neg(a):
    return tuple(fp2_neg(x) for x in a)


def _fp6_mul_groups(a, b, cb: _Combos):
    """The six Fp-level sop groups of an Fp6 product (fp6.rs:195-274 analog):
      c0 = a0 b0 + xi (a1 b2 + a2 b1)
      c1 = a0 b1 + a1 b0 + xi (a2 b2)
      c2 = a0 b2 + a1 b1 + a2 b0
    Each output Fp component is one fused 6-term group.
    """
    a0, a1, a2 = a
    b0, b1, b2 = b
    g = []
    g += _fp2_term_groups([(a0, b0, False), (a1, b2, True), (a2, b1, True)], cb)
    g += _fp2_term_groups([(a0, b1, False), (a1, b0, False), (a2, b2, True)], cb)
    g += _fp2_term_groups([(a0, b2, False), (a1, b1, False), (a2, b0, False)], cb)
    return g  # 6 groups: [c0c0, c0c1, c1c0, c1c1, c2c0, c2c1]


def _fp6_from_flat(flat):
    return ((flat[0], flat[1]), (flat[2], flat[3]), (flat[4], flat[5]))


def fp6_mul(a, b):
    """Full interleaved product: ONE fused fold of 6 six-term groups."""
    cb = _Combos()
    flat = fp.sop_fold(_fp6_mul_groups(a, b, cb))
    return _fp6_from_flat(flat)


def fp6_mul_many(pairs):
    """Independent Fp6 products folded into one reduction; returns a list."""
    cb = _Combos()
    groups = []
    for a, b in pairs:
        groups += _fp6_mul_groups(a, b, cb)
    flat = fp.sop_fold(groups)
    return [_fp6_from_flat(flat[6 * i : 6 * i + 6]) for i in range(len(pairs))]


def _fp2_sqr_groups(x):
    """The two Fp-level groups of a complex squaring ((x0+x1)(x0-x1), x0 x1);
    the caller doubles the second output component."""
    s = fp.add(x[0], x[1])
    d = fp.sub(x[0], x[1])
    return [[(s, d)], [(x[0], x[1])]]


def fp6_sqr(a):
    """Dedicated CH-SQR squaring (fp6.rs:277-291): 5 Fp2 products
      s0 = c0^2, ab = c0 c1, s2 = (c0 - c1 + c2)^2, bc = c1 c2, s4 = c2^2
    as ONE fused fold of 10 groups (T <= 2) — ~1.4x fewer limb MACs than the
    36-term full product."""
    c0, c1, c2 = a
    cb = _Combos()
    t = fp2_add(fp2_sub(c0, c1), c2)
    groups = (
        _fp2_sqr_groups(c0)
        + list(_fp2_term_groups([(c0, c1, False)], cb))
        + _fp2_sqr_groups(t)
        + list(_fp2_term_groups([(c1, c2, False)], cb))
        + _fp2_sqr_groups(c2)
    )
    flat = fp.sop_fold(groups)

    def sq_out(g0, g1):
        return (g0, fp.add(g1, g1))

    s0 = sq_out(flat[0], flat[1])
    ab = (flat[2], flat[3])
    s1 = fp2_add(ab, ab)
    s2 = sq_out(flat[4], flat[5])
    bc = (flat[6], flat[7])
    s3 = fp2_add(bc, bc)
    s4 = sq_out(flat[8], flat[9])
    return (
        fp2_add(fp2_mul_by_nonresidue(s3), s0),
        fp2_add(fp2_mul_by_nonresidue(s4), s1),
        fp2_sub(fp2_add(fp2_add(s1, s2), s3), fp2_add(s0, s4)),
    )


def fp6_mul_by_nonresidue(a):
    """Multiply by v: (xi*c2, c0, c1) (fp6.rs:139-150)."""
    return (fp2_mul_by_nonresidue(a[2]), a[0], a[1])


def fp6_mul_by_0(a, g0):
    """a * (g0 + 0 v + 0 v^2): three Fp2 muls."""
    return (fp2_mul(a[0], g0), fp2_mul(a[1], g0), fp2_mul(a[2], g0))


def _fp6_mul_by_12_groups(a, g1, g2, cb: _Combos):
    """Groups for a * (g1 v + g2 v^2):
      c0 = xi (a2 g1 + a1 g2)
      c1 = a0 g1 + xi (a2 g2)
      c2 = a1 g1 + a0 g2
    """
    g = []
    g += _fp2_term_groups([(a[2], g1, True), (a[1], g2, True)], cb)
    g += _fp2_term_groups([(a[0], g1, False), (a[2], g2, True)], cb)
    g += _fp2_term_groups([(a[1], g1, False), (a[0], g2, False)], cb)
    return g


def fp6_mul_by_12(a, g1, g2):
    cb = _Combos()
    flat = fp.sop_fold(_fp6_mul_by_12_groups(a, g1, g2, cb))
    return _fp6_from_flat(flat)


def fp6_inv(a):
    """Adjugate inversion with one Fp2 inversion (fp6.rs:294-312)."""
    a0, a1, a2 = a
    c0 = fp2_sub(fp2_sqr(a0), fp2_mul_by_nonresidue(fp2_mul(a1, a2)))
    c1 = fp2_sub(fp2_mul_by_nonresidue(fp2_sqr(a2)), fp2_mul(a0, a1))
    c2 = fp2_sub(fp2_sqr(a1), fp2_mul(a0, a2))
    t = fp2_add(
        fp2_mul_by_nonresidue(fp2_sop([(a1, c2), (a2, c1)])),
        fp2_mul(a0, c0),
    )
    tinv = fp2_inv(t)
    return (fp2_mul(c0, tinv), fp2_mul(c1, tinv), fp2_mul(c2, tinv))


def fp6_select(mask, a, b):
    return tuple(fp2_select(mask, x, y) for x, y in zip(a, b))


def fp6_eq(a, b):
    return fp2_eq(a[0], b[0]) & fp2_eq(a[1], b[1]) & fp2_eq(a[2], b[2])


def fp6_zero(batch=()):
    return (fp2_zero(batch), fp2_zero(batch), fp2_zero(batch))


def fp6_one(batch=()):
    return (fp2_one(batch), fp2_zero(batch), fp2_zero(batch))


# Frobenius coefficients (computed by the host oracle, not transcribed)
_FROB6_C1 = hm.FROB6_C1
_FROB6_C2 = hm.FROB6_C2
_FROB12_C1 = hm.FROB12_C1


def fp6_frobenius(a):
    """(c0^p, gamma1 c1^p, gamma2 c2^p) with gamma_i = xi^(i(p-1)/3)
    (fp6.rs:152-188)."""
    batch = a[0][0].shape[1:]
    c0 = fp2_conjugate(a[0])
    c1 = fp2_mul(fp2_conjugate(a[1]), fp2_const(_FROB6_C1, batch))
    c2 = fp2_mul(fp2_conjugate(a[2]), fp2_const(_FROB6_C2, batch))
    return (c0, c1, c2)


# =========================================================================
# Fp12
# =========================================================================


def fp12_add(a, b):
    return (fp6_add(a[0], b[0]), fp6_add(a[1], b[1]))


def fp12_mul(a, b):
    """Karatsuba over Fp6 — three independent Fp6 products in ONE fold
    (fp12.rs:197-213)."""
    t0, t1, t2 = fp6_mul_many(
        [
            (a[0], b[0]),
            (a[1], b[1]),
            (fp6_add(a[0], a[1]), fp6_add(b[0], b[1])),
        ]
    )
    c0 = fp6_add(t0, fp6_mul_by_nonresidue(t1))
    c1 = fp6_sub(fp6_sub(t2, t0), t1)
    return (c0, c1)


def fp12_sqr(a):
    """(c0 + c1 w)^2 with 2 folded Fp6 muls (fp12.rs:174-185)."""
    ab, t = fp6_mul_many(
        [
            (a[0], a[1]),
            (fp6_add(a[0], a[1]), fp6_add(a[0], fp6_mul_by_nonresidue(a[1]))),
        ]
    )
    c0 = fp6_sub(fp6_sub(t, ab), fp6_mul_by_nonresidue(ab))
    c1 = fp6_add(ab, ab)
    return (c0, c1)


def fp12_conjugate(a):
    """a^(p^6) (fp12.rs:136)."""
    return (a[0], fp6_neg(a[1]))


def fp12_cyclotomic_sqr(f):
    """Granger-Scott squaring for elements of the cyclotomic subgroup
    (ePrint 2009/565; the algorithm family of pairings.rs:50-113).

    With w^6 = xi, the three Fp4 = Fp2[w^3] subalgebra groupings are
    (a0, b1), (b0, a2), (a1, b2); each fp4-square is 3 Fp2 squarings, all
    nine folded into ONE reduction.  Only valid after the easy part of the
    final exponentiation (where conj == inverse).
    """
    (a0, a1, a2), (b0, b1, b2) = f

    # all nine fp2 squarings in one fold: for each fp4 pair (x, y):
    # x^2, y^2, (x+y)^2
    sums = [fp2_add(a0, b1), fp2_add(b0, a2), fp2_add(a1, b2)]
    sq = fp2_mul_many(
        [
            (a0, a0), (b1, b1), (sums[0], sums[0]),
            (b0, b0), (a2, a2), (sums[1], sums[1]),
            (a1, a1), (b2, b2), (sums[2], sums[2]),
        ]
    )

    def fp4_out(x2, y2, s2):
        c0 = fp2_add(fp2_mul_by_nonresidue(y2), x2)       # x^2 + xi y^2
        c1 = fp2_sub(fp2_sub(s2, x2), y2)                 # 2xy
        return c0, c1

    t00, t01 = fp4_out(sq[0], sq[1], sq[2])  # g0^2 over (a0, b1)
    t10, t11 = fp4_out(sq[3], sq[4], sq[5])  # g1^2 over (b0, a2)
    t20, t21 = fp4_out(sq[6], sq[7], sq[8])  # g2^2 over (a1, b2)

    def three_minus_two(t, z):
        u = fp2_sub(t, z)
        return fp2_add(fp2_add(u, u), t)

    def three_plus_two(t, z):
        u = fp2_add(t, z)
        return fp2_add(fp2_add(u, u), t)

    na0 = three_minus_two(t00, a0)
    nb1 = three_plus_two(t01, b1)
    na1 = three_minus_two(t10, a1)
    nb2 = three_plus_two(t11, b2)
    xt21 = fp2_mul_by_nonresidue(t21)
    nb0 = three_plus_two(xt21, b0)
    na2 = three_minus_two(t20, a2)
    return ((na0, na1, na2), (nb0, nb1, nb2))


def fp12_inv(a):
    """1/(c0 + c1 w) via norm c0^2 - v c1^2 (fp12.rs:187-194)."""
    t = fp6_sub(fp6_sqr(a[0]), fp6_mul_by_nonresidue(fp6_sqr(a[1])))
    tinv = fp6_inv(t)
    return (fp6_mul(a[0], tinv), fp6_neg(fp6_mul(a[1], tinv)))


def fp12_frobenius(a):
    """(c0^p, gamma12 * c1^p) with gamma12 = xi^((p-1)/6) (fp12.rs:145-171)."""
    batch = a[0][0][0].shape[1:]
    c0 = fp6_frobenius(a[0])
    c1 = fp6_frobenius(a[1])
    g = fp2_const(_FROB12_C1, batch)
    c1 = tuple(fp2_mul(x, g) for x in c1)
    return (c0, c1)


def fp12_mul_by_045(f, g0, g4, g5):
    """Multiply f by the sparse element g0 + g4 (v w) + g5 (v^2 w) — the
    Miller-loop line shape in the D-twist 045 convention (see
    hostmath._sparse_line_045; counterpart of the reference's mul_by_014,
    fp12.rs:116-128, under its twist convention).

    All 24 component products run as ONE fused fold:
      (f0 + f1 w)(g0 + (g4 v + g5 v^2) w)
        = f0 g0 + f1 B v  +  (f1 g0 + f0 B) w,   B = g4 v + g5 v^2.
    """
    cb = _Combos()
    groups = []
    for part in (f[0], f[1]):  # part * g0: three fp2 muls each
        for comp in part:
            groups += _fp2_term_groups([(comp, g0, False)], cb)
    groups += _fp6_mul_by_12_groups(f[1], g4, g5, cb)
    groups += _fp6_mul_by_12_groups(f[0], g4, g5, cb)
    flat = fp.sop_fold(groups)
    a = _fp6_from_flat(flat[0:6])     # f0 g0
    a2 = _fp6_from_flat(flat[6:12])   # f1 g0
    b = _fp6_from_flat(flat[12:18])   # f1 B
    b2 = _fp6_from_flat(flat[18:24])  # f0 B
    c0 = fp6_add(a, fp6_mul_by_nonresidue(b))
    c1 = fp6_add(a2, b2)
    return (c0, c1)


def fp12_select(mask, a, b):
    return (fp6_select(mask, a[0], b[0]), fp6_select(mask, a[1], b[1]))


def fp12_eq(a, b):
    return fp6_eq(a[0], b[0]) & fp6_eq(a[1], b[1])


def fp12_zero(batch=()):
    return (fp6_zero(batch), fp6_zero(batch))


def fp12_one(batch=()):
    return (fp6_one(batch), fp6_zero(batch))


def fp12_pow(a, e: int):
    """a^e for static e (scanned square-and-multiply)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    batch = a[0][0][0].shape[1:]
    if e == 0:
        return fp12_one(batch)
    bits = np.array([int(c) for c in bin(e)[2:]], dtype=np.bool_)

    def step(acc, bit):
        acc = fp12_sqr(acc)
        acc = fp12_select(jnp.broadcast_to(bit, batch), fp12_mul(acc, a), acc)
        return acc, None

    acc, _ = jax.lax.scan(step, a, jnp.asarray(bits[1:]))
    return acc


# =========================================================================
# host <-> device codecs for tower elements
# =========================================================================


def fp2_from_ints(vals):
    """vals: sequence of (c0, c1) int pairs (or a single pair)."""
    import numpy as np

    arr = np.asarray(vals, dtype=object)
    if arr.ndim == 1:  # single element
        return (fp.from_ints(arr[0]), fp.from_ints(arr[1]))
    return (fp.from_ints(list(arr[..., 0])), fp.from_ints(list(arr[..., 1])))


def fp2_to_ints(a):
    return (fp.to_ints(a[0]), fp.to_ints(a[1]))


def fp12_from_host(h, batch=()):
    """Encode a hostmath Fp12 (nested int tuples) -> broadcast device element."""
    return tuple(
        tuple(
            (fp.const(c2[0], batch), fp.const(c2[1], batch)) for c2 in c6
        )
        for c6 in h
    )


def fp12_to_host(a):
    """Decode a device Fp12 batch -> nested python-int structure.

    Returns nested tuples mirroring hostmath layout; leaf values are numpy
    object arrays over the batch (or ints for scalar batch).
    """
    return tuple(
        tuple((fp.to_ints(c2[0]), fp.to_ints(c2[1])) for c2 in c6) for c6 in a
    )
