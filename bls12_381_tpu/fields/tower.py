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
    xi-combinations y0-y1 / y0+y1), so each is traced at most once.

    `prefill(terms)` batch-resolves every form a term list will need in
    three fused carry networks (limbs.add_many/sub_many) instead of one
    network per form — the launch/carry overhead of those small networks
    dominates the tower glue at small batch sizes."""

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

    def prefill(self, terms):
        """terms: list of (x, y, use_xi) as passed to _fp2_term_groups.
        Resolves, deduplicated: per plain term neg(y1); per xi term
        (y0-y1, y0+y1) and neg(y0+y1).  Phase A: one sub network (ym's and
        plain negs, as 0 - y1); phase B: one add network (yp's); phase C:
        one sub network (neg yp's)."""
        pm_keys, pm_ys = [], []
        neg_keys, neg_xs = [], []
        zero = None
        for _, y, use_xi in terms:
            if use_xi:
                key = (id(y[0]), id(y[1]))
                if key not in self._pm and key not in pm_keys:
                    pm_keys.append(key)
                    pm_ys.append(y)
            else:
                key = id(y[1])
                if key not in self._neg and key not in neg_keys:
                    neg_keys.append(key)
                    neg_xs.append(y[1])
        if not pm_keys and len(neg_keys) <= 1:
            return  # nothing to batch
        if neg_xs or pm_keys:
            zero = fp.zero(
                jnp_broadcast_batch([x for x in neg_xs]
                                    + [c for y in pm_ys for c in y])
            )
        subs = [(y[0], y[1]) for y in pm_ys] + [(zero, x) for x in neg_xs]
        sub_out = fp.sub_many(subs) if subs else []
        adds = [(y[0], y[1]) for y in pm_ys]
        add_out = fp.add_many(adds) if adds else []
        for i, key in enumerate(pm_keys):
            self._pm[key] = (sub_out[i], add_out[i], pm_ys[i])
        for j, key in enumerate(neg_keys):
            self._neg[key] = (sub_out[len(pm_keys) + j], neg_xs[j])
        if add_out:
            neg_yp = fp.sub_many([(zero, yp) for yp in add_out])
            for yp, nyp in zip(add_out, neg_yp):
                self._neg[id(yp)] = (nyp, yp)


def jnp_broadcast_batch(tensors):
    import jax.numpy as jnp

    return jnp.broadcast_shapes(*[t.shape[1:] for t in tensors])


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
    cb.prefill([(a, b, False) for a, b in pairs])
    groups = []
    for a, b in pairs:
        c0g, c1g = _fp2_term_groups([(a, b, False)], cb)
        groups += [c0g, c1g]
    flat = fp.sop_fold(groups)
    return [(flat[2 * i], flat[2 * i + 1]) for i in range(len(pairs))]


def fp2_mul_fp(a, s):
    return (fp.mul(a[0], s), fp.mul(a[1], s))


def fp2_add_many(pairs):
    """K independent Fp2 additions in one fused carry network."""
    flat = fp.add_many(
        [(a[0], b[0]) for a, b in pairs] + [(a[1], b[1]) for a, b in pairs]
    )
    k = len(pairs)
    return [(flat[i], flat[k + i]) for i in range(k)]


def fp2_sub_many(pairs):
    """K independent Fp2 subtractions in one fused borrow network."""
    flat = fp.sub_many(
        [(a[0], b[0]) for a, b in pairs] + [(a[1], b[1]) for a, b in pairs]
    )
    k = len(pairs)
    return [(flat[i], flat[k + i]) for i in range(k)]


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


def _fp6_mul_terms(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    return [
        (a0, b0, False), (a1, b2, True), (a2, b1, True),
        (a0, b1, False), (a1, b0, False), (a2, b2, True),
        (a0, b2, False), (a1, b1, False), (a2, b0, False),
    ]


def _fp6_mul_groups(a, b, cb: _Combos):
    """The six Fp-level sop groups of an Fp6 product (fp6.rs:195-274 analog):
      c0 = a0 b0 + xi (a1 b2 + a2 b1)
      c1 = a0 b1 + a1 b0 + xi (a2 b2)
      c2 = a0 b2 + a1 b1 + a2 b0
    Each output Fp component is one fused 6-term group.
    """
    t = _fp6_mul_terms(a, b)
    g = []
    g += _fp2_term_groups(t[0:3], cb)
    g += _fp2_term_groups(t[3:6], cb)
    g += _fp2_term_groups(t[6:9], cb)
    return g  # 6 groups: [c0c0, c0c1, c1c0, c1c1, c2c0, c2c1]


def _fp6_from_flat(flat):
    return ((flat[0], flat[1]), (flat[2], flat[3]), (flat[4], flat[5]))


def fp6_mul(a, b):
    """Full interleaved product: ONE fused fold of 6 six-term groups."""
    cb = _Combos()
    cb.prefill(_fp6_mul_terms(a, b))
    flat = fp.sop_fold(_fp6_mul_groups(a, b, cb))
    return _fp6_from_flat(flat)


def fp6_mul_many(pairs):
    """Independent Fp6 products folded into one reduction; returns a list."""
    cb = _Combos()
    cb.prefill([t for a, b in pairs for t in _fp6_mul_terms(a, b)])
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
    36-term full product.  All glue adds/subs batched into phased networks.
    """
    c0, c1, c2 = a
    d01 = fp.sub_many([(c0[0], c1[0]), (c0[1], c1[1])])
    tq = fp.add_many([(d01[0], c2[0]), (d01[1], c2[1])])
    t = (tq[0], tq[1])
    # complex-squaring combos (x0+x1, x0-x1) for c0, t, c2 + product negs
    zero = fp.zero(c0[0].shape[1:])
    p3 = fp.add_many([(x[0], x[1]) for x in (c0, t, c2)])
    p4 = fp.sub_many(
        [(x[0], x[1]) for x in (c0, t, c2)]
        + [(zero, c1[1]), (zero, c2[1])]
    )
    n_c1_1, n_c2_1 = p4[3], p4[4]
    groups = [
        [(p3[0], p4[0])], [(c0[0], c0[1])],            # s0 = c0^2
        [(c0[0], c1[0]), (c0[1], n_c1_1)],             # ab c0
        [(c0[0], c1[1]), (c0[1], c1[0])],              # ab c1
        [(p3[1], p4[1])], [(t[0], t[1])],              # s2 = t^2
        [(c1[0], c2[0]), (c1[1], n_c2_1)],             # bc c0
        [(c1[0], c2[1]), (c1[1], c2[0])],              # bc c1
        [(p3[2], p4[2])], [(c2[0], c2[1])],            # s4 = c2^2
    ]
    f = fp.sop_fold(groups)
    # doubles: s0.c1 = 2 f1, s1 = 2 ab, s2.c1 = 2 f5, s3 = 2 bc, s4.c1 = 2 f9
    d = fp.add_many(
        [(f[1], f[1]), (f[2], f[2]), (f[3], f[3]), (f[5], f[5]),
         (f[6], f[6]), (f[7], f[7]), (f[9], f[9])]
    )
    s0 = (f[0], d[0])
    s1 = (d[1], d[2])
    s2 = (f[4], d[3])
    s3 = (d[4], d[5])
    s4 = (f[8], d[6])
    # out0 = xi(s3)+s0 ; out1 = xi(s4)+s1 ; out2 = s1+s2+s3-s0-s4
    p6a = fp.add_many(
        [(s3[0], s3[1]), (s4[0], s4[1]),
         (s1[0], s2[0]), (s1[1], s2[1]),
         (s0[0], s4[0]), (s0[1], s4[1])]
    )
    p6s = fp.sub_many([(s3[0], s3[1]), (s4[0], s4[1])])
    p7 = fp.add_many(
        [(p6s[0], s0[0]), (p6a[0], s0[1]),
         (p6s[1], s1[0]), (p6a[1], s1[1]),
         (p6a[2], s3[0]), (p6a[3], s3[1])]
    )
    p8 = fp.sub_many([(p7[4], p6a[4]), (p7[5], p6a[5])])
    return (
        (p7[0], p7[1]),
        (p7[2], p7[3]),
        (p8[0], p8[1]),
    )


def fp6_mul_by_nonresidue(a):
    """Multiply by v: (xi*c2, c0, c1) (fp6.rs:139-150)."""
    return (fp2_mul_by_nonresidue(a[2]), a[0], a[1])


def fp6_mul_by_0(a, g0):
    """a * (g0 + 0 v + 0 v^2): three Fp2 muls."""
    return (fp2_mul(a[0], g0), fp2_mul(a[1], g0), fp2_mul(a[2], g0))


def _fp6_mul_by_12_terms(a, g1, g2):
    return [
        (a[2], g1, True), (a[1], g2, True),
        (a[0], g1, False), (a[2], g2, True),
        (a[1], g1, False), (a[0], g2, False),
    ]


def _fp6_mul_by_12_groups(a, g1, g2, cb: _Combos):
    """Groups for a * (g1 v + g2 v^2):
      c0 = xi (a2 g1 + a1 g2)
      c1 = a0 g1 + xi (a2 g2)
      c2 = a1 g1 + a0 g2
    """
    t = _fp6_mul_by_12_terms(a, g1, g2)
    g = []
    g += _fp2_term_groups(t[0:2], cb)
    g += _fp2_term_groups(t[2:4], cb)
    g += _fp2_term_groups(t[4:6], cb)
    return g


def fp6_mul_by_12(a, g1, g2):
    cb = _Combos()
    cb.prefill(_fp6_mul_by_12_terms(a, g1, g2))
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


def _fp6_halves(x6):
    return [c for fp2c in x6 for c in fp2c]  # 6 Fp components


def _use_plan_kernels() -> bool:
    from ..kernels import plan_exec

    return plan_exec.enabled()


def _unflatten12(o):
    return (
        ((o[0], o[1]), (o[2], o[3]), (o[4], o[5])),
        ((o[6], o[7]), (o[8], o[9]), (o[10], o[11])),
    )


def _run_fp12_plan(plan, comps):
    from ..kernels import plan_exec

    return _unflatten12(plan_exec.run_plan(plan, comps))


def fp12_mul(a, b):
    """Karatsuba over Fp6 — three independent Fp6 products in ONE fold
    (fp12.rs:197-213); all glue adds/subs batched into 4 carry networks.

    On TPU (config.plan_kernels) the whole operation — products AND glue —
    runs as ONE expression-plan Pallas kernel (kernels/plan_exec.py)."""
    if _use_plan_kernels():
        from ..kernels import plan_exec

        return _run_fp12_plan(
            plan_exec.fp12_mul_plan(),
            _fp6_halves(a[0]) + _fp6_halves(a[1])
            + _fp6_halves(b[0]) + _fp6_halves(b[1]),
        )
    sums = fp2_add_many(
        [(a[0][i], a[1][i]) for i in range(3)]
        + [(b[0][i], b[1][i]) for i in range(3)]
    )
    sa = tuple(sums[0:3])
    sb = tuple(sums[3:6])
    t0, t1, t2 = fp6_mul_many([(a[0], b[0]), (a[1], b[1]), (sa, sb)])
    # c1 = t2 - t0 - t1 (two chained borrow networks)
    # c0 = t0 + xi*t1 with xi*t1 = (fp2_nonres(t1[2]), t1[0], t1[1])
    d = fp.sub_many(
        [(x, y) for x, y in zip(_fp6_halves(t2), _fp6_halves(t0))]
        + [(t1[2][0], t1[2][1])]
    )
    xi_t1_c0_r = fp.add_many([(t1[2][0], t1[2][1])])[0]
    xi_t1 = ((d[6], xi_t1_c0_r), t1[0], t1[1])
    c1_flat = fp.sub_many(
        [(x, y) for x, y in zip(d[0:6], _fp6_halves(t1))]
    )
    c0_flat = fp.add_many(
        [(x, y) for x, y in zip(_fp6_halves(t0), _fp6_halves(xi_t1))]
    )
    c0 = ((c0_flat[0], c0_flat[1]), (c0_flat[2], c0_flat[3]),
          (c0_flat[4], c0_flat[5]))
    c1 = ((c1_flat[0], c1_flat[1]), (c1_flat[2], c1_flat[3]),
          (c1_flat[4], c1_flat[5]))
    return (c0, c1)


def fp12_sqr(a):
    """(c0 + c1 w)^2 with 2 folded Fp6 muls (fp12.rs:174-185); glue
    batched.  One fused plan kernel on TPU (config.plan_kernels)."""
    if _use_plan_kernels():
        from ..kernels import plan_exec

        return _run_fp12_plan(
            plan_exec.fp12_sqr_plan(),
            _fp6_halves(a[0]) + _fp6_halves(a[1]),
        )
    # pre: s = a0 + a1; u = a0 + xi*a1 (xi*a1 = (nonres(a1[2]), a1[0], a1[1]))
    nr = fp.sub_many([(a[1][2][0], a[1][2][1])])[0]
    nr_i = fp.add_many([(a[1][2][0], a[1][2][1])])[0]
    xi_a1 = ((nr, nr_i), a[1][0], a[1][1])
    pre = fp.add_many(
        [(x, y) for x, y in zip(_fp6_halves(a[0]), _fp6_halves(a[1]))]
        + [(x, y) for x, y in zip(_fp6_halves(a[0]), _fp6_halves(xi_a1))]
    )
    s = ((pre[0], pre[1]), (pre[2], pre[3]), (pre[4], pre[5]))
    u = ((pre[6], pre[7]), (pre[8], pre[9]), (pre[10], pre[11]))
    ab, t = fp6_mul_many([(a[0], a[1]), (s, u)])
    # c0 = t - ab - xi*ab ; c1 = 2 ab
    nrab = fp.sub_many(
        [(x, y) for x, y in zip(_fp6_halves(t), _fp6_halves(ab))]
        + [(ab[2][0], ab[2][1])]
    )
    nrab_i = fp.add_many(
        [(ab[2][0], ab[2][1])]
        + [(x, x) for x in _fp6_halves(ab)]
    )
    xi_ab = ((nrab[6], nrab_i[0]), ab[0], ab[1])
    c0_flat = fp.sub_many(
        [(x, y) for x, y in zip(nrab[0:6], _fp6_halves(xi_ab))]
    )
    c0 = ((c0_flat[0], c0_flat[1]), (c0_flat[2], c0_flat[3]),
          (c0_flat[4], c0_flat[5]))
    c1 = ((nrab_i[1], nrab_i[2]), (nrab_i[3], nrab_i[4]),
          (nrab_i[5], nrab_i[6]))
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
    if _use_plan_kernels():
        from ..kernels import plan_exec

        return _run_fp12_plan(
            plan_exec.fp12_cyclotomic_sqr_plan(),
            _fp6_halves(f[0]) + _fp6_halves(f[1]),
        )
    return _fp12_cyclotomic_sqr_jnp(f)


def fp12_cyclotomic_sqr_k(f, k: int):
    """k consecutive cyclotomic squarings — ONE fused plan kernel on TPU
    (kernels/plan_exec.fp12_cyclotomic_sqr_k_plan); sequential squarings
    otherwise.  Same cyclotomic-subgroup precondition as
    fp12_cyclotomic_sqr."""
    if k > 1 and _use_plan_kernels():
        from ..kernels import plan_exec

        return _run_fp12_plan(
            plan_exec.fp12_cyclotomic_sqr_k_plan(k),
            _fp6_halves(f[0]) + _fp6_halves(f[1]),
        )
    for _ in range(k):
        f = fp12_cyclotomic_sqr(f)
    return f


def _fp12_cyclotomic_sqr_jnp(f):
    (a0, a1, a2), (b0, b1, b2) = f

    # all nine fp2 squarings in one fold: for each fp4 pair (x, y):
    # x^2, y^2, (x+y)^2 — via COMPLEX squaring groups (T = 1: ((v0+v1)(v0-v1),
    # 2 v0 v1)), with all glue adds/subs batched into phased carry networks
    # (they dominate at small batch sizes).
    sums = fp2_add_many([(a0, b1), (b0, a2), (a1, b2)])
    vals = [a0, b1, sums[0], b0, a2, sums[1], a1, b2, sums[2]]
    vs = fp.add_many([(v[0], v[1]) for v in vals])
    vd = fp.sub_many([(v[0], v[1]) for v in vals])
    f9 = fp.sop_fold(
        [g for k in range(9) for g in ([(vs[k], vd[k])],
                                       [(vals[k][0], vals[k][1])])]
    )
    dbl = fp.add_many([(f9[2 * k + 1], f9[2 * k + 1]) for k in range(9)])
    sq = [(f9[2 * k], dbl[k]) for k in range(9)]
    x2s = [sq[0], sq[3], sq[6]]
    y2s = [sq[1], sq[4], sq[7]]
    s2s = [sq[2], sq[5], sq[8]]
    # P2 (subs): xi(y2) real part per block; c1 part1 = s2 - x2
    p2 = fp.sub_many(
        [(y2[0], y2[1]) for y2 in y2s]
        + [(s2[i], x2[i]) for s2, x2 in zip(s2s, x2s) for i in range(2)]
    )
    xiy_r = p2[0:3]
    part1 = [(p2[3], p2[4]), (p2[5], p2[6]), (p2[7], p2[8])]
    # P3 (adds): xi(y2) imag part
    xiy_i = fp.add_many([(y2[0], y2[1]) for y2 in y2s])
    # P4: c0 = xi(y2) + x2 (adds); c1 = part1 - y2 (subs)
    p4a = fp.add_many(
        [(xiy_r[k], x2s[k][0]) for k in range(3)]
        + [(xiy_i[k], x2s[k][1]) for k in range(3)]
    )
    p4s = fp.sub_many(
        [(part1[k][i], y2s[k][i]) for k in range(3) for i in range(2)]
    )
    t0_ = [(p4a[k], p4a[3 + k]) for k in range(3)]   # c0 per block
    t1_ = [(p4s[2 * k], p4s[2 * k + 1]) for k in range(3)]  # c1 per block
    t00, t10, t20 = t0_
    t01, t11, t21 = t1_
    # P5: u-subs for the 3t-2z outputs + xi(t21) real part
    p5 = fp.sub_many(
        [(t21[0], t21[1])]
        + [(t00[i], a0[i]) for i in range(2)]
        + [(t10[i], a1[i]) for i in range(2)]
        + [(t20[i], a2[i]) for i in range(2)]
    )
    xt21 = (p5[0], fp.add_many([(t21[0], t21[1])])[0])
    u_m = [(p5[1], p5[2]), (p5[3], p5[4]), (p5[5], p5[6])]  # t00-a0 etc.
    # P6: u-adds for the 3t+2z outputs
    p6 = fp.add_many(
        [(t01[i], b1[i]) for i in range(2)]
        + [(t11[i], b2[i]) for i in range(2)]
        + [(xt21[i], b0[i]) for i in range(2)]
    )
    u_p = [(p6[0], p6[1]), (p6[2], p6[3]), (p6[4], p6[5])]
    # P7: double all six u's; P8: add back t
    us = u_m + u_p
    ts = [t00, t10, t20, t01, t11, xt21]
    p7 = fp.add_many([(u[i], u[i]) for u in us for i in range(2)])
    p8 = fp.add_many(
        [(p7[2 * k + i], ts[k][i]) for k in range(6) for i in range(2)]
    )
    na0 = (p8[0], p8[1])
    na1 = (p8[2], p8[3])
    na2 = (p8[4], p8[5])
    nb1 = (p8[6], p8[7])
    nb2 = (p8[8], p8[9])
    nb0 = (p8[10], p8[11])
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

    One fused plan kernel on TPU (config.plan_kernels).
    """
    if _use_plan_kernels():
        from ..kernels import plan_exec

        return _run_fp12_plan(
            plan_exec.fp12_mul_by_045_plan(),
            _fp6_halves(f[0]) + _fp6_halves(f[1])
            + [g0[0], g0[1], g4[0], g4[1], g5[0], g5[1]],
        )
    return _fp12_mul_by_045_jnp(f, g0, g4, g5)


def fp12_sqr_mul_by_045(f, g0, g4, g5):
    """f^2 * (g0 + g4 (v w) + g5 (v^2 w)) — the Miller doubling-step
    update, ONE fused plan kernel on TPU (squaring and sparse multiply
    share a single launch; pairings.rs:620-634 + ell)."""
    if _use_plan_kernels():
        from ..kernels import plan_exec

        return _run_fp12_plan(
            plan_exec.fp12_sqr_mul_by_045_plan(),
            _fp6_halves(f[0]) + _fp6_halves(f[1])
            + [g0[0], g0[1], g4[0], g4[1], g5[0], g5[1]],
        )
    return _fp12_mul_by_045_jnp(fp12_sqr(f), g0, g4, g5)


def _fp12_mul_by_045_jnp(f, g0, g4, g5):
    cb = _Combos()
    terms = [(comp, g0, False) for part in (f[0], f[1]) for comp in part]
    terms += _fp6_mul_by_12_terms(f[1], g4, g5)
    terms += _fp6_mul_by_12_terms(f[0], g4, g5)
    cb.prefill(terms)
    groups = []
    for part in (f[0], f[1]):  # part * g0: three fp2 muls each
        for comp in part:
            groups += _fp2_term_groups([(comp, g0, False)], cb)
    groups += _fp6_mul_by_12_groups(f[1], g4, g5, cb)
    groups += _fp6_mul_by_12_groups(f[0], g4, g5, cb)
    flat = fp.sop_fold(groups)
    a = flat[0:6]      # f0 g0 (halves)
    a2 = flat[6:12]    # f1 g0
    b = _fp6_from_flat(flat[12:18])   # f1 B
    b2 = flat[18:24]   # f0 B
    # c0 = a + xi*b ; c1 = a2 + b2 — batched glue (one sub + one add net)
    xib_c0 = fp.sub_many([(b[2][0], b[2][1])])[0]
    xib = [xib_c0, None, b[0][0], b[0][1], b[1][0], b[1][1]]
    out = fp.add_many(
        [(b[2][0], b[2][1])]                      # xi*b c0.c1
        + [(a[i], x) for i, x in enumerate(xib) if x is not None]
        + [(x, y) for x, y in zip(a2, b2)]
    )
    c0c01 = fp.add_many([(a[1], out[0])])[0]
    c0 = ((out[1], c0c01), (out[2], out[3]), (out[4], out[5]))
    c1 = ((out[6], out[7]), (out[8], out[9]), (out[10], out[11]))
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
