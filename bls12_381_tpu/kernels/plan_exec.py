"""Expression-plan Pallas kernels: whole tower operations in ONE launch.

Round-2 profiling showed small-batch pairing is LAUNCH-bound: an Fp12
cyclotomic squaring was ~11 kernel/glue launches, each paying dispatch plus
an HBM round-trip for every [L, B] intermediate.  This module executes an
entire tower operation (fp12 mul / sqr / cyclotomic sqr, ...) as a single
Pallas kernel: a static expression DAG over Fp nodes is evaluated in
registers/VMEM — modular adds/subs ("glue") become in-register ripple-carry
networks, products become lazy radix-2^12 column accumulations with one
Montgomery reduction per sum-of-products group (same numeric pipeline as
pallas_mont, so results are bit-identical to the jnp path).

No reference counterpart: the reference computes one element at a time on a
CPU (fp12.rs / fp6.rs / fp2.rs); this is the TPU-first fusion of the same
algebra.

DAG node ops:
    in(k)      operand row k of the stacked input [K, L, B]
    add/sub    canonical modular add/sub (16-bit ripple + cond-subtract p)
    neg        p - x (via sub from zero)
    sop(terms) Montgomery-reduced sum of products over node pairs (T <= 6
               per group by the radix-12 column bound; builders auto-chunk)

Plans are built symbolically by the fp2/fp6/fp12 helpers below, hashed by
value (hash-consing via an intern table), and compiled once per
(plan, shapes) by jax.jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mont import (_r12_params, _repack_16_to_12,
                          _r12_reduce_and_pack)

M16 = np.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# Symbolic DAG
# ---------------------------------------------------------------------------


class Node:
    """Interned DAG node: structural equality == identity.

    A frozen dataclass would recompute its hash RECURSIVELY on every dict
    lookup — for the deep chained plans (cyclo_k) that made plan
    construction and kernel tracing quadratic-plus (measured: building
    cyclo_k(8) alone exceeded 100 s).  Interning through _mk makes every
    structurally-equal node the SAME object, so the default identity
    hash/eq are O(1) and correct."""

    __slots__ = ("op", "args")

    def __init__(self, op: str, args: tuple):
        self.op = op      # "in" | "add" | "sub" | "neg" | "sop"
        self.args = args  # in: (k,); add/sub: (Node, Node); neg: (Node,);
        #                 # sop: ((Node, Node), ...)

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"Node({self.op}, {self.args!r})"


_INTERN: dict = {}


def _mk(op: str, args: tuple) -> Node:
    # args contain only ints or already-interned Nodes, so the tuple key
    # hashes/compares by identity in O(len(args))
    key = (op, args)
    n = _INTERN.get(key)
    if n is None:
        n = _INTERN[key] = Node(op, args)
    return n


def inp(k: int) -> Node:
    return _mk("in", (k,))


def add(a: Node, b: Node) -> Node:
    return _mk("add", (a, b))


def sub(a: Node, b: Node) -> Node:
    return _mk("sub", (a, b))


def neg(a: Node) -> Node:
    return _mk("neg", (a,))


def sop(terms) -> Node:
    """Sum of products with automatic chunking to the T <= 6 kernel bound."""
    terms = tuple(terms)
    if len(terms) <= 6:
        return _mk("sop", terms)
    parts = [sop(terms[i: i + 6]) for i in range(0, len(terms), 6)]
    acc = parts[0]
    for p in parts[1:]:
        acc = add(acc, p)
    return acc


# --- symbolic Fp2 (pairs of nodes), Fp6 (triples of pairs) -----------------


def f2_add(a, b):
    return (add(a[0], b[0]), add(a[1], b[1]))


def f2_sub(a, b):
    return (sub(a[0], b[0]), sub(a[1], b[1]))


def f2_mul_by_xi(a):
    """(1+u) * a  =  (a0 - a1) + (a0 + a1) u."""
    return (sub(a[0], a[1]), add(a[0], a[1]))


def f2_sop(terms):
    """sum_i [xi *]? (x_i * y_i) over symbolic Fp2 (mirrors
    tower._fp2_term_groups' expansion into Fp product groups):
      plain: c0 += x0 y0 - x1 y1            c1 += x0 y1 + x1 y0
      xi:    c0 += x0 (y0-y1) - x1 (y0+y1)  c1 += x0 (y0+y1) + x1 (y0-y1)
    """
    c0g, c1g = [], []
    for x, y, use_xi in terms:
        if not use_xi:
            c0g += [(x[0], y[0]), (neg(x[1]), y[1])]
            c1g += [(x[0], y[1]), (x[1], y[0])]
        else:
            ym, yp = sub(y[0], y[1]), add(y[0], y[1])
            c0g += [(x[0], ym), (neg(x[1]), yp)]
            c1g += [(x[0], yp), (x[1], ym)]
    return (sop(c0g), sop(c1g))


def f2_sqr(a):
    """Complex squaring: ((a0+a1)(a0-a1), 2 a0 a1)."""
    return (
        sop([(add(a[0], a[1]), sub(a[0], a[1]))]),
        sop([(add(a[0], a[0]), a[1])]),
    )


def f2_mul(a, b):
    return (
        sop([(a[0], b[0]), (neg(a[1]), b[1])]),
        sop([(a[0], b[1]), (a[1], b[0])]),
    )


def f2_neg(a):
    return (neg(a[0]), neg(a[1]))


def f2_dbl(a):
    return f2_add(a, a)


def f2_mul_b3(a):
    """3 * b_G2 * a = 12 (1+u) a (tower._mul_b3 algebra, adds only)."""
    t = f2_mul_by_xi(a)
    d2 = f2_add(t, t)
    d4 = f2_add(d2, d2)
    d8 = f2_add(d4, d4)
    return f2_add(d8, d4)


def f6_add(x, y):
    return tuple(f2_add(a, b) for a, b in zip(x, y))


def f6_sub(x, y):
    return tuple(f2_sub(a, b) for a, b in zip(x, y))


def f6_mul(x, y):
    """Schoolbook over v (v^3 = xi), each coord one fused 6-term Fp2 sop:
      c0 = x0 y0 + xi(x1 y2 + x2 y1)
      c1 = x0 y1 + x1 y0 + xi(x2 y2)
      c2 = x0 y2 + x1 y1 + x2 y0
    """
    return (
        f2_sop([(x[0], y[0], False), (x[1], y[2], True), (x[2], y[1], True)]),
        f2_sop([(x[0], y[1], False), (x[1], y[0], False), (x[2], y[2], True)]),
        f2_sop([(x[0], y[2], False), (x[1], y[1], False), (x[2], y[0], False)]),
    )


def f6_mul_by_v(x):
    """v * (c0 + c1 v + c2 v^2) = xi c2 + c0 v + c1 v^2."""
    return (f2_mul_by_xi(x[2]), x[0], x[1])


def _f6_in(base: int):
    return tuple(
        (inp(base + 2 * i), inp(base + 2 * i + 1)) for i in range(3)
    )


def _flatten12(c0, c1):
    return tuple(n for f2 in (c0 + c1) for n in f2)


# ---------------------------------------------------------------------------
# Plans for the hot Fp12 operations (operand layout: 12 Fp rows per element,
# [c0.c0.re, c0.c0.im, c0.c1.re, ..., c1.c2.im])
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def fp12_mul_plan():
    """Karatsuba over w (fp12.rs:197-213 algebra): 24 input rows -> 12."""
    a0, a1 = _f6_in(0), _f6_in(6)
    b0, b1 = _f6_in(12), _f6_in(18)
    t0 = f6_mul(a0, b0)
    t1 = f6_mul(a1, b1)
    t2 = f6_mul(f6_add(a0, a1), f6_add(b0, b1))
    c1 = f6_sub(f6_sub(t2, t0), t1)
    c0 = f6_add(t0, f6_mul_by_v(t1))
    return _flatten12(c0, c1)


def _f12_sqr_sym(a0, a1):
    """(c0 + c1 w)^2 symbolically (fp12.rs:174-185 algebra)."""
    ab = f6_mul(a0, a1)
    t = f6_mul(f6_add(a0, a1), f6_add(a0, f6_mul_by_v(a1)))
    c0 = f6_sub(t, f6_add(ab, f6_mul_by_v(ab)))
    c1 = f6_add(ab, ab)
    return c0, c1


@functools.lru_cache(maxsize=None)
def fp12_sqr_plan():
    """(c0 + c1 w)^2: 12 input rows -> 12."""
    return _flatten12(*_f12_sqr_sym(_f6_in(0), _f6_in(6)))


def _f12_mul_by_045_sym(f0, f1, g0, g4, g5):
    """f * (g0 + g4 (v w) + g5 (v^2 w)) symbolically — the D-twist sparse
    line multiply (tower.fp12_mul_by_045 algebra; counterpart of
    fp12.rs:116-128 under its twist convention)."""

    def mul_g0(x):
        return tuple(f2_sop([(c, g0, False)]) for c in x)

    def mul_B(x):
        """x * (g4 v + g5 v^2) over Fp6 (y0 = 0 specialization of f6_mul)."""
        return (
            f2_sop([(x[1], g5, True), (x[2], g4, True)]),
            f2_sop([(x[0], g4, False), (x[2], g5, True)]),
            f2_sop([(x[0], g5, False), (x[1], g4, False)]),
        )

    c0 = f6_add(mul_g0(f0), f6_mul_by_v(mul_B(f1)))
    c1 = f6_add(mul_g0(f1), mul_B(f0))
    return c0, c1


@functools.lru_cache(maxsize=None)
def fp12_mul_by_045_plan():
    """Sparse line multiply: 12 f rows + 6 line rows (g0, g4, g5) -> 12."""
    g0, g4, g5 = (inp(12), inp(13)), (inp(14), inp(15)), (inp(16), inp(17))
    return _flatten12(
        *_f12_mul_by_045_sym(_f6_in(0), _f6_in(6), g0, g4, g5)
    )


@functools.lru_cache(maxsize=None)
def fp12_sqr_mul_by_045_plan():
    """The fused Miller doubling-step update f^2 * line: 12 f rows + 6
    line rows -> 12.  One launch instead of sqr + mul_by_045
    (pairings.rs:620-634 doubling_step + ell under the D-twist)."""
    g0, g4, g5 = (inp(12), inp(13)), (inp(14), inp(15)), (inp(16), inp(17))
    s0, s1 = _f12_sqr_sym(_f6_in(0), _f6_in(6))
    return _flatten12(*_f12_mul_by_045_sym(s0, s1, g0, g4, g5))


def _f12_cyclo_sqr_sym(blocks):
    """One Granger-Scott cyclotomic squaring (ePrint 2009/565) over six
    symbolic Fp2 blocks (a0, a1, a2, b0, b1, b2) — tower
    fp12_cyclotomic_sqr's block mapping."""
    a0, a1, a2, b0, b1, b2 = blocks

    def fp4_sqr(x, y):
        """t0 = x^2 + xi y^2, t1 = (x+y)^2 - x^2 - y^2."""
        x2, y2 = f2_sqr(x), f2_sqr(y)
        s2 = f2_sqr(f2_add(x, y))
        t0 = f2_add(f2_mul_by_xi(y2), x2)
        t1 = f2_sub(f2_sub(s2, x2), y2)
        return t0, t1

    t00, t01 = fp4_sqr(a0, b1)
    t10, t11 = fp4_sqr(b0, a2)
    t20, t21 = fp4_sqr(a1, b2)
    xt21 = f2_mul_by_xi(t21)

    def out3m2(t, z):
        """3t - 2z = 2(t - z) + t."""
        u = f2_sub(t, z)
        return f2_add(f2_add(u, u), t)

    def out3p2(t, z):
        """3t + 2z = 2(t + z) + t."""
        u = f2_add(t, z)
        return f2_add(f2_add(u, u), t)

    return (
        out3m2(t00, a0),
        out3m2(t10, a1),
        out3m2(t20, a2),
        out3p2(xt21, b0),
        out3p2(t01, b1),
        out3p2(t11, b2),
    )


@functools.lru_cache(maxsize=None)
def fp12_cyclotomic_sqr_plan():
    """Granger-Scott cyclotomic squaring: 12 input rows -> 12."""
    return fp12_cyclotomic_sqr_k_plan(1)


@functools.lru_cache(maxsize=None)
def fp12_cyclotomic_sqr_k_plan(k: int):
    """k CHAINED cyclotomic squarings in one kernel — the final-exp
    pow-by-|z| chains are ~63 consecutive squarings per exponentiation
    (315 per pairing), so fusing k of them cuts that launch count k-fold.
    12 input rows -> 12."""
    blocks = tuple((inp(2 * i), inp(2 * i + 1)) for i in range(6))
    for _ in range(k):
        blocks = _f12_cyclo_sqr_sym(blocks)
    return tuple(n for f2 in blocks for n in f2)


def eval_plan_host(outputs, values, p: int, r: int):
    """Pure-Python oracle for a plan: evaluate the DAG over integers in the
    Montgomery domain (sop multiplies carry the R^-1 factor, exactly like
    the kernel's reduction).  Used by tests to pin plan ALGEBRA without
    paying an XLA compile (the kernel's limb arithmetic is pinned separately
    by tiny interpret-mode cases)."""
    rinv = pow(r, -1, p)
    cache = {}

    def ev(n):
        if n in cache:
            return cache[n]
        if n.op == "in":
            v = values[n.args[0]] % p
        elif n.op == "add":
            v = (ev(n.args[0]) + ev(n.args[1])) % p
        elif n.op == "sub":
            v = (ev(n.args[0]) - ev(n.args[1])) % p
        elif n.op == "neg":
            v = (-ev(n.args[0])) % p
        elif n.op == "sop":
            v = sum(ev(a) * ev(b) for a, b in n.args) * rinv % p
        else:  # pragma: no cover
            raise ValueError(n.op)
        cache[n] = v
        return v

    return [ev(o) for o in outputs]


def _flatten_f2s(f2s):
    return tuple(n for f2 in f2s for n in f2)


@functools.lru_cache(maxsize=None)
def g2_dbl_step_plan():
    """prepare_g2 doubling step fused: tangent-line coefficients
    (pairing._dbl_line algebra: a = xi 2YZ^2, b = 3X^3 - 2Y^2 Z,
    c = -3X^2 Z) AND the RCB Algorithm-9 point doubling, sharing the
    Y^2 / YZ products.  Inputs X, Y, Z (6 rows) -> a, b, c, X3, Y3, Z3."""
    X, Y, Z = (inp(0), inp(1)), (inp(2), inp(3)), (inp(4), inp(5))
    xx, yy, zz = f2_sqr(X), f2_sqr(Y), f2_sqr(Z)
    yz, xy = f2_mul(Y, Z), f2_mul(X, Y)
    xxx, yyz = f2_mul(xx, X), f2_mul(yy, Z)
    yzz, xxz = f2_mul(yz, Z), f2_mul(xx, Z)
    la = f2_mul_by_xi(f2_dbl(yzz))
    lb = f2_sub(f2_add(f2_dbl(xxx), xxx), f2_dbl(yyz))
    lc = f2_neg(f2_add(f2_dbl(xxz), xxz))
    # RCB Alg 9 (a = 0): t0 = Y^2, t1 = YZ shared with the line
    t0, t1 = yy, yz
    t2 = f2_mul_b3(zz)
    z3t = f2_dbl(f2_dbl(f2_dbl(t0)))          # 8 Y^2
    y3s = f2_add(t0, t2)
    t0d = f2_sub(t0, f2_add(f2_dbl(t2), t2))  # t0 - 3 t2
    x3 = f2_dbl(f2_mul(t0d, xy))
    y3 = f2_add(f2_mul(t2, z3t), f2_mul(t0d, y3s))
    z3 = f2_mul(t1, z3t)
    return _flatten_f2s((la, lb, lc, x3, y3, z3))


@functools.lru_cache(maxsize=None)
def g2_add_step_plan():
    """prepare_g2 addition step fused: chord-line coefficients
    (pairing._add_line algebra: D = X - xq Z, N = Y - yq Z; a = xi D,
    b = N xq - yq D, c = -N) AND RCB Algorithm-8 mixed addition, sharing
    the xq Z / yq Z products.  Inputs X, Y, Z, xq, yq (10 rows) ->
    a, b, c, X3, Y3, Z3."""
    X, Y, Z = (inp(0), inp(1)), (inp(2), inp(3)), (inp(4), inp(5))
    xq, yq = (inp(6), inp(7)), (inp(8), inp(9))
    xqz, yqz = f2_mul(xq, Z), f2_mul(yq, Z)
    d = f2_sub(X, xqz)
    n = f2_sub(Y, yqz)
    la = f2_mul_by_xi(d)
    lb = f2_sub(f2_mul(n, xq), f2_mul(yq, d))
    lc = f2_neg(n)
    # RCB Alg 8 (a = 0, z2 = 1)
    t0, t1 = f2_mul(X, xq), f2_mul(Y, yq)
    t3 = f2_sub(f2_mul(f2_add(xq, yq), f2_add(X, Y)), f2_add(t0, t1))
    t4 = f2_add(yqz, Y)
    y3m = f2_add(xqz, X)
    t0_3 = f2_add(f2_dbl(t0), t0)
    t2 = f2_mul_b3(Z)
    z3s = f2_add(t1, t2)
    t1d = f2_sub(t1, t2)
    y3b = f2_mul_b3(y3m)
    pa = f2_mul(t4, y3b)
    pb = f2_mul(t3, t1d)
    pc = f2_mul(y3b, t0_3)
    pd = f2_mul(t1d, z3s)
    pe = f2_mul(t0_3, t3)
    pg = f2_mul(z3s, t4)
    x3 = f2_sub(pb, pa)
    y3 = f2_add(pd, pc)
    z3 = f2_add(pg, pe)
    return _flatten_f2s((la, lb, lc, x3, y3, z3))


# ---------------------------------------------------------------------------
# Whole-group-law plans: RCB 2015/1060 complete formulas (Algorithms 7/8/9,
# a = 0) fused into one kernel each.  These are the inner operations of the
# MSM segmented scan / bucket reduction and the windowed scalar
# multiplications — previously ~15 launches per group add.  Counterpart of
# g1.rs:638/670/715 (same algorithms, fused TPU execution).
# ---------------------------------------------------------------------------


def fp_mul_b3(a: Node) -> Node:
    """12 * a by additions (3*b with b = 4 on G1; g1.rs:596 trick)."""
    d2 = add(a, a)
    d4 = add(d2, d2)
    d8 = add(d4, d4)
    return add(d8, d4)


@functools.lru_cache(maxsize=None)
def g1_add_plan():
    """RCB Algorithm 7 over Fp: rows (X1 Y1 Z1 X2 Y2 Z2) -> (X3 Y3 Z3).
    Stage-2 cross products fuse pairwise into 3 two-term sops."""
    x1, y1, z1, x2, y2, z2 = [inp(i) for i in range(6)]
    t0 = sop([(x1, x2)])
    t1 = sop([(y1, y2)])
    t2 = sop([(z1, z2)])
    m3 = sop([(add(x1, y1), add(x2, y2))])
    m4 = sop([(add(y1, z1), add(y2, z2))])
    m5 = sop([(add(x1, z1), add(x2, z2))])
    t3 = sub(m3, add(t0, t1))
    t4 = sub(m4, add(t1, t2))
    y3 = sub(m5, add(t0, t2))
    t0_3 = add(add(t0, t0), t0)
    t2b = fp_mul_b3(t2)
    z3 = add(t1, t2b)
    t1d = sub(t1, t2b)
    y3b = fp_mul_b3(y3)
    x3 = sop([(t3, t1d), (neg(t4), y3b)])
    y3o = sop([(t1d, z3), (y3b, t0_3)])
    z3o = sop([(z3, t4), (t0_3, t3)])
    return (x3, y3o, z3o)


@functools.lru_cache(maxsize=None)
def g1_double_plan():
    """RCB Algorithm 9 over Fp: rows (X Y Z) -> (X3 Y3 Z3)."""
    x, y, z = inp(0), inp(1), inp(2)
    t0 = sop([(y, y)])
    t1 = sop([(y, z)])
    zz = sop([(z, z)])
    xy = sop([(x, y)])
    t2 = fp_mul_b3(zz)
    z3t = add(add(t0, t0), add(t0, t0))
    z3t = add(z3t, z3t)                        # 8 Y^2
    y3s = add(t0, t2)
    t0d = sub(t0, add(add(t2, t2), t2))        # t0 - 3 t2
    xym = sop([(t0d, xy)])
    x3 = add(xym, xym)
    y3 = sop([(t2, z3t), (t0d, y3s)])
    z3 = sop([(t1, z3t)])
    return (x3, y3, z3)


@functools.lru_cache(maxsize=None)
def g1_add_mixed_plan():
    """RCB Algorithm 8 (Z2 = 1) over Fp: rows (X1 Y1 Z1 X2 Y2) ->
    (X3 Y3 Z3).  The affine-identity select stays outside the kernel."""
    x1, y1, z1, x2, y2 = [inp(i) for i in range(5)]
    t0 = sop([(x1, x2)])
    t1 = sop([(y1, y2)])
    m3 = sop([(add(x2, y2), add(x1, y1))])
    xz = sop([(x2, z1)])
    yz = sop([(y2, z1)])
    t3 = sub(m3, add(t0, t1))
    t4 = add(yz, y1)
    y3m = add(xz, x1)
    t0_3 = add(add(t0, t0), t0)
    t2 = fp_mul_b3(z1)
    z3 = add(t1, t2)
    t1d = sub(t1, t2)
    y3b = fp_mul_b3(y3m)
    x3 = sop([(t3, t1d), (neg(t4), y3b)])
    y3o = sop([(t1d, z3), (y3b, t0_3)])
    z3o = sop([(z3, t4), (t0_3, t3)])
    return (x3, y3o, z3o)


@functools.lru_cache(maxsize=None)
def g2_add_plan():
    """RCB Algorithm 7 over Fp2: rows (X1 Y1 Z1 X2 Y2 Z2 as c0,c1 pairs;
    12 rows) -> 6 rows."""
    x1, y1, z1 = (inp(0), inp(1)), (inp(2), inp(3)), (inp(4), inp(5))
    x2, y2, z2 = (inp(6), inp(7)), (inp(8), inp(9)), (inp(10), inp(11))
    t0 = f2_mul(x1, x2)
    t1 = f2_mul(y1, y2)
    t2 = f2_mul(z1, z2)
    m3 = f2_mul(f2_add(x1, y1), f2_add(x2, y2))
    m4 = f2_mul(f2_add(y1, z1), f2_add(y2, z2))
    m5 = f2_mul(f2_add(x1, z1), f2_add(x2, z2))
    t3 = f2_sub(m3, f2_add(t0, t1))
    t4 = f2_sub(m4, f2_add(t1, t2))
    y3 = f2_sub(m5, f2_add(t0, t2))
    t0_3 = f2_add(f2_dbl(t0), t0)
    t2b = f2_mul_b3(t2)
    z3 = f2_add(t1, t2b)
    t1d = f2_sub(t1, t2b)
    y3b = f2_mul_b3(y3)
    x3 = f2_sop([(t3, t1d, False), (f2_neg(t4), y3b, False)])
    y3o = f2_sop([(t1d, z3, False), (y3b, t0_3, False)])
    z3o = f2_sop([(z3, t4, False), (t0_3, t3, False)])
    return _flatten_f2s((x3, y3o, z3o))


@functools.lru_cache(maxsize=None)
def g2_double_plan():
    """RCB Algorithm 9 over Fp2: 6 rows -> 6 rows."""
    x, y, z = (inp(0), inp(1)), (inp(2), inp(3)), (inp(4), inp(5))
    t0 = f2_sqr(y)
    t1 = f2_mul(y, z)
    zz = f2_sqr(z)
    xy = f2_mul(x, y)
    t2 = f2_mul_b3(zz)
    z3t = f2_dbl(f2_dbl(f2_dbl(t0)))           # 8 Y^2
    y3s = f2_add(t0, t2)
    t0d = f2_sub(t0, f2_add(f2_dbl(t2), t2))   # t0 - 3 t2
    x3 = f2_dbl(f2_mul(t0d, xy))
    y3 = f2_sop([(t2, z3t, False), (t0d, y3s, False)])
    z3 = f2_mul(t1, z3t)
    return _flatten_f2s((x3, y3, z3))


@functools.lru_cache(maxsize=None)
def g2_add_mixed_plan():
    """RCB Algorithm 8 (Z2 = 1) over Fp2: rows (X1 Y1 Z1 X2 Y2; 10 rows)
    -> 6 rows."""
    x1, y1, z1 = (inp(0), inp(1)), (inp(2), inp(3)), (inp(4), inp(5))
    x2, y2 = (inp(6), inp(7)), (inp(8), inp(9))
    t0 = f2_mul(x1, x2)
    t1 = f2_mul(y1, y2)
    m3 = f2_mul(f2_add(x2, y2), f2_add(x1, y1))
    xz = f2_mul(x2, z1)
    yz = f2_mul(y2, z1)
    t3 = f2_sub(m3, f2_add(t0, t1))
    t4 = f2_add(yz, y1)
    y3m = f2_add(xz, x1)
    t0_3 = f2_add(f2_dbl(t0), t0)
    t2 = f2_mul_b3(z1)
    z3 = f2_add(t1, t2)
    t1d = f2_sub(t1, t2)
    y3b = f2_mul_b3(y3m)
    x3 = f2_sop([(t3, t1d, False), (f2_neg(t4), y3b, False)])
    y3o = f2_sop([(t1d, z3, False), (y3b, t0_3, False)])
    z3o = f2_sop([(z3, t4, False), (t0_3, t3, False)])
    return _flatten_f2s((x3, y3o, z3o))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------



# Per-limb scalar-register DAG evaluator: ~2x the runtime throughput of the
# vectorized one on ALU-bound large batches (group-law chains at batch
# 2^12+), at ~10x the trace cost — used for the SMALL plans (group laws:
# <= 9 sops) where a graph holds only a handful of kernel instantiations.
def _mod_add_rows(a, b, p16):
    """Canonical (a + b) mod p over 16-bit limb registers (ripple carry +
    conditional subtract)."""
    L = len(a)
    one = np.uint32(1)
    c = jnp.zeros_like(a[0])
    s = []
    for i in range(L):
        v = a[i] + b[i] + c
        s.append(v & M16)
        c = v >> np.uint32(16)
    # conditional subtract: value = c * 2^384 + s < 2p
    br = jnp.zeros_like(a[0])
    d = []
    for i in range(L):
        v = s[i] + np.uint32(0x10000) - np.uint32(p16[i]) - br
        d.append(v & M16)
        br = one - (v >> np.uint32(16))
    take = (c != 0) | (br == 0)
    return [jnp.where(take, di, si) for di, si in zip(d, s)]


def _mod_sub_rows(a, b, p16):
    """Canonical (a - b) mod p: a + (p - b), then conditional subtract."""
    L = len(a)
    one = np.uint32(1)
    br = jnp.zeros_like(a[0])
    pb = []
    for i in range(L):
        v = np.uint32(p16[i]) + np.uint32(0x10000) - b[i] - br
        pb.append(v & M16)
        br = one - (v >> np.uint32(16))
    return _mod_add_rows(a, pb, p16)


def _plan_kernel_scalar(ops_ref, out_ref, *, outputs, n_limbs, inv12, p12, p16,
                 l12):
    L = n_limbs
    zero_rows = None
    cache16 = {}
    cache12 = {}

    def rows(n):
        r = cache16.get(n)
        if r is not None:
            return r
        if n.op == "in":
            r = [ops_ref[n.args[0], i] for i in range(L)]
        elif n.op == "add":
            r = _mod_add_rows(rows(n.args[0]), rows(n.args[1]), p16)
        elif n.op == "sub":
            r = _mod_sub_rows(rows(n.args[0]), rows(n.args[1]), p16)
        elif n.op == "neg":
            nonlocal zero_rows
            if zero_rows is None:
                zero_rows = [jnp.zeros_like(ops_ref[0, 0])] * L
            r = _mod_sub_rows(zero_rows, rows(n.args[0]), p16)
        elif n.op == "sop":
            acc = [jnp.zeros_like(ops_ref[0, 0])] * (2 * l12 - 1)
            for (na, nb) in n.args:
                a12, b12 = rows12(na), rows12(nb)
                for i in range(l12):
                    ai = a12[i]
                    for j in range(l12):
                        acc[i + j] = acc[i + j] + ai * b12[j]
            r = _r12_reduce_and_pack(
                acc, l12=l12, inv12=inv12, p12=p12, n16=L)
        else:  # pragma: no cover
            raise ValueError(n.op)
        cache16[n] = r
        return r

    def rows12(n):
        r = cache12.get(n)
        if r is None:
            r = cache12[n] = _repack_16_to_12(rows(n), l12)
        return r

    out_ref[:] = jnp.stack([jnp.stack(rows(o)) for o in outputs])


def _plan_schedule(outputs):
    """Level-batched schedule: group independent same-op nodes so the
    kernel evaluates each group as ONE vectorized limbvec call.

    depth(n) = 1 + max(depth(children)); nodes sharing (depth, op, T) are
    mutually independent by construction.  Returns the group list in
    dependency order."""
    depth = {}

    def visit(n):
        d = depth.get(n)
        if d is not None:
            return d
        if n.op == "in":
            d = 0
        elif n.op == "sop":
            d = 1 + max(max(visit(a), visit(b)) for a, b in n.args)
        else:
            d = 1 + max(visit(c) for c in n.args)
        depth[n] = d
        return d

    for o in outputs:
        visit(o)
    groups = {}
    for n, d in depth.items():
        if n.op == "in":
            continue
        key = (d, n.op, len(n.args) if n.op == "sop" else 0)
        groups.setdefault(key, []).append(n)
    return [groups[k] for k in sorted(groups)]


def _plan_kernel(ops_ref, p16_ref, p12_ref, out_ref, *, outputs, n_limbs,
                 inv12, l12):
    """DAG evaluator over VECTOR values ([L, bb] uint32 arrays; see
    kernels/limbvec.py), one vectorized limbvec call per GROUP of
    independent same-op nodes (level-batched schedule).  Each group traces
    a constant number of whole-row ops instead of one op per limb per node
    — the fused Miller/final-exp plans went from minutes of client-side
    tracing to seconds, and the batched rows use the VPU sublanes better
    than lone [24, bb] values."""
    from . import limbvec as lvec

    L = n_limbs
    p16c = p16_ref[...]
    p12c = p12_ref[...]
    val = {}

    def v(n):
        r = val.get(n)
        if r is None:  # only "in" nodes are unseen in dependency order
            r = val[n] = ops_ref[n.args[0]]
        return r

    for group in _plan_schedule(outputs):
        op = group[0].op
        if op == "sop":
            a16 = jnp.stack(
                [jnp.stack([v(na) for na, _ in n.args]) for n in group])
            b16 = jnp.stack(
                [jnp.stack([v(nb) for _, nb in n.args]) for n in group])
            r = lvec.mont_sop_12(
                lvec.repack_16_to_12(a16, l12),
                lvec.repack_16_to_12(b16, l12), inv12, p12c, L)
        elif op == "add":
            r = lvec.mod_add_16(
                jnp.stack([v(n.args[0]) for n in group]),
                jnp.stack([v(n.args[1]) for n in group]), p16c)
        elif op == "sub":
            r = lvec.mod_sub_16(
                jnp.stack([v(n.args[0]) for n in group]),
                jnp.stack([v(n.args[1]) for n in group]), p16c)
        elif op == "neg":
            r = lvec.mod_neg_16(
                jnp.stack([v(n.args[0]) for n in group]), p16c)
        else:  # pragma: no cover
            raise ValueError(op)
        for i, n in enumerate(group):
            val[n] = r[i]

    out_ref[:] = jnp.stack([v(o) for o in outputs])


@functools.partial(
    jax.jit,
    static_argnames=("outputs", "n_limbs", "inv16", "p_limbs", "block_b",
                     "variant",
                     "interpret"),
)
def plan_exec_pallas(ops_stack, *, outputs, n_limbs, inv16, p_limbs,
                     block_b=512, interpret=False, variant="vector"):
    """Evaluate a plan over stacked operands.

    ops_stack: [K, L, B] uint32 canonical Montgomery limbs;
    outputs: tuple of Nodes;  returns [O, L, B].

    variant "vector" (limbvec, default): ~20x cheaper to trace — for the
    big fp12/pairing plans (dozens of kernel instantiations per graph,
    launch-bound at pairing batch sizes).  "scalar": per-limb registers,
    ~2x the ALU throughput — for the small group-law plans driving the
    large-batch curve/MSM chains.
    """
    k, l, b = ops_stack.shape
    assert l == n_limbs
    r12 = _r12_params(p_limbs)
    assert r12 is not None, "plan kernels require the radix-12 modulus path"
    l12, inv12, p12 = r12
    n_out = len(outputs)
    if b == 0:
        return jnp.zeros((n_out, l, 0), jnp.uint32)
    bb = min(block_b, -(-b // 128) * 128)
    pad = (-b) % bb
    if pad:
        ops_stack = jnp.pad(ops_stack, ((0, 0), (0, 0), (0, pad)))
    bp = b + pad
    op_spec = pl.BlockSpec((k, l, bb), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n_out, l, bb), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    common = dict(
        grid=(bp // bb,),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, l, bp), jnp.uint32),
        interpret=interpret,
    )
    if variant == "scalar":
        kernel = functools.partial(
            _plan_kernel_scalar, outputs=outputs, n_limbs=l, inv12=inv12,
            p12=p12, p16=tuple(int(x) for x in p_limbs), l12=l12,
        )
        out = pl.pallas_call(kernel, in_specs=[op_spec], **common)(ops_stack)
    else:
        kernel = functools.partial(
            _plan_kernel, outputs=outputs, n_limbs=l, inv12=inv12, l12=l12,
        )
        p16c = jnp.asarray(np.asarray(p_limbs, np.uint32).reshape(-1, 1))
        p12c = jnp.asarray(np.asarray(p12, np.uint32).reshape(-1, 1))
        col = lambda rows: pl.BlockSpec(  # noqa: E731 - block-constant col
            (rows, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel, in_specs=[op_spec, col(l), col(l12)], **common
        )(ops_stack, p16c, p12c)
    return out[:, :, :b] if pad else out


# ---------------------------------------------------------------------------
# Runtime entry: stack Fp component tensors, run, unstack
# ---------------------------------------------------------------------------


def enabled() -> bool:
    """Plan kernels route only on the Pallas (TPU) path and behind the
    config.plan_kernels flag."""
    from .. import config, limbs

    return config.get().plan_kernels and limbs._use_pallas()


def run_plan(outputs, components, *, interpret=False, variant="vector"):
    """components: list of [L, *batch] Fp tensors (the plan's input rows, in
    index order).  Returns a list of [L, *batch] output tensors.  variant:
    see plan_exec_pallas ("scalar" for the small runtime-hot group-law
    plans, "vector" for the big trace-hot fp12/pairing plans)."""
    from .. import limbs
    from .. import config

    spec = limbs.FP
    batch = jnp.broadcast_shapes(*[c.shape[1:] for c in components])
    comps = [jnp.broadcast_to(c, (spec.n_limbs,) + batch) for c in components]
    flat = [c.reshape(spec.n_limbs, -1) for c in comps]
    ops = jnp.stack(flat)
    out = plan_exec_pallas(
        ops,
        outputs=tuple(outputs),
        n_limbs=spec.n_limbs,
        inv16=spec.inv16,
        p_limbs=tuple(int(x) for x in spec.p_limbs),
        block_b=min(config.get().block_b, 512),
        interpret=interpret,
        variant=variant,
    )
    return [
        out[i].reshape((spec.n_limbs,) + batch) for i in range(len(outputs))
    ]
