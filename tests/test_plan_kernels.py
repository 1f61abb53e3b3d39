"""Expression-plan kernels (kernels/plan_exec.py).

Two layers, split to keep the suite runnable on the 1-core CPU box:

1. Plan ALGEBRA: every fp12 plan evaluated by the pure-Python DAG oracle
   (eval_plan_host — same Montgomery semantics as the kernel reduction)
   against the host oracle's fp12 arithmetic.  No XLA compiles.
2. Kernel MECHANICS: the in-register modular add/sub/neg ripple networks
   and the radix-12 sop reduction, via ONE tiny plan in Pallas interpret
   mode with edge values (0, 1, p-1) — big-plan interpret compiles are
   impractically slow on XLA CPU; the full plans run on real TPU through
   the pairing tests/bench.
"""

import random

import numpy as np
import pytest

import conftest  # noqa: F401
from bls12_381_tpu import hostmath as hm
from bls12_381_tpu.kernels import plan_exec as pe
from bls12_381_tpu.params import P

R = 1 << 384
random.seed(23)


def _rand_fp12():
    return tuple(
        tuple((random.randrange(P), random.randrange(P)) for _ in range(3))
        for _ in range(2)
    )


def _flat(f12):
    return [c for c6 in f12 for c2 in c6 for c in c2]


def _mont(vals):
    return [v * R % P for v in vals]


def _check(plan, in_vals, expect12):
    got = pe.eval_plan_host(plan, _mont(in_vals), P, R)
    exp = _mont(_flat(expect12))
    assert got == exp


def test_fp12_mul_plan_algebra():
    a, b = _rand_fp12(), _rand_fp12()
    _check(pe.fp12_mul_plan(), _flat(a) + _flat(b), hm.fp12_mul(a, b))
    # identity and zero operands
    one = ((((1, 0)), (0, 0), (0, 0)), ((0, 0), (0, 0), (0, 0)))
    _check(pe.fp12_mul_plan(), _flat(a) + _flat(one), a)


def test_fp12_sqr_plan_algebra():
    a = _rand_fp12()
    _check(pe.fp12_sqr_plan(), _flat(a), hm.fp12_square(a))
    edge = (((0, 1), (P - 1, 0), (P - 1, P - 1)),
            ((1, 1), (0, 0), (P - 2, (P - 1) // 2)))
    _check(pe.fp12_sqr_plan(), _flat(edge), hm.fp12_square(edge))


def test_fp12_cyclotomic_sqr_plan_algebra():
    # genuinely cyclotomic element (after the easy part): cyclo sqr == sqr
    f = _rand_fp12()
    f = hm.fp12_mul(hm.fp12_conjugate(f), hm.fp12_inv(f))
    f = hm.fp12_mul(hm.fp12_frobenius(hm.fp12_frobenius(f)), f)
    _check(pe.fp12_cyclotomic_sqr_plan(), _flat(f), hm.fp12_square(f))


def test_fp12_cyclotomic_sqr_k_plan_algebra():
    """k-chained cyclotomic squaring plan == k host squarings (on a real
    cyclotomic element) for every k used by the pow-by-|z| schedule."""
    f = _rand_fp12()
    f = hm.fp12_mul(hm.fp12_conjugate(f), hm.fp12_inv(f))
    f = hm.fp12_mul(hm.fp12_frobenius(hm.fp12_frobenius(f)), f)
    for k in (2, 4):
        exp = f
        for _ in range(k):
            exp = hm.fp12_square(exp)
        _check(pe.fp12_cyclotomic_sqr_k_plan(k), _flat(f), exp)


def test_fp12_mul_by_045_plan_algebra():
    f = _rand_fp12()
    g0 = (random.randrange(P), random.randrange(P))
    g4 = (random.randrange(P), random.randrange(P))
    g5 = (random.randrange(P), random.randrange(P))
    # reference value: full fp12 mul by the sparse element
    # g0 + g4 (v w) + g5 (v^2 w)  ==  (g0, 0, 0) + ((0, g4, g5)) w
    sparse = (
        (g0, (0, 0), (0, 0)),
        ((0, 0), g4, g5),
    )
    expect = hm.fp12_mul(f, sparse)
    _check(
        pe.fp12_mul_by_045_plan(),
        _flat(f) + [g0[0], g0[1], g4[0], g4[1], g5[0], g5[1]],
        expect,
    )


def test_fp12_sqr_mul_by_045_plan_algebra():
    """The fused Miller doubling-step plan == sqr then sparse multiply."""
    f = _rand_fp12()
    g0, g4, g5 = (_rand_f2p() for _ in range(3))
    sparse = ((g0, (0, 0), (0, 0)), ((0, 0), g4, g5))
    expect = hm.fp12_mul(hm.fp12_square(f), sparse)
    _check(
        pe.fp12_sqr_mul_by_045_plan(),
        _flat(f) + [g0[0], g0[1], g4[0], g4[1], g5[0], g5[1]],
        expect,
    )


def _rand_f2p():
    return (random.randrange(P), random.randrange(P))


def test_plan_kernel_interpret_tiny():
    """Kernel mechanics: modular add/sub/neg ripple networks + one radix-12
    sop group, in interpret mode, over edge values."""
    import jax

    from bls12_381_tpu.fields import fp

    a, b = pe.inp(0), pe.inp(1)
    plan = (
        pe.sop([(a, b), (pe.sub(a, b), a)]),
        pe.add(a, b),
        pe.neg(pe.add(a, pe.sub(b, b))),  # == -a with a zero-value sub
    )
    cases = [
        (0, 0), (1, 0), (0, 1), (P - 1, P - 1), (P - 1, 1),
        (random.randrange(P), random.randrange(P)),
    ]
    A = fp.from_ints([x for x, _ in cases])
    B = fp.from_ints([y for _, y in cases])
    out = pe.run_plan(plan, [A, B], interpret=True)
    got0 = [int(v) for v in fp.to_ints(out[0])]
    got1 = [int(v) for v in fp.to_ints(out[1])]
    got2 = [int(v) for v in fp.to_ints(out[2])]
    for i, (x, y) in enumerate(cases):
        assert got0[i] == (x * y + (x - y) * x) % P, i
        assert got1[i] == (x + y) % P, i
        assert got2[i] == (-x) % P, i


def _host_run_plan(outputs, components, **_):
    """Drop-in run_plan fake: evaluates the plan per lane with the pure-
    Python DAG oracle — verifies the fused-hook WIRING (row order, output
    mapping) with zero XLA compiles."""
    from bls12_381_tpu.fields import fp

    cols = [[int(v) for v in fp.to_ints(c)] for c in components]
    lanes = len(cols[0])
    outs = [[] for _ in outputs]
    for i in range(lanes):
        vals = [_mont([col[i]])[0] for col in cols]
        got = pe.eval_plan_host(tuple(outputs), vals, P, R)
        for j, v in enumerate(got):
            outs[j].append(v * RINV % P)
    return [fp.from_ints(o) for o in outs]


def _ints(fpv):
    from bls12_381_tpu.fields import fp

    return [int(v) for v in fp.to_ints(fpv)]


def test_g1_fused_group_law_wiring(monkeypatch):
    """The weierstrass fused_add/fused_double/fused_add_mixed hooks route
    through run_plan with the right row order: force-enable plans (host
    DAG oracle standing in for the kernel) and compare whole group ops
    against the staged jnp path."""
    from bls12_381_tpu.curves import g1 as G1
    from bls12_381_tpu.fields import fp

    ks = [1, 2, 5, 0]  # incl. identity lane
    xs, ys = [], []
    for k in ks:
        pt = hm.g1_mul(hm.G1_GEN, k)
        xs.append(0 if pt is None else pt[0])
        ys.append(1 if pt is None else pt[1])
    zs = [0 if k == 0 else 1 for k in ks]
    p = (fp.from_ints(xs), fp.from_ints(ys), fp.from_ints(zs))
    q = G1.generator((len(ks),))
    aff = (q[0], q[1], np.array([False, False, False, True]))

    ref_d, ref_a = G1.double(p), G1.add(p, q)
    ref_m = G1.add_mixed(p, aff)
    monkeypatch.setattr(pe, "enabled", lambda: True)
    monkeypatch.setattr(pe, "run_plan", _host_run_plan)
    got_d, got_a = G1.double(p), G1.add(p, q)
    got_m = G1.add_mixed(p, aff)
    for g, r in zip(got_d + got_a + got_m, ref_d + ref_a + ref_m):
        assert _ints(g) == _ints(r)


def test_g2_fused_group_law_wiring(monkeypatch):
    from bls12_381_tpu.curves import g2 as G2
    from bls12_381_tpu.fields import fp

    p1, p2 = hm.g2_mul(hm.G2_GEN, 3), hm.g2_mul(hm.G2_GEN, 5)
    q1, q2 = hm.g2_mul(hm.G2_GEN, 7), hm.g2_mul(hm.G2_GEN, 11)

    def mk(pa, pb):
        """[2]-lane projective G2 point from two affine host points."""
        return tuple(
            (fp.from_ints([pa[c][0], pb[c][0]]),
             fp.from_ints([pa[c][1], pb[c][1]]))
            for c in range(2)
        ) + ((fp.from_ints([1, 1]), fp.from_ints([0, 0])),)

    P1 = mk(p1, p2)
    Q1 = mk(q1, q2)
    ref_d, ref_a = G2.double(P1), G2.add(P1, Q1)
    monkeypatch.setattr(pe, "enabled", lambda: True)
    monkeypatch.setattr(pe, "run_plan", _host_run_plan)
    got_d, got_a = G2.double(P1), G2.add(P1, Q1)
    for g, r in zip(_flat2(got_d + got_a), _flat2(ref_d + ref_a)):
        assert _ints(g) == _ints(r)


def _flat2(pts):
    return [c for f2c in pts for c in f2c]


# --- prepare_g2 fused step plans: algebra vs a pure-Python mirror ----------

def _f2m(a, b):
    return ((a[0] * b[0] - a[1] * b[1]) % P, (a[0] * b[1] + a[1] * b[0]) % P)


def _f2a(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def _f2s(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def _f2xi(a):
    return ((a[0] - a[1]) % P, (a[0] + a[1]) % P)


def _f2b3(a):
    x = _f2xi(a)
    return (12 * x[0] % P, 12 * x[1] % P)


def _f2neg(a):
    return ((-a[0]) % P, (-a[1]) % P)


def _f2dbl(a):
    return _f2a(a, a)


def _rand_f2():
    return (random.randrange(P), random.randrange(P))


def test_g2_dbl_step_plan_algebra():
    X, Y, Z = _rand_f2(), _rand_f2(), _rand_f2()
    xx, yy, zz = _f2m(X, X), _f2m(Y, Y), _f2m(Z, Z)
    yz, xy = _f2m(Y, Z), _f2m(X, Y)
    la = _f2xi(_f2dbl(_f2m(yz, Z)))
    lb = _f2s(_f2a(_f2dbl(_f2m(xx, X)), _f2m(xx, X)),
              _f2dbl(_f2m(yy, Z)))
    lc = _f2neg(_f2a(_f2dbl(_f2m(xx, Z)), _f2m(xx, Z)))
    t0, t1 = yy, yz
    t2 = _f2b3(zz)
    z3t = _f2dbl(_f2dbl(_f2dbl(t0)))
    y3s = _f2a(t0, t2)
    t0d = _f2s(t0, _f2a(_f2dbl(t2), t2))
    x3 = _f2dbl(_f2m(t0d, xy))
    y3 = _f2a(_f2m(t2, z3t), _f2m(t0d, y3s))
    z3 = _f2m(t1, z3t)
    expect = [c for f2 in (la, lb, lc, x3, y3, z3) for c in f2]
    got = pe.eval_plan_host(
        pe.g2_dbl_step_plan(),
        _mont([X[0], X[1], Y[0], Y[1], Z[0], Z[1]]), P, R)
    assert got == _mont(expect)
    # the point half must BE the library's G2 doubling: check via a real
    # point, normalized (beyond formula mirroring)
    ph = hm.g2_mul(hm.G2_GEN, 7)
    vals = _mont([ph[0][0], ph[0][1], ph[1][0], ph[1][1], 1, 0])
    out = pe.eval_plan_host(pe.g2_dbl_step_plan(), vals, P, R)
    rinv = pow(R, -1, P)
    x3v = (out[6] * rinv % P, out[7] * rinv % P)
    y3v = (out[8] * rinv % P, out[9] * rinv % P)
    z3v = (out[10] * rinv % P, out[11] * rinv % P)
    zi = hm.fp2_inv(z3v)
    aff = (hm.fp2_mul(x3v, zi), hm.fp2_mul(y3v, zi))
    assert aff == hm.g2_double(ph)


# --- whole-group-law plans (RCB Algorithms 7/8/9): outputs normalized and
# compared against the host oracle's affine group law, including the
# exceptional cases the complete formulas must cover ------------------------

RINV = pow(R, -1, P)


def _g1_pt(k, z=1):
    """Projective G1 [k]G with an arbitrary z-scaling, Montgomery rows."""
    if k == 0:
        return _mont([0, 1, 0]), None
    x, y = hm.g1_mul(hm.G1_GEN, k)
    return _mont([x * z % P, y * z % P, z % P]), (x, y)


def _g1_norm(out):
    x, y, z = (v * RINV % P for v in out)
    if z == 0:
        return None
    zi = hm.fp_inv(z)
    return (x * zi % P, y * zi % P)


def test_g1_add_plan_algebra():
    a, pa = _g1_pt(5, z=1234567)
    b, pb = _g1_pt(9, z=42)
    got = _g1_norm(pe.eval_plan_host(pe.g1_add_plan(), a + b, P, R))
    assert got == hm.g1_add(pa, pb)
    # exceptional: P + P (doubling through add), P + (-P), P + identity
    nb, _ = _g1_pt(5, z=3)
    nb[1] = (P - pa[1]) * 3 % P * (R % P) % P  # -y, same z-scale
    assert _g1_norm(
        pe.eval_plan_host(pe.g1_add_plan(), a + a, P, R)
    ) == hm.g1_double(pa)
    assert _g1_norm(pe.eval_plan_host(pe.g1_add_plan(), a + nb, P, R)) is None
    ident, _ = _g1_pt(0)
    assert _g1_norm(
        pe.eval_plan_host(pe.g1_add_plan(), a + ident, P, R)
    ) == pa


def test_g1_double_plan_algebra():
    a, pa = _g1_pt(7, z=99)
    got = _g1_norm(pe.eval_plan_host(pe.g1_double_plan(), a, P, R))
    assert got == hm.g1_double(pa)
    ident, _ = _g1_pt(0)
    assert _g1_norm(
        pe.eval_plan_host(pe.g1_double_plan(), ident, P, R)
    ) is None


def test_g1_add_mixed_plan_algebra():
    a, pa = _g1_pt(6, z=31337)
    qx, qy = hm.g1_mul(hm.G1_GEN, 13)
    got = _g1_norm(
        pe.eval_plan_host(pe.g1_add_mixed_plan(), a + _mont([qx, qy]), P, R)
    )
    assert got == hm.g1_add(pa, (qx, qy))
    # mixed P + P and P + (-P)
    sx, sy = pa
    assert _g1_norm(pe.eval_plan_host(
        pe.g1_add_mixed_plan(), a + _mont([sx, sy]), P, R)
    ) == hm.g1_double(pa)
    assert _g1_norm(pe.eval_plan_host(
        pe.g1_add_mixed_plan(), a + _mont([sx, P - sy]), P, R)
    ) is None


def _g2_pt(k, z=(1, 0)):
    if k == 0:
        return _mont([0, 0, 1, 0, 0, 0]), None
    x, y = hm.g2_mul(hm.G2_GEN, k)
    xz, yz = hm.fp2_mul(x, z), hm.fp2_mul(y, z)
    return _mont([xz[0], xz[1], yz[0], yz[1], z[0], z[1]]), (x, y)


def _g2_norm(out):
    vals = [v * RINV % P for v in out]
    x = (vals[0], vals[1])
    y = (vals[2], vals[3])
    z = (vals[4], vals[5])
    if z == (0, 0):
        return None
    zi = hm.fp2_inv(z)
    return (hm.fp2_mul(x, zi), hm.fp2_mul(y, zi))


def test_g2_add_plan_algebra():
    a, pa = _g2_pt(5, z=(17, 23))
    b, pb = _g2_pt(9, z=(3, 1))
    got = _g2_norm(pe.eval_plan_host(pe.g2_add_plan(), a + b, P, R))
    assert got == hm.g2_add(pa, pb)
    assert _g2_norm(
        pe.eval_plan_host(pe.g2_add_plan(), a + a, P, R)
    ) == hm.g2_double(pa)
    ident, _ = _g2_pt(0)
    assert _g2_norm(
        pe.eval_plan_host(pe.g2_add_plan(), a + ident, P, R)
    ) == pa


def test_g2_double_plan_algebra():
    a, pa = _g2_pt(7, z=(5, 11))
    got = _g2_norm(pe.eval_plan_host(pe.g2_double_plan(), a, P, R))
    assert got == hm.g2_double(pa)


def test_g2_add_mixed_plan_algebra():
    a, pa = _g2_pt(6, z=(2, 9))
    qx, qy = hm.g2_mul(hm.G2_GEN, 13)
    got = _g2_norm(pe.eval_plan_host(
        pe.g2_add_mixed_plan(),
        a + _mont([qx[0], qx[1], qy[0], qy[1]]), P, R))
    assert got == hm.g2_add(pa, (qx, qy))
    ny = hm.fp2_neg(pa[1])
    assert _g2_norm(pe.eval_plan_host(
        pe.g2_add_mixed_plan(),
        a + _mont([pa[0][0], pa[0][1], ny[0], ny[1]]), P, R)
    ) is None


def test_g2_add_step_plan_algebra():
    X, Y, Z = _rand_f2(), _rand_f2(), _rand_f2()
    xq, yq = _rand_f2(), _rand_f2()
    xqz, yqz = _f2m(xq, Z), _f2m(yq, Z)
    d, n = _f2s(X, xqz), _f2s(Y, yqz)
    la = _f2xi(d)
    lb = _f2s(_f2m(n, xq), _f2m(yq, d))
    lc = _f2neg(n)
    t0, t1 = _f2m(X, xq), _f2m(Y, yq)
    t3 = _f2s(_f2m(_f2a(xq, yq), _f2a(X, Y)), _f2a(t0, t1))
    t4 = _f2a(yqz, Y)
    y3m = _f2a(xqz, X)
    t0_3 = _f2a(_f2dbl(t0), t0)
    t2 = _f2b3(Z)
    z3s = _f2a(t1, t2)
    t1d = _f2s(t1, t2)
    y3b = _f2b3(y3m)
    x3 = _f2s(_f2m(t3, t1d), _f2m(t4, y3b))
    y3 = _f2a(_f2m(t1d, z3s), _f2m(y3b, t0_3))
    z3 = _f2a(_f2m(z3s, t4), _f2m(t0_3, t3))
    expect = [c for f2 in (la, lb, lc, x3, y3, z3) for c in f2]
    got = pe.eval_plan_host(
        pe.g2_add_step_plan(),
        _mont([X[0], X[1], Y[0], Y[1], Z[0], Z[1],
               xq[0], xq[1], yq[0], yq[1]]), P, R)
    assert got == _mont(expect)
    # point half == real mixed addition on actual points
    p1 = hm.g2_mul(hm.G2_GEN, 3)
    p2 = hm.g2_mul(hm.G2_GEN, 11)
    vals = _mont([p1[0][0], p1[0][1], p1[1][0], p1[1][1], 1, 0,
                  p2[0][0], p2[0][1], p2[1][0], p2[1][1]])
    out = pe.eval_plan_host(pe.g2_add_step_plan(), vals, P, R)
    rinv = pow(R, -1, P)
    x3v = (out[6] * rinv % P, out[7] * rinv % P)
    y3v = (out[8] * rinv % P, out[9] * rinv % P)
    z3v = (out[10] * rinv % P, out[11] * rinv % P)
    zi = hm.fp2_inv(z3v)
    aff = (hm.fp2_mul(x3v, zi), hm.fp2_mul(y3v, zi))
    assert aff == hm.g2_add(p1, p2)
