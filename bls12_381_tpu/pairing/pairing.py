"""Batched optimal-ate pairing on device (reference src/pairings.rs).

Architecture (TPU-first redesign of pairings.rs:498-694):

  * Line convention: D-twist "045" sparse lines (see hostmath module docs):
    the line through points of E'(Fp2), evaluated at P = (xp, yp) in G1, is

        l = (a * yp) * 1  +  b * (v w)  +  (c * xp) * (v^2 w)

    with (a, b, c) Fp2 coefficients independent of P.  Projective (no
    inversions), derived by scaling the affine line by elements of Fp2 —
    legal because Fp2 factors are killed by the final exponentiation.

  * prepare_g2 (== G2Prepared, pairings.rs:498-546) computes the 68
    coefficient triples [63 doubling + 5 addition steps for
    BLS_X = 0xd201000000010000] as a lax.scan with masked double/add branches.

  * miller_loop_batched scales and identity-masks all 68 lines in one
    batched fold, then runs STATIC segments: maximal runs of doubling steps
    as lax.scans of the fused f^2 * line update
    (tower.fp12_sqr_mul_by_045, one plan-kernel launch per step on TPU)
    with single line multiplies at the five addition steps between.

  * Final exponentiation: easy part (p^6-1)(p^2+1), then the hard part with
    cofactor 3 via the exact digit decomposition (verified in
    tests/test_pairing.py against the integer exponent):

        3 (p^4-p^2+1)/q = l0 + l1 p + l2 p^2 + l3 p^3
        l3 = (z-1)^2,  l2 = z l3,  l1 = z l2 - l3,  l0 = z l1 + 3

    computed with 5 exponentiations by |z| (cyclotomic inverse = conjugate).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from ..curves import g2 as G2
from ..fields import fp, tower as tw

# ---------------------------------------------------------------------------
# Miller loop schedule (static): bits of BLS_X below the MSB
# ---------------------------------------------------------------------------

_X_BITS = [int(b) for b in bin(params.BLS_X)[3:]]  # 63 bits
N_DOUBLING_STEPS = len(_X_BITS)  # 63
N_COEFFS = N_DOUBLING_STEPS + sum(_X_BITS)  # 68 (pairings.rs:539)

# per-coefficient-step schedule: for each of the 68 line applications,
# whether f is squared first (True for doubling steps) — see miller scan
_SQR_FLAGS = []
_IS_ADD_STEP = []
for _bit in _X_BITS:
    _SQR_FLAGS.append(True)
    _IS_ADD_STEP.append(False)
    if _bit:
        _SQR_FLAGS.append(False)
        _IS_ADD_STEP.append(True)
_SQR_FLAGS = np.array(_SQR_FLAGS)
_IS_ADD_STEP = np.array(_IS_ADD_STEP)
assert len(_SQR_FLAGS) == N_COEFFS


# ---------------------------------------------------------------------------
# Projective line coefficients
# ---------------------------------------------------------------------------


def _dbl_line(t):
    """Tangent-line coefficients at T = (X:Y:Z) on E'(Fp2).

    Affine line scaled by 2YZ^2 (an Fp2 factor):
        a = xi * 2 Y Z^2          (multiplies yp)
        b = 3 X^3 - 2 Y^2 Z
        c = -3 X^2 Z              (multiplies xp)
    """
    x, y, z = t
    xx, yy, yz = tw.fp2_mul_many([(x, x), (y, y), (y, z)])
    xxx, yyz, yzz, xxz = tw.fp2_mul_many(
        [(xx, x), (yy, z), (yz, z), (xx, z)]
    )
    # glue in 3 fused carry networks (doubles; +thirds & xi-add; subs/negs)
    from ..fields import fp as _fp

    zero = _fp.zero(x[0].shape[1:])
    p1 = _fp.add_many(
        [(v[i], v[i]) for v in (xxx, yyz, yzz, xxz) for i in range(2)]
    )
    xxx2, yyz2, yzz2, xxz2 = (
        (p1[0], p1[1]), (p1[2], p1[3]), (p1[4], p1[5]), (p1[6], p1[7])
    )
    p2 = _fp.add_many(
        [(xxx2[0], xxx[0]), (xxx2[1], xxx[1]),
         (xxz2[0], xxz[0]), (xxz2[1], xxz[1]),
         (yzz2[0], yzz2[1])]
    )
    xxx3 = (p2[0], p2[1])
    xxz3 = (p2[2], p2[3])
    a_c1 = p2[4]
    p3 = _fp.sub_many(
        [(xxx3[0], yyz2[0]), (xxx3[1], yyz2[1]),
         (yzz2[0], yzz2[1]),
         (zero, xxz3[0]), (zero, xxz3[1])]
    )
    b = (p3[0], p3[1])
    a = (p3[2], a_c1)
    c = (p3[3], p3[4])
    return (a, b, c)


def _add_line(t, q_aff):
    """Chord-line coefficients through T = (X:Y:Z) and affine Q = (xq, yq).

    Affine line scaled by D = X - xq Z:
        a = xi * D
        b = N xq - yq D      with N = Y - yq Z
        c = -N
    """
    from ..fields import fp as _fp

    x, y, z = t
    xq, yq = q_aff
    xqz, yqz = tw.fp2_mul_many([(xq, z), (yq, z)])
    d, n = tw.fp2_sub_many([(x, xqz), (y, yqz)])
    nxq, yqd = tw.fp2_mul_many([(n, xq), (yq, d)])
    zero = _fp.zero(x[0].shape[1:])
    s = _fp.sub_many(
        [(d[0], d[1]),
         (nxq[0], yqd[0]), (nxq[1], yqd[1]),
         (zero, n[0]), (zero, n[1])]
    )
    a = (s[0], _fp.add_many([(d[0], d[1])])[0])
    b = (s[1], s[2])
    c = (s[3], s[4])
    return (a, b, c)


# ---------------------------------------------------------------------------
# G2 preparation (== G2Prepared, pairings.rs:498-546)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class G2Prepared:
    """68 line-coefficient triples, each an Fp2 batch: coeffs[i] has shape
    [3(a,b,c), 2(c0,c1), L, *batch].  `infinity` masks identity inputs
    (lines become no-ops, pairings.rs:563-586 semantics)."""

    coeffs: jnp.ndarray  # [68, 3, 2, L, *batch] uint32
    infinity: jnp.ndarray  # [*batch] bool


jax.tree_util.register_pytree_node(
    G2Prepared,
    lambda g: ((g.coeffs, g.infinity), None),
    lambda _, c: G2Prepared(*c),
)


def _pack_fp2(a):
    return jnp.stack([a[0], a[1]])  # [2, L, *batch]


@jax.jit
def prepare_g2(q_aff) -> G2Prepared:
    """Compute the 68 line-coefficient triples for an affine G2 batch.

    Identity inputs are replaced by the generator during computation and
    masked at application time (the reference's conditional_select dance,
    pairings.rs:611-614).
    """
    xq, yq, inf = q_aff
    batch = xq[0].shape[1:]
    gen = G2.generator_affine(batch)
    xq = tw.fp2_select(inf, gen[0], xq)
    yq = tw.fp2_select(inf, gen[1], yq)
    q_proj = (xq, yq, tw.fp2_one(batch))

    is_add = jnp.asarray(_IS_ADD_STEP)

    def _fused_steps(t):
        """Line coefficients + point update as ONE expression-plan kernel
        per branch (kernels/plan_exec.py), sharing products between the
        line and the group law."""
        from ..fields.tower import _use_plan_kernels
        if not _use_plan_kernels():
            return None
        from ..kernels import plan_exec

        comps = [t[0][0], t[0][1], t[1][0], t[1][1], t[2][0], t[2][1]]
        od = plan_exec.run_plan(plan_exec.g2_dbl_step_plan(), comps)
        oa = plan_exec.run_plan(
            plan_exec.g2_add_step_plan(),
            comps + [xq[0], xq[1], yq[0], yq[1]],
        )

        def untup(o):
            f2s = [(o[2 * i], o[2 * i + 1]) for i in range(6)]
            return tuple(f2s[:3]), tuple(f2s[3:])

        return untup(od), untup(oa)

    def step(t, is_add_step):
        fused = _fused_steps(t)
        if fused is not None:
            (dbl_c, t_dbl), (add_c, t_add) = fused
        else:
            dbl_c = _dbl_line(t)
            t_dbl = G2.double(t)
            add_c = _add_line(t, (xq, yq))
            t_add = G2.add_mixed(
                t, (xq, yq, jnp.zeros(batch, dtype=bool)))
        mask = jnp.broadcast_to(is_add_step, batch)
        coeff = tuple(
            tw.fp2_select(mask, ac, dc) for ac, dc in zip(add_c, dbl_c)
        )
        t_next = tuple(
            tw.fp2_select(mask, ta, td) for ta, td in zip(t_add, t_dbl)
        )
        packed = jnp.stack([_pack_fp2(c) for c in coeff])  # [3, 2, L, *batch]
        return t_next, packed

    _, coeffs = jax.lax.scan(step, q_proj, is_add)
    return G2Prepared(coeffs=coeffs, infinity=inf)


# ---------------------------------------------------------------------------
# Miller loop
# ---------------------------------------------------------------------------


# static segmentation of the 68-step schedule: maximal runs of doubling
# (sqr) steps, broken by single addition steps — same run-length trick as
# _X_RUNS below.  Lets every doubling step run the FUSED f^2 * line update
# (tower.fp12_sqr_mul_by_045) with no per-step sqr/no-sqr select.
_SEGMENTS = []  # (start, length, is_sqr_run)
_i = 0
while _i < N_COEFFS:
    _j = _i
    while _j < N_COEFFS and _SQR_FLAGS[_j]:
        _j += 1
    if _j > _i:
        _SEGMENTS.append((_i, _j - _i, True))
    if _j < N_COEFFS:
        _SEGMENTS.append((_j, 1, False))
        _j += 1
    _i = _j
assert sum(s[1] for s in _SEGMENTS) == N_COEFFS


@jax.jit
def miller_loop_batched(p_aff, prep: G2Prepared):
    """f_{|z|,Q}(P) (conjugated for z < 0) for batches of G1 points and
    prepared G2 coefficients.

    All 68 lines are scaled by the G1 point and identity-masked in ONE
    batched fold up front (ell(), pairings.rs:696-707); the loop then runs
    static segments of fused f^2 * line doubling steps with single
    line-multiply addition steps between (schedule is static, so no
    per-step flag select).  Identity terms contribute f *= 1
    (pairings.rs:563-586).
    """
    xp, yp, inf_p = p_aff
    batch = xp.shape[1:]
    either_inf = inf_p | prep.infinity

    # [68, 3, 2, L, *batch] -> per-component [L, 68, *batch]
    def comp(i, j):
        return jnp.moveaxis(prep.coeffs[:, i, j], 1, 0)

    a0, a1 = comp(0, 0), comp(0, 1)
    b0, b1 = comp(1, 0), comp(1, 1)
    c0, c1 = comp(2, 0), comp(2, 1)
    ypb = jnp.broadcast_to(yp[:, None], a0.shape)
    xpb = jnp.broadcast_to(xp[:, None], a0.shape)
    s0, s1, s2, s3 = fp.mul_many(
        [(a0, ypb), (a1, ypb), (c0, xpb), (c1, xpb)]
    )
    sbatch = (N_COEFFS,) + batch
    mask = jnp.broadcast_to(either_inf[None], sbatch)
    g0 = tw.fp2_select(mask, tw.fp2_one(sbatch), (s0, s1))
    g4 = tw.fp2_select(mask, tw.fp2_zero(sbatch), (b0, b1))
    g5 = tw.fp2_select(mask, tw.fp2_zero(sbatch), (s2, s3))
    # [68, 6, L, *batch] scan operand
    lines = jnp.stack(
        [jnp.moveaxis(x, 1, 0) for x in (g0[0], g0[1], g4[0], g4[1],
                                         g5[0], g5[1])],
        axis=1,
    )

    def unpack(ln):
        return (ln[0], ln[1]), (ln[2], ln[3]), (ln[4], ln[5])

    def sqr_step(f, ln):
        return tw.fp12_sqr_mul_by_045(f, *unpack(ln)), None

    f = tw.fp12_one(batch)
    for start, length, is_sqr in _SEGMENTS:
        seg = jax.lax.slice_in_dim(lines, start, start + length, axis=0)
        if is_sqr:
            f, _ = jax.lax.scan(sqr_step, f, seg)
        else:
            f = tw.fp12_mul_by_045(f, *unpack(seg[0]))
    # z < 0: conjugate (pairings.rs:687-691)
    return tw.fp12_conjugate(f)


@jax.jit
def multi_miller_loop(p_affs, prep: G2Prepared):
    """Product of Miller values over the leading batch axis (the shared-
    accumulator semantics of pairings.rs:554-603; same value, computed as a
    batched loop + tree product)."""
    f = miller_loop_batched(p_affs, prep)
    return _tree_product(f)


def _tree_product(f):
    """Reduce an Fp12 batch [..., n] by multiplication along the LAST batch
    axis via a halving tree (log2 n fp12_muls)."""

    def last_dim(x):
        return x.shape[-1]

    n = last_dim(f[0][0][0])
    while n > 1:
        half = n // 2
        lo = jax.tree.map(lambda x: x[..., :half], f)
        hi = jax.tree.map(lambda x: x[..., half : 2 * half], f)
        prod = tw.fp12_mul(lo, hi)
        if n % 2:
            tail = jax.tree.map(lambda x: x[..., -1:], f)
            prod = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], axis=-1), prod, tail
            )
        f = prod
        n = last_dim(f[0][0][0])
    return jax.tree.map(lambda x: x[..., 0], f)


# ---------------------------------------------------------------------------
# Final exponentiation
# ---------------------------------------------------------------------------


# run-length schedule for |z| = BLS_X: (squares, then multiply) segments.
# BLS_X's bit pattern is STATIC, so the masked-multiply-every-step ladder
# wastes ~57 fp12 muls + selects per exponentiation; instead scan pure
# cyclotomic-square segments and multiply only at the (five) set bits.
_X_RUNS = []
_run = 0
for _bit in _X_BITS:
    _run += 1
    if _bit:
        _X_RUNS.append((_run, True))
        _run = 0
if _run:
    _X_RUNS.append((_run, False))


def _cyclotomic_exp_u(f):
    """f^|z| in the cyclotomic subgroup (vartime fixed schedule,
    pairings.rs:115-132 analog), segmented by the static bit runs.

    On the plan-kernel path, runs execute as scans of k-CHAINED squaring
    kernels (config.cyclo_fuse, tower.fp12_cyclotomic_sqr_k) — one launch
    per k squarings — with the k-remainder as single squarings."""

    def sqr_n(acc, n):
        from ..fields.tower import _use_plan_kernels
        from .. import config

        k = config.get().cyclo_fuse
        if k > 1 and n >= k and _use_plan_kernels():
            body = lambda a, _: (  # noqa: E731
                tw.fp12_cyclotomic_sqr_k(a, k), None)
            if n // k > 1:
                acc, _ = jax.lax.scan(body, acc, None, length=n // k)
            else:
                acc = tw.fp12_cyclotomic_sqr_k(acc, k)
            n = n % k
        if n == 0:
            return acc
        if n == 1:
            return tw.fp12_cyclotomic_sqr(acc)
        body = lambda a, _: (tw.fp12_cyclotomic_sqr(a), None)  # noqa: E731
        acc, _ = jax.lax.scan(body, acc, None, length=n)
        return acc

    acc = f
    for n_sqr, mul_f in _X_RUNS:
        acc = sqr_n(acc, n_sqr)
        if mul_f:
            acc = tw.fp12_mul(acc, f)
    return acc


def _exp_z(f):
    """f^z = conj(f^|z|) (z negative; conjugate = inverse in the cyclotomic
    subgroup)."""
    return tw.fp12_conjugate(_cyclotomic_exp_u(f))


@jax.jit
def final_exponentiation(f):
    """f^((p^12-1)/q * 3) — the reference-compatible final exponentiation
    (cofactor-3 hard part; validated against RELIC in tests)."""
    # easy part: f^((p^6-1)(p^2+1))  (pairings.rs:134-147)
    f = tw.fp12_mul(tw.fp12_conjugate(f), tw.fp12_inv(f))
    f = tw.fp12_mul(tw.fp12_frobenius(tw.fp12_frobenius(f)), f)
    # hard part via exact digits: l3=(z-1)^2, l2=z l3, l1=z l2-l3, l0=z l1+3
    # f is now cyclotomic: inverse == conjugate
    fz = _exp_z(f)  # f^z
    a = tw.fp12_mul(fz, tw.fp12_conjugate(f))  # f^(z-1)
    c = tw.fp12_mul(_exp_z(a), tw.fp12_conjugate(a))  # f^((z-1)^2) = f^l3
    t3 = c
    t2 = _exp_z(c)  # f^l2
    t1 = tw.fp12_mul(_exp_z(t2), tw.fp12_conjugate(c))  # f^(z l2 - l3)
    f3 = tw.fp12_mul(tw.fp12_sqr(f), f)  # f^3
    t0 = tw.fp12_mul(_exp_z(t1), f3)  # f^(z l1 + 3)
    out = t0
    out = tw.fp12_mul(out, tw.fp12_frobenius(t1))
    out = tw.fp12_mul(out, tw.fp12_frobenius(tw.fp12_frobenius(t2)))
    out = tw.fp12_mul(
        out, tw.fp12_frobenius(tw.fp12_frobenius(tw.fp12_frobenius(t3)))
    )
    return out


# ---------------------------------------------------------------------------
# Top-level pairings
# ---------------------------------------------------------------------------


@jax.jit
def pairing(p_aff, q_aff):
    """e(P, Q) for batches of affine points (pairings.rs:607-653)."""
    return final_exponentiation(miller_loop_batched(p_aff, prepare_g2(q_aff)))


def pairing_batched(p_aff, q_aff):
    """Alias emphasizing the batch semantics: element-wise e(P_i, Q_i)."""
    return pairing(p_aff, q_aff)
