"""Batched G2: E'(Fp2): y^2 = x^3 + 4(u+1) (reference src/g2.rs).

Adds the psi (untwist-Frobenius-twist) endomorphism, Budroni-Pintore cofactor
clearing, and the psi-based subgroup check.  Serialization is 96/192-byte
with Fp2 written c1 || c0 (g2.rs:254-282).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import hostmath as hm
from .. import params
from ..fields import fp, tower as tw
from .weierstrass import FieldFns, Weierstrass
from . import g1 as _g1

def _mul_b3(x):
    """12*(u+1)*x by additions (3*b with b = 4(u+1), g2.rs analog)."""
    t = tw.fp2_mul_by_nonresidue(x)  # (u+1) x
    t2 = tw.fp2_add(t, t)
    t4 = tw.fp2_add(t2, t2)
    t8 = tw.fp2_add(t4, t4)
    return tw.fp2_add(t8, t4)


def _fused(plan_name, f2s):
    """Route one whole Fp2 group operation through an expression-plan
    Pallas kernel (kernels/plan_exec.py) when enabled; None falls back.
    f2s: sequence of (c0, c1) pairs -> returns 3 pairs."""
    from ..kernels import plan_exec as pe

    if not pe.enabled():
        return None
    # config.plan_variant routing: see curves/g1.py _fused
    from .. import config

    o = pe.run_plan(
        getattr(pe, plan_name)(), [c for f2 in f2s for c in f2],
        variant=config.get().plan_variant,
    )
    return ((o[0], o[1]), (o[2], o[3]), (o[4], o[5]))


_FNS = FieldFns(
    add=tw.fp2_add,
    sub=tw.fp2_sub,
    neg=tw.fp2_neg,
    mul=tw.fp2_mul,
    sqr=tw.fp2_sqr,
    mul_many=tw.fp2_mul_many,
    mul_b3=_mul_b3,
    select=tw.fp2_select,
    eq=tw.fp2_eq,
    is_zero=tw.fp2_is_zero,
    zero=tw.fp2_zero,
    one=tw.fp2_one,
    b=lambda batch: tw.fp2_const(params.B_G2, batch),
    batch_of=lambda x: x[0].shape[1:],
    add_many=tw.fp2_add_many,
    sub_many=tw.fp2_sub_many,
    b3c=lambda batch: tw.fp2_const(
        tuple(3 * c for c in params.B_G2), batch
    ),
    b3c9=lambda batch: tw.fp2_const(
        tuple(9 * c for c in params.B_G2), batch
    ),
    fused_add=lambda p, q: _fused("g2_add_plan", list(p) + list(q)),
    fused_double=lambda p: _fused("g2_double_plan", list(p)),
    fused_add_mixed=lambda p, xy: _fused(
        "g2_add_mixed_plan", list(p) + list(xy)),
)

CURVE = Weierstrass(_FNS)

identity = CURVE.identity
from_affine = CURVE.from_affine
is_identity = CURVE.is_identity
is_on_curve = CURVE.is_on_curve
eq = CURVE.eq
neg = CURVE.neg
double = CURVE.double
add = CURVE.add
add_mixed = CURVE.add_mixed


def generator(batch=()):
    (x, y) = params.G2_GEN
    return (tw.fp2_const(x, batch), tw.fp2_const(y, batch), tw.fp2_one(batch))


def generator_affine(batch=()):
    (x, y) = params.G2_GEN
    return (
        tw.fp2_const(x, batch),
        tw.fp2_const(y, batch),
        jnp.zeros(batch, dtype=bool),
    )


@jax.jit
def scalar_mul(p, scalars_mont):
    """[s]P via the 4-way GLS endomorphism split (beyond-reference).

    psi acts as multiplication by z on the subgroup (g2.rs:475-482), so
    writing s = c0 + c1|z| + c2|z|^2 + c3|z|^3 (base-|z| digits via Barrett
    division; each c_i < 2^64) gives

        [s]P = [c0]P + [c1](-psi(P)) + [c2]psi^2(P) + [c3](-psi^3(P))

    (signs because z = -|z|), evaluated with SHARED doublings over four
    64-bit mini-scalars: 64 doublings instead of 255.  Valid on the
    prime-order subgroup; use scalar_mul_generic for arbitrary points.
    """
    from .. import config, limbs

    x = params.BLS_X
    canon = limbs.from_mont(_g1.FR, scalars_mont)  # [16, *batch]
    q3, r3 = limbs.barrett_divmod(canon, x**3, 5)   # c3 < |z| < 2^64
    q2, r2 = limbs.barrett_divmod(r3, x**2, 5)
    q1, c0 = limbs.barrett_divmod(r2, x, 5)

    p1 = p
    pp = psi(p)
    p2 = CURVE.neg(pp)               # [|z|]P
    p3 = psi(pp)                     # [|z|^2]P
    p4 = CURVE.neg(psi(p3))          # [|z|^3]P
    lookup = config.get().smul_lookup
    if lookup == "unsigned":
        digits = [
            limbs.digits4_msb(c0, 64),
            limbs.digits4_msb(q1, 64),
            limbs.digits4_msb(q2, 64),
            limbs.digits4_msb(q3, 64),
        ]
        return CURVE.multi_scalar_mul_windowed([p1, p2, p3, p4], digits)
    return CURVE.multi_scalar_mul_signed(
        [p1, p2, p3, p4],
        [limbs.signed_digits_msb(k, 64) for k in (c0, q1, q2, q3)],
        lookup=lookup,
    )


@jax.jit
def scalar_mul_generic(p, scalars_mont):
    """[s]P by plain 4-bit windows (valid for ANY curve point)."""
    return CURVE.scalar_mul_windowed(p, _g1.fr_digits4_msb(scalars_mont))


@jax.jit
def mul_by_x(p):
    """[|z|]P (g2.rs semantics: sign handled by callers)."""
    return CURVE.mul_by_const(p, params.BLS_X)


@jax.jit
def psi(p):
    """Untwist-Frobenius-twist: (x:y:z) -> (c_x x^p : c_y y^p : z^p)
    (g2.rs:847-888; constants computed by the host oracle)."""
    batch = p[0][0].shape[1:]
    cx = tw.fp2_const(hm.PSI_CX, batch)
    cy = tw.fp2_const(hm.PSI_CY, batch)
    return (
        tw.fp2_mul(tw.fp2_conjugate(p[0]), cx),
        tw.fp2_mul(tw.fp2_conjugate(p[1]), cy),
        tw.fp2_conjugate(p[2]),
    )


@jax.jit
def psi2(p):
    return psi(psi(p))


@jax.jit
def is_torsion_free(p):
    """psi(P) == [z]P = -[|z|]P (ePrint 2021/1130 §4; g2.rs:475-482)."""
    return CURVE.eq(psi(p), CURVE.neg(mul_by_x(p)))


@jax.jit
def clear_cofactor(p):
    """Budroni-Pintore (ia.cr/2017/419; g2.rs:934-947):

        h(P) = [z^2 - z - 1]P + [z - 1] psi(P) + psi^2(2P)

    with z = -|z|: [u^2]P + [u]P - P - [u]psi(P) - psi(P) + psi^2(2P),
    u = |z|.  Verified bit-exact against [h_eff]P in tests.
    """
    t1 = mul_by_x(p)              # [u]P
    t2 = mul_by_x(t1)             # [u^2]P
    psip = psi(p)
    t3 = mul_by_x(psip)           # [u]psi(P)
    acc = CURVE.add(t2, t1)
    acc = CURVE.add(acc, CURVE.neg(p))
    acc = CURVE.add(acc, CURVE.neg(t3))
    acc = CURVE.add(acc, CURVE.neg(psip))
    acc = CURVE.add(acc, psi2(CURVE.double(p)))
    return acc


@jax.jit
def to_affine(p):
    """z-inversion amortized over the batch (g2.rs:951-984 analog)."""
    return CURVE.to_affine(p, tw.fp2_batch_inv)


batch_normalize = to_affine


# ---------------------------------------------------------------------------
# Serialization (host-side)
# ---------------------------------------------------------------------------


def _fp2_bytes(a, batch) -> np.ndarray:
    """Fp2 -> 96 bytes: c1 || c0 (g2.rs:254-282)."""
    return np.concatenate(
        [fp.to_bytes_host(a[1]), fp.to_bytes_host(a[0])], axis=-1
    )


def to_compressed_host(aff) -> np.ndarray:
    x, y, inf = aff
    inf_np = np.asarray(inf)
    batch = inf_np.shape
    m = jnp.asarray(inf_np)
    xb = _fp2_bytes(tw.fp2_select(m, tw.fp2_zero(batch), x), batch)
    sort = np.asarray(tw.fp2_lexicographically_largest(y)) & ~inf_np
    out = xb.copy()
    out[..., 0] |= 0b1000_0000
    out[..., 0] |= np.where(inf_np, 0b0100_0000, 0).astype(np.uint8)
    out[..., 0] |= np.where(sort, 0b0010_0000, 0).astype(np.uint8)
    return out


def to_uncompressed_host(aff) -> np.ndarray:
    x, y, inf = aff
    inf_np = np.asarray(inf)
    batch = inf_np.shape
    m = jnp.asarray(inf_np)
    xb = _fp2_bytes(tw.fp2_select(m, tw.fp2_zero(batch), x), batch)
    yb = _fp2_bytes(tw.fp2_select(m, tw.fp2_zero(batch), y), batch)
    out = np.concatenate([xb, yb], axis=-1)
    out[..., 0] |= np.where(inf_np, 0b0100_0000, 0).astype(np.uint8)
    return out


def _fp2_from_bytes(data):
    c1, ok1 = fp.from_bytes_host(data[..., :48])
    c0, ok0 = fp.from_bytes_host(data[..., 48:96])
    return (c0, c1), ok0 & ok1


@functools.partial(jax.jit, static_argnames=("check_subgroup",))
def _decompress_device(x, inf, sort, check_subgroup: bool):
    """Device half of decompression in ONE graph (see g1._decompress_device;
    eager field ops would pay a tunnel round-trip per op)."""
    batch = inf.shape
    rhs = tw.fp2_add(
        tw.fp2_mul(tw.fp2_sqr(x), x), tw.fp2_const(params.B_G2, batch)
    )
    y, on_curve = tw.fp2_sqrt(rhs)
    flip = tw.fp2_lexicographically_largest(y) != sort
    y = tw.fp2_select(flip, tw.fp2_neg(y), y)
    aff = (
        tw.fp2_select(inf, tw.fp2_zero(batch), x),
        tw.fp2_select(inf, tw.fp2_one(batch), y),
        inf,
    )
    tf = (
        is_torsion_free(from_affine(aff))
        if check_subgroup
        else jnp.ones(batch, dtype=bool)
    )
    return aff, on_curve, tw.fp2_is_zero(x), tf


def from_compressed_host(data: np.ndarray, check_subgroup: bool = True):
    data = np.asarray(data, dtype=np.uint8)
    comp = (data[..., 0] >> 7) & 1
    inf = ((data[..., 0] >> 6) & 1).astype(bool)
    sort = ((data[..., 0] >> 5) & 1).astype(bool)
    body = data.copy()
    body[..., 0] &= 0b0001_1111
    x, x_ok = _fp2_from_bytes(body[..., :96])
    aff, on_curve, x_is_zero, tf = _decompress_device(
        x, jnp.asarray(inf), jnp.asarray(sort), check_subgroup
    )
    valid = (comp == 1) & x_ok
    valid &= ~inf | (np.asarray(x_is_zero) & ~sort)
    valid &= inf | np.asarray(on_curve)
    if check_subgroup:
        valid &= np.asarray(tf) | inf
    return aff, valid


@functools.partial(jax.jit, static_argnames=("check",))
def _from_uncompressed_device(x, y, inf, check: bool):
    batch = inf.shape
    zeros = tw.fp2_is_zero(x) & tw.fp2_is_zero(y)
    aff = (
        tw.fp2_select(inf, tw.fp2_zero(batch), x),
        tw.fp2_select(inf, tw.fp2_one(batch), y),
        inf,
    )
    if check:
        proj = from_affine(aff)
        ok = is_on_curve(proj) & (is_torsion_free(proj) | inf)
    else:
        ok = jnp.ones(batch, dtype=bool)
    return aff, zeros, ok


def from_uncompressed_host(data: np.ndarray, check: bool = True):
    data = np.asarray(data, dtype=np.uint8)
    comp = (data[..., 0] >> 7) & 1
    inf = ((data[..., 0] >> 6) & 1).astype(bool)
    sort = ((data[..., 0] >> 5) & 1).astype(bool)
    body = data[..., :96].copy()
    body[..., 0] &= 0b0001_1111
    x, x_ok = _fp2_from_bytes(body)
    y, y_ok = _fp2_from_bytes(data[..., 96:192])
    aff, zeros, ok = _from_uncompressed_device(x, y, jnp.asarray(inf), check)
    valid = (comp == 0) & ~sort & x_ok & y_ok
    valid &= ~inf | np.asarray(zeros)
    valid &= np.asarray(ok)
    return aff, valid
