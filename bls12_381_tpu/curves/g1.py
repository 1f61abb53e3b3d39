"""Batched G1: E(Fp): y^2 = x^3 + 4 (reference src/g1.rs).

Points are pytrees of Fp limb tensors: projective (x, y, z), affine
(x, y, inf_mask).  Serialization is host-side numpy (48/96-byte, 3 flag
bits — reference notes/serialization.rs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import hostmath as hm
from .. import params
from ..fields import fp, fr
from ..limbs import FR
from .weierstrass import FieldFns, Weierstrass

def _mul_b3(x):
    """12*x by additions (3*b with b = 4; the mul_by_3b trick, g1.rs:596)."""
    x2 = fp.add(x, x)
    x4 = fp.add(x2, x2)
    x8 = fp.add(x4, x4)
    return fp.add(x8, x4)


def _fused(plan_name, comps):
    """Route one whole group operation through an expression-plan Pallas
    kernel (kernels/plan_exec.py) when enabled; None falls back."""
    from ..kernels import plan_exec as pe

    if not pe.enabled():
        return None
    # config.plan_variant: "scalar" (per-limb registers, ~2x ALU
    # throughput) by default; graphs that instantiate the group law at
    # many distinct shapes (MSM bucket scans) scope it to "vector" so
    # client-side tracing stays bounded (see plan_exec)
    from .. import config

    o = pe.run_plan(getattr(pe, plan_name)(), comps,
                    variant=config.get().plan_variant)
    return (o[0], o[1], o[2])


_FNS = FieldFns(
    add=fp.add,
    sub=fp.sub,
    neg=fp.neg,
    mul=fp.mul,
    sqr=fp.sqr,
    mul_many=fp.mul_many,
    mul_b3=_mul_b3,
    select=fp.select,
    eq=fp.eq,
    is_zero=fp.is_zero,
    zero=fp.zero,
    one=fp.one,
    b=lambda batch: fp.const(params.B_G1, batch),
    batch_of=lambda x: x.shape[1:],
    add_many=fp.add_many,
    sub_many=fp.sub_many,
    b3c=lambda batch: fp.const(3 * params.B_G1, batch),
    b3c9=lambda batch: fp.const(9 * params.B_G1, batch),
    fused_add=lambda p, q: _fused("g1_add_plan", list(p) + list(q)),
    fused_double=lambda p: _fused("g1_double_plan", list(p)),
    fused_add_mixed=lambda p, xy: _fused(
        "g1_add_mixed_plan", list(p) + list(xy)),
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

# endomorphism constant: cube root of unity with phi(P) = -[z^2]P (g1.rs:421)
BETA = hm._compute_beta()


def generator(batch=()):
    gx, gy = params.G1_GEN
    return (fp.const(gx, batch), fp.const(gy, batch), fp.one(batch))


def generator_affine(batch=()):
    gx, gy = params.G1_GEN
    return (
        fp.const(gx, batch),
        fp.const(gy, batch),
        jnp.zeros(batch, dtype=bool),
    )


@jax.jit
def scalar_mul(p, scalars_mont):
    """[s]P via the GLV endomorphism split (beyond-reference optimization).

    phi(x:y:z) = (beta*x : y : z) acts as multiplication by -z^2 on the
    subgroup (g1.rs:401-410), so s = k1 + k2*z^2 (a 255-bit division by the
    public constant z^2) lets [s]P = [k1]P + [k2](-phi(P)) run with shared
    doublings over two ~128-bit mini-scalars: 128 doublings instead of 255.

    Valid for points in the prime-order subgroup (where Fr scalars act);
    use scalar_mul_generic for arbitrary curve points.
    """
    from .. import config, limbs

    zsq = params.BLS_X ** 2  # z^2 (positive, ~2^127.3)
    canon = limbs.from_mont(FR, scalars_mont)  # [16, *batch]
    k2, k1 = limbs.barrett_divmod(canon, zsq, 9)

    # [zsq]P = -phi(P) = (beta*x : -y : z)
    batch = p[0].shape[1:]
    beta = fp.const(BETA, batch)
    p2 = (fp.mul(beta, p[0]), fp.neg(p[1]), p[2])
    lookup = config.get().smul_lookup
    if lookup == "unsigned":
        d1 = limbs.digits4_msb(k1, 128)
        d2 = limbs.digits4_msb(k2, 128)
        return CURVE.multi_scalar_mul_windowed([p, p2], [d1, d2])
    return CURVE.multi_scalar_mul_signed(
        [p, p2],
        [limbs.signed_digits_msb(k1, 128), limbs.signed_digits_msb(k2, 128)],
        lookup=lookup,
    )


@jax.jit
def scalar_mul_generic(p, scalars_mont):
    """[s]P by plain 4-bit windows (g1.rs:754-774 semantics: multiplies by
    the canonical integer < q, valid for ANY curve point)."""
    return CURVE.scalar_mul_windowed(p, fr_digits4_msb(scalars_mont))


def fr_bits_msb(scalars_mont):
    """Montgomery Fr [16, *batch] -> [255, *batch] bool bits, MSB first."""
    from .. import limbs

    canon = limbs.from_mont(FR, scalars_mont)
    rows = []
    for j in range(254, -1, -1):
        rows.append(((canon[j // 16] >> (j % 16)) & 1) != 0)
    return jnp.stack(rows)


def fr_digits4_msb(scalars_mont):
    """Montgomery Fr [16, *batch] -> [64, *batch] int32 4-bit digits, MSB
    first (each 16-bit limb holds four aligned digits)."""
    from .. import limbs

    canon = limbs.from_mont(FR, scalars_mont)
    rows = []
    for d in range(63, -1, -1):
        rows.append(((canon[d // 4] >> (4 * (d % 4))) & 15).astype(jnp.int32))
    return jnp.stack(rows)


@jax.jit
def mul_by_x(p):
    """[|z|]P with the fixed public BLS parameter schedule (g1.rs:777-795
    semantics, sign handled by callers)."""
    return CURVE.mul_by_const(p, params.BLS_X)


@jax.jit
def clear_cofactor(p):
    """[1 - z]P = [1 + |z|]P (ia.cr/2019/403; g1.rs:800-802)."""
    return CURVE.mul_by_const(p, params.H_EFF_G1)


@jax.jit
def is_torsion_free(p):
    """phi(P) == -[z^2]P with phi(x:y:z) = (beta x : y : z)
    (ePrint 2021/1130 §6; g1.rs:401-410)."""
    batch = p[0].shape[1:]
    beta = fp.const(BETA, batch)
    phi = (fp.mul(beta, p[0]), p[1], p[2])
    zsq = CURVE.mul_by_const(CURVE.mul_by_const(p, params.BLS_X), params.BLS_X)
    return CURVE.eq(phi, CURVE.neg(zsq))


@jax.jit
def to_affine(p):
    """Projective -> affine; the z-inversion is amortized over the batch via
    the log-depth product tree (the reference's batch_normalize Montgomery
    trick, g1.rs:806-839, redesigned batch-first)."""
    return CURVE.to_affine(p, fp.batch_inv)


batch_normalize = to_affine  # one name per reference (g1.rs:806-839)


# ---------------------------------------------------------------------------
# Serialization (host-side; bit-exact vs notes/serialization.rs)
# ---------------------------------------------------------------------------


def to_compressed_host(aff) -> np.ndarray:
    """Affine batch -> uint8[*batch, 48]."""
    x, y, inf = aff
    inf_np = np.asarray(inf)
    batch = inf_np.shape
    xbytes = fp.to_bytes_host(fp.select(jnp.asarray(inf_np), fp.zero(batch), x))
    sort = np.asarray(fp.lexicographically_largest(y)) & ~inf_np
    out = xbytes.copy()
    out[..., 0] |= 0b1000_0000
    out[..., 0] |= np.where(inf_np, 0b0100_0000, 0).astype(np.uint8)
    out[..., 0] |= np.where(sort, 0b0010_0000, 0).astype(np.uint8)
    return out


def to_uncompressed_host(aff) -> np.ndarray:
    x, y, inf = aff
    inf_np = np.asarray(inf)
    batch = inf_np.shape
    m = jnp.asarray(inf_np)
    xb = fp.to_bytes_host(fp.select(m, fp.zero(batch), x))
    yb = fp.to_bytes_host(fp.select(m, fp.zero(batch), y))
    out = np.concatenate([xb, yb], axis=-1)
    out[..., 0] |= np.where(inf_np, 0b0100_0000, 0).astype(np.uint8)
    return out


@functools.partial(jax.jit, static_argnames=("check_subgroup",))
def _decompress_device(x, inf, sort, check_subgroup: bool):
    """Device half of decompression in ONE graph (eager field ops would pay
    a tunnel round-trip per op): sqrt-based y recovery, sign select, identity
    masking, and (optionally) the endomorphism subgroup check."""
    batch = inf.shape
    # y^2 = x^3 + 4
    rhs = fp.add(fp.mul(fp.sqr(x), x), fp.const(params.B_G1, batch))
    y, on_curve = fp.sqrt(rhs)
    flip = fp.lexicographically_largest(y) != sort
    y = fp.select(flip, fp.neg(y), y)
    aff = (
        fp.select(inf, fp.zero(batch), x),
        fp.select(inf, fp.one(batch), y),
        inf,
    )
    tf = (
        is_torsion_free(from_affine(aff))
        if check_subgroup
        else jnp.ones(batch, dtype=bool)
    )
    return aff, on_curve, fp.is_zero(x), tf


def from_compressed_host(data: np.ndarray, check_subgroup: bool = True):
    """uint8[*batch, 48] -> (affine point batch, valid mask).

    Invalid entries are masked (valid=False) rather than raised — the batched
    analog of the reference's CtOption (g1.rs:326-390).
    """
    data = np.asarray(data, dtype=np.uint8)
    comp = (data[..., 0] >> 7) & 1
    inf = ((data[..., 0] >> 6) & 1).astype(bool)
    sort = ((data[..., 0] >> 5) & 1).astype(bool)
    body = data.copy()
    body[..., 0] &= 0b0001_1111
    x, x_ok = fp.from_bytes_host(body)
    aff, on_curve, x_is_zero, tf = _decompress_device(
        x, jnp.asarray(inf), jnp.asarray(sort), check_subgroup
    )
    valid = (comp == 1) & x_ok
    # infinity: x must be 0, sort must be clear
    valid &= ~inf | (np.asarray(x_is_zero) & ~sort)
    valid &= inf | np.asarray(on_curve)
    if check_subgroup:
        valid &= np.asarray(tf) | inf
    return aff, valid


@functools.partial(jax.jit, static_argnames=("check",))
def _from_uncompressed_device(x, y, inf, check: bool):
    batch = inf.shape
    zeros = fp.is_zero(x) & fp.is_zero(y)
    aff = (
        fp.select(inf, fp.zero(batch), x),
        fp.select(inf, fp.one(batch), y),
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
    body = data[..., :48].copy()
    body[..., 0] &= 0b0001_1111
    x, x_ok = fp.from_bytes_host(body)
    y, y_ok = fp.from_bytes_host(data[..., 48:96])
    aff, zeros, ok = _from_uncompressed_device(x, y, jnp.asarray(inf), check)
    valid = (comp == 0) & ~sort & x_ok & y_ok
    valid &= ~inf | np.asarray(zeros)
    valid &= np.asarray(ok)
    return aff, valid
