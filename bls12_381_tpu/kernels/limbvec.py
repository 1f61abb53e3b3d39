"""Vectorized in-kernel limb arithmetic for the Pallas TPU kernels.

The original kernels (pallas_mont / plan_exec) carried every multiprecision
value as a PYTHON LIST of per-limb [bb] registers, emitting one jnp op bind
per limb per step — a 384-bit sum-of-products cost ~6k binds and a fused
Miller-step plan ~380k, so CLIENT-SIDE TRACING (not XLA compile, not
execution) took minutes per graph and no persistent cache could help
(tracing precedes the cache-key computation).  This module represents a
value as ONE array [..., n_limbs, bb] (limb = sublane axis, batch = lane
axis, any leading axes vectorize independent values) and vectorizes every
step:

  * carries/borrows: Kogge-Stone carry-lookahead over the limb axis
    (log-depth pad-shifts) instead of a Python ripple loop
  * schoolbook columns: per-shift pad-adds of whole [l12, bb] rows, with
    the term axis folded by an int32 tree reduction
  * Montgomery rounds: one [l12, bb] update per round instead of l12
    per-limb updates

Mosaic constraints honored (probed on-device): shifted adds via jnp.pad
(no scatter/.at[].add), no zero-size slices, no unsigned reductions (the
term fold casts to int32 — values sign-safe, see per-function bounds).

The arithmetic is bit-identical to the list-based kernels: same radix, same
lazy-column bounds, same conditional subtracts (see pallas_mont.py for the
bound analysis).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

M16 = np.uint32(0xFFFF)
M12 = np.uint32(0xFFF)


def _up(x, d: int):
    """Shift rows toward higher limb indices along axis -2:
    out[..., i, :] = x[..., i-d, :], zero-fill."""
    pad = [(0, 0)] * (x.ndim - 2) + [(d, 0), (0, 0)]
    return jnp.pad(x[..., : x.shape[-2] - d, :], pad)


def _pad_rows(x, lo: int, hi: int):
    """Zero-pad axis -2 by (lo, hi)."""
    pad = [(0, 0)] * (x.ndim - 2) + [(lo, hi), (0, 0)]
    return jnp.pad(x, pad)


def _ks(g, p):
    """Kogge-Stone prefix over the limb axis (-2): out[..., i, :] = 1 iff a
    carry (borrow) comes OUT of limb i, given per-limb generate g and
    propagate p (uint32 0/1 rows)."""
    d = 1
    n = g.shape[-2]
    while d < n:
        g = g | (p & _up(g, d))
        p = p & _up(p, d)
        d *= 2
    return g


def resolve_carries_16(s):
    """s: [..., L, bb] per-limb sums < 2^17.  Returns (limbs, carry_out)
    where limbs = the carry-propagated 16-bit rows and carry_out[..., i, :]
    is the carry out of limb i (index -1 = the 16L-bit overflow bit)."""
    g = s >> np.uint32(16)
    p = ((s & M16) + np.uint32(1)) >> np.uint32(16)  # low16 == 0xFFFF
    c = _ks(g, p)
    return (s + _up(c, 1)) & M16, c


def sub_const_borrow_16(a, p16c):
    """a - p over 16-bit rows (p16c: [L, 1] uint32 constant).  Returns
    (diff_rows, borrow_out) with borrow_out[..., -1, :] = 1 iff a < p."""
    u = a + (np.uint32(1 << 16) - p16c)
    g = np.uint32(1) - (u >> np.uint32(16))
    p = (np.uint32(1 << 16) - (u & M16)) >> np.uint32(16)  # low16 == 0
    b = _ks(g, p)
    return (u - _up(b, 1)) & M16, b


def mod_add_16(a, b, p16c):
    """Canonical (a + b) mod p over [..., L, bb] 16-bit rows (inputs < p)."""
    limbs, c = resolve_carries_16(a + b)
    diff, br = sub_const_borrow_16(limbs, p16c)
    take = (c[..., -1:, :] != 0) | (br[..., -1:, :] == 0)
    return jnp.where(take, diff, limbs)


def const_minus_16(p16c, b):
    """p - b over 16-bit rows (b canonical < p)."""
    u = p16c + (np.uint32(1 << 16) - b)
    g = np.uint32(1) - (u >> np.uint32(16))
    p = (np.uint32(1 << 16) - (u & M16)) >> np.uint32(16)
    br = _ks(g, p)
    return (u - _up(br, 1)) & M16


def mod_sub_16(a, b, p16c):
    """Canonical (a - b) mod p: a + (p - b), then conditional subtract."""
    return mod_add_16(a, const_minus_16(p16c, b), p16c)


def mod_neg_16(a, p16c):
    """Canonical (-a) mod p == (p - a) mod p; a == 0 must map to 0."""
    pb = const_minus_16(p16c, a)
    diff, br = sub_const_borrow_16(pb, p16c)
    return jnp.where(br[..., -1:, :] == 0, diff, pb)


# ---------------------------------------------------------------------------
# radix 16 <-> 12 repacking (vectorized over any leading axes)
# ---------------------------------------------------------------------------


def repack_16_to_12(x, l12: int):
    """[..., L16, bb] canonical 16-bit rows -> [..., l12, bb] 12-bit rows.

    A 12-bit limb straddles at most two 16-bit rows (offsets cycle
    {0, 12, 8, 4}); each output row is two shifts and a mask.
    """
    L16 = x.shape[-2]
    outs = []
    for k in range(l12):
        bit = 12 * k
        i0, off = bit // 16, bit % 16
        v = x[..., i0, :]
        if off:
            v = v >> np.uint32(off)
        if off > 4 and i0 + 1 < L16:
            v = v | (x[..., i0 + 1, :] << np.uint32(16 - off))
        outs.append(v & M12)
    return jnp.stack(outs, axis=-2)


def repack_12_to_16(y, n16: int):
    """[..., l12, bb] 12-bit rows -> [..., n16, bb] 16-bit rows."""
    l12 = y.shape[-2]
    outs = []
    for i in range(n16):
        bit = 16 * i
        j0, off = bit // 12, bit % 12
        v = y[..., j0, :]
        if off:
            v = v >> np.uint32(off)
        if j0 + 1 < l12:
            v = v | (y[..., j0 + 1, :] << np.uint32(12 - off))
        outs.append(v & M16)
    return jnp.stack(outs, axis=-2)


# ---------------------------------------------------------------------------
# radix-12 schoolbook columns + Montgomery reduction
# ---------------------------------------------------------------------------


def sop_columns(a12, b12):
    """Lazy schoolbook columns of sum_t a12[..., t, :, :] * b12[..., t, :, :].

    a12, b12: [..., T, l12, bb] 12-bit rows.  Returns [..., 2*l12, bb]
    uint32 columns (index 2*l12-1 is headroom for the reduction).  Products
    are < 2^24 and a column absorbs <= (T+1) * l12 of them plus the
    reduction's — the caller must keep T <= 6 (pallas_mont bound analysis).

    The term axis folds through an int32 sum (Mosaic has no unsigned
    reductions; per-column partial sums are < T * 2^24 < 2^31, sign-safe).
    """
    t, l12 = a12.shape[-3], a12.shape[-2]
    ai = a12.astype(jnp.int32)
    bi = b12.astype(jnp.int32)
    shape = a12.shape[:-3] + (2 * l12,) + a12.shape[-1:]
    acc = jnp.zeros(shape, jnp.uint32)
    for i in range(l12):
        prod = ai[..., i : i + 1, :] * bi  # [..., T, l12, bb]
        rs = prod[..., 0, :, :] if t == 1 else jnp.sum(prod, axis=-3)
        acc = acc + _pad_rows(rs.astype(jnp.uint32), i, l12 - i)
    return acc


def sqr_columns(a12):
    """Lazy columns of a12^2 ([..., l12, bb]) with off-diagonal products
    computed once and doubled: column budget <= l12 + l12 (reduction), the
    T=1 bound."""
    l12 = a12.shape[-2]
    shape = a12.shape[:-2] + (2 * l12,) + a12.shape[-1:]
    acc = jnp.zeros(shape, jnp.uint32)
    for i in range(l12):
        tail = a12[..., i:, :]  # [..., l12 - i, bb]
        head = a12[..., i : i + 1, :]
        row = head * (tail + tail)  # doubled (products < 2^24: exact)
        sq = head * head
        # doubled diagonal overcounts a_i^2 once: subtract one copy
        if i < l12 - 1:
            row = jnp.concatenate(
                [row[..., :1, :] - sq, row[..., 1:, :]], axis=-2
            )
        else:
            row = row[..., :1, :] - sq
        acc = acc + _pad_rows(row, 2 * i, l12 - i)
    return acc


def mont_reduce_12(acc, inv12: int, p12c):
    """Montgomery rounds over 12-bit lazy columns.

    acc: [..., 2*l12, bb] uint32; p12c: [l12, 1] uint32 modulus rows.
    After round k, acc[..., k, :]'s low 12 bits are dead; its carry spills
    into k+1.  Returns acc with rows l12..2*l12-1 holding the
    (unpropagated) result columns.
    """
    l12 = p12c.shape[-2]
    inv = np.uint32(inv12)
    for k in range(l12):
        row_k = acc[..., k, :]
        m = (row_k * inv) & M12
        upd = m[..., None, :] * p12c  # [..., l12, bb]
        c0 = (row_k + upd[..., 0, :]) >> np.uint32(12)
        upd = upd + _pad_rows(c0[..., None, :], 1, l12 - 2)
        acc = acc + _pad_rows(upd, k, l12 - k)
    return acc


def finalize_12(acc, p12c, n16: int):
    """Carry-propagate columns l12..2*l12-1, conditionally subtract p,
    repack to n16 16-bit rows.  Column values < 2^32 with carries up to
    2^20: two vector normalization passes bring carries to <= 1, then a
    Kogge-Stone 1-bit chain finishes exactly."""
    l12 = p12c.shape[-2]
    v = acc[..., l12:, :]  # [..., l12, bb]
    for _ in range(2):
        v = (v & M12) + _up(v >> np.uint32(12), 1)
    # now v <= M12 + 2^8: one more split leaves 1-bit carries
    c = v >> np.uint32(12)
    s = v & M12
    p = (s + np.uint32(1)) >> np.uint32(12)  # s == M12 exactly
    cc = _ks(c, p)
    t_out = (s + _up(cc, 1)) & M12
    # conditional subtract p (value < 2p < 2^384: no top carry)
    u = t_out + (np.uint32(1 << 12) - p12c)
    gb = np.uint32(1) - (u >> np.uint32(12))
    pb = (np.uint32(1 << 12) - (u & M12)) >> np.uint32(12)
    b = _ks(gb, pb)
    diff = (u - _up(b, 1)) & M12
    res = jnp.where(b[..., -1:, :] == 0, diff, t_out)
    return repack_12_to_16(res, n16)


def mont_sop_12(a12, b12, inv12: int, p12c, n16: int):
    """Full radix-12 Montgomery sum-of-products: [..., T, l12, bb] x2 ->
    [..., n16, bb] canonical 16-bit rows."""
    acc = sop_columns(a12, b12)
    acc = mont_reduce_12(acc, inv12, p12c)
    return finalize_12(acc, p12c, n16)


# ---------------------------------------------------------------------------
# 16-bit Montgomery product (any modulus width; Fr's 256-bit NTT path)
# ---------------------------------------------------------------------------


def mont_sop_16(a, b, inv16: int, p16c):
    """Canonical Montgomery sum-of-products over 16-bit rows:
    a, b [..., T, L, bb] -> [..., L, bb].

    Schoolbook with lazy lo/hi column splitting (the 16-bit register-kernel
    pipeline, vectorized): column values stay < 2^32 because each column
    absorbs <= 2*L*T 16-bit halves plus the reduction's (see limbs.py);
    the term fold sums in int32 (split halves < 2^16, T <= 8, sign-safe).
    """
    t, L = a.shape[-3], a.shape[-2]
    ai = a.astype(jnp.int32)
    bi = b.astype(jnp.int32)
    m16i = jnp.int32(0xFFFF)
    shape = a.shape[:-3] + (2 * L + 1,) + a.shape[-1:]
    acc = jnp.zeros(shape, jnp.uint32)
    for i in range(L):
        prod = ai[..., i : i + 1, :] * bi  # [..., T, L, bb] wraps int32 ==
        lo = prod & m16i                   # uint32 bit-exactly
        hi = (prod >> jnp.int32(16)) & m16i
        if t > 1:
            lo = jnp.sum(lo, axis=-3, keepdims=True)
            hi = jnp.sum(hi, axis=-3, keepdims=True)
        lo = lo[..., 0, :, :].astype(jnp.uint32)
        hi = hi[..., 0, :, :].astype(jnp.uint32)
        acc = acc + _pad_rows(lo, i, L + 1 - i)
        acc = acc + _pad_rows(hi, i + 1, L - i)
    inv = np.uint32(inv16)
    for k in range(L):
        row_k = acc[..., k, :]
        m = (row_k * inv) & M16
        mp = m[..., None, :] * p16c  # [..., L, bb]
        lo = mp & M16
        hi = mp >> np.uint32(16)
        c0 = (row_k + lo[..., 0, :]) >> np.uint32(16)
        tail = _pad_rows(lo, 0, 1) + _pad_rows(
            hi + _pad_rows(c0[..., None, :], 0, L - 1), 1, 0
        )  # [..., L+1, bb]: lo at offset 0, hi (+ spill) at offset 1
        acc = acc + _pad_rows(tail, k, L - k)
    # propagate columns L..2L (values < 2^32, carries < 2^16): two vector
    # passes then an exact 1-bit Kogge-Stone chain
    v = acc[..., L:, :]
    for _ in range(2):
        v = (v & M16) + _up(v >> np.uint32(16), 1)
    c = v >> np.uint32(16)
    s = v & M16
    cc = _ks(c, (s + np.uint32(1)) >> np.uint32(16))
    t_out = (s + _up(cc, 1)) & M16  # [..., L+1, bb], value < 2p
    padded_p = _pad_rows(p16c, 0, 1)
    diff, br = sub_const_borrow_16(t_out, padded_p)
    res = jnp.where(br[..., -1:, :] == 0, diff, t_out)
    return res[..., :L, :]


def mont_mul_16(a, b, inv16: int, p16c):
    """Canonical Montgomery product over 16-bit rows: a, b [..., L, bb]."""
    return mont_sop_16(a[..., None, :, :], b[..., None, :, :], inv16, p16c)
