"""Batched base field Fp (381-bit) on device.

TPU-native counterpart of reference src/fp.rs: 24x16-bit limbs in uint32,
Montgomery form with R = 2^384 (identical domain to the reference's, fp.rs:13).
Byte codecs are big-endian 48-byte, matching fp.rs:179-227.
"""

from __future__ import annotations

import numpy as np

from .. import limbs, params
from ..limbs import FP

# re-exported primitive ops bound to the Fp spec
add = lambda a, b: limbs.add(FP, a, b)  # noqa: E731
sub = lambda a, b: limbs.sub(FP, a, b)  # noqa: E731
neg = lambda a: limbs.neg(FP, a)  # noqa: E731
mul = lambda a, b: limbs.mont_mul(FP, a, b)  # noqa: E731
sqr = lambda a: limbs.mont_sqr(FP, a)  # noqa: E731
sop = lambda pairs: limbs.sum_of_products(FP, pairs)  # noqa: E731
sop_fold = lambda groups: limbs.sop_fold(FP, groups)  # noqa: E731
mul_many = lambda pairs: limbs.mul_many(FP, pairs)  # noqa: E731
add_many = lambda pairs: limbs.add_many(FP, pairs)  # noqa: E731
sub_many = lambda pairs: limbs.sub_many(FP, pairs)  # noqa: E731
select = limbs.select
is_zero = limbs.is_zero
eq = limbs.eq
sgn0 = limbs.sgn0

zero = lambda batch=(): limbs.zero(FP, batch)  # noqa: E731
one = lambda batch=(): limbs.one(FP, batch)  # noqa: E731
const = lambda v, batch=(): limbs.const(FP, v, batch)  # noqa: E731
from_ints = lambda v, to_mont=True: limbs.from_ints(FP, v, to_mont)  # noqa: E731
to_ints = lambda a, from_mont=True: limbs.to_ints(FP, a, from_mont)  # noqa: E731


def inv(a):
    """a^(p-2); 0 maps to 0 (reference fp.rs:346 returns CtOption; callers
    mask)."""
    return limbs.pow_fixed(FP, a, params.P - 2)


def pow(a, exp_limbs):
    """a^e with a runtime exponent tensor (ff::Field::pow analog; see
    limbs.pow_runtime).  For static public exponents use limbs.pow_fixed —
    its windowed schedule is ~4x fewer multiplies."""
    return limbs.pow_runtime(FP, a, exp_limbs)


def batch_inv(a):
    """Elementwise inverse amortized over the last batch axis (the batched
    analog of the reference's batch_normalize trick, g1.rs:806-839)."""
    return limbs.batch_inv(FP, a)


def sqrt(a):
    """Candidate square root a^((p+1)/4) plus an is-square mask.

    Returns (root, ok) where ok[b] is True iff root^2 == a (fp.rs:324-343).
    """
    cand = limbs.pow_fixed(FP, a, (params.P + 1) // 4)
    ok = limbs.eq(limbs.mont_sqr(FP, cand), a)
    return cand, ok


def lexicographically_largest(a):
    """a > (p-1)/2 on the canonical value (fp.rs:273-297)."""
    return limbs.gt_half(FP, limbs.from_mont(FP, a))


def sgn0_mont(a):
    """Parity of the canonical value of a Montgomery-form element."""
    return limbs.sgn0(limbs.from_mont(FP, a))


def pow_fixed(a, e: int):
    return limbs.pow_fixed(FP, a, e)


def from_okm(okm):
    """Device hash_to_field element from 64 OKM bytes (map_g1.rs:506-532).

    okm: [*batch, 64] uint8 big-endian.  The 512-bit value d0*2^256 + d1
    (d0 = first 32 bytes) is reduced with two Montgomery products:
    M(v) = mont_mul(lo, R^2) + mont_mul(hi, R^2) * M(2^384), where
    v = hi*2^384 + lo in raw limb form (both factors < R, so the kernel
    bounds hold for non-canonical inputs).
    """
    import jax.numpy as jnp

    rev = okm[..., ::-1].astype(jnp.uint32)  # little-endian bytes
    limbs512 = jnp.stack(
        [rev[..., 2 * k] | (rev[..., 2 * k + 1] << jnp.uint32(8))
         for k in range(32)]
    )  # [32, *batch]
    batch = limbs512.shape[1:]
    lo = limbs512[: FP.n_limbs]
    hi = jnp.concatenate(
        [limbs512[FP.n_limbs :],
         jnp.zeros((2 * FP.n_limbs - 32,) + batch, jnp.uint32)]
    )
    r2 = limbs._bcast(FP.r2_limbs, lo)
    lo_m = limbs.mont_mul(FP, lo, r2)
    hi_m = limbs.mont_mul(FP, hi, r2)
    shift = const(1 << 384, batch)  # M(2^384)
    return add(limbs.mont_mul(FP, hi_m, shift), lo_m)


# ---------------------------------------------------------------------------
# Byte codecs (host-side, numpy): 48-byte big-endian
# ---------------------------------------------------------------------------


def to_bytes_host(a) -> np.ndarray:
    """[L, *batch] Montgomery -> uint8[*batch, 48] big-endian canonical."""
    canon = np.asarray(limbs.from_mont(FP, a))  # [L, *batch] canonical limbs
    batch = canon.shape[1:]
    # limb i supplies bytes 2i (lo) and 2i+1 (hi) of the little-endian byte
    # string; the big-endian output reverses that.
    out = np.zeros(batch + (48,), dtype=np.uint8)
    for i in range(FP.n_limbs):
        out[..., 47 - 2 * i] = canon[i] & 0xFF
        out[..., 46 - 2 * i] = (canon[i] >> 8) & 0xFF
    return out


def from_bytes_host(data: np.ndarray):
    """uint8[*batch, 48] big-endian -> ([L, *batch] Montgomery, valid mask)."""
    data = np.asarray(data, dtype=np.uint8)
    batch = data.shape[:-1]
    canon = np.zeros((FP.n_limbs,) + batch, dtype=np.uint32)
    for i in range(FP.n_limbs):
        canon[i] = data[..., 47 - 2 * i].astype(np.uint32) | (
            data[..., 46 - 2 * i].astype(np.uint32) << 8
        )
    # canonical check: value < p
    ok = np.asarray(limbs._sub_limbs(canon, limbs._bcast(FP.p_limbs, canon),
                                     FP.n_limbs)[1] != 0)
    return limbs.to_mont(FP, canon), ok
