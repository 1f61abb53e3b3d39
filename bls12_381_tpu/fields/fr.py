"""Batched scalar field Fq on device (reference src/scalar.rs).

16x16-bit limbs in uint32, Montgomery R = 2^256 (scalar.rs:20).  Byte codec is
little-endian 32-byte (scalar.rs:256-296 — opposite endianness from Fp!).
Carries the NTT constants: generator 7, S=32, 2^32-th root of unity
(scalar.rs:99-222).
"""

from __future__ import annotations

import numpy as np

from .. import limbs, params
from ..limbs import FR

add = lambda a, b: limbs.add(FR, a, b)  # noqa: E731
sub = lambda a, b: limbs.sub(FR, a, b)  # noqa: E731
neg = lambda a: limbs.neg(FR, a)  # noqa: E731
mul = lambda a, b: limbs.mont_mul(FR, a, b)  # noqa: E731
sqr = lambda a: limbs.mont_sqr(FR, a)  # noqa: E731
select = limbs.select
is_zero = limbs.is_zero
eq = limbs.eq

zero = lambda batch=(): limbs.zero(FR, batch)  # noqa: E731
one = lambda batch=(): limbs.one(FR, batch)  # noqa: E731
const = lambda v, batch=(): limbs.const(FR, v, batch)  # noqa: E731
from_ints = lambda v, to_mont=True: limbs.from_ints(FR, v, to_mont)  # noqa: E731
to_ints = lambda a, from_mont=True: limbs.to_ints(FR, a, from_mont)  # noqa: E731

GENERATOR = params.FR_GENERATOR
S = params.FR_S
ROOT_OF_UNITY = params.FR_ROOT_OF_UNITY


def inv(a):
    """a^(q-2); 0 maps to 0."""
    return limbs.pow_fixed(FR, a, params.Q - 2)


def pow_fixed(a, e: int):
    return limbs.pow_fixed(FR, a, e)


def root_of_unity_pow(k: int):
    """omega^k as a device constant (for NTT twiddle tables)."""
    return pow(ROOT_OF_UNITY, k, params.Q)


# ---------------------------------------------------------------------------
# Byte codecs (host-side): 32-byte little-endian
# ---------------------------------------------------------------------------


def to_bytes_host(a) -> np.ndarray:
    """[L, *batch] Montgomery -> uint8[*batch, 32] little-endian canonical."""
    canon = np.asarray(limbs.from_mont(FR, a))
    batch = canon.shape[1:]
    out = np.zeros(batch + (32,), dtype=np.uint8)
    for i in range(FR.n_limbs):
        out[..., 2 * i] = canon[i] & 0xFF
        out[..., 2 * i + 1] = (canon[i] >> 8) & 0xFF
    return out


def from_bytes_host(data: np.ndarray):
    """uint8[*batch, 32] LE -> ([L, *batch] Montgomery, valid mask)."""
    data = np.asarray(data, dtype=np.uint8)
    batch = data.shape[:-1]
    canon = np.zeros((FR.n_limbs,) + batch, dtype=np.uint32)
    for i in range(FR.n_limbs):
        canon[i] = data[..., 2 * i].astype(np.uint32) | (
            data[..., 2 * i + 1].astype(np.uint32) << 8
        )
    ok = np.asarray(
        limbs._sub_limbs(canon, limbs._bcast(FR.p_limbs, canon), FR.n_limbs)[1]
        != 0
    )
    return limbs.to_mont(FR, canon), ok


def from_bytes_wide_host(data: np.ndarray):
    """uint8[*batch, 64] LE -> Montgomery form, reduced (scalar.rs:300-331)."""
    data = np.asarray(data, dtype=np.uint8)
    batch = data.shape[:-1]
    flat = data.reshape(-1, 64)
    out = np.empty(flat.shape[0], dtype=object)
    for i, row in enumerate(flat):
        out[i] = int.from_bytes(bytes(row.tolist()), "little") % params.Q
    return from_ints(out.reshape(batch) if batch else out[0])
