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
# scalar.rs:183-222 constant parity (canonical ints; Montgomery-encode with
# fr.const when needed on device)
TWO_INV = pow(2, params.Q - 2, params.Q)
ROOT_OF_UNITY_INV = pow(ROOT_OF_UNITY, params.Q - 2, params.Q)
DELTA = pow(GENERATOR, 1 << S, params.Q)  # generator of the order-t group


def inv(a):
    """a^(q-2); 0 maps to 0."""
    return limbs.pow_fixed(FR, a, params.Q - 2)


# the runtime-exponent device `pow` below shadows the builtin in this
# module's globals; integer constant derivations must use the builtin
_int_pow = pow


def pow(a, exp_limbs):
    """a^e with a runtime exponent tensor — `ff::Field::pow` parity
    (reference scalar.rs:373-390).  exp_limbs: canonical limb rows, e.g.
    `limbs.from_mont(FR, s)` for an Fr-valued exponent."""
    return limbs.pow_runtime(FR, a, exp_limbs)


def batch_inv(a):
    """Product-tree amortized elementwise inverse (g1.rs:806-839 analog)."""
    return limbs.batch_inv(FR, a)


def butterfly(a, b, w):
    """Fused NTT butterfly (a + b*w, a - b*w) mod q.

    Routes to a single Pallas VMEM pass on TPU (one kernel instead of a
    mul + add + sub chain of carry networks); bit-exact jnp fallback."""
    if limbs._use_pallas():
        import jax.numpy as jnp
        import numpy as np

        from ..kernels import pallas_mont

        batch = a.shape[1:]
        full = (FR.n_limbs,) + tuple(
            jnp.broadcast_shapes(batch, b.shape[1:], w.shape[1:])
        )
        flat = int(np.prod(full[1:])) if len(full) > 1 else 1
        out = pallas_mont.butterfly_pallas(
            jnp.broadcast_to(a, full).reshape(FR.n_limbs, flat),
            jnp.broadcast_to(b, full).reshape(FR.n_limbs, flat),
            jnp.broadcast_to(w, full).reshape(FR.n_limbs, flat),
            n_limbs=FR.n_limbs,
            inv16=FR.inv16,
            p_limbs=tuple(int(x) for x in FR.p_limbs),
        )
        out = out.reshape((2,) + full)
        return out[0], out[1]
    t = mul(b, w)
    return add(a, t), sub(a, t)


def sqrt(a):
    """Batched Tonelli-Shanks square root on device (reference Scalar::sqrt,
    scalar.rs:670-681, via ff's constant-schedule helper).

    Returns (root, ok) with ok False for quadratic non-residues; the root is
    the deterministic Tonelli-Shanks root (validated against the host oracle
    in tests).  Constant schedule: after w = a^((t-1)/2), x = a*w, b = a^t
    lies in the 2^S-order subgroup <omega>; the discrete log e of b is
    extracted bit-by-bit (Pohlig-Hellman in a 2-group: 496 batched squarings
    for S = 32), and root = x * omega^(-e/2).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    S = params.FR_S  # 32
    t = (params.Q - 1) >> S
    batch = a.shape[1:]
    w = pow_fixed(a, (t - 1) // 2)
    x = mul(a, w)  # a^((t+1)/2)
    b = mul(x, w)  # a^t = omega^e for QRs (omega = ROOT_OF_UNITY, order 2^S)
    root_inv = _int_pow(params.FR_ROOT_OF_UNITY, params.Q - 2, params.Q)

    one_b = one(batch)
    # per-k constants: omega^(-2^k) (dlog bit clear) and omega^(-2^(k-1))
    # (half-exponent factor; unused for k = 0)
    c_tab = jnp.stack(
        [
            np.asarray(const(_int_pow(root_inv, 1 << k, params.Q)))
            for k in range(S)
        ]
    )  # [S, L]
    h_tab = jnp.stack(
        [
            np.asarray(const(_int_pow(root_inv, 1 << max(k - 1, 0),
                                      params.Q)))
            for k in range(S)
        ]
    )

    def bcast_const(row):
        return jnp.broadcast_to(
            row.reshape((FR.n_limbs,) + (1,) * len(batch)),
            (FR.n_limbs,) + tuple(batch),
        )

    def outer(carry, xs):
        acc, half, is_qr, any_bit = carry
        c_row, h_row, k = xs
        # tk = acc^(2^(S-1-k)) via S-1 masked squarings (uniform body)
        def inner(tk, j):
            sq = sqr(tk)
            return select(jnp.broadcast_to(j < S - 1 - k, batch), sq, tk), None

        tk, _ = jax.lax.scan(inner, acc, jnp.arange(S - 1))
        bit = ~eq(tk, one_b)
        acc = select(bit, mul(acc, bcast_const(c_row)), acc)
        is_first = k == 0
        is_qr = jnp.where(
            jnp.broadcast_to(is_first, batch), ~bit, is_qr
        )
        upd = bit & jnp.broadcast_to(~is_first, batch)
        half = select(upd, mul(half, bcast_const(h_row)), half)
        return (acc, half, is_qr, any_bit | bit), None

    init = (b, one_b, jnp.ones(batch, dtype=bool),
            jnp.zeros(batch, dtype=bool))
    (acc, half, is_qr, any_bit), _ = jax.lax.scan(
        outer, init, (c_tab, h_tab, jnp.arange(S))
    )
    root = mul(x, half)
    # match the reference's ff::sqrt_tonelli_shanks root exactly: the classic
    # T-S correction lands on -x*omega^(-e/2) whenever e != 0 (empirically
    # characterized and pinned by tests vs the host oracle)
    root = select(any_bit, neg(root), root)
    a_zero = is_zero(a)
    root = select(a_zero, zero(batch), root)
    ok = (is_qr & eq(sqr(root), a)) | a_zero
    return root, ok


def _bytes_to_limbs_le(data):
    """uint8 [*batch, 2K] little-endian -> raw [K, *batch] 16-bit limbs."""
    import jax.numpy as jnp

    d = jnp.asarray(data).astype(jnp.uint32)
    limbs16 = d[..., 0::2] | (d[..., 1::2] << 8)  # [*batch, K]
    return jnp.moveaxis(limbs16, -1, 0)


def from_bytes_wide(data):
    """uint8 [*batch, 64] LE -> Montgomery Fr, reduced mod q — batched ON
    DEVICE (reference scalar.rs:300-331: d0*R^2 + d1*R^3 folded by two
    Montgomery products)."""
    import jax.numpy as jnp

    d = jnp.asarray(data)
    lo = _bytes_to_limbs_le(d[..., :32])
    hi = _bytes_to_limbs_le(d[..., 32:])
    return limbs.wide_reduce(FR, lo, hi)


def from_okm(okm):
    """48-byte big-endian OKM blocks -> Fr, batched on device (reference
    map_scalar.rs:10-23: zero-pad to 64 bytes, reverse to LE, wide-reduce)."""
    import jax.numpy as jnp

    d = jnp.asarray(okm)[..., ::-1]  # BE -> LE
    pad = jnp.zeros(d.shape[:-1] + (16,), dtype=d.dtype)
    return from_bytes_wide(jnp.concatenate([d, pad], axis=-1))


def pow_fixed(a, e: int):
    return limbs.pow_fixed(FR, a, e)


def root_of_unity_pow(k: int):
    """omega^k as a device constant (for NTT twiddle tables)."""
    return _int_pow(ROOT_OF_UNITY, k, params.Q)


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
