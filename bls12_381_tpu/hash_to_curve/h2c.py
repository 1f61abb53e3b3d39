"""Batched hash-to-curve (draft-irtf-cfrg-hash-to-curve-16) on device.

Split exactly as the reference test plan anticipates (SURVEY.md §3.4):
message expansion (SHA-2/SHAKE over bytes) runs on host via hashlib —
hashing is byte-oriented and tiny; everything from field mapping onward
(SSWU, isogeny evaluation, cofactor clearing) is batched on device.

Reference anchors: src/hash_to_curve/{mod,expand_msg,map_g1,map_g2}.rs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import hostmath as hm
from .. import params
from ..curves import g1 as G1
from ..curves import g2 as G2
from ..fields import fp, tower as tw

# isogeny/SSWU constants (canonical ints extracted from reference data;
# draft-16 appendix E values)
_C = hm.ISO_CONSTS


# ---------------------------------------------------------------------------
# hash_to_field: expansion on host, arithmetic batched
# ---------------------------------------------------------------------------


def hash_to_field_fp(msgs, dst, count, expand=hm.expand_message_xmd, **kw):
    """msgs: list of bytes -> Fp batch [L, count, len(msgs)] (Montgomery)."""
    vals = []
    for msg in msgs:
        okm = expand(msg, dst, count * 64, **kw)
        vals.append([hm.fp_from_okm(okm[i * 64 : (i + 1) * 64]) for i in range(count)])
    arr = np.array(vals, dtype=object).T  # [count, n_msgs]
    return fp.from_ints(arr)


def _msgs_to_array(msgs):
    """Equal-length list of bytes -> [B, msg_len] uint8 (arrays — including
    traced ones — pass through)."""
    if hasattr(msgs, "shape"):
        return msgs
    lens = {len(m) for m in msgs}
    assert len(lens) == 1, "device expansion needs equal-length messages"
    return np.frombuffer(b"".join(msgs), dtype=np.uint8).reshape(len(msgs), -1)


def hash_to_field_fp_device(msgs, dst, count):
    """Fully-on-device hash_to_field: batched SHA-256 expansion + Montgomery
    from_okm.  msgs: equal-length list of bytes (or [B, len] uint8 array).
    Returns Fp batch [L, count, B]."""
    from ..kernels import sha256_jax

    arr = _msgs_to_array(msgs)
    okm = sha256_jax.expand_message_xmd_sha256(arr, dst, count * 64)
    okm = okm.reshape(arr.shape[0], count, 64)  # [B, count, 64]
    u = fp.from_okm(okm)  # [L, B, count]
    return jnp.moveaxis(u, -1, 1)  # [L, count, B]


def hash_to_field_fp2_device(msgs, dst, count):
    """Device hash_to_field over Fp2 (map_g2.rs:367-379: L=128 per element,
    c0 from the first 64 bytes, c1 from the last).  Returns an Fp2 batch
    ([L, count, B], [L, count, B])."""
    from ..kernels import sha256_jax

    arr = _msgs_to_array(msgs)
    okm = sha256_jax.expand_message_xmd_sha256(arr, dst, count * 128)
    okm = okm.reshape(arr.shape[0], count, 2, 64)  # [B, count, (c0,c1), 64]
    u = fp.from_okm(okm)  # [L, B, count, 2]
    return (
        jnp.moveaxis(u[..., 0], -1, 1),
        jnp.moveaxis(u[..., 1], -1, 1),
    )


def hash_to_field_fr(msgs, dst, count, expand=hm.expand_message_xmd, **kw):
    """HashToField for Scalar (map_scalar.rs:10-23): L = 48 bytes/element.
    Host expansion -> Fr batch [L, count, n_msgs] (Montgomery)."""
    vals = []
    for msg in msgs:
        okm = expand(msg, dst, count * 48, **kw)
        vals.append(
            [hm.fr_from_okm(okm[i * 48 : (i + 1) * 48]) for i in range(count)]
        )
    from ..fields import fr

    arr = np.array(vals, dtype=object).T  # [count, n_msgs]
    return fr.from_ints(arr)


def hash_to_field_fr_device(msgs, dst, count):
    """Fully-on-device scalar hash_to_field: batched SHA-256 XMD expansion +
    batched wide reduction (fr.from_okm).  Returns [L, count, B]."""
    from ..fields import fr
    from ..kernels import sha256_jax

    arr = _msgs_to_array(msgs)
    okm = sha256_jax.expand_message_xmd_sha256(arr, dst, count * 48)
    okm = okm.reshape(arr.shape[0], count, 48)  # [B, count, 48]
    u = fr.from_okm(okm)  # [L, B, count]
    return jnp.moveaxis(u, -1, 1)  # [L, count, B]


def hash_to_field_fp2(msgs, dst, count, expand=hm.expand_message_xmd, **kw):
    """msgs: list of bytes -> Fp2 batch ([L, count, n], [L, count, n])."""
    c0s, c1s = [], []
    for msg in msgs:
        okm = expand(msg, dst, count * 128, **kw)
        els = [hm.fp2_from_okm(okm[i * 128 : (i + 1) * 128]) for i in range(count)]
        c0s.append([e[0] for e in els])
        c1s.append([e[1] for e in els])
    a0 = np.array(c0s, dtype=object).T
    a1 = np.array(c1s, dtype=object).T
    return (fp.from_ints(a0), fp.from_ints(a1))


# ---------------------------------------------------------------------------
# Simplified SWU (batched, mask-selected branches)
# ---------------------------------------------------------------------------


def _sswu(u, f, consts):
    """Generic batched SSWU onto y^2 = x^3 + A x + B (draft-16 F.2).

    `f` is a namespace dict of batched field ops; `consts` holds device
    constants A, B, Z.  Returns affine (x, y) with sgn0(y) == sgn0(u).
    """
    A, B, Z = consts["A"], consts["B"], consts["Z"]
    one = consts["one"]

    usq = f["sqr"](u)
    z_usq = f["mul"](Z, usq)
    zz_u4 = f["sqr"](z_usq)
    tv = f["add"](zz_u4, z_usq)
    x1num = f["mul"](B, f["add"](tv, one))
    tv_zero = f["is_zero"](tv)
    x1den = f["select"](tv_zero, f["mul"](Z, A), f["mul"](A, f["neg"](tv)))
    # g(x1) as a fraction with denominator x1den^3
    dsq = f["sqr"](x1den)
    dcb = f["mul"](dsq, x1den)
    gnum = f["add"](
        f["add"](f["mul"](f["sqr"](x1num), x1num), f["mul"](f["mul"](A, x1num), dsq)),
        f["mul"](B, dcb),
    )
    dinv = f["inv"](dcb)
    g1v = f["mul"](gnum, dinv)
    y1, ok1 = f["sqrt"](g1v)
    # second candidate: x2 = Z u^2 x1;  g(x2) = g(x1) Z^3 u^6
    zu3 = f["mul"](f["sqr"](z_usq), z_usq)
    g2v = f["mul"](g1v, zu3)
    y2, _ = f["sqrt"](g2v)
    x_num = f["select"](ok1, x1num, f["mul"](z_usq, x1num))
    y = f["select"](ok1, y1, y2)
    x = f["mul"](x_num, f["inv"](x1den))
    # fix sign: sgn0(y) == sgn0(u)
    flip = f["sgn0"](y) != f["sgn0"](u)
    y = f["select"](flip, f["neg"](y), y)
    return (x, y)


def _horner(coeffs_dev, x, f):
    acc = coeffs_dev[-1]
    for c in reversed(coeffs_dev[:-1]):
        acc = f["add"](f["mul"](acc, x), c)
    return acc


_FP_NS = dict(
    add=fp.add, sub=fp.sub, neg=fp.neg, mul=fp.mul, sqr=fp.sqr, inv=fp.inv,
    sqrt=fp.sqrt, select=fp.select, is_zero=fp.is_zero,
    sgn0=lambda a: fp.sgn0_mont(a) != 0,
)
_FP2_NS = dict(
    add=tw.fp2_add, sub=tw.fp2_sub, neg=tw.fp2_neg, mul=tw.fp2_mul,
    sqr=tw.fp2_sqr, inv=tw.fp2_inv, sqrt=tw.fp2_sqrt, select=tw.fp2_select,
    is_zero=tw.fp2_is_zero, sgn0=tw.fp2_sgn0,
)


def map_to_curve_g1(u):
    """SSWU to iso-E1 + 11-isogeny to E1 (map_g1.rs:545-630)."""
    batch = u.shape[1:]
    consts = dict(
        A=fp.const(_C["g1_sswu_a"], batch),
        B=fp.const(_C["g1_sswu_b"], batch),
        Z=fp.const(_C["g1_sswu_xi"], batch),
        one=fp.one(batch),
    )
    x, y = _sswu(u, _FP_NS, consts)
    xnum = [fp.const(c, batch) for c in _C["iso11_xnum"]]
    xden = [fp.const(c, batch) for c in _C["iso11_xden"]]
    ynum = [fp.const(c, batch) for c in _C["iso11_ynum"]]
    yden = [fp.const(c, batch) for c in _C["iso11_yden"]]
    xn = _horner(xnum, x, _FP_NS)
    xd = _horner(xden, x, _FP_NS)
    yn = _horner(ynum, x, _FP_NS)
    yd = _horner(yden, x, _FP_NS)
    # projective output (xn/xd, y*yn/yd) = (xn*yd : y*yn*xd : xd*yd)
    return (
        fp.mul(xn, yd),
        fp.mul(fp.mul(y, yn), xd),
        fp.mul(xd, yd),
    )


def map_to_curve_g2(u):
    """SSWU to iso-E2 + 3-isogeny to E2 (map_g2.rs:391-492)."""
    batch = u[0].shape[1:]
    consts = dict(
        A=tw.fp2_const(_C["g2_sswu_a"], batch),
        B=tw.fp2_const(_C["g2_sswu_b"], batch),
        Z=tw.fp2_const(_C["g2_sswu_xi"], batch),
        one=tw.fp2_one(batch),
    )
    x, y = _sswu(u, _FP2_NS, consts)
    xnum = [tw.fp2_const(c, batch) for c in _C["iso3_xnum"]]
    xden = [tw.fp2_const(c, batch) for c in _C["iso3_xden"]]
    ynum = [tw.fp2_const(c, batch) for c in _C["iso3_ynum"]]
    yden = [tw.fp2_const(c, batch) for c in _C["iso3_yden"]]
    xn = _horner(xnum, x, _FP2_NS)
    xd = _horner(xden, x, _FP2_NS)
    yn = _horner(ynum, x, _FP2_NS)
    yd = _horner(yden, x, _FP2_NS)
    return (
        tw.fp2_mul(xn, yd),
        tw.fp2_mul(tw.fp2_mul(y, yn), xd),
        tw.fp2_mul(xd, yd),
    )


# ---------------------------------------------------------------------------
# Top-level hash/encode
# ---------------------------------------------------------------------------


def hash_to_curve_g1(msgs, dst, expand=hm.expand_message_xmd, **kw):
    """Batched hash_to_curve: list of messages -> projective G1 batch.

    expand="device" runs the SHA-256 XMD expansion on device too (equal-
    length messages), making the whole pipeline one jittable graph.
    """
    if expand == "device":
        u = hash_to_field_fp_device(msgs, dst, 2)
    else:
        u = hash_to_field_fp(msgs, dst, 2, expand=expand, **kw)
    q0 = map_to_curve_g1(u[:, 0])
    q1 = map_to_curve_g1(u[:, 1])
    return G1.clear_cofactor(G1.add(q0, q1))


def encode_to_curve_g1(msgs, dst, expand=hm.expand_message_xmd, **kw):
    if expand == "device":
        u = hash_to_field_fp_device(msgs, dst, 1)
    else:
        u = hash_to_field_fp(msgs, dst, 1, expand=expand, **kw)
    return G1.clear_cofactor(map_to_curve_g1(u[:, 0]))


def hash_to_curve_g2(msgs, dst, expand=hm.expand_message_xmd, **kw):
    if expand == "device":
        u = hash_to_field_fp2_device(msgs, dst, 2)
    else:
        u = hash_to_field_fp2(msgs, dst, 2, expand=expand, **kw)
    u0 = (u[0][:, 0], u[1][:, 0])
    u1 = (u[0][:, 1], u[1][:, 1])
    q0 = map_to_curve_g2(u0)
    q1 = map_to_curve_g2(u1)
    return G2.clear_cofactor(G2.add(q0, q1))


def encode_to_curve_g2(msgs, dst, expand=hm.expand_message_xmd, **kw):
    if expand == "device":
        u = hash_to_field_fp2_device(msgs, dst, 1)
    else:
        u = hash_to_field_fp2(msgs, dst, 1, expand=expand, **kw)
    return G2.clear_cofactor(map_to_curve_g2((u[0][:, 0], u[1][:, 0])))
