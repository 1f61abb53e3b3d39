"""Batched Pippenger multi-scalar multiplication on TPU.

No reference counterpart (the crate's only throughput levers are
batch_normalize and multi_miller_loop, SURVEY.md §2.4) — this is new
TPU-first design per the build plan (SURVEY.md §7.2 item 7).

Design: scatter-add is the classically awkward op on TPU, so bucket
accumulation is reformulated as sort + segmented associative scan:

  per window w (c-bit digits):
    1. keys  = digit_w(scalar_i)                       [B]
    2. order = argsort(keys); gather points            (lanes stay dense)
    3. segmented inclusive scan with the group law     (O(B) work, log depth,
       complete RCB formulas make masking free)
    4. segment tails scatter into the bucket array     (unique indices)
    5. bucket reduction sum_b b * B_b via suffix scan  (2 * 2^c adds)
  recombine: result = sum_w 2^(c w) S_w                (c doublings/window)

Work: ~(255/c) * (3B + 2^(c+1)) group adds, all batched on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import g1 as G1
from ..curves import g2 as G2
from ..fields import fr
from ..limbs import FR


def recommended_window_for_num_scalars(num_scalars: int,
                                       g2: bool = False) -> int:
    """Pippenger window-size recommendation by batch size — the TPU analog
    of the reference's wNAF tables (g1.rs:989-1005, g2.rs:1134-1149; same
    breakpoints, which track the 2^c-vs-N work balance)."""
    recommendations = (
        [1, 3, 8, 20, 47, 126, 260, 826, 1501, 4555, 84071]
        if g2
        else [1, 3, 7, 20, 43, 120, 273, 563, 1630, 3128, 7933, 62569]
    )
    ret = 4
    for r in recommendations:
        if num_scalars > r:
            ret += 1
        else:
            break
    return ret


def _digits_raw(canon, c: int, n_windows: int):
    """c-bit digits of canonical limb tensors [n_limbs, B]: [n_windows, B]
    int32 (LSB-first window order)."""
    n_limbs = canon.shape[0]
    outs = []
    for w in range(n_windows):
        lo_bit = c * w
        out = jnp.zeros(canon.shape[1:], dtype=jnp.uint32)
        # assemble digit from the (<=3) limbs it straddles
        for limb in range(lo_bit // 16,
                          min((lo_bit + c - 1) // 16 + 1, n_limbs)):
            shift = limb * 16 - lo_bit
            part = canon[limb].astype(jnp.uint32)
            if shift >= 0:
                out = out | (part << shift)
            else:
                out = out | (part >> (-shift))
        outs.append(out & jnp.uint32((1 << c) - 1))
    return jnp.stack(outs).astype(jnp.int32)


def _digits(scalars_mont, c: int, n_windows: int):
    """Canonical c-bit digits of Montgomery Fr scalars: [n_windows, B] int32."""
    from .. import limbs

    return _digits_raw(limbs.from_mont(FR, scalars_mont), c, n_windows)


def _segmented_scan_add(curve, pts, heads):
    """Inclusive segmented scan with the group law along the last batch axis.

    pts: projective point pytree with trailing batch axis [B];
    heads: bool [B], True where a new segment starts.

    The group law operates on [L, b] tensors (limb axis first), but
    associative_scan needs one common scan axis — so leaves are transposed
    to batch-major [B, L] around the scan.
    """

    def to_scan(x):
        return jnp.moveaxis(x, -1, 0)

    def from_scan(x):
        return jnp.moveaxis(x, 0, -1)

    def combine(left, right):
        lp, lh = left
        rp, rh = right
        # back to limb-major for the field ops
        lp_f = jax.tree.map(from_scan, lp)
        rp_f = jax.tree.map(from_scan, rp)
        summed = curve.add(lp_f, rp_f)
        mask = rh  # [b']
        pt = jax.tree.map(
            lambda s, r: jnp.where(mask[None], r, s), summed, rp_f
        )
        return (jax.tree.map(to_scan, pt), lh | rh)

    pts_t = jax.tree.map(to_scan, pts)
    out, _ = jax.lax.associative_scan(combine, (pts_t, heads), axis=0)
    return jax.tree.map(from_scan, out)


def _msm_curve(curve_mod, points_proj, scalars_mont, c: int):
    """Single-device Pippenger over one curve module (g1 or g2)."""
    n_windows = -(-255 // c)
    digits = _digits(scalars_mont, c, n_windows)  # [W, B] int32
    return _msm_window_pipeline(curve_mod, points_proj, digits, c)


def _msm_window_pipeline(curve_mod, points_proj, digits, c: int):
    """Window loop over precomputed digit tensors [W, B] (MSB applied last
    via the reversed scan)."""
    curve = curve_mod.CURVE
    n_buckets = 1 << c
    batch = digits.shape[1:]

    def window_sum(keys):
        # sort by bucket, gather points
        order = jnp.argsort(keys)
        keys_s = keys[order]
        pts = jax.tree.map(lambda x: x[..., order], points_proj)
        heads = jnp.concatenate(
            [jnp.ones((1,), dtype=bool), keys_s[1:] != keys_s[:-1]]
        )
        scanned = _segmented_scan_add(curve, pts, heads)
        # segment tails: last element of each run holds the bucket total
        tails = jnp.concatenate(
            [keys_s[1:] != keys_s[:-1], jnp.ones((1,), dtype=bool)]
        )
        # scatter tails into bucket slots (indices unique among tails)
        idx = jnp.where(tails, keys_s, n_buckets)  # non-tails -> overflow slot
        buckets = jax.tree.map(
            lambda x: jnp.zeros(x.shape[:-1] + (n_buckets + 1,), x.dtype)
            .at[..., idx]
            .set(x)[..., :n_buckets],
            scanned,
        )
        # make non-tail slots the identity (z = 0): zeros already encode
        # (0 : 0 : 0); fix y to keep points well-formed is unnecessary for
        # complete formulas with z=0 and x=y=0?  Use an explicit identity fix:
        filled = jnp.zeros((n_buckets + 1,), dtype=bool).at[idx].set(True)[
            :n_buckets
        ]
        ident = curve.identity((n_buckets,))
        buckets = tuple(
            jax.tree.map(
                lambda idn, bk: jnp.where(filled[None], bk, idn), idn_, bk_
            )
            for idn_, bk_ in zip(ident, buckets)
        )
        # bucket reduction: S = sum_{b>=1} b * B_b == sum over the inclusive
        # suffix sums of B_{m-1}..B_1.  Both the suffix scan and the final
        # sum run LOG-DEPTH over the bucket axis (associative_scan + halving
        # tree) — a sequential 2^c-step scan is latency-bound on TPU and
        # dominated the window cost for c >= 10.
        rev = jax.tree.map(lambda x: x[..., ::-1][..., :-1], buckets)  # b=m-1..1

        def to_scan(x):
            return jnp.moveaxis(x, -1, 0)

        def from_scan(x):
            return jnp.moveaxis(x, 0, -1)

        def combine(left, right):
            l = jax.tree.map(from_scan, left)
            r = jax.tree.map(from_scan, right)
            return jax.tree.map(to_scan, curve.add(l, r))

        scanned = jax.lax.associative_scan(
            combine, jax.tree.map(to_scan, rev), axis=0
        )
        suffix = jax.tree.map(from_scan, scanned)  # [..., m-1] running sums
        # tree-sum over the bucket axis
        n = n_buckets - 1
        acc = suffix
        while n > 1:
            half = n // 2
            lo = jax.tree.map(lambda x: x[..., :half], acc)
            hi = jax.tree.map(lambda x: x[..., half : 2 * half], acc)
            s = curve.add(lo, hi)
            if n % 2:
                tail = jax.tree.map(lambda x: x[..., -1:], acc)
                s = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b], axis=-1), s, tail
                )
            acc = s
            n = jax.tree.leaves(acc)[0].shape[-1]
        return jax.tree.map(lambda x: x[..., 0], acc)

    # windows high -> low with c doublings between
    def outer_step(acc, keys):
        for _ in range(c):
            acc = curve.double(acc)
        acc = curve.add(acc, window_sum(keys))
        return acc, None

    acc, _ = jax.lax.scan(outer_step, curve.identity(()), digits[::-1])
    return acc


def msm_g1(points_proj, scalars_mont, c: int | None = None, glv: bool = True):
    """Entry point; c defaults to config.msm_window (see _msm_g1_jit)."""
    if c is None:
        from .. import config

        c = config.get().msm_window
    return _msm_g1_jit(points_proj, scalars_mont, c, glv)


@functools.partial(jax.jit, static_argnames=("c", "glv"))
def _msm_g1_jit(points_proj, scalars_mont, c: int, glv: bool):
    """sum_i [s_i] P_i over G1; equals the fold of serial scalar-muls.

    glv=True (default) splits every scalar with the GLV endomorphism
    (s = k1 + k2 z^2, phi(P) = (beta x, y) = [-z^2]P): the point set doubles
    but the window count halves (128-bit mini-scalars), halving both the
    dominant sort/gather traffic and the bucket-accumulation adds.  Valid
    for subgroup points (the only points Fr-scalar MSM is defined on);
    glv=False keeps the plain 255-bit pipeline for arbitrary points.
    """
    if not glv:
        return _msm_curve(G1, points_proj, scalars_mont, c)
    from .. import limbs, params
    from ..fields import fp

    canon = limbs.from_mont(FR, scalars_mont)
    k2, k1 = limbs.barrett_divmod(canon, params.BLS_X ** 2, 9)
    x, y, z = points_proj
    beta = fp.const(G1.BETA, x.shape[1:])
    p2 = (fp.mul(beta, x), fp.neg(y), z)  # [z^2]P = -phi(P)
    pts_ext = tuple(
        jnp.concatenate([a, b], axis=-1) for a, b in zip(points_proj, p2)
    )
    n_windows = -(-128 // c)
    digits = jnp.concatenate(
        [_digits_raw(k1, c, n_windows), _digits_raw(k2, c, n_windows)],
        axis=-1,
    )  # [W, 2B]
    return _msm_window_pipeline(G1, pts_ext, digits, c)


def msm_g2(points_proj, scalars_mont, c: int | None = None):
    if c is None:
        from .. import config

        c = config.get().msm_window
    return _msm_g2_jit(points_proj, scalars_mont, c)


@functools.partial(jax.jit, static_argnames=("c",))
def _msm_g2_jit(points_proj, scalars_mont, c: int):
    return _msm_curve(G2, points_proj, scalars_mont, c)
