"""Batched Pippenger multi-scalar multiplication on TPU.

No reference counterpart (the crate's only throughput levers are
batch_normalize and multi_miller_loop, SURVEY.md §2.4) — this is new
TPU-first design per the build plan (SURVEY.md §7.2 item 7).

Design: scatter-add is the classically awkward op on TPU, so bucket
accumulation is reformulated as sort + work-efficient segmented scan:

  once:
    0. decompose scalars with the curve endomorphism (GLV 2-way on G1,
       GLS 4-way on G2): 2x/4x the lanes, 1/2 / 1/4 the window count
    1. signed c-bit digits (balanced representation): 2^(c-1) buckets
    2. ONE batched argsort of all windows' digit magnitudes [W, B]
  per window w (lax.scan over precomputed sorted keys/orders):
    3. gather AFFINE (x, y) by the window's order; negate y where the
       digit was negative; lift to projective with a constant z = 1
    4. segmented inclusive scan with the group law along the lane axis
       (associative_scan is work-efficient: ~2B masked adds, log depth;
       complete RCB formulas make masking free)
    5. bucket totals = segment tails, located by searchsorted (no
       scatter); empty buckets select the identity
    6. bucket reduction sum_b b * B_b via suffix scan + halving tree
       (~2 * 2^(c-1) adds, log depth)
  recombine: result = sum_w 2^(c w) S_w  (Horner, c doublings/window)

Work: ~(bits/c) * (3B + 2^c) group adds, all batched on the VPU, where
bits is 128 (G1/GLV) or 64 (G2/GLS).  Identity inputs and zero digits
land in bucket 0, which the reduction never reads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..curves import g1 as G1
from ..curves import g2 as G2
from ..limbs import FR


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


def _signed_digits(canon, c: int, bits: int):
    """Balanced (signed) c-bit digits of canonical limb tensors.

    Returns (mag, neg): [W, B] int32 magnitudes in [0, 2^(c-1)] and the
    sign mask, with W = ceil((bits+1)/c) so the final borrow-carry always
    fits (the top window is guaranteed <= 2^(c-1) and kept non-negative).
    """
    n_windows = -(-(bits + 1) // c)
    raw = _digits_raw(canon, c, n_windows)  # [W, B] in [0, 2^c)
    half, full = 1 << (c - 1), 1 << c
    mags, negs = [], []
    carry = jnp.zeros(raw.shape[1:], jnp.int32)
    for w in range(n_windows):
        t = raw[w] + carry
        if w == n_windows - 1:
            d = t  # top digit <= half by construction; no borrow out
            carry = None
        else:
            borrow = t >= half
            d = jnp.where(borrow, t - full, t)
            carry = borrow.astype(jnp.int32)
        mags.append(jnp.abs(d))
        negs.append(d < 0)
    return jnp.stack(mags), jnp.stack(negs)


def _segmented_scan_add(curve, pts, heads):
    """Inclusive segmented scan with the group law along the last (lane)
    axis.  All leaves stay limb-major [L, b] throughout — the scan runs on
    axis=-1, so no per-level transposes.  heads: bool [1, B], True where a
    new segment starts.  Uses the power-of-two scan (utils/scans.py): one
    group-add instantiation per level, shapes shared process-wide, instead
    of associative_scan's ~2-3 distinct shapes per level (which re-traced
    the Pallas group-law kernel for minutes per MSM graph).
    """
    from ..utils import scans as _scans

    def combine(left, right):
        lp, lh = left
        rp, rh = right
        summed = curve.add(lp, rp)
        mask = rh  # [1, b]
        pt = jax.tree.map(lambda s, r: jnp.where(mask, r, s), summed, rp)
        return (pt, lh | rh)

    ident1 = (curve.identity((1,)), jnp.zeros((1, 1), dtype=bool))
    out, _ = _scans.inclusive_scan(combine, (pts, heads), ident1)
    return out


def _window_sum(curve_mod, aff_xy, order, mags_s, negs_s, c: int):
    """Bucket-accumulate one window from pre-sorted digit magnitudes.

    aff_xy: affine (x, y) pytree with lane axis last; order/mags_s/negs_s:
    [B] from the hoisted batched sort.  Returns the window sum (projective,
    no batch).
    """
    curve = curve_mod.CURVE
    f = curve.f
    half = 1 << (c - 1)
    batch = order.shape

    x, y = jax.tree.map(lambda t: t[..., order], aff_xy)
    # negate where the signed digit was negative (y -> -y is the only cost
    # of the balanced representation)
    neg_y = f.neg(y)
    y = jax.tree.map(
        lambda n_, y_: jnp.where(negs_s, n_, y_), neg_y, y
    )
    pts = (x, y, f.one(batch))

    heads = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), mags_s[1:] != mags_s[:-1]]
    )[None]
    scanned = _segmented_scan_add(curve, pts, heads)

    # bucket totals live at segment tails; locate them with searchsorted
    # (no scatter).  Bucket 0 (zero digits, identity inputs) is never read.
    bucket_ids = jnp.arange(1, half + 1, dtype=mags_s.dtype)
    pos_r = jnp.searchsorted(mags_s, bucket_ids, side="right")
    pos_l = jnp.searchsorted(mags_s, bucket_ids, side="left")
    filled = pos_r > pos_l  # [half]
    tail = jnp.maximum(pos_r - 1, 0)
    vals = jax.tree.map(lambda t: t[..., tail], scanned)
    ident = curve.identity((half,))
    buckets = jax.tree.map(
        lambda v, i: jnp.where(filled, v, i), vals, ident
    )

    # sum_{b=1..half} b * B_b = sum of the inclusive suffix sums
    # B_half, B_half + B_{half-1}, ...  — log-depth scan + halving tree
    # (both on power-of-two shapes, utils/scans.py).
    from ..utils import scans as _scans

    def combine(l, r):
        return curve.add(l, r)

    ident1 = curve.identity((1,))
    suffix = _scans.suffix_scan(combine, buckets, ident1)
    total = _scans.tree_reduce(combine, suffix, ident1)
    return jax.tree.map(lambda t: t[..., 0], total)


def _msm_pipeline(curve_mod, aff_xy, mags, negs, c: int):
    """Window loop over signed digit tensors [W, B]; one batched sort up
    front, lax.scan over windows (MSB applied first, c doublings between).
    """
    curve = curve_mod.CURVE
    order = jnp.argsort(mags, axis=-1)  # ONE batched sort for all windows
    mags_s = jnp.take_along_axis(mags, order, axis=-1)
    negs_s = jnp.take_along_axis(negs, order, axis=-1)

    def outer_step(acc, xs):
        order_w, mags_w, negs_w = xs
        for _ in range(c):
            acc = curve.double(acc)
        acc = curve.add(
            acc, _window_sum(curve_mod, aff_xy, order_w, mags_w, negs_w, c)
        )
        return acc, None

    acc, _ = jax.lax.scan(
        outer_step,
        curve.identity(()),
        (order[::-1], mags_s[::-1], negs_s[::-1]),
    )
    return acc


def _to_affine_xy(curve_mod, points_proj, inv_fn):
    """Normalize once so the per-window gathers move 2 coordinates instead
    of 3 and the scan starts from z = 1.  Identity lanes decode to (0, 1)
    with inf=True; callers zero those lanes' digits so they land in the
    unread bucket 0."""
    ax, ay, inf = curve_mod.CURVE.to_affine(points_proj, inv_fn)
    return (ax, ay), inf


def msm_g1(points_proj, scalars_mont, c: int | None = None, glv: bool = True):
    """Entry point; c defaults to config.msm_window (see _msm_g1_jit)."""
    from .. import config

    if c is None:
        c = config.get().msm_window
    # vector plan evaluator: the bucket scans instantiate the group law at
    # ~log(B) + log(2^c) distinct shapes; the scalar evaluator's per-shape
    # trace cost (~10 s) would put CLIENT-SIDE TRACING at many minutes per
    # MSM graph (measured 530 s at B=2^16) — the vector one traces ~10x
    # faster at a ~2x ALU cost confined to this graph
    with config.scope(plan_variant="vector"):
        return _msm_g1_jit(points_proj, scalars_mont, c, glv)


@functools.partial(jax.jit, static_argnames=("c", "glv"))
def _msm_g1_jit(points_proj, scalars_mont, c: int, glv: bool):
    """sum_i [s_i] P_i over G1; equals the fold of serial scalar-muls
    (reference g1.rs:754-774 semantics, batched).

    glv=True (default) splits every scalar with the GLV endomorphism
    (s = k1 + k2 z^2, phi(P) = (beta x, y) = [-z^2]P): the point set doubles
    but the window count halves (128-bit mini-scalars), halving both the
    dominant sort/gather traffic and the bucket-accumulation adds.  Valid
    for subgroup points (the only points Fr-scalar MSM is defined on);
    glv=False keeps the plain 255-bit pipeline for arbitrary points.
    """
    from .. import limbs, params
    from ..fields import fp

    canon = limbs.from_mont(FR, scalars_mont)
    (ax, ay), inf = _to_affine_xy(G1, points_proj, fp.batch_inv)

    if not glv:
        mags, negs = _signed_digits(canon, c, 255)
        mags = jnp.where(inf[None], 0, mags)
        return _msm_pipeline(G1, (ax, ay), mags, negs, c)

    k2, k1 = limbs.barrett_divmod(canon, params.BLS_X ** 2, 9)
    beta = fp.const(G1.BETA, ax.shape[1:])
    # [z^2]P = -phi(P) = (beta x, -y) — affine, no z bookkeeping
    aff = tuple(
        jnp.concatenate([a, b], axis=-1)
        for a, b in zip((ax, ay), (fp.mul(beta, ax), fp.neg(ay)))
    )
    m1, n1 = _signed_digits(k1, c, 128)
    m2, n2 = _signed_digits(k2, c, 128)
    mags = jnp.concatenate([m1, m2], axis=-1)  # [W, 2B]
    negs = jnp.concatenate([n1, n2], axis=-1)
    mags = jnp.where(jnp.concatenate([inf, inf])[None], 0, mags)
    return _msm_pipeline(G1, aff, mags, negs, c)


def msm_g1_large(points_proj, scalars_mont, c: int | None = None,
                 glv: bool = True, chunk_log2: int = 21):
    """MSM for batches too large for one pipeline's scan working set.

    The segmented scan materializes several copies of the gathered window
    (the power-of-two scan keeps ~6 level intermediates live), so >= 2^23
    GLV lanes (2^22 input points) overflow a 16 GB chip — measured
    RESOURCE_EXHAUSTED at chunk 2^22, clean at 2^21.  Chunks of
    2^chunk_log2 run the normal pipeline (one compile, reused across
    chunks) and fold with single group additions — the extra cost is one
    bucket-reduction + recombination per chunk, amortized to noise at this
    size."""
    B = scalars_mont.shape[-1]
    cs = 1 << chunk_log2
    if B <= cs:
        return msm_g1(points_proj, scalars_mont, c=c, glv=glv)
    acc = None
    for i in range(0, B, cs):
        part = msm_g1(
            jax.tree.map(lambda t: t[..., i: i + cs], tuple(points_proj)),
            scalars_mont[..., i: i + cs], c=c, glv=glv,
        )
        acc = part if acc is None else G1.add(acc, part)
    return acc


def msm_g2(points_proj, scalars_mont, c: int | None = None, gls: bool = True):
    from .. import config

    if c is None:
        c = config.get().msm_window
    with config.scope(plan_variant="vector"):  # see msm_g1
        return _msm_g2_jit(points_proj, scalars_mont, c, gls)


@functools.partial(jax.jit, static_argnames=("c", "gls"))
def _msm_g2_jit(points_proj, scalars_mont, c: int, gls: bool):
    """sum_i [s_i] P_i over G2.

    gls=True (default) applies the 4-way GLS split used by g2.scalar_mul
    (curves/g2.py: psi acts as z on the subgroup, g2.rs:475-482):
    s = c0 + c1|z| + c2|z|^2 + c3|z|^3 gives four 64-bit mini-scalars
    against P, -psi(P), psi^2(P), -psi^3(P) — 4x fewer windows on the
    costliest (Fp2) group adds.  Subgroup points only; gls=False keeps the
    plain 255-bit pipeline.
    """
    from .. import limbs, params
    from ..fields import tower as tw

    canon = limbs.from_mont(FR, scalars_mont)
    (ax, ay), inf = _to_affine_xy(G2, points_proj, tw.fp2_batch_inv)

    if not gls:
        mags, negs = _signed_digits(canon, c, 255)
        mags = jnp.where(inf[None], 0, mags)
        return _msm_pipeline(G2, (ax, ay), mags, negs, c)

    x = params.BLS_X
    q3, r3 = limbs.barrett_divmod(canon, x ** 3, 5)
    q2, r2 = limbs.barrett_divmod(r3, x ** 2, 5)
    q1, c0 = limbs.barrett_divmod(r2, x, 5)

    # psi on affine points (z = 1 is a fixed point of conj): four bases
    batch = inf.shape
    cx = tw.fp2_const(G2.hm.PSI_CX, batch)
    cy = tw.fp2_const(G2.hm.PSI_CY, batch)

    def psi_aff(a):
        px, py = a
        return (
            tw.fp2_mul(tw.fp2_conjugate(px), cx),
            tw.fp2_mul(tw.fp2_conjugate(py), cy),
        )

    def neg_aff(a):
        return (a[0], tw.fp2_neg(a[1]))

    p1 = (ax, ay)
    pp = psi_aff(p1)
    p2 = neg_aff(pp)            # [|z|]P
    p3 = psi_aff(pp)            # [|z|^2]P
    p4 = neg_aff(psi_aff(p3))   # [|z|^3]P

    aff = jax.tree.map(
        lambda *ts: jnp.concatenate(ts, axis=-1), p1, p2, p3, p4
    )
    parts = [_signed_digits(k, c, 64) for k in (c0, q1, q2, q3)]
    mags = jnp.concatenate([m for m, _ in parts], axis=-1)  # [W, 4B]
    negs = jnp.concatenate([n for _, n in parts], axis=-1)
    mags = jnp.where(jnp.concatenate([inf] * 4)[None], 0, mags)
    return _msm_pipeline(G2, aff, mags, negs, c)
