"""Work-efficient scans/reductions with power-of-two shape discipline.

`jax.lax.associative_scan` is work-efficient but its odd/even recursion
instantiates the combine at ~2-3 DISTINCT shapes per level (interleave +
odd-tail corrections).  When the combine contains a Pallas kernel (the MSM
bucket scans' group adds, batch_inv's field muls), every distinct shape
re-traces the kernel client-side (~2 s each here) — associative_scan alone
put an MSM graph at 130 combine calls over ~66 distinct shapes, minutes of
tracing.

These variants keep every combine at a CLEAN power-of-two lane count:
exactly one instantiation per level, and the level shapes (n/2, n/4, ...)
are shared across all scans/reductions in the process — including across
different top-level batch sizes, whose level chains overlap (an MSM at
2^20 after one at 2^16 re-traces only the 4 new top shapes).

All functions operate along the LAST axis of every pytree leaf.
Inclusive-scan outputs at position i depend only on inputs [0..i], so
padding the tail (to reach a power of two) with arbitrary lanes is sound —
the pad region is sliced off before returning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _n_lanes(x):
    return jax.tree.leaves(x)[0].shape[-1]


def _interleave(even, odd):
    """[..., k] x2 -> [..., 2k] with even at 0::2, odd at 1::2."""

    def one(e, o):
        stacked = jnp.stack([e, o], axis=-1)
        return stacked.reshape(stacked.shape[:-2] + (-1,))

    return jax.tree.map(one, even, odd)


def inclusive_scan(combine, xs, identity1):
    """Inclusive scan of `combine` along the last axis.

    combine(left, right) must be associative; identity1 is a pytree with
    ONE lane such that combine(identity1, x) == x (a group identity /
    multiplicative one / any left-unit of the combine).

    Work ~2n, depth ~2 log n, and exactly ceil(log2 n) distinct combine
    shapes (all powers of two).
    """
    n = _n_lanes(xs)
    pow2 = 1 << (n - 1).bit_length()
    if pow2 != n:
        # pad the tail with copies of the last lane (values irrelevant:
        # positions < n never read them); slice back afterwards
        xs = jax.tree.map(
            lambda t: jnp.concatenate(
                [t, jnp.broadcast_to(
                    t[..., -1:], t.shape[:-1] + (pow2 - n,))], axis=-1),
            xs,
        )
    out = _scan_pow2(combine, xs, identity1)
    if pow2 != n:
        out = jax.tree.map(lambda t: t[..., :n], out)
    return out


def _scan_pow2(combine, x, identity1):
    n = _n_lanes(x)
    if n == 1:
        return x
    even = jax.tree.map(lambda t: t[..., 0::2], x)
    odd = jax.tree.map(lambda t: t[..., 1::2], x)
    pair = combine(even, odd)            # [..., n/2] inclusive pair sums
    ps = _scan_pow2(combine, pair, identity1)
    # out[2k+1] = ps[k];  out[2k] = combine(ps[k-1], x[2k]) with ps[-1] = id
    shifted = jax.tree.map(
        lambda i, t: jnp.concatenate(
            [jnp.broadcast_to(i, t.shape[:-1] + (1,)), t[..., :-1]],
            axis=-1),
        identity1, ps,
    )
    out_even = combine(shifted, even)    # same n/2 shape as the pair combine
    return _interleave(out_even, ps)


def suffix_scan(combine, xs, identity1):
    """Inclusive suffix scan (out[i] = fold of xs[i..n-1]) along the last
    axis; `combine` need not be commutative — operands keep input order."""
    rev = jax.tree.map(lambda t: t[..., ::-1], xs)
    flipped = inclusive_scan(lambda l, r: combine(r, l), rev, identity1)
    return jax.tree.map(lambda t: t[..., ::-1], flipped)


def tree_reduce(combine, xs, identity1):
    """Reduce the last axis to one lane (kept, size 1) with a halving tree
    over power-of-two shapes; identity-padded so every level is clean."""
    n = _n_lanes(xs)
    pow2 = 1 << (n - 1).bit_length()
    if pow2 != n:
        xs = jax.tree.map(
            lambda i, t: jnp.concatenate(
                [t, jnp.broadcast_to(i, t.shape[:-1] + (pow2 - n,))],
                axis=-1),
            identity1, xs,
        )
    while _n_lanes(xs) > 1:
        lo = jax.tree.map(lambda t: t[..., 0::2], xs)
        hi = jax.tree.map(lambda t: t[..., 1::2], xs)
        xs = combine(lo, hi)
    return xs
