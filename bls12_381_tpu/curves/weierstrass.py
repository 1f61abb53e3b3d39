"""Generic batched short-Weierstrass group law (y^2 = x^3 + b, a = 0).

Complete projective formulas: Renes-Costello-Batina ePrint 2015/1060
Algorithms 7 (add), 8 (mixed add), 9 (double) — matching the reference's
choice (g1.rs:638/670/715) so exceptional-case behavior is identical by
construction.  Field-generic: instantiated with Fp ops for G1 and Fp2 ops
for G2.

TPU shaping: within each algorithm the field multiplications form two
dependency stages; each stage is ONE folded multi-product (FieldFns.mul_many)
so the whole group op costs two fused Montgomery reductions.  The b3 = 3*4
multiplications are additions (the reference's mul_by_3b trick, g1.rs:596).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FieldFns:
    """Minimal field interface the group law needs."""

    add: callable
    sub: callable
    neg: callable
    mul: callable
    sqr: callable
    mul_many: callable  # [(a,b), ...] -> [ab, ...] in one fused fold
    mul_b3: callable    # x -> 3*b*x via additions
    select: callable    # (mask, a, b) -> a where mask else b
    eq: callable
    is_zero: callable
    zero: callable      # (batch) -> element
    one: callable       # (batch) -> element
    b: callable         # (batch) -> curve constant b
    batch_of: callable  # element -> batch shape
    # batched glue: K independent add/sub in ONE carry network — the
    # launch + carry-lookahead cost of small networks dominates group-law
    # glue at small batch sizes
    add_many: callable = None   # [(a,b), ...] -> [a+b, ...]
    sub_many: callable = None   # [(a,b), ...] -> [a-b, ...]
    b3c: callable = None        # (batch) -> Montgomery constant 3*b
    b3c9: callable = None       # (batch) -> Montgomery constant 9*b
    # whole-group-law fusions (kernels/plan_exec.py): each returns the
    # output point, or None to fall through to the staged paths below
    fused_add: callable = None        # (p, q) -> point | None
    fused_double: callable = None     # (p,) -> point | None
    fused_add_mixed: callable = None  # (p, (x2, y2)) -> point | None


def _small_batch(batch, limit=1024):
    """Batched-glue + constant-multiply-b3 pays off only when the per-op
    launch cost dominates (small batches); at large batches the classic
    addition ladders are cheaper (b3*x as a Montgomery product costs ~10x
    the FLOPs of four additions)."""
    return int(np.prod(batch, dtype=np.int64)) <= limit


class Weierstrass:
    def __init__(self, f: FieldFns):
        self.f = f

    # -- constructors ------------------------------------------------------

    def identity(self, batch=()):
        f = self.f
        return (f.zero(batch), f.one(batch), f.zero(batch))

    def from_affine(self, aff):
        """(x, y, inf) -> projective; identity maps to (0 : 1 : 0)."""
        f = self.f
        x, y, inf = aff
        batch = f.batch_of(x)
        return (
            f.select(inf, f.zero(batch), x),
            f.select(inf, f.one(batch), y),
            f.select(inf, f.zero(batch), f.one(batch)),
        )

    # -- predicates --------------------------------------------------------

    def is_identity(self, p):
        return self.f.is_zero(p[2])

    def is_on_curve(self, p):
        """y^2 z == x^3 + b z^3, or z == 0 (g1.rs:414-417 semantics)."""
        f = self.f
        x, y, z = p
        y2, x2, z2 = f.mul_many([(y, y), (x, x), (z, z)])
        lhs, x3, z3 = f.mul_many([(y2, z), (x2, x), (z2, z)])
        rhs = f.add(x3, f.mul(f.b(f.batch_of(x)), z3))
        return f.eq(lhs, rhs) | f.is_zero(z)

    def eq(self, p, q):
        """Projective equality: x1 z2 == x2 z1 and y1 z2 == y2 z1, with both-
        identity matching (g1.rs equality semantics incl. z-scaled reps)."""
        f = self.f
        x1, y1, z1 = p
        x2, y2, z2 = q
        both_inf = f.is_zero(z1) & f.is_zero(z2)
        one_inf = f.is_zero(z1) ^ f.is_zero(z2)
        a, b, c, d = f.mul_many([(x1, z2), (x2, z1), (y1, z2), (y2, z1)])
        same = f.eq(a, b) & f.eq(c, d)
        return both_inf | (same & ~one_inf)

    def neg(self, p):
        return (p[0], self.f.neg(p[1]), p[2])

    # -- group law (RCB 2015/1060; two folded multiplication stages each) ---

    def double(self, p):
        """Algorithm 9 (a = 0)."""
        f = self.f
        x, y, z = p
        if f.fused_double is not None:
            out = f.fused_double(p)
            if out is not None:
                return out
        if f.add_many is None or not _small_batch(f.batch_of(x)):
            # classic addition-ladder path (large batches / generic fields)
            t0, t1, zz, xy = f.mul_many([(y, y), (y, z), (z, z), (x, y)])
            t2 = f.mul_b3(zz)
            z3 = f.add(t0, t0)
            z3 = f.add(z3, z3)
            z3 = f.add(z3, z3)
            y3s = f.add(t0, t2)
            t2_3 = f.add(f.add(t2, t2), t2)
            t0d = f.sub(t0, t2_3)
            x3, z3o, y3a, xo = f.mul_many(
                [(t2, z3), (t1, z3), (t0d, y3s), (t0d, xy)]
            )
            y3 = f.add(x3, y3a)
            x3o = f.add(xo, xo)
            return (x3o, y3, z3o)
        # stage 1: Y^2, Y*Z, Z^2, X*Y; then b3*Z^2 AND 3*b3*Z^2 as one
        # constant-multiply fold (replaces the mul_by_3b addition ladder)
        batch = f.batch_of(x)
        t0, t1, zz, xy = f.mul_many([(y, y), (y, z), (z, z), (x, y)])
        t2, t2_3 = f.mul_many([(zz, f.b3c(batch)), (zz, f.b3c9(batch))])
        a1 = f.add_many([(t0, t0), (t0, t2)])
        t02, y3s = a1
        t04 = f.add_many([(t02, t02)])[0]
        z3 = f.add_many([(t04, t04)])[0]          # 8 Y^2
        t0d = f.sub(t0, t2_3)
        # stage 2: t2*Z3, t1*Z3, t0d*y3s, t0d*xy
        x3, z3o, y3a, xo = f.mul_many(
            [(t2, z3), (t1, z3), (t0d, y3s), (t0d, xy)]
        )
        y3, x3o = f.add_many([(x3, y3a), (xo, xo)])
        return (x3o, y3, z3o)

    def add(self, p, q):
        """Algorithm 7 (a = 0), complete for all inputs."""
        f = self.f
        x1, y1, z1 = p
        x2, y2, z2 = q
        if f.fused_add is not None:
            out = f.fused_add(p, q)
            if out is not None:
                return out
        if f.add_many is None or not _small_batch(f.batch_of(x1)):
            t0, t1, t2, m3, m4, m5 = f.mul_many(
                [
                    (x1, x2),
                    (y1, y2),
                    (z1, z2),
                    (f.add(x1, y1), f.add(x2, y2)),
                    (f.add(y1, z1), f.add(y2, z2)),
                    (f.add(x1, z1), f.add(x2, z2)),
                ]
            )
            t3 = f.sub(m3, f.add(t0, t1))
            t4 = f.sub(m4, f.add(t1, t2))
            y3 = f.sub(m5, f.add(t0, t2))
            t0_3 = f.add(f.add(t0, t0), t0)
            t2b = f.mul_b3(t2)
            z3 = f.add(t1, t2b)
            t1d = f.sub(t1, t2b)
            y3b = f.mul_b3(y3)
            a, b, c, d, e, g = f.mul_many(
                [
                    (t4, y3b),
                    (t3, t1d),
                    (y3b, t0_3),
                    (t1d, z3),
                    (t0_3, t3),
                    (z3, t4),
                ]
            )
            x3 = f.sub(b, a)
            y3o = f.add(d, c)
            z3o = f.add(g, e)
            return (x3, y3o, z3o)
        batch = f.batch_of(x1)
        pre = f.add_many(
            [(x1, y1), (x2, y2), (y1, z1), (y2, z2), (x1, z1), (x2, z2)]
        )
        t0, t1, t2, m3, m4, m5 = f.mul_many(
            [(x1, x2), (y1, y2), (z1, z2),
             (pre[0], pre[1]), (pre[2], pre[3]), (pre[4], pre[5])]
        )
        s = f.add_many([(t0, t1), (t1, t2), (t0, t2), (t0, t0)])
        subs = f.sub_many([(m3, s[0]), (m4, s[1]), (m5, s[2])])
        t3, t4, y3 = subs
        t0_3 = f.add_many([(s[3], t0)])[0]
        # constant-multiply fold replaces the two mul_by_3b ladders
        t2b, y3b = f.mul_many(
            [(t2, f.b3c(batch)), (y3, f.b3c(batch))]
        )
        z3 = f.add_many([(t1, t2b)])[0]
        t1d = f.sub_many([(t1, t2b)])[0]
        a, b, c, d, e, g = f.mul_many(
            [
                (t4, y3b),
                (t3, t1d),
                (y3b, t0_3),
                (t1d, z3),
                (t0_3, t3),
                (z3, t4),
            ]
        )
        x3 = f.sub_many([(b, a)])[0]
        y3o, z3o = f.add_many([(d, c), (g, e)])
        return (x3, y3o, z3o)

    def add_mixed(self, p, aff):
        """Algorithm 8 (a = 0, z2 = 1) plus identity masking for the affine
        operand (g1.rs:715-751 semantics)."""
        f = self.f
        x1, y1, z1 = p
        x2, y2, inf2 = aff
        if f.fused_add_mixed is not None:
            out = f.fused_add_mixed(p, (x2, y2))
            if out is not None:
                return tuple(
                    f.select(inf2, a_, b_) for a_, b_ in zip(p, out)
                )
        if f.add_many is None or not _small_batch(f.batch_of(x1)):
            t0, t1, m3, xz, yz = f.mul_many(
                [
                    (x1, x2),
                    (y1, y2),
                    (f.add(x2, y2), f.add(x1, y1)),
                    (x2, z1),
                    (y2, z1),
                ]
            )
            t3 = f.sub(m3, f.add(t0, t1))
            t4 = f.add(yz, y1)
            y3m = f.add(xz, x1)
            t0_3 = f.add(f.add(t0, t0), t0)
            t2 = f.mul_b3(z1)
            z3 = f.add(t1, t2)
            t1d = f.sub(t1, t2)
            y3b = f.mul_b3(y3m)
            a, b, c, d, e, g = f.mul_many(
                [
                    (t4, y3b),
                    (t3, t1d),
                    (y3b, t0_3),
                    (t1d, z3),
                    (t0_3, t3),
                    (z3, t4),
                ]
            )
            out = (f.sub(b, a), f.add(d, c), f.add(g, e))
            return tuple(f.select(inf2, a_, b_) for a_, b_ in zip(p, out))
        batch = f.batch_of(x1)
        pre = f.add_many([(x2, y2), (x1, y1)])
        # stage 1 + b3*Z1 folded in as a constant multiply
        t0, t1, m3, xz, yz, t2 = f.mul_many(
            [
                (x1, x2),
                (y1, y2),
                (pre[0], pre[1]),
                (x2, z1),
                (y2, z1),
                (z1, f.b3c(batch)),
            ]
        )
        s = f.add_many(
            [(t0, t1), (yz, y1), (xz, x1), (t0, t0), (t1, t2)]
        )
        t4, y3m, z3 = s[1], s[2], s[4]
        t3 = f.sub_many([(m3, s[0]), (t1, t2)])
        t1d = t3[1]
        t3 = t3[0]
        t0_3 = f.add_many([(s[3], t0)])[0]
        y3b = f.mul(y3m, f.b3c(batch))
        a, b, c, d, e, g = f.mul_many(
            [
                (t4, y3b),
                (t3, t1d),
                (y3b, t0_3),
                (t1d, z3),
                (t0_3, t3),
                (z3, t4),
            ]
        )
        x3 = f.sub_many([(b, a)])[0]
        y3o, z3o = f.add_many([(d, c), (g, e)])
        out = (x3, y3o, z3o)
        # affine identity -> return p unchanged
        return tuple(f.select(inf2, a_, b_) for a_, b_ in zip(p, out))

    # -- scalar multiplication ----------------------------------------------

    def scalar_mul_bits(self, p, bits):
        """Constant-schedule double-and-add over a [n_bits, *batch] bool bit
        tensor (MSB first) — the batched analog of g1.rs:754-774."""
        f = self.f

        def step(acc, bit):
            acc = self.double(acc)
            added = self.add(acc, p)
            acc = tuple(f.select(bit, a, b) for a, b in zip(added, acc))
            return acc, None

        batch = f.batch_of(p[0])
        acc, _ = jax.lax.scan(step, self.identity(batch), bits)
        return acc

    def scalar_mul_windowed(self, p, digits, window: int = 4):
        """Fixed-window scalar multiplication over [n_digits, *batch] digit
        tensors (MSB-first, each in [0, 2^window)).

        The reference's wNAF recommendation tables (g1.rs:989-1005) are the
        CPU analog of this window sizing; on TPU a dense table + masked
        gather keeps the schedule static.  Complete formulas make the
        digit-0 case free (adds the identity).
        """
        f = self.f
        m = 1 << window
        tbl = [self.identity(f.batch_of(p[0])), p]
        for _ in range(2, m):
            tbl.append(self.add(tbl[-1], p))
        # stack leaves: [m, ...leaf...]
        table = jax.tree.map(lambda *xs: jnp.stack(xs), *tbl)

        def lookup(digit):
            def take(leaf):
                sel = leaf
                for b in range(window - 1, -1, -1):
                    bit = ((digit >> b) & 1).astype(bool)
                    mask = bit[(None,) * (sel.ndim - 1 - bit.ndim) + (...,)]
                    half = sel.shape[0] // 2
                    sel = jnp.where(mask, sel[half:], sel[:half])
                return sel[0]

            return jax.tree.map(take, table)

        def step(acc, digit):
            for _ in range(window):
                acc = self.double(acc)
            acc = self.add(acc, lookup(digit))
            return acc, None

        acc, _ = jax.lax.scan(step, self.identity(f.batch_of(p[0])), digits)
        return acc

    def multi_scalar_mul_windowed(self, points, digits_list, window: int = 4):
        """sum_i [k_i] P_i with SHARED doublings (Straus/interleaved windows):
        one pass of n_digit steps, each = `window` doublings + one table add
        per point.  This is the engine behind the GLV/GLS endomorphism-split
        scalar multiplications (digits_list entries may have different
        lengths; shorter ones are processed only in the trailing steps).
        """
        f = self.f
        m = 1 << window
        batch = f.batch_of(points[0][0])
        tables = []
        for p in points:
            tbl = [self.identity(batch), p]
            for _ in range(2, m):
                tbl.append(self.add(tbl[-1], p))
            tables.append(jax.tree.map(lambda *xs: jnp.stack(xs), *tbl))

        def lookup(table, digit):
            # binary select tree (log2 m masked selects) — take_along_axis
            # gathers are an order of magnitude slower on TPU lanes
            def take(leaf):
                sel = leaf
                for b in range(window - 1, -1, -1):
                    bit = ((digit >> b) & 1).astype(bool)
                    mask = bit[(None,) * (sel.ndim - 1 - bit.ndim) + (...,)]
                    half = sel.shape[0] // 2
                    sel = jnp.where(mask, sel[half:], sel[:half])
                return sel[0]

            return jax.tree.map(take, table)

        n_steps = max(d.shape[0] for d in digits_list)
        padded = []
        for d in digits_list:
            if d.shape[0] < n_steps:
                pad = jnp.zeros((n_steps - d.shape[0],) + d.shape[1:],
                                dtype=d.dtype)
                d = jnp.concatenate([pad, d])
            padded.append(d)
        stacked = jnp.stack(padded, axis=1)  # [n_steps, n_points, *batch]

        def step(acc, digs):
            for _ in range(window):
                acc = self.double(acc)
            for i, tbl in enumerate(tables):
                acc = self.add(acc, lookup(tbl, digs[i]))
            return acc, None

        acc, _ = jax.lax.scan(step, self.identity(batch), stacked)
        return acc

    def multi_scalar_mul_signed(self, points, signed_digits_list,
                                window: int = 4, lookup: str = "onehot"):
        """sum_i [k_i] P_i with shared doublings over BALANCED window digits.

        signed_digits_list: [(mags, negs), ...] per point, MSB-first
        [n_digits, *batch] with mags in [0, 2^(w-1)] (limbs.signed_digits_msb).
        Balanced digits halve the table (entries identity, P .. 2^(w-1) P;
        sign = one masked y-negate), and the lookup is a one-hot
        multiply-accumulate over the entry axis — one contiguous VPU pass
        over (2^(w-1)+1) entries instead of a 2^w-leaf masked-select tree,
        which round-3 profiling showed was pure HBM traffic dominating the
        whole scalar mul (round-3 verdict weak #5).
        """
        f = self.f
        half = 1 << (window - 1)
        batch = f.batch_of(points[0][0])
        tables = []
        for p in points:
            tbl = [self.identity(batch), p]
            for _ in range(2, half + 1):
                tbl.append(self.add(tbl[-1], p))
            tables.append(jax.tree.map(lambda *xs: jnp.stack(xs), *tbl))

        def take_onehot(table, mag):
            def take(leaf):
                idx = jnp.arange(leaf.shape[0], dtype=mag.dtype)
                oh = (
                    idx[(slice(None),) + (None,) * (leaf.ndim - 1)]
                    == mag[None]
                ).astype(leaf.dtype)
                return (leaf * oh).sum(axis=0)

            return jax.tree.map(take, table)

        def take_tree(table, mag):
            # binary masked-select tree over the (padded) entry axis
            def take(leaf):
                m = 1
                while m < leaf.shape[0]:
                    m *= 2
                if m != leaf.shape[0]:
                    pad = [(0, m - leaf.shape[0])] + [(0, 0)] * (leaf.ndim - 1)
                    leaf = jnp.pad(leaf, pad)
                sel = leaf
                b = m.bit_length() - 2
                while sel.shape[0] > 1:
                    bit = ((mag >> b) & 1).astype(bool)
                    mask = bit[(None,) * (sel.ndim - 1 - bit.ndim) + (...,)]
                    h = sel.shape[0] // 2
                    sel = jnp.where(mask, sel[h:], sel[:h])
                    b -= 1
                return sel[0]

            return jax.tree.map(take, table)

        take_fn = take_onehot if lookup == "onehot" else take_tree

        n_steps = max(m.shape[0] for m, _ in signed_digits_list)
        padded_m, padded_n = [], []
        for m, ng in signed_digits_list:
            if m.shape[0] < n_steps:
                zpad = jnp.zeros((n_steps - m.shape[0],) + m.shape[1:],
                                 dtype=m.dtype)
                fpad = jnp.zeros((n_steps - ng.shape[0],) + ng.shape[1:],
                                 dtype=bool)
                m = jnp.concatenate([zpad, m])
                ng = jnp.concatenate([fpad, ng])
            padded_m.append(m)
            padded_n.append(ng)
        stacked_m = jnp.stack(padded_m, axis=1)  # [n_steps, n_pts, *batch]
        stacked_n = jnp.stack(padded_n, axis=1)

        def step(acc, digs):
            mags, negs = digs
            for _ in range(window):
                acc = self.double(acc)
            for i, tbl in enumerate(tables):
                pt = take_fn(tbl, mags[i])
                # masked y-negate; (0 : -1 : 0) is still the identity class
                pt = (pt[0], f.select(negs[i], f.neg(pt[1]), pt[1]), pt[2])
                acc = self.add(acc, pt)
            return acc, None

        acc, _ = jax.lax.scan(
            step, self.identity(batch), (stacked_m, stacked_n)
        )
        return acc

    def mul_by_const(self, p, k: int, n_bits: int | None = None):
        """Multiply by a static public integer (fixed bit schedule; the analog
        of mul_by_x, g1.rs:777-795).  Negative k negates the result."""
        f = self.f
        kk = abs(k)
        nb = n_bits or kk.bit_length()
        bits = np.array([(kk >> (nb - 1 - i)) & 1 for i in range(nb)],
                        dtype=np.bool_)
        batch = f.batch_of(p[0])
        bits_b = jnp.broadcast_to(
            jnp.asarray(bits)[(...,) + (None,) * len(batch)],
            (nb,) + tuple(batch),
        )
        out = self.scalar_mul_bits(p, bits_b)
        return self.neg(out) if k < 0 else out

    # -- normalization -------------------------------------------------------

    def to_affine(self, p, inv_fn):
        """Projective -> affine with an identity mask; identity decodes to
        (0, 1, inf=True) like the reference's G1Affine::identity()."""
        f = self.f
        x, y, z = p
        inf = f.is_zero(z)
        zinv = inv_fn(z)  # 0 -> 0
        ax, ay = f.mul_many([(x, zinv), (y, zinv)])
        batch = f.batch_of(x)
        ax = f.select(inf, f.zero(batch), ax)
        ay = f.select(inf, f.one(batch), ay)
        return (ax, ay, inf)
