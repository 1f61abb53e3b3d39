"""Batched multi-limb modular arithmetic over 16-bit limbs in uint32 lanes.

This is the TPU-native replacement for the reference's u64 carry-chain layer
(reference: src/util.rs adc/sbb/mac + src/fp.rs / src/scalar.rs Montgomery
arithmetic).  Design:

  - A field element batch is a uint32 tensor of shape [L, *batch] — limbs on
    axis 0 (little-endian, 16 bits per limb), batch dimensions trailing so
    the batch maps onto TPU lanes.
  - Montgomery form with R = 2^(16*L): identical numeric domain to the
    reference (R = 2^384 for Fp, fp.rs:13; 2^256 for Scalar, scalar.rs:20),
    so device-internal values are bit-identical to the reference's.
  - 16-bit limbs make every partial product fit a uint32 exactly
    (max (2^16-1)^2 < 2^32), and let whole product columns accumulate
    without carries: a column absorbs <= 2L terms per operand pair, so a
    T-term fused sum-of-products stays < 2^32 for T <= ~1000.  Carries are
    propagated once per Montgomery reduction round (lazy/deferred carry
    discipline) — the TPU analog of the reference's `sum_of_products`
    interleaved reduction (fp.rs:430-484, ePrint 2022/367).
  - All stored values are canonical (< p), matching the reference invariant,
    so equality is limbwise comparison and byte codecs are direct.

Everything here is pure jax.numpy over static shapes — jittable, vmappable,
shardable.  The Pallas kernels in bls12_381_tpu/kernels fuse the same
algorithms into single-VMEM-pass kernels for the hot paths.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import params

LIMB_BITS = params.LIMB_BITS
MASK = np.uint32(params.LIMB_MASK)


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static description of a prime field in limb form."""

    name: str
    modulus: int
    n_limbs: int
    inv16: int                 # -p^-1 mod 2^16
    p_limbs: np.ndarray        # [L] uint32
    p2_limbs: np.ndarray       # [L+1] uint32, 2*p (for lazy bounds checks)
    r2_limbs: np.ndarray       # [L] uint32, R^2 mod p (Montgomery conversion)
    r3_limbs: np.ndarray       # [L] uint32, R^3 mod p (wide-byte reduction)
    one_mont: np.ndarray       # [L] uint32, R mod p (Montgomery one)

    @staticmethod
    def make(name: str, modulus: int, n_limbs: int) -> "FieldSpec":
        r = 1 << (LIMB_BITS * n_limbs)

        def limbs(v, n=n_limbs):
            return np.array(params.to_limbs(v, n), dtype=np.uint32)

        return FieldSpec(
            name=name,
            modulus=modulus,
            n_limbs=n_limbs,
            inv16=(-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS),
            p_limbs=limbs(modulus),
            p2_limbs=limbs(2 * modulus, n_limbs + 1),
            r2_limbs=limbs(r * r % modulus),
            r3_limbs=limbs(r * r % modulus * r % modulus),
            one_mont=limbs(r % modulus),
        )


FP = FieldSpec.make("fp", params.P, params.FP_LIMBS)
FR = FieldSpec.make("fr", params.Q, params.FR_LIMBS)


def _bcast(const: np.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a [L] constant against [L, *batch]."""
    return jnp.asarray(const).reshape(const.shape + (1,) * (a.ndim - 1))


# ---------------------------------------------------------------------------
# Carry propagation and canonical reduction
# ---------------------------------------------------------------------------


def _kogge_stone(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Carry chain: given per-limb generate/propagate bools [K, *batch],
    return the carry OUT of each position.

    Implemented by packing the g/p bits of all K limbs into ONE uint32 lane
    (K <= 31 always holds: 25 for Fp, 17 for Fr) and resolving the entire
    chain with the packed-adder identity

        A = G | P',  S = A + G,  carry_in_bits = S ^ A ^ G

    (P' = propagate-and-not-generate, so A + G emulates a 1-bit-per-limb
    adder: limbs with g have a=b=1 and always carry out; limbs with p'
    have a=1, b=0 and forward the incoming carry).  This is a handful of
    flat integer ops — far cheaper to compile AND run than a log-depth
    associative scan over the limb axis.
    """
    K = g.shape[0]
    if K > 31:
        # wide intermediates (Barrett products): log-depth associative scan
        def op(lower, upper):
            lg, lp = lower
            ug, up = upper
            return (ug | (up & lg), lp & up)

        out_g, _ = jax.lax.associative_scan(op, (g, p), axis=0)
        return out_g
    w = jnp.asarray(np.arange(K, dtype=np.uint32)).reshape(
        (K,) + (1,) * (g.ndim - 1)
    )
    G = jnp.sum(g.astype(jnp.uint32) << w, axis=0)
    Pp = jnp.sum((p & ~g).astype(jnp.uint32) << w, axis=0)
    A = G | Pp
    carry_in = (A + G) ^ A ^ G  # bit k = carry INTO position k
    carry_out = carry_in >> jnp.uint32(1)  # bit k = carry OUT of position k
    return ((carry_out[None] >> w) & jnp.uint32(1)).astype(bool)


def _carry_prop_1bit(s: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Normalize limbwise sums s ([K, *batch], values < 2^17 + 2^6) into n_out
    clean 16-bit limbs via one split + carry-lookahead."""
    lo = s & MASK
    hi = s >> LIMB_BITS  # in {0, 1} after the caller's pre-split
    g = hi != 0
    p = lo == MASK
    carry_out = _kogge_stone(g, p)
    cin = jnp.concatenate([jnp.zeros_like(carry_out[:1]), carry_out[:-1]])
    out = (lo + cin.astype(jnp.uint32)) & MASK
    cols = [out]
    if n_out > s.shape[0]:
        top = carry_out[-1].astype(jnp.uint32)[None]
        cols.append(top)
        if n_out > s.shape[0] + 1:
            cols.append(
                jnp.zeros((n_out - s.shape[0] - 1,) + s.shape[1:], jnp.uint32)
            )
    return jnp.concatenate(cols)[:n_out]


def _pad_rows(arr: jnp.ndarray, width: int) -> jnp.ndarray:
    if arr.shape[0] >= width:
        return arr[:width]
    pad = jnp.zeros((width - arr.shape[0],) + arr.shape[1:], jnp.uint32)
    return jnp.concatenate([arr, pad])


def _carry_prop(t: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Propagate carries over lazy columns (values < 2^26) producing n_out
    clean 16-bit limbs: one multi-bit shift-add pass reduces to the 1-bit
    case, then carry-lookahead finishes."""
    lo = t & MASK
    c = t >> LIMB_BITS  # multi-bit carries (< 2^10 by column bounds)
    shifted = jnp.concatenate([jnp.zeros_like(c[:1]), c])  # [K+1, *batch]
    width = max(t.shape[0] + 1, n_out)
    s = _pad_rows(lo, width) + _pad_rows(shifted, width)
    # s values < 2^16 + 2^10: 1-bit carries from here
    return _carry_prop_1bit(s, n_out)


def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray, n: int):
    """a - b via borrow-lookahead; returns (diff [n,*batch], borrow [*batch]).

    a and b are limb tensors (broadcastable shapes, first axis >= n).
    """
    a = a[:n]
    b = jnp.broadcast_to(b[:n], jnp.broadcast_shapes(a.shape, b[:n].shape))
    a = jnp.broadcast_to(a, b.shape)
    g = a < b
    p = a == b
    borrow_out = _kogge_stone(g, p)
    bin_ = jnp.concatenate([jnp.zeros_like(borrow_out[:1]), borrow_out[:-1]])
    diff = (a - b - bin_.astype(jnp.uint32)) & MASK
    return diff, borrow_out[-1].astype(jnp.uint32)


def _cond_sub_p(spec: FieldSpec, t: jnp.ndarray) -> jnp.ndarray:
    """Conditionally subtract p: returns (t - p if t >= p else t) as L limbs.

    t: [L or L+1, *batch] clean 16-bit limbs, value < 2p (so any carry limb
    is folded by the subtraction when present).
    """
    L = spec.n_limbs
    n_in = t.shape[0]
    p_ext = np.zeros(n_in, dtype=np.uint32)
    p_ext[:L] = spec.p_limbs
    diff, borrow = _sub_limbs(t, _bcast(p_ext, t), n_in)
    take_diff = borrow == 0
    return jnp.where(take_diff[None], diff[:L], t[:L])


# ---------------------------------------------------------------------------
# Add / sub / neg (reference semantics: fp.rs:361-427)
# ---------------------------------------------------------------------------


def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    # value < 2p < 2^(16L+1); the L+1-limb conditional subtraction folds the
    # carry limb
    t = _carry_prop_1bit(a + b, spec.n_limbs + 1)
    return _cond_sub_p(spec, t)


def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    diff, borrow = _sub_limbs(a, b, spec.n_limbs)
    # if borrowed, add p back (result computed mod 2^(16 L))
    p = _bcast(spec.p_limbs, diff)
    fixed = _carry_prop_1bit(
        diff + jnp.where(borrow[None] != 0, p, jnp.uint32(0)), spec.n_limbs
    )
    return fixed


def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    p = _bcast(spec.p_limbs, a)
    diff, _ = _sub_limbs(jnp.broadcast_to(p, a.shape), a, spec.n_limbs)
    # p - 0 = p must map back to 0: mask by a != 0
    return jnp.where(~is_zero(a)[None], diff, jnp.zeros_like(a))


def double(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(spec, a, a)


_GLUE_BATCH_MAX = 2048  # above this many lanes the stack copies cost more
# than the saved launches (adds become bandwidth-bound, not launch-bound)


def add_many(spec: FieldSpec, pairs):
    """K independent modular additions folded into ONE carry network.

    At small batch sizes the per-op launch + carry-lookahead cost dominates
    elementwise work, so stacking K adds into [L, K, *batch] makes the whole
    group cost one network (the glue analog of sop_fold).  At large batch
    sizes the stacking copies dominate instead, so this falls back to
    per-pair adds.  Returns a list.
    """
    batch = jnp.broadcast_shapes(*[x.shape[1:] for p in pairs for x in p])
    if len(pairs) == 1 or int(np.prod(batch, dtype=np.int64)) > _GLUE_BATCH_MAX:
        return [add(spec, a, b) for a, b in pairs]
    full = (spec.n_limbs,) + batch
    a = jnp.stack([jnp.broadcast_to(x, full) for x, _ in pairs], axis=1)
    b = jnp.stack([jnp.broadcast_to(y, full) for _, y in pairs], axis=1)
    t = _carry_prop_1bit(a + b, spec.n_limbs + 1)
    out = _cond_sub_p(spec, t)
    return [out[:, i] for i in range(len(pairs))]


def sub_many(spec: FieldSpec, pairs):
    """K independent modular subtractions in ONE borrow network (same
    batch-size adaptivity as add_many)."""
    batch = jnp.broadcast_shapes(*[x.shape[1:] for p in pairs for x in p])
    if len(pairs) == 1 or int(np.prod(batch, dtype=np.int64)) > _GLUE_BATCH_MAX:
        return [sub(spec, a, b) for a, b in pairs]
    full = (spec.n_limbs,) + batch
    a = jnp.stack([jnp.broadcast_to(x, full) for x, _ in pairs], axis=1)
    b = jnp.stack([jnp.broadcast_to(y, full) for _, y in pairs], axis=1)
    diff, borrow = _sub_limbs(a, b, spec.n_limbs)
    p = _bcast(spec.p_limbs, diff)
    fixed = _carry_prop_1bit(
        diff + jnp.where(borrow[None] != 0, p, jnp.uint32(0)), spec.n_limbs
    )
    return [fixed[:, i] for i in range(len(pairs))]


# ---------------------------------------------------------------------------
# Montgomery multiplication (the hot path)
# ---------------------------------------------------------------------------


def _product_columns(a: jnp.ndarray, b: jnp.ndarray, L: int) -> jnp.ndarray:
    """Schoolbook product of two [L,*batch] limb tensors as 2L+1 lazy columns.

    Column k accumulates lo16(a_i*b_j) for i+j=k and hi16 for i+j=k-1 — no
    carries yet (each column stays far below 2^32, see module docstring).
    Implemented as one outer product + two anti-diagonal segment-sums so the
    traced graph is a handful of ops instead of O(L^2).
    """
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    prod = a[:, None] * b[None, :]  # [L, L, *batch], exact (inputs < 2^16)
    flat = prod.reshape((L * L,) + batch)
    lo = flat & MASK
    hi = flat >> LIMB_BITS
    ids = (np.arange(L)[:, None] + np.arange(L)[None, :]).reshape(-1)
    cols = jax.ops.segment_sum(lo, ids, num_segments=2 * L + 1)
    cols = cols + jax.ops.segment_sum(hi, ids + 1, num_segments=2 * L + 1)
    return cols


def _mont_reduce(spec: FieldSpec, t: jnp.ndarray) -> jnp.ndarray:
    """Montgomery reduction of [2L+1,*batch] lazy columns -> canonical limbs.

    Per round: m = t_0 * inv16 mod 2^16; add m*p into columns 0..L; forward
    t_0's carry; shift the column window left.  (The 16-bit-digit analog of
    the reference's montgomery_reduce, fp.rs:487-562.)  Implemented as a
    lax.scan over a shift register so the round body — with only static
    slice offsets — is traced and compiled exactly once.
    """
    L = spec.n_limbs
    inv16 = jnp.uint32(spec.inv16)
    p = _bcast(spec.p_limbs, t)  # [L, *batch]
    zero_row = jnp.zeros((1,) + t.shape[1:], dtype=jnp.uint32)

    def round_fn(state, _):
        m = (state[0] * inv16) & MASK  # [*batch]
        mp = m[None] * p  # [L, *batch]
        lo = mp & MASK
        hi = mp >> LIMB_BITS
        state = state.at[:L].add(lo)
        state = state.at[1 : L + 1].add(hi)
        # state[0] is now divisible by 2^16; forward its carry and drop it
        state = state.at[1].add(state[0] >> LIMB_BITS)
        state = jnp.concatenate([state[1:], zero_row])
        return state, None

    state, _ = jax.lax.scan(round_fn, t, None, length=L)
    out = _carry_prop(state[: L + 1], L + 1)
    return _cond_sub_p(spec, out)


def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Canonical Montgomery product aR * bR -> abR mod p."""
    return sum_of_products(spec, [(a, b)])


def mont_sqr(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Canonical Montgomery square; routes to the dedicated squaring kernel
    (off-diagonal products computed once) on TPU backends."""
    if _use_pallas():
        from .kernels import pallas_mont

        L = spec.n_limbs
        batch = a.shape[1:]
        flat = int(np.prod(batch)) if batch else 1
        out = pallas_mont.sqr_pallas(
            a.reshape(1, L, flat),
            n_limbs=L,
            inv16=spec.inv16,
            p_limbs=tuple(int(x) for x in spec.p_limbs),
            version=_kernel_version(),
        )
        return out.reshape((L,) + batch)
    return mont_mul(spec, a, a)


_PALLAS_MODE = None  # None = auto-detect; True/False = forced


def set_pallas(enabled: bool | None):
    """Force (or re-enable auto-detection of) the Pallas kernel path."""
    global _PALLAS_MODE
    _PALLAS_MODE = enabled


def _use_pallas() -> bool:
    if _PALLAS_MODE is not None:
        return _PALLAS_MODE
    import os

    if os.environ.get("BLS12_381_TPU_NO_PALLAS"):
        return False
    try:
        from . import config

        if config.get().pallas is not None:
            return config.get().pallas
    except Exception:
        pass
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


def _kernel_version() -> int:
    """sop/sqr kernel version from config.plan_variant: 3 = per-limb
    registers (default; ~2x ALU throughput), 4 = vectorized limbvec —
    scoped on by trace-bound graphs (MSM bucket scans instantiate field
    ops at ~log B distinct shapes; see ops/msm.msm_g1)."""
    try:
        from . import config

        return 4 if config.get().plan_variant == "vector" else 3
    except Exception:  # pragma: no cover - config import cycles
        return 3


def _sop_via_pallas(spec: FieldSpec, pairs) -> jnp.ndarray:
    from .kernels import pallas_mont  # local import: optional dependency path

    batch = jnp.broadcast_shapes(*[x.shape[1:] for p in pairs for x in p])
    L = spec.n_limbs
    full = (L,) + batch
    a_stack = jnp.stack([jnp.broadcast_to(a, full) for a, _ in pairs])
    b_stack = jnp.stack([jnp.broadcast_to(b, full) for _, b in pairs])
    flat = int(np.prod(batch)) if batch else 1
    out = pallas_mont.sop_pallas(
        a_stack.reshape(len(pairs), L, flat),
        b_stack.reshape(len(pairs), L, flat),
        n_limbs=L,
        inv16=spec.inv16,
        p_limbs=tuple(int(x) for x in spec.p_limbs),
        version=_kernel_version(),
    )
    return out.reshape(full)


def sum_of_products(spec: FieldSpec, pairs) -> jnp.ndarray:
    """Fused sum_i a_i * b_i with a single Montgomery reduction.

    The TPU analog of the reference's Fp::sum_of_products (fp.rs:430-484):
    one reduction amortized over T products.  The fused path requires
    T <= 8 so the pre-reduction value stays < 2p (T * p^2 / R + p < 2p for
    p < R/8); arbitrary T (fp.rs handles any slice length) is supported by
    chunking into fused groups of 8 and mod-adding the partials.

    Routes to the fused Pallas kernel on TPU backends; the pure-jnp path is
    the bit-exact fallback (and the CPU test path).
    """
    pairs = list(pairs)
    if len(pairs) > 8:
        parts = [
            sum_of_products(spec, pairs[i: i + 8])
            for i in range(0, len(pairs), 8)
        ]
        return functools.reduce(lambda x, y: add(spec, x, y), parts)
    if _use_pallas():
        return _sop_via_pallas(spec, pairs)
    L = spec.n_limbs
    cols = _product_columns(pairs[0][0], pairs[0][1], L)
    for a, b in pairs[1:]:
        cols = cols + _product_columns(a, b, L)
    return _mont_reduce(spec, cols)


def _sop_fold_planned(spec: FieldSpec, groups):
    """Route a fold through the operand-deduplicating planned kernel:
    distinct operand tensors are stacked ONCE ([K, L, B]) with static [G, T]
    index plans, instead of duplicating operands per (group, term)."""
    from .kernels import pallas_mont

    L = spec.n_limbs
    batch = jnp.broadcast_shapes(
        *[x.shape[1:] for grp in groups for pair in grp for x in pair]
    )
    flat = int(np.prod(batch)) if batch else 1
    ops = [jnp.zeros((L,) + batch, jnp.uint32)]  # row 0 = zeros (pad slot)
    ids: dict[int, int] = {}

    def reg(x):
        key = id(x)
        if key not in ids:
            ids[key] = len(ops)
            ops.append(jnp.broadcast_to(x, (L,) + batch))
        return ids[key]

    t = max(len(grp) for grp in groups)
    ia = np.zeros((len(groups), t), np.int32)
    ib = np.zeros((len(groups), t), np.int32)
    for gi, grp in enumerate(groups):
        for ti, (a, b) in enumerate(grp):
            ia[gi, ti] = reg(a)
            ib[gi, ti] = reg(b)
    stack = jnp.stack(ops).reshape(len(ops), L, flat)
    out = pallas_mont.fold_planned_pallas(
        stack,
        jnp.asarray(ia),
        jnp.asarray(ib),
        n_limbs=L,
        inv16=spec.inv16,
        p_limbs=tuple(int(x) for x in spec.p_limbs),
        n_terms=t,
        variant="vector" if _kernel_version() >= 4 else "scalar",
    )
    out = out.reshape((len(groups), L) + batch)
    return [out[i] for i in range(len(groups))]


def sop_fold(spec: FieldSpec, groups):
    """Many independent sum-of-products, folded into ONE batched reduction.

    groups: list of G groups, each a list of (a, b) operand pairs (uneven
    lengths allowed — shorter groups are zero-padded).  All operands must
    share a common batch shape.  Returns a list of G results.

    This is the key batching lever for the jnp path: G independent field
    multiplications become one [L, G, *batch] tensor pipeline — G times
    fewer traced ops, and G times wider VPU lanes.
    """
    g = len(groups)
    if g == 1:
        return [sum_of_products(spec, groups[0])]
    if g >= 4 and _use_pallas() and max(len(grp) for grp in groups) <= 6:
        from . import config

        if config.get().fold_dedup and (16 * spec.n_limbs) % 12 == 0:
            return _sop_fold_planned(spec, groups)
    t = max(len(grp) for grp in groups)
    assert t <= 8
    batch = jnp.broadcast_shapes(
        *[x.shape[1:] for grp in groups for pair in grp for x in pair]
    )
    zero_el = jnp.zeros((spec.n_limbs,) + batch, dtype=jnp.uint32)

    def stacked(term_idx, which):
        parts = []
        for grp in groups:
            if term_idx < len(grp):
                parts.append(
                    jnp.broadcast_to(grp[term_idx][which],
                                     (spec.n_limbs,) + batch)
                )
            else:
                parts.append(zero_el)
        return jnp.stack(parts, axis=1)  # [L, G, *batch]

    pairs = [(stacked(i, 0), stacked(i, 1)) for i in range(t)]
    out = sum_of_products(spec, pairs)  # [L, G, *batch]
    return [out[:, i] for i in range(g)]


def mul_many(spec: FieldSpec, pairs):
    """Independent products a_i * b_i folded into one batched reduction."""
    return sop_fold(spec, [[p] for p in pairs])


# ---------------------------------------------------------------------------
# Plain (non-modular) integer helpers — used by GLV/GLS scalar decomposition
# ---------------------------------------------------------------------------


def plain_mul_const(a: jnp.ndarray, const: int, n_out: int) -> jnp.ndarray:
    """Exact integer product of a limb tensor with a static nonnegative int,
    truncated to n_out 16-bit limbs (i.e. mod 2^(16*n_out))."""
    assert const >= 0
    n = a.shape[0]
    m = params.to_limbs(const, max(const.bit_length() + 15, 16) // 16)
    L = max(n, len(m))
    a_pad = _pad_rows(a, L)
    m_arr = np.zeros(L, dtype=np.uint32)
    m_arr[: len(m)] = m
    cols = _product_columns(a_pad, _bcast(m_arr, a_pad), L)
    return _carry_prop(cols, n_out)


def shift_right_limbs(a: jnp.ndarray, n_limbs: int) -> jnp.ndarray:
    """Drop the low n_limbs 16-bit limbs (a >> 16*n_limbs)."""
    return a[n_limbs:]


def plain_sub(a: jnp.ndarray, b: jnp.ndarray, n: int):
    """Exact a - b over n limbs; returns (diff, borrow_mask)."""
    diff, borrow = _sub_limbs(_pad_rows(a, n), _pad_rows(b, n), n)
    return diff, borrow != 0


def plain_geq(a: jnp.ndarray, b: jnp.ndarray, n: int) -> jnp.ndarray:
    """a >= b over n limbs."""
    _, borrow = _sub_limbs(_pad_rows(a, n), _pad_rows(b, n), n)
    return borrow == 0


def barrett_divmod(a: jnp.ndarray, d: int, q_limbs: int):
    """(floor(a/d), a mod d) for an n-limb tensor and a static divisor d.

    Precomputes M = floor(2^(16n)/d); q_hat = floor(a*M / 2^(16n)) is within
    one of the true quotient (error < a/2^(16n) < 1), fixed by one masked
    correction.  Returns (q [q_limbs, *batch], r [n, *batch]).

    PRECONDITION (caller-guaranteed, silently truncates otherwise): the
    quotient is computed mod 2^(16*q_limbs), so the caller must ensure
    floor(max(a) / d) < 2^(16*q_limbs).  Passing q_limbs sized from the
    VALUE bound of `a` (not its limb count) is legitimate — e.g. the GLS
    decomposition divides a 256-limb-bit tensor known to be < x^3 by x^2
    with q_limbs=5 (quotient < x < 2^64)."""
    n = a.shape[0]
    m_const = (1 << (16 * n)) // d
    prod = plain_mul_const(a, m_const, n + q_limbs)
    q = shift_right_limbs(prod, n)  # [q_limbs, *batch]
    qd = plain_mul_const(q, d, n)
    r, _ = plain_sub(a, qd, n)  # exact: q*d <= a
    d_arr = _bcast(np.array(params.to_limbs(d, n), dtype=np.uint32), r)
    too_big = plain_geq(r, d_arr, n)
    r_fix, _ = plain_sub(r, d_arr, n)
    r = select(too_big, r_fix, r)
    bump = jnp.concatenate(
        [jnp.ones((1,) + q.shape[1:], jnp.uint32),
         jnp.zeros((q_limbs - 1,) + q.shape[1:], jnp.uint32)]
    )
    q_fix = _carry_prop_1bit(q + bump, q_limbs)
    q = select(too_big, q_fix, q)
    return q, r


def digits4_msb(limbs_tensor: jnp.ndarray, n_bits: int) -> jnp.ndarray:
    """[n, *batch] 16-bit limbs -> [ceil(n_bits/4), *batch] int32 4-bit
    digits, MSB first."""
    n_digits = -(-n_bits // 4)
    rows = []
    for d in range(n_digits - 1, -1, -1):
        limb = d // 4
        rows.append(
            ((limbs_tensor[limb] >> jnp.uint32(4 * (d % 4)))
             & jnp.uint32(15)).astype(jnp.int32)
        )
    return jnp.stack(rows)


# ---------------------------------------------------------------------------
# Predicates / selection
# ---------------------------------------------------------------------------


def signed_digits_msb(limbs_tensor: jnp.ndarray, n_bits: int,
                      window: int = 4):
    """Balanced (signed) window digits of canonical limb tensors, MSB first.

    Returns (mags, negs): [n_digits, *batch] int32 magnitudes in
    [0, 2^(window-1)] and sign masks.  Balanced digits halve the lookup
    table of a windowed scalar mul (entries 1..2^(w-1); negation is one
    masked y-negate).  n_digits covers n_bits + 1 so the final borrow-carry
    always fits in a non-negative top digit.
    """
    n_digits = -(-(n_bits + 1) // window)
    half, full = 1 << (window - 1), 1 << window
    mask = np.uint32(full - 1)
    mags, negs = [], []
    carry = jnp.zeros(limbs_tensor.shape[1:], jnp.int32)
    for w in range(n_digits):  # LSB-first recode
        lo_bit = window * w
        raw = jnp.zeros(limbs_tensor.shape[1:], jnp.uint32)
        hi_limb = min((lo_bit + window - 1) // 16 + 1,
                      limbs_tensor.shape[0])
        for limb in range(lo_bit // 16, hi_limb):
            shift = limb * 16 - lo_bit
            part = limbs_tensor[limb].astype(jnp.uint32)
            raw = raw | (part << shift if shift >= 0 else part >> -shift)
        t = (raw & mask).astype(jnp.int32) + carry
        if w == n_digits - 1:
            d = t
            carry = None
        else:
            borrow = t >= half
            d = jnp.where(borrow, t - full, t)
            carry = borrow.astype(jnp.int32)
        mags.append(jnp.abs(d))
        negs.append(d < 0)
    return jnp.stack(mags[::-1]), jnp.stack(negs[::-1])


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=0)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=0)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask ? a : b, with mask of shape [*batch]."""
    return jnp.where(mask[None], a, b)


def gt_half(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """a > (p-1)/2, i.e. `lexicographically_largest` (fp.rs:273): computed as
    no-borrow on a - ((p+1)/2)."""
    half = np.array(params.to_limbs((spec.modulus + 1) // 2, spec.n_limbs),
                    dtype=np.uint32)
    _, borrow = _sub_limbs(a, _bcast(half, a), spec.n_limbs)
    return borrow == 0


def sgn0(a: jnp.ndarray) -> jnp.ndarray:
    """Parity of the canonical value (draft-16 sgn0 for m=1)."""
    return a[0] & jnp.uint32(1)


# ---------------------------------------------------------------------------
# Exponentiation (fixed public exponents; schedule is trace-time)
# ---------------------------------------------------------------------------


def pow_fixed(spec: FieldSpec, a: jnp.ndarray, exponent: int,
              window: int = 4) -> jnp.ndarray:
    """a^exponent via MSB-first fixed-window square-and-multiply.

    The exponent is a static Python int (public, like the reference's
    pow_vartime schedules and addition chains, chain.rs): the digit schedule
    is a compile-time constant.  A 2^window-entry table turns the reference's
    per-bit conditional multiply into one table multiply per window —
    ~(bits/window + 2^window) muls + bits squares instead of ~bits/2 + bits.
    The schedule is zero-padded to the field's bit width so every pow of the
    same field shares one compiled scan body.
    """
    if exponent == 0:
        return jnp.broadcast_to(_bcast(spec.one_mont, a), a.shape)
    width = max(exponent.bit_length(), spec.modulus.bit_length())
    width = -(-width // window) * window
    n_digits = width // window
    digits = np.array(
        [
            (exponent >> (window * (n_digits - 1 - i))) & ((1 << window) - 1)
            for i in range(n_digits)
        ],
        dtype=np.uint32,
    )

    one = jnp.broadcast_to(_bcast(spec.one_mont, a), a.shape)
    table = [one, jnp.broadcast_to(a, one.shape)]
    for _ in range(2, 1 << window):
        table.append(mont_mul(spec, table[-1], a))
    table_arr = jnp.stack(table)  # [2^w, L, *batch]

    def step(acc, digit):
        for _ in range(window):
            acc = mont_sqr(spec, acc)
        sel = table_arr
        for b in range(window - 1, -1, -1):
            bit = ((digit >> np.uint32(b)) & np.uint32(1)).astype(bool)
            half = sel.shape[0] // 2
            sel = jnp.where(bit, sel[half:], sel[:half])
        return mont_mul(spec, acc, sel[0]), None

    acc, _ = jax.lax.scan(step, one, jnp.asarray(digits))
    return acc


def pow_runtime(spec: FieldSpec, a: jnp.ndarray,
                exp_limbs: jnp.ndarray) -> jnp.ndarray:
    """a^e with a RUNTIME exponent tensor — the analog of `ff::Field::pow`
    (reference scalar.rs:373-390), where the exponent is data, not schedule.

    exp_limbs: canonical 16-bit limb rows [n_exp_limbs, *batch] (the same
    layout as a non-Montgomery field tensor, so `from_mont(FR, s)` output
    works directly).  Constant-schedule MSB-first square-and-multiply over
    all 16*n_exp_limbs bits with a masked multiply per bit — the batched
    translation of the reference's per-bit CtOption select.
    """
    n_bits = 16 * exp_limbs.shape[0]
    rows = [
        (((exp_limbs[j // 16] >> np.uint32(j % 16)) & np.uint32(1)) != 0)
        for j in range(n_bits - 1, -1, -1)
    ]
    bits = jnp.stack(rows)  # [n_bits, *batch] MSB-first
    one = jnp.broadcast_to(_bcast(spec.one_mont, a), a.shape)

    def step(acc, bit):
        acc = mont_sqr(spec, acc)
        mul = mont_mul(spec, acc, a)
        return select(bit, mul, acc), None

    acc, _ = jax.lax.scan(step, one, bits)
    return acc


def inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """a^(p-2); maps 0 -> 0 (callers mask identity cases like the reference's
    CtOption plumbing)."""
    return pow_fixed(spec, a, spec.modulus - 2)


def batch_inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Elementwise inverse amortized over the LAST batch axis.

    The TPU-native analog of batch_normalize's Montgomery product trick
    (reference g1.rs:806-839): log-depth prefix/suffix product scans
    (~2 log2 B batched muls) plus ONE pow inversion of the total, instead of
    a ~450-mul pow per element — ~14x less multiply work at B = 2^16.
    Zeros invert to zero (identity-skipping, like the reference's CT dance).
    """
    b = a.shape[-1] if a.ndim > 1 else 0
    if b < 16:  # scan overhead not worth it; latency of pow dominates anyway
        return inv(spec, a)
    zero_mask = is_zero(a)  # [*batch]
    safe = select(zero_mask, _bcast_full(spec.one_mont, a), a)

    # power-of-two scans (utils/scans.py): one combine instantiation per
    # level, level shapes shared process-wide — associative_scan's odd/even
    # recursion re-traced the Pallas mul kernel at ~2-3 distinct shapes per
    # level and dominated graph tracing for scan-heavy callers (MSM)
    from .utils import scans as _scans

    def combine(l, r):
        return mont_mul(spec, l, r)

    one1 = _bcast_full(spec.one_mont, a[..., :1])
    pre_incl = _scans.inclusive_scan(combine, safe, one1)
    suf_incl = _scans.suffix_scan(combine, safe, one1)
    one_col = _bcast_full(spec.one_mont, a[..., :1])
    pre_excl = jnp.concatenate([one_col, pre_incl[..., :-1]], axis=-1)
    suf_excl = jnp.concatenate([suf_incl[..., 1:], one_col], axis=-1)
    total_inv = inv(spec, pre_incl[..., -1])  # [L, *batch_rest]
    others = mont_mul(spec, pre_excl, suf_excl)  # prod_{j != i} a_j
    out = mont_mul(spec, others, total_inv[..., None])
    return select(zero_mask, jnp.zeros_like(out), out)


def _bcast_full(const: np.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    return jnp.broadcast_to(_bcast(const, like), like.shape)


# ---------------------------------------------------------------------------
# Host <-> device codecs
# ---------------------------------------------------------------------------


def from_ints(spec: FieldSpec, values, to_mont: bool = True) -> jnp.ndarray:
    """Encode python ints -> [L, *batch] uint32 (Montgomery form by default)."""
    arr = np.asarray(values, dtype=object)
    flat = arr.reshape(-1)
    r = 1 << (LIMB_BITS * spec.n_limbs)
    out = np.zeros((spec.n_limbs, flat.size), dtype=np.uint32)
    for idx, v in enumerate(flat):
        v = int(v) % spec.modulus
        if to_mont:
            v = v * r % spec.modulus
        out[:, idx] = params.to_limbs(v, spec.n_limbs)
    return jnp.asarray(out.reshape((spec.n_limbs,) + arr.shape))


def to_ints(spec: FieldSpec, a, from_mont: bool = True):
    """Decode [L, *batch] uint32 -> numpy object array of python ints."""
    arr = np.asarray(jax.device_get(a))
    batch_shape = arr.shape[1:]
    flat = arr.reshape(spec.n_limbs, -1)
    r_inv = pow(1 << (LIMB_BITS * spec.n_limbs), -1, spec.modulus)
    out = np.empty(flat.shape[1], dtype=object)
    for idx in range(flat.shape[1]):
        v = params.from_limbs(flat[:, idx])
        if from_mont:
            v = v * r_inv % spec.modulus
        out[idx] = v
    return out.reshape(batch_shape) if batch_shape else out[0]


def const(spec: FieldSpec, value: int, batch_shape=()) -> jnp.ndarray:
    """Montgomery-encode a scalar constant, broadcast over a batch shape."""
    r = 1 << (LIMB_BITS * spec.n_limbs)
    v = int(value) % spec.modulus * r % spec.modulus
    limbs = np.array(params.to_limbs(v, spec.n_limbs), dtype=np.uint32)
    return jnp.broadcast_to(
        jnp.asarray(limbs).reshape((spec.n_limbs,) + (1,) * len(batch_shape)),
        (spec.n_limbs,) + tuple(batch_shape),
    )


def zero(spec: FieldSpec, batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((spec.n_limbs,) + tuple(batch_shape), dtype=jnp.uint32)


def one(spec: FieldSpec, batch_shape=()) -> jnp.ndarray:
    return const(spec, 1, batch_shape)


def to_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Canonical residue -> Montgomery form (multiply by R^2)."""
    return mont_mul(spec, a, _bcast(spec.r2_limbs, a))


def wide_reduce(spec: FieldSpec, lo: jnp.ndarray, hi: jnp.ndarray):
    """(lo + hi * R) mod p in Montgomery form, for RAW limb tensors lo, hi
    (any value < R, not necessarily canonical).

    The device analog of the reference's from_bytes_wide trick
    (scalar.rs:300-331): mont_mul(lo, R^2) = lo*R and mont_mul(hi, R^3) =
    hi*R*R, summed.  The Montgomery-reduction bound result <= a*b/R + p < 2p
    only needs ONE canonical operand (the R^2/R^3 constants), so the raw
    inputs are legal."""
    l = mont_mul(spec, lo, _bcast(spec.r2_limbs, lo))
    h = mont_mul(spec, hi, _bcast(spec.r3_limbs, hi))
    return add(spec, l, h)


def from_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical residue (reduce against 1)."""
    L = spec.n_limbs
    pad = jnp.zeros((L + 1,) + a.shape[1:], dtype=jnp.uint32)
    return _mont_reduce(spec, jnp.concatenate([a, pad]))
