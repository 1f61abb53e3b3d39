"""Pallas TPU kernel: fused batched Montgomery sum-of-products.

The single hot primitive of the whole framework (every field/tower/curve/
pairing multiplication routes through limbs.sum_of_products).  The jnp path
materializes [L, L, B] partial-product tensors in HBM; this kernel keeps the
entire schoolbook product + Montgomery reduction in VMEM, so HBM traffic is
one read of the operands and one write of the result:

  per block [T, L, Bb]:
    phase 1: T*L outer-product rows accumulated into 2L+1 lazy columns
    phase 2: L Montgomery rounds (m = t_k * inv16 mod 2^16; add m*p; shift)
    phase 3: carry ripple + conditional subtract p

Bounds are identical to the jnp path (see limbs.py module docs): 16-bit limbs
in uint32 lanes, T <= 8, column values < 2^26.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbvec as lv

MASK = np.uint32(0xFFFF)
LIMB_BITS = 16


def _const_col(vals) -> jnp.ndarray:
    """[L, 1] uint32 modulus column.  Pallas kernels cannot capture array
    constants, so the column is passed as an extra kernel INPUT with a
    block-constant BlockSpec (fetched to VMEM once per block)."""
    return jnp.asarray(np.asarray(vals, np.uint32).reshape(-1, 1))


def _col_spec(n_rows: int, n_grid: int = 1):
    """Block-constant [n_rows, 1] VMEM spec for the modulus column."""
    if n_grid == 1:
        return pl.BlockSpec((n_rows, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((n_rows, 1), lambda i, g: (0, 0),
                        memory_space=pltpu.VMEM)


def _sop_kernel(a_ref, b_ref, p_ref, out_ref, acc_ref, *, n_limbs, n_terms,
                inv16):
    L, T = n_limbs, n_terms
    bb = out_ref.shape[-1]

    acc_ref[:] = jnp.zeros((2 * L + 1, bb), dtype=jnp.uint32)

    # phase 1: schoolbook columns for all T terms
    for t in range(T):
        bt = b_ref[t]  # [L, bb]
        for i in range(L):
            prod = a_ref[t, i][None, :] * bt  # [L, bb] exact in uint32
            acc_ref[i : i + L] += prod & MASK
            acc_ref[i + 1 : i + L + 1] += prod >> LIMB_BITS

    # phase 2: Montgomery rounds
    inv = np.uint32(inv16)
    for k in range(L):
        m = (acc_ref[k] * inv) & MASK  # [bb]
        mp = m[None, :] * p_ref[:, :]  # [L, bb] via [L, 1] broadcast
        acc_ref[k : k + L] += mp & MASK
        acc_ref[k + 1 : k + L + 1] += mp >> LIMB_BITS
        acc_ref[k + 1] += acc_ref[k] >> LIMB_BITS

    # phase 3: carry ripple over the top L+1 columns
    carry = jnp.zeros((bb,), dtype=jnp.uint32)
    limbs = []
    for k in range(L, 2 * L + 1):
        v = acc_ref[k] + carry
        limbs.append(v & MASK)
        carry = v >> LIMB_BITS
    t_out = jnp.stack(limbs)  # [L+1, bb], value < 2p

    # conditional subtract p (over L+1 limbs; result < p fits L limbs)
    borrow = jnp.zeros((bb,), dtype=jnp.uint32)
    diffs = []
    for i in range(L + 1):
        p_i = p_ref[i, 0] if i < L else np.uint32(0)
        v = t_out[i] + np.uint32(1 << LIMB_BITS) - p_i - borrow
        diffs.append(v & MASK)
        borrow = np.uint32(1) - (v >> LIMB_BITS)
    diff = jnp.stack(diffs[:L])
    take = (borrow == 0)[None, :]
    out_ref[:] = jnp.where(take, diff, t_out[:L])


def _sop_kernel_r12(a_ref, b_ref, p12_ref, out_ref, *, n_limbs, n_terms,
                    inv12, l12):
    """Radix-2^12 sum-of-products kernel (vectorized: kernels/limbvec.py).

    Operands arrive as 16-bit limbs and are repacked to 12-bit limbs in
    registers.  With 12-bit digits every product is < 2^24, so schoolbook
    columns accumulate RAW (no per-product lo/hi splitting): a column absorbs
    l12 products per term plus l12 reduction products — (T+1) * l12 * 4095^2
    < 2^32 for T <= 6.  The Montgomery radix stays 2^384 = 2^(12*32), so
    results are bit-identical to the 16-bit path.
    """
    L, T = n_limbs, n_terms
    assert T <= 6, "radix-12 raw accumulation bound"
    a12 = lv.repack_16_to_12(a_ref[...], l12)  # [T, l12, bb]
    b12 = lv.repack_16_to_12(b_ref[...], l12)
    out_ref[:] = lv.mont_sop_12(a12, b12, inv12, p12_ref[...], L)


def _sqr_kernel_r12(a_ref, p12_ref, out_ref, *, n_limbs, n_groups, inv12,
                    l12):
    """Radix-2^12 squaring kernel: off-diagonal products computed once and
    doubled (products < 2^24 so doubling cannot overflow).  Column budget:
    <= l12 phase-1 contributions + l12 reduction products, same bound as T=1.
    """
    L, G = n_limbs, n_groups
    p12c = p12_ref[...]
    groups = []
    for g in range(G):
        a12 = lv.repack_16_to_12(a_ref[g], l12)
        acc = lv.sqr_columns(a12)
        acc = lv.mont_reduce_12(acc, inv12, p12c)
        groups.append(lv.finalize_12(acc, p12c, L))
    out_ref[:] = jnp.stack(groups)


def _sop_kernel_reg(a_ref, b_ref, out_ref, *, n_limbs, n_terms, inv16,
                    p_limbs):
    """Register-resident variant: the 2L+1 lazy columns live as SSA values
    (a Python list) instead of a VMEM scratch ref, so there are no
    misaligned-sublane read-modify-writes — Mosaic keeps the accumulators in
    vregs and the kernel is pure VPU ALU work.

    Column bounds: each column absorbs <= 2*L*T 16-bit halves plus L 16-bit
    halves from the reduction, so values stay far below 2^32 (see limbs.py).
    """
    L, T = n_limbs, n_terms
    bb = out_ref.shape[-1]
    zero = jnp.zeros((bb,), jnp.uint32)
    acc = [zero] * (2 * L + 1)

    # phase 1: schoolbook columns, products split lazily
    for t in range(T):
        b_t = [b_ref[t, j] for j in range(L)]
        for i in range(L):
            ai = a_ref[t, i]
            for j in range(L):
                prod = ai * b_t[j]
                acc[i + j] = acc[i + j] + (prod & MASK)
                acc[i + j + 1] = acc[i + j + 1] + (prod >> LIMB_BITS)

    # phase 2: L Montgomery rounds with scalar p limbs
    inv = np.uint32(inv16)
    for k in range(L):
        m = (acc[k] * inv) & MASK
        for j in range(L):
            pj = np.uint32(p_limbs[j])
            mp = m * pj
            acc[k + j] = acc[k + j] + (mp & MASK)
            acc[k + j + 1] = acc[k + j + 1] + (mp >> LIMB_BITS)
        acc[k + 1] = acc[k + 1] + (acc[k] >> LIMB_BITS)

    # phase 3: carry ripple over the top L+1 columns (value < 2p)
    carry = zero
    t_out = []
    for k in range(L, 2 * L + 1):
        v = acc[k] + carry
        t_out.append(v & MASK)
        carry = v >> LIMB_BITS

    # conditional subtract p over L+1 limbs
    borrow = zero
    diffs = []
    for i in range(L + 1):
        p_i = np.uint32(p_limbs[i]) if i < L else np.uint32(0)
        v = t_out[i] + np.uint32(1 << LIMB_BITS) - p_i - borrow
        diffs.append(v & MASK)
        borrow = np.uint32(1) - (v >> LIMB_BITS)
    take = (borrow == 0)[None, :]
    diff = jnp.stack(diffs[:L])
    out_ref[:] = jnp.where(take, diff, jnp.stack(t_out[:L]))



def _sop_kernel_reg_vec(a_ref, b_ref, p16_ref, out_ref, *, n_limbs, n_terms,
                        inv16):
    """Vectorized 16-bit register kernel (limbvec.mont_sop_16): the
    CPU-interpret fast tier's route (XLA CPU compiles the per-limb variant
    impractically slowly); bit-exact vs _sop_kernel_reg."""
    out_ref[:] = lv.mont_sop_16(a_ref[...], b_ref[...], inv16, p16_ref[...])


def _fold_planned_kernel_r12_scalar(ia_ref, ib_ref, ops_ref, out_ref, *, n_limbs,
                             n_terms, inv12, p12, l12):
    """Uniform planned-fold kernel: out[g] = sum_t ops[ia[g,t]] * ops[ib[g,t]].

    Grid = (batch_blocks, G); the operand stack [K, L, bb] is block-constant
    across the inner G steps, so Mosaic fetches it from HBM once per batch
    block — distinct operands are read ONCE instead of duplicated per
    (group, term) like the stacked sop layout.  Term lists are padded to
    n_terms with index 0 = the all-zeros row (contributes nothing).
    ia/ib live in SMEM ([G, T] int32 scalars).
    """
    L = n_limbs
    bb = out_ref.shape[-1]
    g = pl.program_id(1)
    zero = jnp.zeros((bb,), jnp.uint32)
    acc = [zero] * (2 * l12 - 1)
    for t in range(n_terms):
        ia = ia_ref[g, t]
        ib = ib_ref[g, t]
        a12 = _repack_16_to_12([ops_ref[ia, i] for i in range(L)], l12)
        b12 = _repack_16_to_12([ops_ref[ib, i] for i in range(L)], l12)
        for i in range(l12):
            ai = a12[i]
            for j in range(l12):
                acc[i + j] = acc[i + j] + ai * b12[j]
    rows = _r12_reduce_and_pack(acc, l12=l12, inv12=inv12, p12=p12, n16=L)
    out_ref[0] = jnp.stack(rows)


def _fold_planned_kernel_r12(ia_ref, ib_ref, ops_ref, p12_ref, out_ref, *,
                             n_limbs, n_terms, inv12, l12):
    """Uniform planned-fold kernel: out[g] = sum_t ops[ia[g,t]] * ops[ib[g,t]].

    Grid = (batch_blocks, G); the operand stack [K, L, bb] is block-constant
    across the inner G steps, so Mosaic fetches it from HBM once per batch
    block — distinct operands are read ONCE instead of duplicated per
    (group, term) like the stacked sop layout.  Term lists are padded to
    n_terms with index 0 = the all-zeros row (contributes nothing).
    ia/ib live in SMEM ([G, T] int32 scalars).
    """
    L = n_limbs
    g = pl.program_id(1)
    a16 = jnp.stack([ops_ref[ia_ref[g, t]] for t in range(n_terms)])
    b16 = jnp.stack([ops_ref[ib_ref[g, t]] for t in range(n_terms)])
    a12 = lv.repack_16_to_12(a16, l12)  # [T, l12, bb]
    b12 = lv.repack_16_to_12(b16, l12)
    out_ref[0] = lv.mont_sop_12(a12, b12, inv12, p12_ref[...], L)


@functools.partial(
    jax.jit, static_argnames=("n_limbs", "inv16", "p_limbs", "n_terms",
                              "block_b", "interpret", "variant")
)
def fold_planned_pallas(ops_stack, ia, ib, *, n_limbs, inv16, p_limbs,
                        n_terms, block_b=1024, interpret=False,
                        variant="scalar"):
    """Planned fused fold: G groups of <= n_terms products over K distinct
    operands.  ops_stack: [K, L, B] (row 0 MUST be zeros); ia/ib: [G, T]
    int32 operand indices.  Returns [G, L, B].
    """
    k, l, b = ops_stack.shape
    gcount, t = ia.shape
    assert l == n_limbs and t == n_terms
    r12 = _r12_params(p_limbs)
    assert r12 is not None and n_terms <= 6
    l12, inv12, p12 = r12
    if b == 0:
        return jnp.zeros((gcount, l, 0), jnp.uint32)
    bb = min(block_b, -(-b // 128) * 128)
    pad = (-b) % bb
    if pad:
        ops_stack = jnp.pad(ops_stack, ((0, 0), (0, 0), (0, pad)))
    bp = b + pad
    smem = pl.BlockSpec((gcount, t), lambda i, g: (0, 0),
                        memory_space=pltpu.SMEM)
    ops_spec = pl.BlockSpec((k, l, bb), lambda i, g: (0, 0, i),
                            memory_space=pltpu.VMEM)
    common = dict(
        grid=(bp // bb, gcount),
        out_specs=pl.BlockSpec((1, l, bb), lambda i, g: (g, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gcount, l, bp), jnp.uint32),
        interpret=interpret,
    )
    if variant == "vector":
        kernel = functools.partial(
            _fold_planned_kernel_r12, n_limbs=l, n_terms=n_terms,
            inv12=inv12, l12=l12,
        )
        out = pl.pallas_call(
            kernel, in_specs=[smem, smem, ops_spec, _col_spec(l12, n_grid=2)],
            **common,
        )(ia, ib, ops_stack, _const_col(p12))
    else:
        kernel = functools.partial(
            _fold_planned_kernel_r12_scalar, n_limbs=l, n_terms=n_terms,
            inv12=inv12, p12=p12, l12=l12,
        )
        out = pl.pallas_call(
            kernel, in_specs=[smem, smem, ops_spec], **common,
        )(ia, ib, ops_stack)
    return out[:, :, :b] if pad else out


def _mont_mul_rows_16(b_rows, w_rows, *, n_limbs, inv16, p16, zero):
    """In-kernel 16-bit-limb Montgomery product of two row lists -> canonical
    row list (the _sop_kernel_reg pipeline as a reusable helper; works for
    ANY modulus, unlike the radix-12 path)."""
    L = n_limbs
    acc = [zero] * (2 * L + 1)
    for i in range(L):
        bi = b_rows[i]
        for j in range(L):
            prod = bi * w_rows[j]
            acc[i + j] = acc[i + j] + (prod & MASK)
            acc[i + j + 1] = acc[i + j + 1] + (prod >> LIMB_BITS)
    inv = np.uint32(inv16)
    for k in range(L):
        m = (acc[k] * inv) & MASK
        for j in range(L):
            mp = m * p16[j]
            acc[k + j] = acc[k + j] + (mp & MASK)
            acc[k + j + 1] = acc[k + j + 1] + (mp >> LIMB_BITS)
        acc[k + 1] = acc[k + 1] + (acc[k] >> LIMB_BITS)
    carry = zero
    t_out = []
    for k in range(L, 2 * L + 1):
        v = acc[k] + carry
        t_out.append(v & MASK)
        carry = v >> LIMB_BITS
    # conditional subtract p over L+1 limbs (value < 2p)
    borrow = zero
    diffs = []
    for i in range(L + 1):
        p_i = p16[i] if i < L else np.uint32(0)
        v = t_out[i] + np.uint32(1 << LIMB_BITS) - p_i - borrow
        diffs.append(v & MASK)
        borrow = np.uint32(1) - (v >> LIMB_BITS)
    take = borrow == 0
    return [jnp.where(take, d, t) for d, t in zip(diffs[:L], t_out[:L])]


def _butterfly_kernel_16(a_ref, b_ref, w_ref, out_ref, *, n_limbs, inv16,
                         p16):
    """Fused NTT butterfly: t = b*w (Montgomery); lo = a+t; hi = a-t.

    One VMEM pass instead of three separate XLA subgraphs (mul + add + sub,
    each with its own carry-propagation network and HBM round trip) — the
    radix-2 NTT stage becomes compute-bound on the multiply.  16-bit limb
    pipeline (Fr's 256-bit width is not radix-12 compatible).
    out_ref: [2, L, bb] = (lo, hi).
    """
    L = n_limbs
    bb = out_ref.shape[-1]
    zero = jnp.zeros((bb,), jnp.uint32)

    t_rows = _mont_mul_rows_16(
        [b_ref[i] for i in range(L)],
        [w_ref[i] for i in range(L)],
        n_limbs=L, inv16=inv16, p16=p16, zero=zero,
    )
    a_rows = [a_ref[i] for i in range(L)]

    # lo = a + t, conditionally minus p (sum < 2p)
    carry = zero
    s_rows = []
    for i in range(L):
        v = a_rows[i] + t_rows[i] + carry
        s_rows.append(v & MASK)
        carry = v >> LIMB_BITS
    borrow = zero
    d_rows = []
    for i in range(L):
        v = s_rows[i] + np.uint32(1 << LIMB_BITS) - p16[i] - borrow
        d_rows.append(v & MASK)
        borrow = np.uint32(1) - (v >> LIMB_BITS)
    # take the subtracted value if (carry:borrowless) sum >= p:
    # sum = carry*2^384 + s; sum - p = ... keep d if no net borrow
    take_d = ((carry + np.uint32(1) - borrow) > 0)[None, :]
    lo = jnp.where(take_d, jnp.stack(d_rows), jnp.stack(s_rows))

    # hi = a - t, plus p on borrow
    borrow = zero
    e_rows = []
    for i in range(L):
        v = a_rows[i] + np.uint32(1 << LIMB_BITS) - t_rows[i] - borrow
        e_rows.append(v & MASK)
        borrow = np.uint32(1) - (v >> LIMB_BITS)
    carry = zero
    f_rows = []
    for i in range(L):
        v = e_rows[i] + p16[i] + carry
        f_rows.append(v & MASK)
        carry = v >> LIMB_BITS
    add_p = (borrow > 0)[None, :]
    hi = jnp.where(add_p, jnp.stack(f_rows), jnp.stack(e_rows))

    out_ref[0] = lo
    out_ref[1] = hi



def _butterfly_kernel_16_vec(a_ref, b_ref, w_ref, p16_ref, out_ref, *,
                             n_limbs, inv16):
    """Vectorized butterfly (limbvec): the CPU-interpret fast tier's route;
    bit-exact vs _butterfly_kernel_16."""
    p16c = p16_ref[...]
    t = lv.mont_mul_16(b_ref[...], w_ref[...], inv16, p16c)
    a = a_ref[...]
    out_ref[0] = lv.mod_add_16(a, t, p16c)
    out_ref[1] = lv.mod_sub_16(a, t, p16c)


@functools.partial(
    jax.jit, static_argnames=("n_limbs", "inv16", "p_limbs", "block_b",
                              "interpret", "variant")
)
def butterfly_pallas(a, b, w, *, n_limbs, inv16, p_limbs, block_b=4096,
                     interpret=False, variant="scalar"):
    """Batched fused butterfly (lo, hi) = (a + b*w, a - b*w) mod p.

    a, b, w: [L, B] uint32 canonical Montgomery limbs; returns [2, L, B].
    16-bit limb pipeline — valid for any modulus width (Fr's 256 bits is
    not radix-12 compatible).
    """
    l, bsz = a.shape
    assert l == n_limbs
    if bsz == 0:
        return jnp.zeros((2, l, 0), jnp.uint32)
    bb = min(block_b, -(-bsz // 128) * 128)
    pad = (-bsz) % bb
    if pad:
        a = jnp.pad(a, ((0, 0), (0, pad)))
        b = jnp.pad(b, ((0, 0), (0, pad)))
        w = jnp.pad(w, ((0, 0), (0, pad)))
    bp = bsz + pad
    spec = pl.BlockSpec((l, bb), lambda i: (0, i), memory_space=pltpu.VMEM)
    common = dict(
        grid=(bp // bb,),
        out_specs=pl.BlockSpec((2, l, bb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, l, bp), jnp.uint32),
        interpret=interpret,
    )
    if variant == "vector":
        kernel = functools.partial(
            _butterfly_kernel_16_vec, n_limbs=l, inv16=inv16)
        out = pl.pallas_call(
            kernel, in_specs=[spec, spec, spec, _col_spec(l)], **common,
        )(a, b, w, _const_col(p_limbs))
    else:
        kernel = functools.partial(
            _butterfly_kernel_16, n_limbs=l, inv16=inv16,
            p16=tuple(np.uint32(x) for x in p_limbs),
        )
        out = pl.pallas_call(
            kernel, in_specs=[spec, spec, spec], **common,
        )(a, b, w)
    return out[:, :, :bsz] if pad else out



# ---------------------------------------------------------------------------
# Per-limb ("scalar register") kernel variants.
#
# The vectorized limbvec kernels trace ~20x faster but spend ~3.7x more VPU
# work on the padded full-width column updates (measured on TPU: fp_mul
# 992M/s scalar vs 270M/s vectorized at batch 2^16).  For the throughput-
# critical standalone field ops (limbs.mont_mul / mont_sqr chains, which
# trace ONE kernel per enclosing graph, so trace cost is irrelevant) the
# per-limb variants below stay the production route; the vectorized ones
# power the plan/fold kernels where a graph contains dozens of kernel
# instantiations and tracing dominated end-to-end latency.
# ---------------------------------------------------------------------------

def _repack_16_to_12(rows, n12):
    """24 16-bit limb registers -> n12 12-bit limb registers ([bb] each).

    Offsets 12k mod 16 cycle through {0, 12, 8, 4}: a 12-bit limb straddles
    at most two 16-bit rows.
    """
    M12 = np.uint32(0xFFF)
    out = []
    for k in range(n12):
        bit = 12 * k
        i0, off = bit // 16, bit % 16
        v = rows[i0] >> np.uint32(off) if off else rows[i0]
        if off > 4 and i0 + 1 < len(rows):
            v = v | (rows[i0 + 1] << np.uint32(16 - off))
        out.append(v & M12)
    return out


def _repack_12_to_16(limbs12, n16):
    """n12 12-bit limb registers -> n16 16-bit limb registers.

    Offsets 16i mod 12 are always in {0, 4, 8}: a 16-bit row is covered by
    exactly two 12-bit limbs.
    """
    M16 = np.uint32(0xFFFF)
    out = []
    for i in range(n16):
        bit = 16 * i
        j0, off = bit // 12, bit % 12
        v = limbs12[j0] >> np.uint32(off) if off else limbs12[j0]
        if j0 + 1 < len(limbs12):
            v = v | (limbs12[j0 + 1] << np.uint32(12 - off))
        out.append(v & M16)
    return out


def _r12_reduce_and_pack(acc, *, l12, inv12, p12, n16):
    """Shared tail for the radix-12 kernels: Montgomery rounds over 12-bit
    columns, carry ripple, conditional subtract, repack to 16-bit rows.

    acc: list of 2*l12-1 lazy columns ([bb] uint32 registers).
    Returns the n16 result rows as a list of registers.
    """
    M12 = np.uint32(0xFFF)
    inv = np.uint32(inv12)
    acc = acc + [jnp.zeros_like(acc[0])]  # headroom column 2*l12-1
    for k in range(l12):
        m = (acc[k] * inv) & M12
        for j in range(l12):
            acc[k + j] = acc[k + j] + m * np.uint32(p12[j])
        acc[k + 1] = acc[k + 1] + (acc[k] >> np.uint32(12))

    # carry ripple over columns l12 .. 2*l12-1 => l12 clean limbs (value < 2p
    # fits l12 * 12 = 384 bits)
    carry = jnp.zeros_like(acc[0])
    t_out = []
    for k in range(l12, 2 * l12):
        v = acc[k] + carry
        t_out.append(v & M12)
        carry = v >> np.uint32(12)

    # conditional subtract p (12-bit ripple borrow)
    borrow = jnp.zeros_like(acc[0])
    diffs = []
    for i in range(l12):
        v = t_out[i] + np.uint32(1 << 12) - np.uint32(p12[i]) - borrow
        diffs.append(v & M12)
        borrow = np.uint32(1) - (v >> np.uint32(12))
    final = [
        jnp.where(borrow == 0, d, t) for d, t in zip(diffs, t_out)
    ]
    return _repack_12_to_16(final, n16)


def _sop_kernel_r12_scalar(a_ref, b_ref, out_ref, *, n_limbs, n_terms, inv12,
                    p12, l12):
    """Radix-2^12 sum-of-products kernel.

    Operands arrive as 16-bit limbs and are repacked to 12-bit limbs in
    registers.  With 12-bit digits every product is < 2^24, so schoolbook
    columns accumulate RAW (no per-product lo/hi splitting): a column absorbs
    l12 products per term plus l12 reduction products — (T+1) * l12 * 4095^2
    < 2^32 for T <= 6.  The Montgomery radix stays 2^384 = 2^(12*32), so
    results are bit-identical to the 16-bit path.
    """
    L, T = n_limbs, n_terms
    assert T <= 6, "radix-12 raw accumulation bound"
    bb = out_ref.shape[-1]
    zero = jnp.zeros((bb,), jnp.uint32)
    acc = [zero] * (2 * l12 - 1)

    for t in range(T):
        a12 = _repack_16_to_12([a_ref[t, i] for i in range(L)], l12)
        b12 = _repack_16_to_12([b_ref[t, i] for i in range(L)], l12)
        for i in range(l12):
            ai = a12[i]
            for j in range(l12):
                acc[i + j] = acc[i + j] + ai * b12[j]

    rows = _r12_reduce_and_pack(acc, l12=l12, inv12=inv12, p12=p12, n16=L)
    out_ref[:] = jnp.stack(rows)


def _sqr_kernel_r12_scalar(a_ref, out_ref, *, n_limbs, n_groups, inv12, p12,
                           l12):
    """Radix-2^12 squaring kernel: off-diagonal products computed once and
    doubled (products < 2^24 so doubling cannot overflow).  Column budget:
    <= l12 phase-1 contributions + l12 reduction products, same bound as T=1.
    """
    L, G = n_limbs, n_groups
    bb = out_ref.shape[-1]
    groups = []
    for g in range(G):
        a12 = _repack_16_to_12([a_ref[g, i] for i in range(L)], l12)
        zero = jnp.zeros((bb,), jnp.uint32)
        acc = [zero] * (2 * l12 - 1)
        for i in range(l12):
            sq = a12[i] * a12[i]
            acc[2 * i] = acc[2 * i] + sq
            for j in range(i + 1, l12):
                pr = a12[i] * a12[j]
                acc[i + j] = acc[i + j] + pr + pr
        rows = _r12_reduce_and_pack(
            acc, l12=l12, inv12=inv12, p12=p12, n16=L
        )
        groups.append(jnp.stack(rows))
    out_ref[:] = jnp.stack(groups)



def _r12_params(p_limbs16):
    """(l12, inv12, p12 limbs) for a modulus given as 16-bit limbs, or None
    if the bit width is not a multiple of 12 (radix-12 needs R = 2^(12*l12)
    to equal 2^(16*L))."""
    L = len(p_limbs16)
    if (16 * L) % 12:
        return None
    modulus = sum(int(x) << (16 * i) for i, x in enumerate(p_limbs16))
    l12 = 16 * L // 12
    inv12 = (-pow(modulus, -1, 1 << 12)) % (1 << 12)
    p12 = tuple((modulus >> (12 * k)) & 0xFFF for k in range(l12))
    return l12, inv12, p12


@functools.partial(
    jax.jit, static_argnames=("n_limbs", "inv16", "p_limbs", "block_b",
                              "interpret", "version")
)
def sop_pallas(a_stack, b_stack, *, n_limbs, inv16, p_limbs, block_b=2048,
               interpret=False, version=3):
    """Fused sum_t a[t] * b[t] mod p over a flat batch.

    a_stack, b_stack: [T, L, B] uint32 (Montgomery operands, canonical limbs).
    Returns [L, B].  p_limbs must be a hashable tuple of ints.

    version 3 = radix-12 raw-accumulation kernel in per-limb registers
    (fastest at runtime; needs 12 | 16L and T <= 6, else falls back),
    4 = vectorized radix-12 (limbvec; ~20x faster to trace, ~3.7x slower to
    run — for trace-bound comparisons), 2 = 16-bit register kernel, 1 =
    scratch-ref kernel (kept for comparison benchmarks).
    """
    t, l, b = a_stack.shape
    assert l == n_limbs
    if b == 0:  # zero-length batches appear inside scan/odd-split internals
        return jnp.zeros((l, 0), jnp.uint32)
    bb = min(block_b, -(-b // 128) * 128)  # lane-aligned block
    pad = (-b) % bb
    if pad:
        a_stack = jnp.pad(a_stack, ((0, 0), (0, 0), (0, pad)))
        b_stack = jnp.pad(b_stack, ((0, 0), (0, 0), (0, pad)))
    bp = b + pad

    common = dict(
        grid=(bp // bb,),
        out_shape=jax.ShapeDtypeStruct((l, bp), jnp.uint32),
        interpret=interpret,
    )
    op_specs = [
        pl.BlockSpec((t, l, bb), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((t, l, bb), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((l, bb), lambda i: (0, i), memory_space=pltpu.VMEM)

    r12 = _r12_params(p_limbs) if version >= 3 else None
    if r12 is not None and t <= 6 and version >= 4:
        l12, inv12, p12 = r12
        kernel = functools.partial(
            _sop_kernel_r12, n_limbs=l, n_terms=t, inv12=inv12, l12=l12,
        )
        out = pl.pallas_call(
            kernel, in_specs=op_specs + [_col_spec(l12)],
            out_specs=out_spec, **common
        )(a_stack, b_stack, _const_col(p12))
    elif r12 is not None and t <= 6:
        l12, inv12, p12 = r12
        kernel = functools.partial(
            _sop_kernel_r12_scalar, n_limbs=l, n_terms=t, inv12=inv12,
            p12=p12, l12=l12,
        )
        out = pl.pallas_call(
            kernel, in_specs=op_specs, out_specs=out_spec, **common
        )(a_stack, b_stack)
    elif version == 5:
        kernel = functools.partial(
            _sop_kernel_reg_vec, n_limbs=l, n_terms=t, inv16=inv16,
        )
        out = pl.pallas_call(
            kernel, in_specs=op_specs + [_col_spec(l)],
            out_specs=out_spec, **common
        )(a_stack, b_stack, _const_col(p_limbs))
    elif version >= 2:
        kernel = functools.partial(
            _sop_kernel_reg, n_limbs=l, n_terms=t, inv16=inv16,
            p_limbs=tuple(int(x) for x in p_limbs),
        )
        out = pl.pallas_call(
            kernel, in_specs=op_specs, out_specs=out_spec, **common
        )(a_stack, b_stack)
    else:
        kernel = functools.partial(
            _sop_kernel, n_limbs=l, n_terms=t, inv16=inv16
        )
        p_arr = jnp.asarray(np.array(p_limbs, dtype=np.uint32).reshape(l, 1))
        out = pl.pallas_call(
            kernel,
            in_specs=op_specs
            + [pl.BlockSpec((l, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)],
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((2 * l + 1, bb), jnp.uint32)],
            **common,
        )(a_stack, b_stack, p_arr)
    return out[:, :b] if pad else out


@functools.partial(
    jax.jit, static_argnames=("n_limbs", "inv16", "p_limbs", "block_b",
                              "interpret", "version")
)
def sqr_pallas(a_stack, *, n_limbs, inv16, p_limbs, block_b=2048,
               interpret=False, version=3):
    """Batched Montgomery squares over G independent groups.

    a_stack: [G, L, B] uint32.  Returns [G, L, B].  Uses the radix-12
    squaring kernel (off-diagonal products doubled) when 12 | 16L, else
    falls back to sop_pallas with a == b per group.  version 3 = per-limb
    registers (production), 4 = vectorized limbvec (trace-bound contexts
    and the CPU-interpret fast tier, where XLA CPU compiles the per-limb
    graph orders of magnitude slower).
    """
    g, l, b = a_stack.shape
    assert l == n_limbs
    if b == 0:
        return jnp.zeros((g, l, 0), jnp.uint32)
    r12 = _r12_params(p_limbs)
    if r12 is None:
        # flatten groups into the batch axis: [G, L, B] -> [1, L, G*B] with
        # the limb axis kept contiguous (a bare reshape would interleave the
        # group and limb axes and silently corrupt the result for G > 1)
        flat = (
            jnp.moveaxis(a_stack, 0, 1).reshape(1, l, g * b)
            if g > 1 else a_stack
        )
        out = sop_pallas(flat, flat, n_limbs=n_limbs, inv16=inv16,
                         p_limbs=p_limbs, block_b=block_b,
                         interpret=interpret)
        return (
            jnp.moveaxis(out.reshape(l, g, b), 1, 0) if g > 1 else out
        )
    l12, inv12, p12 = r12
    bb = min(block_b, -(-b // 128) * 128)  # lane-aligned block
    pad = (-b) % bb
    if pad:
        a_stack = jnp.pad(a_stack, ((0, 0), (0, 0), (0, pad)))
    bp = b + pad
    in_specs = [
        pl.BlockSpec((g, l, bb), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    if version >= 4:
        kernel = functools.partial(
            _sqr_kernel_r12, n_limbs=l, n_groups=g, inv12=inv12, l12=l12
        )
        in_specs.append(_col_spec(l12))
        args = (a_stack, _const_col(p12))
    else:
        kernel = functools.partial(
            _sqr_kernel_r12_scalar, n_limbs=l, n_groups=g, inv12=inv12,
            p12=p12, l12=l12
        )
        args = (a_stack,)
    out = pl.pallas_call(
        kernel,
        grid=(bp // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, l, bb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, l, bp), jnp.uint32),
        interpret=interpret,
    )(*args)
    return out[:, :, :b] if pad else out
