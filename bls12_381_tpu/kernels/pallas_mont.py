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

MASK = np.uint32(0xFFFF)
LIMB_BITS = 16


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


@functools.partial(
    jax.jit, static_argnames=("n_limbs", "inv16", "p_limbs", "block_b",
                              "interpret")
)
def sop_pallas(a_stack, b_stack, *, n_limbs, inv16, p_limbs, block_b=1024,
               interpret=False):
    """Fused sum_t a[t] * b[t] mod p over a flat batch.

    a_stack, b_stack: [T, L, B] uint32 (Montgomery operands, canonical limbs).
    Returns [L, B].  p_limbs must be a hashable tuple of ints.
    """
    t, l, b = a_stack.shape
    assert l == n_limbs
    bb = min(block_b, b)
    pad = (-b) % bb
    if pad:
        a_stack = jnp.pad(a_stack, ((0, 0), (0, 0), (0, pad)))
        b_stack = jnp.pad(b_stack, ((0, 0), (0, 0), (0, pad)))
    bp = b + pad

    kernel = functools.partial(_sop_kernel, n_limbs=l, n_terms=t, inv16=inv16)
    p_arr = jnp.asarray(np.array(p_limbs, dtype=np.uint32).reshape(l, 1))
    out = pl.pallas_call(
        kernel,
        grid=(bp // bb,),
        in_specs=[
            pl.BlockSpec((t, l, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, l, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((l, bb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, bp), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((2 * l + 1, bb), jnp.uint32)],
        interpret=interpret,
    )(a_stack, b_stack, p_arr)
    return out[:, :b] if pad else out
