"""Radix-2 NTT over the scalar field Fq on device.

The reference ships the constants (2^32-th ROOT_OF_UNITY, S = 32, TWO_INV;
scalar.rs:183-222) but no NTT — this is new TPU-first design (SURVEY.md §5
"long-context" analog).  Iterative Cooley-Tukey with:

  - a static bit-reversal gather,
  - log2(N) butterfly stages, each ONE batched Montgomery mul over N/2 lanes
    with a precomputed twiddle tensor (host-computed powers of omega),
  - all shapes static; the stage loop is trace-time.

The multi-chip version (parallel/ntt_sharded.py) runs the four-step
decomposition with an all_to_all transpose over the mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from ..fields import fr
from ..limbs import FR


def _master_twiddles(log_n: int, inverse: bool):
    """Powers root^j, j in [0, N/2), as a device tensor [L, N/2].

    Built ON DEVICE by doubling (log2(N/2) batched Montgomery muls against
    tiny per-step constants): materializing the table host-side embeds an
    O(N)-byte constant in the compiled graph, which is ~33 MB at N = 2^20
    and overflows the remote-compile request limit.

    Stage s (s = 1..log_n) needs omega_{2^s}^j = root^(j*(n/2^s)) for
    j < 2^(s-1) — exactly the stride-(n/2^s) subset of this table.
    """
    n = 1 << log_n
    root = pow(params.FR_ROOT_OF_UNITY, 1 << (params.FR_S - log_n), params.Q)
    if inverse:
        root = pow(root, params.Q - 2, params.Q)
    powers = fr.one((1,))  # [L, 1]
    width = 1
    while width < n // 2:
        step = fr.const(pow(root, width, params.Q), (1,))
        powers = jnp.concatenate([powers, fr.mul(powers, step)], axis=-1)
        width *= 2
    return powers[:, : n // 2]


def _bit_reverse_perm(log_n: int):
    # computed on device (log_n vector ops) — a host-side numpy index array
    # would embed an O(N)-byte constant in the compiled graph
    n = 1 << log_n
    idx = jnp.arange(n, dtype=jnp.int32)
    rev = jnp.zeros(n, dtype=jnp.int32)
    for b in range(log_n):
        rev = rev | (((idx >> b) & 1) << (log_n - 1 - b))
    return rev


@functools.partial(jax.jit, static_argnames=("inverse", "_skip_scale"))
def ntt(coeffs, inverse: bool = False, _skip_scale: bool = False):
    """In-order radix-2 NTT of an Fr batch [L, *batch, N] (N a power of two).

    Forward: evaluates at omega^k in natural order.  With inverse=True,
    computes the inverse transform including the 1/N scaling (suppressed by
    _skip_scale for the sharded four-step composition).
    """
    n = coeffs.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "NTT size must be a power of two"
    master = _master_twiddles(log_n, inverse)  # [L, N/2] (device)
    extra = coeffs.ndim - 2  # leading batch dims between limbs and N

    x = coeffs[..., _bit_reverse_perm(log_n)]
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        # stage table: stride-(n/m) subset of the master powers, tiled
        tw = jnp.tile(master[:, :: n // m], (1, n // m))  # [L, N/2]
        if extra:
            tw = tw.reshape(tw.shape[:1] + (1,) * extra + tw.shape[1:])
        # view as [L, n/m, m]; split into even/odd halves of each group
        xg = x.reshape(x.shape[:-1] + (n // m, m))
        a = xg[..., :half].reshape(x.shape[:-1] + (n // 2,))
        b = xg[..., half:].reshape(x.shape[:-1] + (n // 2,))
        # fused butterfly: ONE kernel pass for mul+add+sub on TPU
        lo, hi = fr.butterfly(a, b, tw)
        x = jnp.concatenate(
            [
                lo.reshape(x.shape[:-1] + (n // m, half)),
                hi.reshape(x.shape[:-1] + (n // m, half)),
            ],
            axis=-1,
        ).reshape(x.shape[:-1] + (n,))
    if inverse and not _skip_scale:
        n_inv = fr.const(pow(n, params.Q - 2, params.Q), x.shape[1:])
        x = fr.mul(x, n_inv)
    return x


def intt(evals):
    return ntt(evals, inverse=True)


def poly_mul(a, b):
    """Polynomial multiplication via NTT (convolution theorem), sizes padded
    to the next power of two >= deg(a)+deg(b)+1."""
    na = a.shape[-1]
    nb = b.shape[-1]
    n = 1 << (na + nb - 1).bit_length() if (na + nb - 1) & (na + nb - 2) else (
        na + nb - 1
    )
    n = max(n, 2)
    pad_a = jnp.zeros(a.shape[:-1] + (n - na,), dtype=a.dtype)
    pad_b = jnp.zeros(b.shape[:-1] + (n - nb,), dtype=b.dtype)
    fa = ntt(jnp.concatenate([a, pad_a], axis=-1))
    fb = ntt(jnp.concatenate([b, pad_b], axis=-1))
    return intt(fr.mul(fa, fb))
