"""Multi-chip radix-2 NTT: four-step decomposition over a device mesh.

N = N1 * N2 viewed as an [N1, N2] matrix sharded over columns (N2 / n_chips
per chip):

  1. local NTT of length N1 down each column      (chip-local)
  2. twiddle by omega_N^(k1 * i2)                 (chip-local, sharded table)
  3. transpose                                    (all_to_all over ICI)
  4. local NTT of length N2 along each row        (chip-local)
  5. transpose back to natural order

This is the NTT analog of the scaling-book sharded-matmul recipe: pick the
mesh, shard the twiddle table like the data, and let the single all_to_all
ride ICI.  The whole pipeline is built once per (mesh, n, inverse) and
jitted — shard_map outside jit runs eagerly (see msm_sharded.py).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .. import params
from ..fields import fr
from ..ops.ntt import ntt


def _outer_twiddle_inputs(n1: int, n2: int, inverse: bool):
    """Row/column seed powers for the outer twiddle table, as Montgomery
    device constants [L, n1] and [L, n2].  The full [L, n1, n2] table
    omega^(k1*i2) = col_pow(k1) * row_geometric(i2) is built ON DEVICE with
    one batched outer mul — O(n1 + n2) host work instead of O(n)."""
    n = n1 * n2
    root = pow(params.FR_ROOT_OF_UNITY, 1 << (params.FR_S - n.bit_length() + 1),
               params.Q)
    if inverse:
        root = pow(root, params.Q - 2, params.Q)
    # omega^(k1*i2) for k1 < n1, i2 < n2: build rows as (omega^k1)^i2 via
    # on-device scan over i2 of a per-row constant multiplier
    row_base = np.array([pow(root, k1, params.Q) for k1 in range(n1)],
                        dtype=object)
    return row_base


def _build_twiddles(n1: int, n2: int, inverse: bool):
    """Montgomery [L, n1, n2] outer-twiddle tensor, built with log2(n2)
    on-device doubling muls per row block (device memory bound, not host)."""
    row_base = _outer_twiddle_inputs(n1, n2, inverse)
    base = fr.from_ints(row_base)  # [L, n1] = omega^k1 per row
    powers = fr.one((n1, 1))  # [L, n1, 1] = base^0
    step = base[:, :, None]  # base^width with width = 1
    width = 1
    while width < n2:
        take = min(width, n2 - width)
        # block [width, 2*width): powers[:take] * base^width
        nxt = fr.mul(powers[..., :take], step)
        powers = jnp.concatenate([powers, nxt], axis=-1)
        step = fr.mul(step, step)  # base^(2*width)
        width *= 2
    return powers[..., :n2]


@functools.lru_cache(maxsize=None)
def _build(mesh, n: int, inverse: bool):
    axes = tuple(mesh.axis_names)  # columns shard over the whole mesh
    n_chips = mesh.devices.size
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    # choose n2 divisible by chips
    log_n2 = max((log_n + 1) // 2, (n_chips - 1).bit_length())
    n2 = 1 << log_n2
    n1 = n // n2
    assert n1 >= 1 and n2 % n_chips == 0

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axes), P(None, None, axes)),
        out_specs=P(None, None, axes),
        check_rep=False,
    )
    def _stage13(xl, twl):
        # xl: [L, n1, n2/c] — NTT along axis 1 (length n1)
        xt = jnp.moveaxis(xl, 1, 2)  # [L, n2/c, n1]
        y = ntt(xt, inverse=inverse, _skip_scale=True)
        y = jnp.moveaxis(y, 2, 1)  # [L, n1, n2/c]
        y = fr.mul(y, twl)
        return y

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axes),),
        out_specs=P(None, None, axes),
        check_rep=False,
    )
    def _stage4(yl):
        # yl: [L, n2, n1/c] — NTT along axis 1 (length n2)
        zt = jnp.moveaxis(yl, 1, 2)  # [L, n1/c, n2]
        z = ntt(zt, inverse=inverse, _skip_scale=True)
        return jnp.moveaxis(z, 2, 1)

    def pipeline(coeffs, tw):
        x = coeffs.reshape(coeffs.shape[:-1] + (n1, n2))
        y = _stage13(x, tw)
        # transpose [n1, n2] -> [n2, n1] (resharded over the new column n1)
        yt = jnp.swapaxes(y, -1, -2)
        z = _stage4(yt)  # [L, n2, n1]; entry [k1 -> axis2, k2 -> axis1]
        out = z.reshape(z.shape[:-2] + (n,))  # natural: k = k2*n1 + k1
        if inverse:
            out = fr.mul(
                out, fr.const(pow(n, params.Q - 2, params.Q), out.shape[1:])
            )
        return out

    return jax.jit(pipeline), (n1, n2)


@functools.lru_cache(maxsize=None)
def _twiddles_cached(n1: int, n2: int, inverse: bool):
    return _build_twiddles(n1, n2, inverse)


def ntt_sharded(mesh, coeffs, inverse: bool = False):
    """NTT of [L, N] over the mesh (column-sharded four-step).

    Returns the transform in natural order, replicated layout [L, N].
    """
    n = coeffs.shape[-1]
    fn, (n1, n2) = _build(mesh, n, inverse)
    tw = _twiddles_cached(n1, n2, inverse)
    return fn(coeffs, tw)
