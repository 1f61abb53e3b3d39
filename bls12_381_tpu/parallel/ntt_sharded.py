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
ride ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .. import params
from ..fields import fr
from ..ops.ntt import ntt


def _outer_twiddles(n1: int, n2: int, inverse: bool) -> np.ndarray:
    """omega_N^(k1*i2) as Montgomery limbs [L, n1, n2] (host precompute)."""
    n = n1 * n2
    root = pow(params.FR_ROOT_OF_UNITY, 1 << (params.FR_S - n.bit_length() + 1),
               params.Q)
    if inverse:
        root = pow(root, params.Q - 2, params.Q)
    # powers by rows: row k1 = root^(k1*i2) = (root^k1)^i2
    rows = []
    for k1 in range(n1):
        wk = pow(root, k1, params.Q)
        row = [1] * n2
        for i2 in range(1, n2):
            row[i2] = row[i2 - 1] * wk % params.Q
        rows.append(row)
    return np.asarray(fr.from_ints(np.array(rows, dtype=object)))


def ntt_sharded(mesh, coeffs, inverse: bool = False):
    """NTT of [L, N] over the mesh (column-sharded four-step).

    Returns the transform in natural order, replicated layout [L, N].
    """
    axis = mesh.axis_names[0]
    n_chips = mesh.devices.size
    n = coeffs.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    # choose n2 divisible by chips
    log_n2 = max((log_n + 1) // 2, (n_chips - 1).bit_length())
    n2 = 1 << log_n2
    n1 = n // n2
    assert n1 >= 1 and n2 % n_chips == 0

    tw = jnp.asarray(_outer_twiddles(n1, n2, inverse))  # [L, n1, n2]
    x = coeffs.reshape(coeffs.shape[:-1] + (n1, n2))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, None, axis)),
        out_specs=P(None, None, axis),
        check_rep=False,
    )
    def _stage13(xl, twl):
        # xl: [L, n1, n2/c] — NTT along axis 1 (length n1)
        xt = jnp.moveaxis(xl, 1, 2)  # [L, n2/c, n1]
        y = ntt(xt, inverse=inverse, _skip_scale=True)
        y = jnp.moveaxis(y, 2, 1)  # [L, n1, n2/c]
        y = fr.mul(y, twl)
        return y

    y = _stage13(x, tw)

    # transpose [n1, n2] -> [n2, n1] (resharded over the new column axis n1)
    yt = jnp.swapaxes(y, -1, -2)  # [L, n2, n1]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis),),
        out_specs=P(None, None, axis),
        check_rep=False,
    )
    def _stage4(yl):
        # yl: [L, n2, n1/c] — NTT along axis 1 (length n2)
        zt = jnp.moveaxis(yl, 1, 2)  # [L, n1/c, n2]
        z = ntt(zt, inverse=inverse, _skip_scale=True)
        return jnp.moveaxis(z, 2, 1)

    z = _stage4(yt)  # [L, n2, n1], entry [k1 -> axis2, k2 -> axis1]
    out = z.reshape(z.shape[:-2] + (n,))  # natural order: k = k2*n1 + k1
    if inverse:
        out = fr.mul(out, fr.const(pow(n, params.Q - 2, params.Q), out.shape[1:]))
    return out
