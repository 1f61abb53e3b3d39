"""Multi-chip Pippenger MSM via shard_map.

Strategy (SURVEY.md §2.4 table): points and scalars are sharded over the mesh
"x" axis; every chip runs the full local Pippenger pipeline on its shard
(buckets stay chip-local — no cross-chip scatter), producing one partial
result point per chip; partials are combined with log2(N) group additions
after an all_gather over ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..curves import g1 as G1
from ..ops import msm as msm_mod


def msm_g1_sharded(mesh, points_proj, scalars_mont, c: int = 8,
                   glv: bool = False):
    """sum_i [s_i] P_i with the point batch sharded across the mesh.

    points_proj: projective G1 pytree with trailing batch axis [B];
    scalars_mont: [16, B] Montgomery Fr.  B must divide evenly by mesh size.

    glv defaults to False here (unlike single-chip msm_g1): the cross-chip
    semantics — shard, per-chip buckets, gather-reduce — are identical under
    either per-chip digit pipeline, and the plain pipeline keeps this
    (CPU-compiled, virtual-mesh) graph small for tests and dry runs.  Pass
    glv=True on real pods.
    """
    axis = mesh.axis_names[0]

    point_spec = jax.tree.map(lambda _: P(None, axis), points_proj)
    scalar_spec = P(None, axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(point_spec, scalar_spec),
        out_specs=jax.tree.map(lambda _: P(None, None), points_proj),
        check_rep=False,
    )
    def _local(points, scalars):
        partial_pt = msm_mod.msm_g1(points, scalars, c=c, glv=glv)  # [L] coords
        # gather one partial per chip -> [L, n_chips]; tree-add locally
        gathered = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis, axis=x.ndim, tiled=False),
            partial_pt,
        )
        n = gathered[0].shape[-1]
        acc = jax.tree.map(lambda x: x[..., 0], gathered)
        for i in range(1, n):
            acc = G1.add(acc, jax.tree.map(lambda x: x[..., i], gathered))
        # out shape [L, 1] to satisfy the sharded-out rank
        return jax.tree.map(lambda x: x[:, None], acc)

    out = _local(points_proj, scalars_mont)
    return jax.tree.map(lambda x: x[..., 0], out)
