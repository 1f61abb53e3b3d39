"""Multi-chip Pippenger MSM via shard_map.

Strategy (SURVEY.md §2.4 table): points and scalars are sharded over the mesh
"x" axis; every chip runs the full local Pippenger pipeline on its shard
(buckets stay chip-local — no cross-chip scatter), producing one partial
result point per chip; partials are combined with log2(N) group additions
after an all_gather over ICI.

The shard_map computation is built ONCE per (mesh, c, glv) and wrapped in
jax.jit — shard_map outside jit executes its body eagerly, which on the
round-1 code dispatched thousands of per-op compiles (the driver-dryrun
timeout root cause).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..curves import g1 as G1
from ..curves import g2 as G2
from ..ops import msm as msm_mod


def _gather_tree_add(curve_mod, pt, axis_name):
    """all_gather partial points over one mesh axis and tree-add them."""
    gathered = jax.tree.map(
        lambda x: jax.lax.all_gather(x, axis_name, axis=x.ndim, tiled=False),
        pt,
    )
    n = jax.tree.leaves(gathered)[0].shape[-1]
    acc = jax.tree.map(lambda x: x[..., 0], gathered)
    for i in range(1, n):
        acc = curve_mod.add(acc, jax.tree.map(lambda x: x[..., i], gathered))
    return acc


@functools.lru_cache(maxsize=None)
def _build(mesh, c: int, glv: bool, curve_name: str):
    axes = tuple(mesh.axis_names)  # batch sharded over the whole mesh
    curve_mod = G1 if curve_name == "g1" else G2
    # G1 coords are [L, B] tensors; G2 coords are (c0, c1) pairs of [L, B]
    coord_spec = (
        P(None, axes) if curve_name == "g1" else (P(None, axes),) * 2
    )
    coord_out = P(None, None) if curve_name == "g1" else (P(None, None),) * 2
    point_spec = (coord_spec,) * 3
    scalar_spec = P(None, axes)

    def local_msm(points, scalars):
        if curve_name == "g1":
            return msm_mod.msm_g1(points, scalars, c=c, glv=glv)
        return msm_mod.msm_g2(points, scalars, c=c, gls=glv)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(point_spec, scalar_spec),
        out_specs=(coord_out,) * 3,
        check_rep=False,
    )
    def _local(points, scalars):
        partial_pt = local_msm(points, scalars)
        # hierarchical combine: innermost axis first (ICI within a host),
        # outer axis last, so only one partial per host crosses DCN
        for ax in reversed(axes):
            partial_pt = _gather_tree_add(curve_mod, partial_pt, ax)
        # out shape [L, 1] to satisfy the sharded-out rank
        return jax.tree.map(lambda x: x[:, None], partial_pt)

    return jax.jit(_local)


def _canon_g2_point(points_proj):
    return tuple((cc[0], cc[1]) for cc in points_proj)


def msm_g1_sharded(mesh, points_proj, scalars_mont, c: int = 8,
                   glv: bool = True):
    """sum_i [s_i] P_i with the point batch sharded across the mesh.

    points_proj: projective G1 pytree with trailing batch axis [B];
    scalars_mont: [16, B] Montgomery Fr.  B must divide evenly by mesh size.

    glv=True (the production config) splits scalars with the GLV
    endomorphism inside each shard — identical cross-chip semantics, half
    the window work (see ops/msm.py).
    """
    out = _build(mesh, c, glv, "g1")(tuple(points_proj), scalars_mont)
    return jax.tree.map(lambda x: x[..., 0], out)


def msm_g2_sharded(mesh, points_proj, scalars_mont, c: int = 8,
                   gls: bool = True):
    """G2 multi-scalar multiplication sharded over the mesh (same shard +
    per-chip-buckets + gather-reduce layout as msm_g1_sharded).  gls=True
    applies the 4-way psi split inside each shard (subgroup points only)."""
    out = _build(mesh, c, gls, "g2")(
        _canon_g2_point(points_proj), scalars_mont
    )
    return jax.tree.map(lambda x: x[..., 0], out)
