"""Multi-chip batched pairing: pair batches sharded over the mesh.

Every pairing in the batch is independent, so the whole Miller loop + final
exponentiation runs SPMD with zero collectives; the optional aggregation
(multi_miller_loop semantics) finishes with an all_gather of Fp12 values and
a local product — the DCN-friendly layout of SURVEY.md §2.4.

Each (mesh, aggregate, final_exp) pipeline is built once and jitted —
shard_map outside jit runs its body eagerly (see msm_sharded.py).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..fields import tower as tw
from ..pairing import miller_loop_batched, final_exponentiation, prepare_g2
from ..pairing.pairing import _tree_product


@functools.lru_cache(maxsize=None)
def _build(mesh, aggregate: bool, final_exp: bool, p_spec, q_spec):
    """p_spec/q_spec: nested PartitionSpec tuples mirroring the input
    pytrees (hashable, so pipelines cache per mesh + config)."""
    axes = tuple(mesh.axis_names)

    if aggregate:
        out_spec = jax.tree.map(lambda _: P(), tw.fp12_one(()))

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(p_spec, q_spec),
            out_specs=out_spec,
            check_rep=False,
        )
        def _agg(p, q):
            f = miller_loop_batched(p, prepare_g2(q))
            local = _tree_product(f)
            # hierarchical product: ICI axis first, DCN (host) axis last —
            # one Fp12 value per host crosses DCN
            for ax in reversed(axes):
                gathered = jax.tree.map(
                    lambda x: jax.lax.all_gather(x, ax, axis=x.ndim,
                                                 tiled=False),
                    local,
                )
                local = _tree_product(gathered)
            return final_exponentiation(local) if final_exp else local

        return jax.jit(_agg)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(p_spec, q_spec),
        out_specs=jax.tree.map(lambda _: P(None, axes), tw.fp12_one((1,))),
        check_rep=False,
    )
    def _elem(p, q):
        return final_exponentiation(miller_loop_batched(p, prepare_g2(q)))

    return jax.jit(_elem)


def _shard_specs(tree, axes):
    return jax.tree.map(
        lambda x: P(*([None] * (x.ndim - 1) + [axes])), tree
    )


def pairing_sharded(mesh, p_aff, q_aff, aggregate: bool = False,
                    final_exp: bool = True):
    """e(P_i, Q_i) with the batch sharded over the mesh axis.

    aggregate=False: element-wise pairings (replicated gather of results).
    aggregate=True: product of all pairings with ONE final exponentiation —
    the multi_miller_loop pattern (pairings.rs:554-603) across chips.
    final_exp=False returns the raw aggregated Miller value (the
    MillerLoopResult analog, pairings.rs:26) — callers batching several
    aggregations can amortize the final exponentiation further.
    """
    # canonicalize pytrees to tuples so the jitted signature is stable
    p_aff = (p_aff[0], p_aff[1], p_aff[2])
    q_aff = ((q_aff[0][0], q_aff[0][1]), (q_aff[1][0], q_aff[1][1]), q_aff[2])
    axes = tuple(mesh.axis_names)
    fn = _build(mesh, aggregate, final_exp,
                _shard_specs(p_aff, axes), _shard_specs(q_aff, axes))
    return fn(p_aff, q_aff)
