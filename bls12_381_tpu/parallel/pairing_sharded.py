"""Multi-chip batched pairing: pair batches sharded over the mesh.

Every pairing in the batch is independent, so the whole Miller loop + final
exponentiation runs SPMD with zero collectives; the optional aggregation
(multi_miller_loop semantics) finishes with an all_gather of Fp12 values and
a local product — the DCN-friendly layout of SURVEY.md §2.4.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..fields import tower as tw
from ..pairing import miller_loop_batched, final_exponentiation, prepare_g2
from ..pairing.pairing import _tree_product


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
    axis = mesh.axis_names[0]

    shard = lambda t: jax.tree.map(lambda x: P(*([None] * (x.ndim - 1) + [axis])), t)  # noqa: E731

    if aggregate:
        out_spec = jax.tree.map(lambda _: P(), tw.fp12_one(()))

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(shard(p_aff), shard(q_aff)),
            out_specs=out_spec,
            check_rep=False,
        )
        def _agg(p, q):
            f = miller_loop_batched(p, prepare_g2(q))
            local = _tree_product(f)
            gathered = jax.tree.map(
                lambda x: jax.lax.all_gather(x, axis, axis=x.ndim, tiled=False),
                local,
            )
            total = _tree_product(gathered)
            return final_exponentiation(total) if final_exp else total

        return _agg(p_aff, q_aff)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(shard(p_aff), shard(q_aff)),
        out_specs=jax.tree.map(lambda _: P(None, axis), tw.fp12_one((1,))),
        check_rep=False,
    )
    def _elem(p, q):
        return final_exponentiation(miller_loop_batched(p, prepare_g2(q)))

    return _elem(p_aff, q_aff)
