"""Device-mesh helpers for multi-chip execution.

The reference is single-threaded (SURVEY.md §2.4); all parallelism here is
new TPU-first design: a 1-D "x" mesh over chips (extend to ("host", "x") for
DCN-spanning meshes), shard_map-based SPMD, XLA collectives over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        # fall back to virtual host devices (e.g. asking for an 8-way mesh on
        # a 1-chip box with xla_force_host_platform_device_count set) — warn,
        # so a misconfigured real pod cannot silently run sharded compute on
        # the host CPU
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= n:
                import warnings

                warnings.warn(
                    f"make_mesh({n}): only {len(devs)} accelerator device(s) "
                    f"present; falling back to virtual CPU devices",
                    stacklevel=2,
                )
                devs = cpu
        except RuntimeError:
            pass
    if len(devs) < n:
        raise RuntimeError(
            f"make_mesh({n}): only {len(devs)} devices available (set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N for a "
            "virtual mesh)"
        )
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, arr, axis_name: str = "x"):
    """Place a [..., B] batch with B sharded over the mesh axis."""
    ndim = arr.ndim
    spec = P(*([None] * (ndim - 1) + [axis_name]))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
