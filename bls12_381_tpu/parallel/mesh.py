"""Device-mesh helpers for multi-chip execution.

The reference is single-threaded (SURVEY.md §2.4); all parallelism here is
new TPU-first design: shard_map-based SPMD over a 1-D "x" chip mesh or a 2-D
("host", "x") mesh whose outer axis spans hosts over DCN (SURVEY.md §2.4
"DCN-spanning mesh axes for multi-host pairing batches").  Batches shard over
ALL mesh axes; reductions run hierarchically — innermost axis first (ICI
within a host), outer axis last — so only one partial value per host crosses
DCN.
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


def make_mesh_2d(n_hosts: int, chips_per_host: int,
                 axes: tuple[str, str] = ("host", "x")) -> Mesh:
    """[n_hosts, chips_per_host] mesh: outer axis spans hosts (DCN), inner
    axis spans each host's chips (ICI).  On a real multi-host pod
    jax.devices() enumerates host-major, so reshaping preserves the
    host/ICI locality; on a virtual CPU mesh the layout is nominal."""
    m = make_mesh(n_hosts * chips_per_host, axis=axes[1])
    return Mesh(m.devices.reshape(n_hosts, chips_per_host), axes)


def batch_axes(mesh: Mesh) -> tuple[str, ...]:
    """All mesh axis names, for sharding a batch over the whole mesh."""
    return tuple(mesh.axis_names)


def reduce_axes_inner_first(mesh: Mesh) -> tuple[str, ...]:
    """Reduction order: innermost (ICI) axis first, DCN axis last."""
    return tuple(reversed(mesh.axis_names))


def shard_batch(mesh: Mesh, arr, axis_name=None):
    """Place a [..., B] batch with B sharded over all mesh axes (or the
    given axis name / tuple)."""
    ndim = arr.ndim
    name = batch_axes(mesh) if axis_name is None else axis_name
    spec = P(*([None] * (ndim - 1) + [name]))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
