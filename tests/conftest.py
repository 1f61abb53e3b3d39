"""Test configuration.

Platform strategy:
  - Single-chip device tests run on the default platform — the real TPU when
    present (also exercising the Pallas kernels), CPU otherwise.  Results are
    bit-exact either way; XLA CPU compiles the big field/curve graphs orders
    of magnitude slower than the TPU toolchain, so we do NOT force CPU.
  - Multi-chip sharding tests always use an 8-device virtual CPU mesh
    (XLA_FLAGS host platform device count), with the Pallas path disabled
    (fixture below) since those kernels only lower for TPU.

A persistent compilation cache makes repeated runs cheap.
"""

import os

# Must be set before jax is imported anywhere: 8 virtual CPU devices for the
# multi-chip tests (they coexist with the TPU platform).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import subprocess
import sys as _sys

import jax
import pytest


def _accelerator_alive() -> bool:
    """Probe (in a subprocess, with a timeout) whether the default
    accelerator backend can actually initialize.  On this box the axon TPU
    tunnel can be down, in which case backend init hangs for tens of minutes
    and pytest dies at COLLECTION; `JAX_PLATFORMS=cpu` in the environment
    does NOT help because the axon plugin overrides it — only
    `jax.config.update("jax_platforms", "cpu")` works.
    """
    if os.environ.get("BLS12_381_TPU_FORCE_CPU"):
        return False
    timeout = float(os.environ.get("BLS12_381_TPU_PROBE_TIMEOUT", "180"))
    try:
        out = subprocess.run(
            [_sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, timeout=timeout, text=True,
        )
        plat = out.stdout.strip().splitlines()[-1] if out.stdout else ""
        return out.returncode == 0 and plat in ("tpu", "axon")
    except Exception:
        return False


if not _accelerator_alive():
    # Tunnel down: force the CPU backend so correctness stays checkable.
    jax.config.update("jax_platforms", "cpu")
    print("[conftest] accelerator unreachable - forcing CPU backend",
          file=_sys.stderr)

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("BLS12_381_TPU_JAX_CACHE", "/root/.cache/bls12381_jax"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bls12_381_tpu import config as _bls_config

_bls_config.harden_compile_cache()

VECTORS = pathlib.Path(__file__).resolve().parent / "vectors"


def cpu_devices(n: int = 8):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} virtual CPU devices, have {len(devs)}")
    return devs[:n]


@pytest.fixture
def cpu_mesh_8():
    """8-device virtual CPU mesh with the Pallas kernel path disabled (the
    kernels only lower for TPU; the jnp fallback is bit-exact)."""
    import numpy as np

    from bls12_381_tpu import limbs as lb
    from jax.sharding import Mesh

    lb.set_pallas(False)
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            yield Mesh(np.array(cpu_devices(8)), ("x",))
    finally:
        lb.set_pallas(None)


@pytest.fixture
def cpu_mesh_2x4():
    """2x4 ("host", "x") virtual mesh — the DCN-spanning 2-D layout
    (SURVEY.md §2.4); outer axis models hosts, inner axis ICI."""
    import numpy as np

    from bls12_381_tpu import limbs as lb
    from jax.sharding import Mesh

    lb.set_pallas(False)
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            yield Mesh(
                np.array(cpu_devices(8)).reshape(2, 4), ("host", "x")
            )
    finally:
        lb.set_pallas(None)
