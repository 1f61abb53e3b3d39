"""Test configuration: force CPU JAX with an 8-device virtual mesh.

Device-layer tests run on CPU for bit-exactness checking; multi-chip sharding
tests use 8 virtual host devices (the driver separately dry-runs the multichip
path via __graft_entry__.dryrun_multichip).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some PJRT plugins (e.g. the axon TPU tunnel) override JAX_PLATFORMS; the
# config update below wins regardless.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the big tower/pairing graphs compile in
# minutes on the CPU backend; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/bls12_381_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

VECTORS = pathlib.Path(__file__).resolve().parent / "vectors"
