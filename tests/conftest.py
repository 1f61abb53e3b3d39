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

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

VECTORS = pathlib.Path(__file__).resolve().parent / "vectors"
