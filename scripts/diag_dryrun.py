"""Diagnose dryrun_multichip stage costs: run ONE stage with compile logging.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python scripts/diag_dryrun.py {msm|ntt|pairing|prep}
"""

import sys
import time

import __graft_entry__ as ge

ge._configure_jax()

import jax
import numpy as np

jax.config.update("jax_log_compiles", True)

import jax.numpy as jnp

from bls12_381_tpu.curves import g1 as G1
from bls12_381_tpu.fields import fr
from bls12_381_tpu.parallel import (
    mesh as mesh_mod,
    msm_g1_sharded,
    ntt_sharded,
    pairing_sharded,
)

stage = sys.argv[1]
n_devices = 8
mesh = mesh_mod.make_mesh(n_devices)
t0 = time.time()

if stage == "msm":
    b = 4 * n_devices
    rng = np.random.RandomState(0)
    scalars = fr.from_ints(list(rng.randint(1, 1 << 30, size=b)))
    pts = G1.generator((b,))
    print(f"[{time.time()-t0:.1f}s] inputs ready", flush=True)
    out = msm_g1_sharded(mesh, pts, scalars, c=4)
    jax.block_until_ready(out[0])
    print(f"[{time.time()-t0:.1f}s] msm done", flush=True)
elif stage == "ntt":
    rng = np.random.RandomState(0)
    n = 256
    coeffs = fr.from_ints(list(rng.randint(0, 1 << 30, size=n)))
    print(f"[{time.time()-t0:.1f}s] inputs ready", flush=True)
    out = ntt_sharded(mesh, coeffs)
    jax.block_until_ready(out)
    print(f"[{time.time()-t0:.1f}s] ntt done", flush=True)
elif stage == "pairing":
    p_aff, q_aff = ge._tiny_pairing_inputs(n_devices)
    print(f"[{time.time()-t0:.1f}s] inputs ready", flush=True)
    agg = pairing_sharded(mesh, p_aff, q_aff, aggregate=True, final_exp=False)
    jax.device_get(jax.tree.map(lambda v: v.reshape(-1)[:1], agg))
    print(f"[{time.time()-t0:.1f}s] pairing done", flush=True)
