#!/usr/bin/env python3
"""Diagnose persistent-compile-cache misses across processes.

Compiles one small fixed graph with per-ingredient cache-key hash logging
(jax._src.cache_key._log_cache_key_hash) and explain-cache-misses enabled.
Run twice in fresh processes and diff the stderr: the first ingredient whose
running hash differs is the one that is per-session.

Usage:  python scripts/cache_key_probe.py 2> run_a.log
        python scripts/cache_key_probe.py 2> run_b.log
        diff run_a.log run_b.log
"""
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/bls12381_jax")

# Must run BEFORE `import jax`: jax/absl may install a root handler during
# import, which would make a later basicConfig a silent no-op and drop the
# jax._src.cache_key DEBUG hash lines this script exists to capture.
# force=True also clears any handler an embedding environment installed.
logging.basicConfig(stream=sys.stderr, level=logging.DEBUG, force=True)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/bls12381_jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_explain_cache_misses", True)

for name in ("jax._src.cache_key", "jax._src.compilation_cache",
             "jax._src.compiler"):
    logging.getLogger(name).setLevel(logging.DEBUG)

from bls12_381_tpu import config as _cfg

_cfg.harden_compile_cache()  # includes stabilize_cache_key()

import jax.numpy as jnp

from bls12_381_tpu import limbs as lb


@jax.jit
def probe(a, b):
    return lb.mont_mul(lb.FP, a, b)


a = jnp.ones((lb.FP.n_limbs, 256), dtype=jnp.uint32)
import time

t0 = time.perf_counter()
jax.block_until_ready(probe(a, a))
print(f"compile+run: {time.perf_counter() - t0:.2f}s", file=sys.stderr)
print("devices:", jax.devices(), file=sys.stderr)
