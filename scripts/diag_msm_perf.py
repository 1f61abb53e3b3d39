"""MSM window sweep + stage decomposition on the real device.

Usage: PYTHONPATH=/root/repo python scripts/diag_msm_perf.py [log_b ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge

ge._configure_jax()

import jax
import jax.numpy as jnp
import numpy as np

from bls12_381_tpu.curves import g1 as G1
from bls12_381_tpu.ops import msm as msm_mod


def rand_fr(seed, batch):
    from bls12_381_tpu import limbs as lb

    rng = np.random.RandomState(seed)
    a = rng.randint(0, 1 << 16, size=(lb.FR.n_limbs, batch)).astype(np.uint32)
    a[-1] &= 0x3FFF
    return jnp.asarray(a)


def timeit(fn, *args, reps=3):
    jax.device_get(jax.tree.map(lambda v: v.reshape(-1)[:1], fn(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jax.tree.map(lambda v: v.reshape(-1)[:1], fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


logs = [int(x) for x in sys.argv[1:]] or [16]
for log_b in logs:
    B = 1 << log_b
    ks = rand_fr(3, B)
    pts = G1.generator((B,))
    for c in (10, 12, 14, 16):
        try:
            t = timeit(
                jax.jit(
                    lambda p, k, c=c: jax.tree.map(
                        lambda v: v.reshape(-1)[:8],
                        msm_mod.msm_g1(p, k, c=c),
                    )
                ),
                pts, ks,
            )
            print(f"msm 2^{log_b} c={c}: {t*1e3:9.1f} ms", flush=True)
        except Exception as e:  # OOM etc.
            print(f"msm 2^{log_b} c={c}: FAILED {type(e).__name__}",
                  flush=True)
