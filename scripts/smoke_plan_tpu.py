#!/usr/bin/env python3
"""TPU smoke for the expression-plan kernels: compile + time each plan.

The plan kernels unroll an entire tower operation into one Pallas kernel
(~10^4-10^5 ops); Mosaic compile time on the real device is the main risk
(they have only been validated in interpret/oracle modes on CPU).  This
script force-compiles each plan at a small batch, reports compile wall
time and steady-state latency, and compares against the phased-glue path
so the plan_kernels default can be confirmed or flipped before bench.

Usage: PYTHONPATH=/root/repo python scripts/smoke_plan_tpu.py [batch]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge

ge._configure_jax()

import jax
import numpy as np

from bls12_381_tpu import config
from bls12_381_tpu.fields import fp, tower as tw


def timeit(fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.device_get(jax.tree.map(lambda v: v.reshape(-1)[:1], out))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jax.tree.map(lambda v: v.reshape(-1)[:1], fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return compile_s, best


B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
rng = np.random.RandomState(5)
print(f"platform {jax.devices()[0].platform}  batch {B}", flush=True)


def rand_f2():
    return (fp.from_ints(list(rng.randint(1, 1 << 30, size=B))),
            fp.from_ints(list(rng.randint(1, 1 << 30, size=B))))


def rand_f12():
    return tuple(tuple(rand_f2() for _ in range(3)) for _ in range(2))


a, b = rand_f12(), rand_f12()
g0, g4, g5 = rand_f2(), rand_f2(), rand_f2()

CASES = [
    ("fp12_mul", lambda: jax.jit(tw.fp12_mul)(a, b)),
    ("fp12_sqr", lambda: jax.jit(tw.fp12_sqr)(a)),
    ("fp12_cyclo_sqr", lambda: jax.jit(tw.fp12_cyclotomic_sqr)(a)),
    ("fp12_mul_by_045",
     lambda: jax.jit(tw.fp12_mul_by_045)(a, g0, g4, g5)),
    ("fp12_sqr_mul_by_045",
     lambda: jax.jit(tw.fp12_sqr_mul_by_045)(a, g0, g4, g5)),
    ("fp12_cyclo_sqr_k4",
     lambda: jax.jit(lambda x: tw.fp12_cyclotomic_sqr_k(x, 4))(a)),
    ("fp12_cyclo_sqr_k8",
     lambda: jax.jit(lambda x: tw.fp12_cyclotomic_sqr_k(x, 8))(a)),
]

for plan_on in (True, False):
    config.update(plan_kernels=plan_on)
    tag = "plan" if plan_on else "glue"
    for name, fn in CASES:
        try:
            comp, run = timeit(lambda: fn())
            print(f"{tag:5s} {name:22s} compile {comp:7.1f}s"
                  f"  run {run * 1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{tag:5s} {name:22s} FAILED {type(e).__name__}: {e}",
                  flush=True)

# correctness cross-check plan vs glue on device values
config.update(plan_kernels=True)
got = jax.device_get(jax.jit(tw.fp12_mul)(a, b))
config.update(plan_kernels=False)
ref = jax.device_get(jax.jit(tw.fp12_mul)(a, b))
same = all(
    bool((np.asarray(x) == np.asarray(y)).all())
    for x, y in zip(jax.tree.leaves(got), jax.tree.leaves(ref))
)
print(f"plan vs glue bit-identical: {same}", flush=True)
