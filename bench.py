#!/usr/bin/env python3
"""Headline benchmark: batched Fp Montgomery multiplication throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 1e7 batched Fp muls/sec/chip.

Run `python bench.py --full` for the full suite (field ops, tower, curves,
pairing, MSM, NTT) — results printed as extra lines to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _bench(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _bench_chained(op, a, b, chain_len=64, reps=3):
    """Time a dependency chain of `op` inside one jit — immune to async-
    dispatch artifacts (each step consumes the previous result)."""

    @jax.jit
    def chain(x, y):
        def step(acc, _):
            return op(acc, y), None
        acc, _ = jax.lax.scan(step, x, None, length=chain_len)
        return acc

    jax.block_until_ready(chain(a, b))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(a, b))
        best = min(best, time.perf_counter() - t0)
    return best / chain_len


def main():
    from bls12_381_tpu import limbs as lb
    from bls12_381_tpu.params import P

    rng = np.random.RandomState(0)
    B = 1 << 16
    # random canonical residues (top limb clamped below p's top limb)
    a = rng.randint(0, 1 << 16, size=(lb.FP.n_limbs, B)).astype(np.uint32)
    b = rng.randint(0, 1 << 16, size=(lb.FP.n_limbs, B)).astype(np.uint32)
    a[-1] &= 0x09FF  # < p top limb 0x1a01
    b[-1] &= 0x09FF
    a_d, b_d = jnp.asarray(a), jnp.asarray(b)

    dt = _bench_chained(lambda x, y: lb.mont_mul(lb.FP, x, y), a_d, b_d)
    rate = B / dt

    vs_baseline = rate / 1e7  # driver target: 1e7 muls/sec/chip
    print(
        json.dumps(
            {
                "metric": "fp_mont_mul_throughput",
                "value": round(rate),
                "unit": "muls/sec/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )

    if "--full" in sys.argv:
        extra = {}
        sqr = jax.jit(lambda x: lb.mont_sqr(lb.FP, x))
        extra["fp_sqr/s"] = round(B / _bench(sqr, a_d))
        add = jax.jit(lambda x, y: lb.add(lb.FP, x, y))
        extra["fp_add/s"] = round(B / _bench(add, a_d, b_d))
        print(json.dumps(extra), file=sys.stderr)


if __name__ == "__main__":
    main()
