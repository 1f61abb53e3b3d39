"""Profiling / tracing helpers (SURVEY.md §5: the TPU-equivalent of the
reference's criterion benches is jax.profiler traces + roofline accounting).

Usage:
    from bls12_381_tpu.utils import profiling
    with profiling.trace("/tmp/bls_trace"):
        out = pairing(p, q)
        jax.device_get(jax.tree.map(lambda v: v.reshape(-1)[:1], out))
    # then: xprof / tensorboard --logdir /tmp/bls_trace

    profiling.time_fn(lambda: pairing(p, q))   # wall time, fetch-forced
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace scope (works on TPU; on the axon tunnel the device
    trace is captured remotely and merged)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, reps: int = 3, warmup: int = 1):
    """Best-of-reps wall time of fn(*args), forcing completion with a host
    fetch (block_until_ready is unreliable on tunneled platforms)."""
    for _ in range(warmup):
        jax.device_get(jax.tree.map(lambda v: v.reshape(-1)[:1], fn(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jax.tree.map(lambda v: v.reshape(-1)[:1], fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def fp_mul_roofline(batch: int, seconds: float, n_limbs: int = 24) -> dict:
    """Rough roofline accounting for a batched Fp-multiply-shaped kernel:
    returns achieved element rate and the fraction of the ~3e12 uint32
    lane-op/s VPU envelope measured on v5e (see BASELINE.md)."""
    l12 = 16 * n_limbs // 12
    ops_per_el = 2 * l12 * l12 + 68 * l12  # phase1 + reduction, radix-12
    rate = batch / seconds
    return {
        "elements_per_s": rate,
        "uint32_lane_ops_per_s": rate * ops_per_el,
        "vpu_fraction_of_3e12": rate * ops_per_el / 3e12,
    }
