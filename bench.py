#!/usr/bin/env python3
"""Benchmark suite: the BASELINE.md configs, one JSON line on stdout.

`python bench.py` (no flags) runs the FULL metric set — field ops, tower,
curve ops, scalar mul, MSM (2^16 and 2^20), NTT 2^20, pairing stages,
hash-to-curve — and prints ONE JSON line:

    {"metric": "fp_mont_mul_throughput", "value": ..., "unit": ...,
     "vs_baseline": ..., "metrics": {<the full set>}}

The headline metric/vs_baseline is the driver target (>= 1e7 batched Fp
Montgomery muls/sec/chip, BASELINE.md); the `metrics` dict carries every
other number (keys ending in `_s` are seconds, `/s` are rates).  Progress
lines go to stderr so stdout stays machine-parseable.

Workloads mirror the reference's bench definitions
(/root/reference/benches/groups.rs:10-167, benches/hash_to_curve.rs:10-65)
at the batch sizes of BASELINE.md configs 1-5.

`python bench.py --scaling` additionally runs the weak-scaling MSM harness
on a virtual 8-device CPU mesh (shape-aligned with tests) — meaningful
scaling numbers require a real multi-chip pod; see README.

Measurement discipline: on the axon-tunneled TPU platform,
`block_until_ready` can return before execution finishes, so every timing
forces completion with a `device_get` of a tiny output slice, and fixed
dispatch/fetch overhead is cancelled by differencing two dependency-chain
lengths where rates are reported.
"""

import json
import os
import sys
import time

# Persistent compile cache: bench runs in a fresh process (no conftest).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.environ.get("BLS12_381_TPU_JAX_CACHE",
                                     "/root/.cache/bls12381_jax"))


PROBE_FAILURE = ""


def _probe_accelerator():
    """Check in a SUBPROCESS that the accelerator backend initializes (a dead
    TPU tunnel can make backend init hang or fail); fall back to CPU so the
    bench always completes and emits its JSON line.

    The tunnel on this box is flaky: cold `jax.devices()` init has been
    observed to exceed 180 s even when it eventually succeeds.  So retry with
    escalating timeouts (~10 min total) and record WHY the fallback was taken
    so the emitted artifact is diagnosable (round-2 verdict item 1).
    """
    import subprocess

    global PROBE_FAILURE
    attempts = (120, 240, 360)
    reasons = []
    for i, timeout_s in enumerate(attempts):
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, timeout=timeout_s, text=True,
            )
            plat = out.stdout.strip().splitlines()[-1] if out.stdout else ""
            if out.returncode == 0 and plat:
                return plat
            tail = (out.stderr or "").strip().splitlines()[-3:]
            reasons.append(
                f"attempt {i + 1} (cap {timeout_s}s): rc={out.returncode} "
                + " | ".join(tail))
        except subprocess.TimeoutExpired:
            reasons.append(f"attempt {i + 1}: timeout after {timeout_s}s")
        except Exception as e:
            reasons.append(f"attempt {i + 1}: {type(e).__name__}: {e}")
        print(reasons[-1], file=sys.stderr, flush=True)
    PROBE_FAILURE = "; ".join(reasons)
    return ""


_PLATFORM = _probe_accelerator()
CPU_FALLBACK = _PLATFORM not in ("tpu", "axon")
if CPU_FALLBACK:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
if CPU_FALLBACK:
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from bls12_381_tpu import config as _bls_config

_bls_config.harden_compile_cache()

METRICS = {}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(key, val):
    METRICS[key] = val
    log(json.dumps({key: val}))


def _time_fetch(fn, *args, reps=3):
    """Best-of-reps wall time of fn(*args) forced with a host fetch."""
    jax.device_get(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _chain_rate(op, a, b, n1=32, n2=160, reps=3):
    """Per-op seconds of a dependency chain acc = op(acc, b), overhead-
    cancelled: (t(n2) - t(n1)) / (n2 - n1)."""

    def make(n):
        @jax.jit
        def chain(x, y):
            def step(acc, _):
                return op(acc, y), None
            acc, _ = jax.lax.scan(step, x, None, length=n)
            return jax.tree.map(lambda v: v.reshape(-1)[:8], acc)

        return chain

    t1 = _time_fetch(make(n1), a, b, reps=reps)
    t2 = _time_fetch(make(n2), a, b, reps=reps)
    return max(t2 - t1, 1e-12) / (n2 - n1)


def _tiny_out(fn):
    """Jit fn returning only 8 lanes per leaf (cheap fetch, full compute)."""

    def wrapped(*args):
        return jax.tree.map(lambda v: v.reshape(-1)[:8], fn(*args))

    return jax.jit(wrapped)


def _rand_fp(rng, n_limbs, batch):
    a = rng.randint(0, 1 << 16, size=(n_limbs, batch)).astype(np.uint32)
    a[-1] &= 0x09FF  # below p's top limb => canonical
    return jnp.asarray(a)


def bench_fields():
    from bls12_381_tpu import limbs as lb
    from bls12_381_tpu.fields import tower as tw

    rng = np.random.RandomState(0)
    B = 1 << 16
    a = _rand_fp(rng, lb.FP.n_limbs, B)
    b = _rand_fp(rng, lb.FP.n_limbs, B)

    dt = _chain_rate(lambda x, y: lb.mont_mul(lb.FP, x, y), a, b)
    headline = B / dt
    emit("fp_mul/s", round(headline))
    emit("fp_sqr/s", round(
        B / _chain_rate(lambda x, _: lb.mont_sqr(lb.FP, x), a, b)))
    emit("fp_add/s", round(
        B / _chain_rate(lambda x, y: lb.add(lb.FP, x, y), a, b)))

    B2 = 1 << 14
    rng = np.random.RandomState(1)
    x2 = (_rand_fp(rng, lb.FP.n_limbs, B2), _rand_fp(rng, lb.FP.n_limbs, B2))
    y2 = (_rand_fp(rng, lb.FP.n_limbs, B2), _rand_fp(rng, lb.FP.n_limbs, B2))
    emit("fp2_mul/s", round(B2 / _chain_rate(tw.fp2_mul, x2, y2)))
    return headline


def bench_curves():
    from bls12_381_tpu.curves import g1 as G1
    from bls12_381_tpu.fields import fr

    B3 = 1 << 12
    pts = G1.generator((B3,))
    emit("g1_double/s", round(
        B3 / _chain_rate(lambda p, _: G1.CURVE.double(p), pts, jnp.zeros(()),
                         n1=16, n2=64)))
    emit("g1_add/s", round(
        B3 / _chain_rate(lambda p, q: G1.CURVE.add(p, q), pts, pts,
                         n1=16, n2=64)))

    B4 = 1 << 10
    ks = fr.from_ints(list(np.random.RandomState(2).randint(1, 1 << 62, B4)))
    smul = _tiny_out(G1.scalar_mul)
    t = _time_fetch(smul, G1.generator((B4,)), ks)
    emit("g1_scalar_mul/s (batch 2^10)", round(B4 / t, 1))


def _rand_fr(seed, batch):
    """Random canonical Fr limb tensors WITHOUT the per-int host codec
    (keeps 2^20-element setup off the 1-core host): top limb masked below
    q's top limb 0x73ed, so values are < q."""
    from bls12_381_tpu import limbs as lb

    rng = np.random.RandomState(seed)
    a = rng.randint(0, 1 << 16, size=(lb.FR.n_limbs, batch)).astype(np.uint32)
    a[-1] &= 0x3FFF
    return jnp.asarray(a)


def bench_msm_ntt():
    from bls12_381_tpu.curves import g1 as G1
    from bls12_381_tpu.ops import msm as msm_mod
    from bls12_381_tpu.ops import ntt as ntt_mod

    for log_b, c in ((16, 12), (20, 13), (24, 13)):
        try:
            B = 1 << log_b
            ks = _rand_fr(3 + log_b, B)

            # msm_g1_large chunks >2^22 with a PYTHON loop of jitted calls —
            # must not be re-wrapped in an outer jit (that would fuse all
            # chunks into one graph and reinstate the memory peak)
            def fn(p, k, c=c):
                out = msm_mod.msm_g1_large(p, k, c=c)
                return jax.tree.map(lambda v: v.reshape(-1)[:8], out)

            t = _time_fetch(fn, G1.generator((B,)), ks, reps=2)
            emit(f"msm_g1_2^{log_b}_s", round(t, 3))
        except Exception as e:
            emit(f"msm_g1_2^{log_b}_error", type(e).__name__)
            log(f"msm 2^{log_b} failed: {e}")

    try:
        from bls12_381_tpu.curves import g2 as G2

        B = 1 << 14
        ks = _rand_fr(31, B)
        fn = _tiny_out(lambda p, k: msm_mod.msm_g2(p, k, c=12))
        t = _time_fetch(fn, G2.generator((B,)), ks, reps=2)
        emit("msm_g2_2^14_s", round(t, 3))
    except Exception as e:
        emit("msm_g2_2^14_error", type(e).__name__)
        log(f"msm_g2 2^14 failed: {e}")

    N = 1 << 20
    coeffs = _rand_fr(4, N)
    t = _time_fetch(_tiny_out(ntt_mod.ntt), coeffs, reps=2)
    emit("ntt_2^20_s (incl fetch overhead)", round(t, 3))

    # overhead-cancelled: NTT composed with itself chains naturally
    def ntt_k(k):
        def fn(x):
            for _ in range(k):
                x = ntt_mod.ntt(x)
            return x.reshape(-1)[:8]

        return jax.jit(fn)

    t3 = _time_fetch(ntt_k(3), coeffs, reps=2)
    t1 = _time_fetch(ntt_k(1), coeffs, reps=2)
    emit("ntt_2^20_s (marginal)", round(max(t3 - t1, 0) / 2, 3))


def bench_pairing():
    import importlib

    import __graft_entry__ as ge

    pr_mod = importlib.import_module("bls12_381_tpu.pairing.pairing")
    tw = importlib.import_module("bls12_381_tpu.fields.tower")
    p_aff, q_aff = ge._tiny_pairing_inputs(64)
    t = _time_fetch(_tiny_out(lambda q: pr_mod.prepare_g2(q).coeffs), q_aff)
    emit("g2_prepare/s (batch 64)", round(64 / t, 1))
    prep = pr_mod.prepare_g2(q_aff)
    t = _time_fetch(
        _tiny_out(lambda p, pr: pr_mod.miller_loop_batched(p, pr)),
        p_aff, prep)
    emit("miller_loop/s (batch 64)", round(64 / t, 1))
    f = pr_mod.miller_loop_batched(p_aff, prep)
    t = _time_fetch(_tiny_out(pr_mod.final_exponentiation), f)
    emit("final_exp/s (batch 64)", round(64 / t, 1))
    t1 = _time_fetch(_tiny_out(pr_mod.pairing), p_aff, q_aff)
    emit("pairing/s (batch 64, incl fetch overhead)", round(64 / t1, 1))

    # overhead-cancelled: k pairing batches multiplied inside ONE graph;
    # marginal rate cancels the fixed dispatch/fetch round-trip (which on the
    # tunneled platform is ~25 ms and would swamp a 64-batch measurement)
    def many(k):
        # chain each instance's G1 input through the previous result's
        # infinity mask (value-preserving but data-dependent, so instances
        # cannot be collapsed or reordered away)
        def fn(p, q):
            out = None
            for _ in range(k):
                e = pr_mod.pairing(p, q)
                out = e if out is None else tw.fp12_mul(out, e)
                # limbs are canonical (< 2^16), so this is always False at
                # runtime but not statically provable — a value-preserving
                # data dependency
                dep = p[2] | (e[0][0][0][0] > jnp.uint32(0xFFFF))
                p = (p[0], p[1], dep)
            return jax.tree.map(lambda v: v.reshape(-1)[:8], out)

        return jax.jit(fn)

    t3 = _time_fetch(many(3), p_aff, q_aff, reps=2)
    t1b = _time_fetch(many(1), p_aff, q_aff, reps=2)
    rate = 64 * 2 / max(t3 - t1b, 1e-9)
    emit("pairing/s (batch 64, marginal)", round(rate, 1))

    # throughput regime: batch 256 / 1024 (round-2 verdict weak #6 — the
    # 64-batch numbers sit in the launch-bound regime; a TPU should win at
    # large batch).  Inputs tile the 64-lane set — values are irrelevant to
    # timing, shapes are what's measured.
    for bs in (256, 1024):
        try:
            reps_t = bs // 64
            p_b = (jnp.tile(p_aff[0], (1, reps_t)), jnp.tile(p_aff[1], (1, reps_t)),
                   jnp.tile(p_aff[2], (reps_t,)))
            q_b = (tuple(jnp.tile(c, (1, reps_t)) for c in q_aff[0]),
                   tuple(jnp.tile(c, (1, reps_t)) for c in q_aff[1]),
                   jnp.tile(q_aff[2], (reps_t,)))
            t3b = _time_fetch(many(3), p_b, q_b, reps=2)
            t1c = _time_fetch(many(1), p_b, q_b, reps=2)
            emit(f"pairing/s (batch {bs}, marginal)",
                 round(bs * 2 / max(t3b - t1c, 1e-9), 1))
        except Exception as e:
            emit(f"pairing_batch{bs}_error", type(e).__name__)
            log(f"pairing batch {bs} failed: {e}")


def bench_h2c():
    from bls12_381_tpu.hash_to_curve import h2c

    msgs = np.random.RandomState(5).randint(
        0, 256, size=(256, 32)).astype(np.uint8)
    t = _time_fetch(
        _tiny_out(
            lambda m: h2c.hash_to_curve_g1(m, b"BENCH-DST_", expand="device")),
        msgs)
    emit("hash_to_curve_g1/s (batch 256)", round(256 / t, 1))


def bench_scaling():
    """Weak-scaling MSM on a virtual 8-device CPU mesh (1 core: numbers show
    correctness of the sharded path, not real ICI scaling)."""
    from bls12_381_tpu import limbs as lb
    from bls12_381_tpu.curves import g1 as G1
    from bls12_381_tpu.fields import fr
    from bls12_381_tpu.parallel import mesh as mesh_mod, msm_g1_sharded

    lb.set_pallas(False)
    try:
        cpu = jax.devices("cpu")
        per_dev = 1 << 10
        with jax.default_device(cpu[0]):
            for n_dev in (1, 8):
                mesh = mesh_mod.make_mesh(n_dev)
                B = per_dev * n_dev
                ks = fr.from_ints(
                    list(np.random.RandomState(6).randint(1, 1 << 62, B)))
                fn = _tiny_out(
                    lambda p, k: msm_g1_sharded(mesh, p, k, c=8, glv=True))
                t = _time_fetch(fn, G1.generator((B,)), ks, reps=2)
                emit(f"msm_sharded_{n_dev}dev_{per_dev}/dev_s", round(t, 3))
    finally:
        lb.set_pallas(None)


def bench_fields_cpu_reduced():
    """Tiny CPU-only fallback when no accelerator is reachable: measures the
    headline metric at a reduced batch so a valid JSON line is still
    emitted (clearly marked)."""
    from bls12_381_tpu import limbs as lb

    rng = np.random.RandomState(0)
    B = 1 << 12
    a = _rand_fp(rng, lb.FP.n_limbs, B)
    b = _rand_fp(rng, lb.FP.n_limbs, B)
    dt = _chain_rate(lambda x, y: lb.mont_mul(lb.FP, x, y), a, b,
                     n1=8, n2=24, reps=2)
    headline = B / dt
    emit("fp_mul/s", round(headline))
    emit("platform", "cpu_fallback (accelerator unavailable)")
    emit("probe_failure", PROBE_FAILURE or "unknown")
    return headline


def main():
    t_start = time.perf_counter()
    if CPU_FALLBACK:
        log("accelerator unreachable - running reduced CPU fallback")
        headline = bench_fields_cpu_reduced()
    else:
        emit("platform", _PLATFORM)
        headline = bench_fields()
        # every section fail-soft: the JSON line on stdout must always appear
        for section in (bench_curves, bench_msm_ntt, bench_pairing,
                        bench_h2c):
            try:
                section()
            except Exception as e:  # OOM'd compiles etc.
                emit(f"{section.__name__}_error", f"{type(e).__name__}")
                log(f"{section.__name__} failed: {e}")
        # scaling section: in the default run whenever a virtual 8-device
        # CPU mesh is available (or forced with --scaling)
        try:
            run_scaling = "--scaling" in sys.argv or len(
                jax.devices("cpu")) >= 8
        except Exception:
            run_scaling = "--scaling" in sys.argv
        if run_scaling:
            try:
                bench_scaling()
            except Exception as e:
                emit("bench_scaling_error", f"{type(e).__name__}")
    log(f"total bench wall time: {time.perf_counter() - t_start:.1f}s")

    print(
        json.dumps(
            {
                "metric": "fp_mont_mul_throughput",
                "value": round(headline),
                "unit": "muls/sec/chip",
                "vs_baseline": round(headline / 1e7, 3),
                "metrics": METRICS,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
