#!/usr/bin/env python3
"""Benchmark suite: the BASELINE.md configs, one JSON line on stdout.

`python bench.py` (no flags) runs the FULL metric set — field ops, tower,
curve ops (incl. the reference's per-op workloads: on-curve, eq, double,
add, mixed add, scalar mul, batch_normalize n=10000, deserialize), pairing
stages + throughput batches, hash-to-curve G1/G2, NTT 2^20, MSM up to 2^24 —
and prints ONE JSON line:

    {"metric": "fp_mont_mul_throughput", "value": ..., "unit": ...,
     "vs_baseline": ..., "metrics": {<the full set>}}

The headline metric/vs_baseline is the driver target (>= 1e7 batched Fp
Montgomery muls/sec/chip, BASELINE.md); the `metrics` dict carries every
other number (keys ending in `_s` are seconds, `/s` are rates).  Progress
lines go to stderr so stdout stays machine-parseable.

Workloads mirror the reference's bench definitions
(/root/reference/benches/groups.rs:10-167, benches/hash_to_curve.rs:10-65)
at the batch sizes of BASELINE.md configs 1-5.

Budget discipline (round-3 verdict items 1-2):
  * Sections run most-valuable-first: fields -> pairing -> curves -> h2c ->
    NTT -> MSM, with the 2^24 MSM row LAST.  A global deadline
    (BLS12_381_TPU_BENCH_DEADLINE seconds of process wall time, default 900)
    is checked before every row; rows past it emit `<key>_skipped_deadline`.
  * The headline JSON line is emitted from an atexit hook (SIGTERM/SIGINT
    exit cleanly through it), so even a driver kill leaves a parseable
    artifact with every metric captured up to that point.
  * Every row reports its compile time separately (`<key>_compile_s`) when
    the cold compile exceeded 1s, so cache regressions are visible.

Measurement discipline: on the axon-tunneled TPU platform,
`block_until_ready` can return before execution finishes, so every timing
forces completion with a `device_get` of a tiny output slice; fixed
dispatch/fetch overhead is cancelled by differencing two dependency-chain
lengths where rates are reported, with median-of-reps (cheap rows varied
4.5x run-to-run under best-of in round 3).
"""

import atexit
import json
import os
import signal
import sys
import time

_T0 = time.monotonic()
# default sized to the fully-warm full-row run (~750 s incl. one 133 s
# 2^24 MSM execution); the watchdog emits the artifact at deadline + 60 s
DEADLINE_S = float(os.environ.get("BLS12_381_TPU_BENCH_DEADLINE", "1100"))

# Persistent compile cache: bench runs in a fresh process (no conftest).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.environ.get("BLS12_381_TPU_JAX_CACHE",
                                     "/root/.cache/bls12381_jax"))


# Probe in a subprocess (a dead TPU tunnel can make backend init hang or
# fail) with a file-cached verdict shared with the test suite; fall back to
# CPU so the bench always completes and emits its JSON line.  The tunnel on
# this box is flaky: cold `jax.devices()` init has been observed to exceed
# 180 s even when it eventually succeeds, hence the escalating retries.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bls12_381_tpu._probe import probe_platform

_PLATFORM, PROBE_FAILURE = probe_platform(timeouts=(120, 240))
CPU_FALLBACK = _PLATFORM not in ("tpu", "axon")
if CPU_FALLBACK:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

if CPU_FALLBACK:
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from bls12_381_tpu import config as _bls_config

# NOTE: must be the explicit config.update path — this jax build ignores the
# JAX_COMPILATION_CACHE_DIR environment variable entirely (verified: env-only
# runs log "cache is disabled/not initialized" and write nothing), which is
# why no TPU executable was ever cached in rounds 1-3 and every bench run
# cold-compiled for minutes.
_bls_config.configure_jax_cache()

METRICS = {}
_HEADLINE = {"value": 0.0}
_EMITTED = {"done": False}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(key, val):
    METRICS[key] = val
    log(json.dumps({key: val}))


def _emit_headline():
    """The ONE stdout JSON line; atexit-safe so a kill still leaves a
    parseable artifact (round-3 verdict weak #1)."""
    if _EMITTED["done"]:
        return
    _EMITTED["done"] = True
    headline = _HEADLINE["value"]
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


atexit.register(_emit_headline)


def _exit_on_signal(signum, frame):
    log(f"signal {signum} after {time.monotonic() - _T0:.1f}s - emitting "
        "partial artifact")
    METRICS["killed_by_signal"] = signum
    # raises SystemExit -> atexit runs
    sys.exit(128 + signum)


for _sig in (signal.SIGTERM, signal.SIGINT):
    signal.signal(_sig, _exit_on_signal)


def elapsed():
    return time.monotonic() - _T0


def _start_watchdog():
    """Signal handlers cannot run while the main thread is inside a
    multi-minute XLA compile (the GIL stays in C++), so a SIGTERM from the
    driver's `timeout` would be acted on only after the compile finishes —
    or never, if SIGKILL follows.  A daemon thread CAN run during compiles:
    at deadline + grace it prints the headline JSON itself and hard-exits,
    guaranteeing a parseable artifact."""
    import threading

    def watch():
        grace = 60.0
        remaining = DEADLINE_S + grace - elapsed()
        while remaining > 0:
            time.sleep(min(remaining, 5.0))
            remaining = DEADLINE_S + grace - elapsed()
            if _EMITTED["done"]:
                return
        METRICS["watchdog_fired_s"] = round(elapsed(), 1)
        log("watchdog: deadline + grace exceeded mid-row; emitting artifact")
        _emit_headline()
        os._exit(0)

    threading.Thread(target=watch, daemon=True).start()


_start_watchdog()


def _start_device_warmup():
    """The tunneled platform charges a large, variable one-time cost
    (observed 25-255 s) to the FIRST program execution of the process —
    server-side session attach, unrelated to graph size.  Absorb it in a
    daemon thread so it overlaps with the main thread's tracing of the
    fields graphs instead of inflating the first row's compile time."""
    import threading

    def warm():
        try:
            t0 = time.monotonic()
            x = jnp.ones((8, 128), jnp.float32)
            jax.device_get(jax.jit(lambda v: (v @ v.T).sum())(x))
            METRICS["device_warmup_s"] = round(time.monotonic() - t0, 1)
        except Exception as e:  # pragma: no cover - never fail the bench
            METRICS["device_warmup_error"] = type(e).__name__

    t = threading.Thread(target=warm, daemon=True)
    t.start()
    return t


def over_deadline(key: str, reserve: float = 0.0) -> bool:
    """True (and emits a skip marker) when the budget is spent."""
    if elapsed() + reserve <= DEADLINE_S:
        return False
    emit(f"{key}_skipped_deadline", round(elapsed(), 1))
    return True


def _time_fetch(fn, *args, reps=3, key=None):
    """Median-of-reps wall time of fn(*args) forced with a host fetch.
    The first (compiling) call is timed separately; when it took > 1s the
    compile time is emitted as `<key>_compile_s` (cache-regression
    visibility, round-3 verdict item 2)."""
    t0 = time.perf_counter()
    jax.device_get(fn(*args))  # compile + warm
    t_compile = time.perf_counter() - t0
    if key is not None and t_compile > 1.0:
        emit(f"{key}_compile_s", round(t_compile, 2))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def _chain_rate(op, a, b, n1=32, n2=160, reps=5, key=None):
    """Per-op seconds of a dependency chain acc = op(acc, b), overhead-
    cancelled: (t(n2) - t(n1)) / (n2 - n1), median-of-reps."""

    def make(n):
        @jax.jit
        def chain(x, y):
            def step(acc, _):
                return op(acc, y), None
            acc, _ = jax.lax.scan(step, x, None, length=n)
            return jax.tree.map(lambda v: v.reshape(-1)[:8], acc)

        return chain

    t1 = _time_fetch(make(n1), a, b, reps=reps, key=key)
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

    # chain spans sized so the marginal work is >= ~50 ms — the tunneled
    # platform has ~25 ms dispatch jitter, and shorter spans made the cheap
    # rows swing 4x run-to-run (round-3 weak #4)
    dt = _chain_rate(lambda x, y: lb.mont_mul(lb.FP, x, y), a, b,
                     n1=64, n2=832, key="fp_mul")
    headline = B / dt
    emit("fp_mul/s", round(headline))
    emit("fp_sqr/s", round(
        B / _chain_rate(lambda x, _: lb.mont_sqr(lb.FP, x), a, b,
                        n1=64, n2=832)))
    emit("fp_add/s", round(
        B / _chain_rate(lambda x, y: lb.add(lb.FP, x, y), a, b,
                        n1=64, n2=1600)))

    B2 = 1 << 14
    rng = np.random.RandomState(1)
    x2 = (_rand_fp(rng, lb.FP.n_limbs, B2), _rand_fp(rng, lb.FP.n_limbs, B2))
    y2 = (_rand_fp(rng, lb.FP.n_limbs, B2), _rand_fp(rng, lb.FP.n_limbs, B2))
    emit("fp2_mul/s", round(B2 / _chain_rate(tw.fp2_mul, x2, y2,
                                             n1=64, n2=576)))
    return headline


def bench_pairing():
    """The reference's headline workloads: full pairing, G2 preparation,
    Miller loop, final exponentiation (groups.rs:15-29), plus throughput
    batches 256/1024 — run FIRST after fields (round-3 verdict item 1)."""
    import importlib

    import __graft_entry__ as ge

    pr_mod = importlib.import_module("bls12_381_tpu.pairing.pairing")
    tw = importlib.import_module("bls12_381_tpu.fields.tower")
    p_aff, q_aff = ge._tiny_pairing_inputs(64)

    if not over_deadline("g2_prepare"):
        t = _time_fetch(_tiny_out(lambda q: pr_mod.prepare_g2(q).coeffs),
                        q_aff, key="g2_prepare")
        emit("g2_prepare/s (batch 64)", round(64 / t, 1))
    if not over_deadline("miller_loop"):
        prep = pr_mod.prepare_g2(q_aff)
        t = _time_fetch(
            _tiny_out(lambda p, pr: pr_mod.miller_loop_batched(p, pr)),
            p_aff, prep, key="miller_loop")
        emit("miller_loop/s (batch 64)", round(64 / t, 1))
    if not over_deadline("final_exp"):
        f = pr_mod.miller_loop_batched(p_aff, pr_mod.prepare_g2(q_aff))
        t = _time_fetch(_tiny_out(pr_mod.final_exponentiation), f,
                        key="final_exp")
        emit("final_exp/s (batch 64)", round(64 / t, 1))
    # One compiled single-pairing graph per batch size; the fixed
    # dispatch/fetch round-trip (~25 ms on the tunneled platform, it would
    # swamp a 64-batch measurement) cancels by differencing batch sizes —
    # the same overhead-cancellation as a chained-instances graph at a third
    # of the compile cost (a k-instance graph compiles k pairings).
    def tile(bs):
        r = bs // 64
        p_b = (jnp.tile(p_aff[0], (1, r)), jnp.tile(p_aff[1], (1, r)),
               jnp.tile(p_aff[2], (r,)))
        q_b = (tuple(jnp.tile(c, (1, r)) for c in q_aff[0]),
               tuple(jnp.tile(c, (1, r)) for c in q_aff[1]),
               jnp.tile(q_aff[2], (r,)))
        return p_b, q_b

    pair_fn = _tiny_out(pr_mod.pairing)
    times = {}
    for bs in (64, 1024):
        key = f"pairing_batch{bs}"
        if over_deadline(key):
            continue
        try:
            args = (p_aff, q_aff) if bs == 64 else tile(bs)
            times[bs] = _time_fetch(pair_fn, *args, reps=3, key=key)
        except Exception as e:
            emit(f"{key}_error", type(e).__name__)
            log(f"pairing batch {bs} failed: {e}")
    if 64 in times:
        emit("pairing/s (batch 64, incl fetch overhead)",
             round(64 / times[64], 1))
    if 64 in times and 1024 in times:
        emit("pairing_batch1024_s", round(times[1024], 4))
        emit("pairing/s (batch 1024, marginal)",
             round(960 / max(times[1024] - times[64], 1e-9), 1))


def bench_curves():
    from bls12_381_tpu.curves import g1 as G1
    from bls12_381_tpu.curves import g2 as G2
    from bls12_381_tpu.fields import fr

    # fused plan-kernel group ops run ~5-20 us/launch at this batch, so the
    # chain difference must span hundreds of ops to clear the ~25 ms
    # dispatch noise of the tunneled platform (n2=96 gave t2 <= t1 noise)
    B3 = 1 << 12
    pts = G1.generator((B3,))
    emit("g1_double/s", round(
        B3 / _chain_rate(lambda p, _: G1.CURVE.double(p), pts, jnp.zeros(()),
                         n1=32, n2=544, key="g1_double")))
    emit("g1_add/s", round(
        B3 / _chain_rate(lambda p, q: G1.CURVE.add(p, q), pts, pts,
                         n1=32, n2=544)))
    aff = G1.generator_affine((B3,))
    emit("g1_add_mixed/s", round(
        B3 / _chain_rate(lambda p, a: G1.CURVE.add_mixed(p, a),
                         pts, aff, n1=32, n2=544)))

    B4 = 1 << 10
    ks = fr.from_ints(list(np.random.RandomState(2).randint(1, 1 << 62, B4)))
    if not over_deadline("g1_scalar_mul"):
        smul = _tiny_out(G1.scalar_mul)
        t = _time_fetch(smul, G1.generator((B4,)), ks, key="g1_scalar_mul")
        emit("g1_scalar_mul/s (batch 2^10)", round(B4 / t, 1))
    if not over_deadline("g1_scalar_mul_12"):
        # throughput regime: batch 2^10 sits on the dispatch floor (~28 ms
        # regardless of lookup strategy); 2^12 shows the real rate
        B5 = 1 << 12
        ks12 = _rand_fr(7, B5)
        smul = _tiny_out(G1.scalar_mul)
        t = _time_fetch(smul, G1.generator((B5,)), ks12,
                        key="g1_scalar_mul_12")
        emit("g1_scalar_mul/s (batch 2^12)", round(B5 / t, 1))

    # G2 per-op rows (groups.rs:100-167)
    pts2 = G2.generator((B3,))
    if not over_deadline("g2_ops"):
        emit("g2_double/s", round(
            B3 / _chain_rate(lambda p, _: G2.CURVE.double(p), pts2,
                             jnp.zeros(()), n1=32, n2=544, key="g2_double")))
        emit("g2_add/s", round(
            B3 / _chain_rate(lambda p, q: G2.CURVE.add(p, q), pts2, pts2,
                             n1=32, n2=544)))
        aff2 = G2.generator_affine((B3,))
        emit("g2_add_mixed/s", round(
            B3 / _chain_rate(lambda p, a: G2.add_mixed(p, a),
                             pts2, aff2, n1=32, n2=544)))
    if not over_deadline("g2_scalar_mul"):
        smul2 = _tiny_out(G2.scalar_mul)
        t = _time_fetch(smul2, G2.generator((B4,)), ks, key="g2_scalar_mul")
        emit("g2_scalar_mul/s (batch 2^10)", round(B4 / t, 1))

    # on-curve / eq / subgroup check / batch_normalize (groups.rs:31-98)
    if not over_deadline("g1_small_ops"):
        t = _time_fetch(_tiny_out(G1.is_on_curve), pts, key="g1_is_on_curve")
        emit("g1_is_on_curve/s", round(B3 / t, 1))
        t = _time_fetch(_tiny_out(G1.eq), pts, pts, key="g1_eq")
        emit("g1_eq/s", round(B3 / t, 1))
    if not over_deadline("subgroup_checks"):
        t = _time_fetch(_tiny_out(G1.is_torsion_free), pts,
                        key="g1_subgroup_check")
        emit("g1_subgroup_check/s", round(B3 / t, 1))
        t = _time_fetch(_tiny_out(G2.is_torsion_free), pts2,
                        key="g2_subgroup_check")
        emit("g2_subgroup_check/s", round(B3 / t, 1))
    if not over_deadline("batch_normalize"):
        pn = G1.generator((10000,))
        t = _time_fetch(_tiny_out(G1.batch_normalize), pn,
                        key="g1_batch_normalize")
        emit("g1_batch_normalize_10000_s", round(t, 4))
        pn2 = G2.generator((10000,))
        t = _time_fetch(_tiny_out(G2.to_affine), pn2,
                        key="g2_batch_normalize")
        emit("g2_batch_normalize_10000_s", round(t, 4))


def bench_deserialize():
    """Deserialization rows (groups.rs:50-57): sqrt-dominated decompression
    + subgroup check, batched at 1024."""
    from bls12_381_tpu.curves import g1 as G1
    from bls12_381_tpu.curves import g2 as G2

    B = 1 << 10
    aff1 = G1.to_affine(G1.generator((B,)))
    comp1 = G1.to_compressed_host(aff1)
    unc1 = G1.to_uncompressed_host(aff1)

    def run(fn, data, reps=3, key=None):
        # host+device mixed codec: time end-to-end (numpy arg is constant)
        fn(data)  # warm/compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out, valid = fn(data)
            jax.device_get(jax.tree.map(lambda v: v.reshape(-1)[:1], out))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    t = run(G1.from_compressed_host, comp1, key="g1_deser_comp")
    emit("g1_deserialize_compressed/s (batch 2^10)", round(B / t, 1))
    t = run(G1.from_uncompressed_host, unc1)
    emit("g1_deserialize_uncompressed/s (batch 2^10)", round(B / t, 1))

    if over_deadline("g2_deserialize"):
        return
    aff2 = G2.to_affine(G2.generator((B,)))
    comp2 = G2.to_compressed_host(aff2)
    t = run(G2.from_compressed_host, comp2)
    emit("g2_deserialize_compressed/s (batch 2^10)", round(B / t, 1))


def bench_h2c():
    from bls12_381_tpu.hash_to_curve import h2c

    msgs = np.random.RandomState(5).randint(
        0, 256, size=(256, 32)).astype(np.uint8)
    t = _time_fetch(
        _tiny_out(
            lambda m: h2c.hash_to_curve_g1(m, b"BENCH-DST_", expand="device")),
        msgs, key="h2c_g1")
    emit("hash_to_curve_g1/s (batch 256)", round(256 / t, 1))
    if over_deadline("h2c_g2"):
        return
    t = _time_fetch(
        _tiny_out(
            lambda m: h2c.hash_to_curve_g2(m, b"BENCH-DST_", expand="device")),
        msgs, key="h2c_g2")
    emit("hash_to_curve_g2/s (batch 256)", round(256 / t, 1))
    # NU variants (hash_to_curve.rs:18-27, 45-54): one field element, no add
    if over_deadline("encode_g1"):
        return
    t = _time_fetch(
        _tiny_out(
            lambda m: h2c.encode_to_curve_g1(m, b"BENCH-DST_",
                                             expand="device")),
        msgs, key="encode_g1")
    emit("encode_to_curve_g1/s (batch 256)", round(256 / t, 1))


def _rand_fr(seed, batch):
    """Random canonical Fr limb tensors generated ON DEVICE (a host randint
    at 2^24 would cost a ~1 GB tunnel transfer): top limb masked below q's
    top limb 0x73ed, so values are < q."""
    from bls12_381_tpu import limbs as lb

    k = jax.random.PRNGKey(seed)
    a = jax.random.randint(
        k, (lb.FR.n_limbs, batch), 0, 1 << 16, dtype=jnp.int32
    ).astype(jnp.uint32)
    return a.at[-1].set(a[-1] & 0x3FFF)


def bench_ntt():
    from bls12_381_tpu.ops import ntt as ntt_mod

    N = 1 << 20
    coeffs = _rand_fr(4, N)
    t = _time_fetch(_tiny_out(ntt_mod.ntt), coeffs, reps=2, key="ntt")
    emit("ntt_2^20_s (incl fetch overhead)", round(t, 3))

    # overhead-cancelled: NTT composed with itself chains naturally
    def ntt_k(k):
        def fn(x):
            for _ in range(k):
                x = ntt_mod.ntt(x)
            return x.reshape(-1)[:8]

        return jax.jit(fn)

    if over_deadline("ntt_marginal"):
        return
    t3 = _time_fetch(ntt_k(3), coeffs, reps=2, key="ntt_marginal")
    t1 = _time_fetch(ntt_k(1), coeffs, reps=2)
    emit("ntt_2^20_s (marginal)", round(max(t3 - t1, 0) / 2, 3))


def bench_msm():
    from bls12_381_tpu.curves import g1 as G1
    from bls12_381_tpu.curves import g2 as G2
    from bls12_381_tpu.ops import msm as msm_mod

    # G1 rows FIRST (the BASELINE north star is the G1 2^24 MSM; G2 MSM is
    # this framework's own extra).  Sizes ascend so the power-of-two scan
    # shapes warm cumulatively (the 2^20/2^24 graphs re-trace only their
    # few new top-level shapes).  reserve= keeps a margin for the run
    # itself so a timeout still exits via atexit.
    def g2_row():
        if over_deadline("msm_g2"):
            return
        try:
            B = 1 << 14
            ks = _rand_fr(31, B)
            fn = _tiny_out(lambda p, k: msm_mod.msm_g2(p, k, c=12))
            t = _time_fetch(fn, G2.generator((B,)), ks, reps=2, key="msm_g2")
            emit("msm_g2_2^14_s", round(t, 3))
        except Exception as e:
            emit("msm_g2_2^14_error", type(e).__name__)
            log(f"msm_g2 2^14 failed: {e}")

    for log_b, c, reserve in ((16, 12, 0), (20, 13, 20), (24, 13, 60)):
        if log_b == 24:
            # G2 row before the riskiest/most expensive row (a 2^24 failure
            # must not take the G2 row down with it)
            g2_row()
        key = f"msm_g1_2^{log_b}"
        if over_deadline(key, reserve=reserve):
            continue
        pts = ks = None
        try:
            B = 1 << log_b
            ks = _rand_fr(3 + log_b, B)
            pts = G1.generator((B,))

            # msm_g1_large chunks big batches with a PYTHON loop of jitted
            # calls — must not be re-wrapped in an outer jit (that would
            # fuse all chunks into one graph and reinstate the memory peak)
            def fn(p, k, c=c):
                out = msm_mod.msm_g1_large(p, k, c=c)
                return jax.tree.map(lambda v: v.reshape(-1)[:8], out)

            if log_b == 24:
                # one execution is ~133 s: time the first call (warm cache
                # => pure execute) so a row lands even if the budget stops
                # here, then refine with one clean rep if budget remains
                t0 = time.perf_counter()
                jax.device_get(fn(pts, ks))
                t = time.perf_counter() - t0
                emit(f"msm_g1_2^{log_b}_first_call_s", round(t, 3))
                if not over_deadline(f"{key}_rep", reserve=int(t) + 10):
                    t0 = time.perf_counter()
                    jax.device_get(fn(pts, ks))
                    t = time.perf_counter() - t0
            else:
                t = _time_fetch(fn, pts, ks, reps=2, key=key)
            emit(f"msm_g1_2^{log_b}_s", round(t, 3))
            emit(f"msm_g1_2^{log_b}_pts/s", round(B / t))
        except Exception as e:
            emit(f"{key}_error", type(e).__name__)
            log(f"msm 2^{log_b} failed: {e}")
        finally:
            # the 2^24 inputs alone hold ~5 GB of HBM; free them before the
            # next row so a failure does not cascade
            del pts, ks


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
    emit("deadline_s", DEADLINE_S)
    emit("probe_s", round(elapsed(), 1))
    if CPU_FALLBACK:
        log("accelerator unreachable - running reduced CPU fallback")
        _HEADLINE["value"] = bench_fields_cpu_reduced()
    else:
        emit("platform", _PLATFORM)
        warm_thread = _start_device_warmup()
        _HEADLINE["value"] = bench_fields()
        warm_thread.join(timeout=1.0)
        # Section order = value order; 2^24 MSM last (round-3 verdict #1).
        # Every section fail-soft AND deadline-guarded.
        for section in (bench_pairing, bench_curves, bench_deserialize,
                        bench_h2c, bench_ntt, bench_msm):
            if over_deadline(section.__name__):
                continue
            try:
                section()
            except Exception as e:  # OOM'd compiles etc.
                emit(f"{section.__name__}_error", f"{type(e).__name__}")
                log(f"{section.__name__} failed: {e}")
        # scaling section: only when explicitly asked (it is a CPU-mesh
        # correctness demo, not a TPU number, and costs budget)
        if "--scaling" in sys.argv and not over_deadline("bench_scaling"):
            try:
                bench_scaling()
            except Exception as e:
                emit("bench_scaling_error", f"{type(e).__name__}")
    emit("total_wall_s", round(elapsed(), 1))
    _emit_headline()


if __name__ == "__main__":
    main()
