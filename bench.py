#!/usr/bin/env python3
"""Headline benchmark: batched Fp Montgomery multiplication throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 1e7 batched Fp muls/sec/chip.

Measurement discipline: on the axon-tunneled TPU platform,
`block_until_ready` can return before execution finishes, so every timing
here forces completion with a `device_get` of a tiny output slice, and
fixed dispatch/fetch overhead is cancelled by differencing two dependency-
chain lengths (rate = B * (n2 - n1) / (t2 - t1)).

Run `python bench.py --full` for the extended suite (field ops, tower,
curves, pairing, MSM, NTT) — extra lines on stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


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
    """Per-op rate of a dependency chain acc = op(acc, b), overhead-cancelled.

    Returns seconds per op: (t(n2) - t(n1)) / (n2 - n1).  Each chain returns
    a tiny slice so the fetch is cheap but the full chain must execute.
    """

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


def _rand_fp(rng, n_limbs, batch):
    a = rng.randint(0, 1 << 16, size=(n_limbs, batch)).astype(np.uint32)
    a[-1] &= 0x09FF  # below p's top limb (0x1a01) => canonical
    return jnp.asarray(a)


def main():
    from bls12_381_tpu import limbs as lb

    rng = np.random.RandomState(0)
    B = 1 << 16
    a_d = _rand_fp(rng, lb.FP.n_limbs, B)
    b_d = _rand_fp(rng, lb.FP.n_limbs, B)

    dt = _chain_rate(lambda x, y: lb.mont_mul(lb.FP, x, y), a_d, b_d)
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
        _full_suite(B, a_d, b_d)


def _tiny_out(fn):
    """Wrap fn so the jitted graph returns only 8 lanes per leaf (cheap
    fetch, full compute)."""

    def wrapped(*args):
        return jax.tree.map(lambda v: v.reshape(-1)[:8], fn(*args))

    return jax.jit(wrapped)


def _full_suite(B, a_d, b_d):
    from bls12_381_tpu import limbs as lb
    from bls12_381_tpu.curves import g1 as G1
    from bls12_381_tpu.fields import fr, tower as tw

    import importlib

    extra = {}

    def emit(key, val):
        extra[key] = val
        print(json.dumps({key: val}), file=sys.stderr, flush=True)

    emit("fp_sqr/s", round(
        B / _chain_rate(lambda x, _: lb.mont_sqr(lb.FP, x), a_d, b_d)
    ))
    emit("fp_add/s", round(
        B / _chain_rate(lambda x, y: lb.add(lb.FP, x, y), a_d, b_d)
    ))

    # tower: Fp2 mul at batch 2^14 (BASELINE config 2); fp2 = (c0, c1) tuple
    B2 = 1 << 14
    rng = np.random.RandomState(1)
    x2 = (_rand_fp(rng, lb.FP.n_limbs, B2), _rand_fp(rng, lb.FP.n_limbs, B2))
    y2 = (_rand_fp(rng, lb.FP.n_limbs, B2), _rand_fp(rng, lb.FP.n_limbs, B2))
    emit("fp2_mul/s", round(
        B2 / _chain_rate(lambda u, v: tw.fp2_mul(u, v), x2, y2)
    ))

    # G1 double/add at batch 2^12 (benches/groups.rs workloads, config 3)
    B3 = 1 << 12
    pts = G1.generator((B3,))
    emit("g1_double/s", round(
        B3
        / _chain_rate(
            lambda p, _: G1.CURVE.double(p), pts, jnp.zeros(()), n1=16, n2=64
        )
    ))
    emit("g1_add/s", round(
        B3
        / _chain_rate(lambda p, q: G1.CURVE.add(p, q), pts, pts, n1=16, n2=64)
    ))

    # G1 scalar mul batch 2^10 (single dispatch)
    B4 = 1 << 10
    ks = fr.from_ints(list(np.random.RandomState(2).randint(1, 1 << 62, B4)))
    smul = _tiny_out(lambda p, k: G1.scalar_mul(p, k))
    t = _time_fetch(smul, G1.generator((B4,)), ks)
    emit("g1_scalar_mul/s (batch 2^10)", round(B4 / t, 1))

    # MSM 2^16 (BASELINE config 4)
    from bls12_381_tpu.ops import msm as msm_mod

    B5 = 1 << 16
    ks5 = fr.from_ints(list(np.random.RandomState(3).randint(1, 1 << 62, B5)))
    msm_fn = _tiny_out(lambda p, k: msm_mod.msm_g1(p, k, c=12))
    t = _time_fetch(msm_fn, G1.generator((B5,)), ks5, reps=2)
    emit("msm_g1_2^16_s", round(t, 3))

    # NTT 2^20 (BASELINE config 4)
    from bls12_381_tpu.ops import ntt as ntt_mod

    N = 1 << 20
    coeffs = fr.from_ints(list(np.random.RandomState(4).randint(0, 1 << 62, N)))
    ntt_fn = _tiny_out(ntt_mod.ntt)
    t = _time_fetch(ntt_fn, coeffs, reps=2)
    emit("ntt_2^20_s", round(t, 3))

    # pairing stages, batch 64 (benches/groups.rs:15-29; config 5)
    pr_mod = importlib.import_module("bls12_381_tpu.pairing.pairing")
    import __graft_entry__ as ge

    p_aff, q_aff = ge._tiny_pairing_inputs(64)
    t = _time_fetch(_tiny_out(lambda q: pr_mod.prepare_g2(q).coeffs), q_aff)
    emit("g2_prepare/s (batch 64)", round(64 / t, 1))
    prep = pr_mod.prepare_g2(q_aff)
    t = _time_fetch(
        _tiny_out(lambda p, pr: pr_mod.miller_loop_batched(p, pr)), p_aff, prep
    )
    emit("miller_loop/s (batch 64)", round(64 / t, 1))
    f = pr_mod.miller_loop_batched(p_aff, prep)
    t = _time_fetch(_tiny_out(pr_mod.final_exponentiation), f)
    emit("final_exp/s (batch 64)", round(64 / t, 1))
    t = _time_fetch(_tiny_out(pr_mod.pairing), p_aff, q_aff)
    emit("pairing/s (batch 64)", round(64 / t, 1))

    # hash_to_curve G1, device expansion, batch 256 (benches/hash_to_curve.rs)
    from bls12_381_tpu.hash_to_curve import h2c

    msgs = np.random.RandomState(5).randint(0, 256, size=(256, 32)).astype(
        np.uint8
    )
    t = _time_fetch(
        _tiny_out(
            lambda m: h2c.hash_to_curve_g1(m, b"BENCH-DST_", expand="device")
        ),
        msgs,
    )
    emit("hash_to_curve_g1/s (batch 256)", round(256 / t, 1))
    print(json.dumps(extra), file=sys.stderr)


if __name__ == "__main__":
    main()
