"""Decompose pairing cost at batch 64 on the real device.

Times each pipeline stage and each primitive the Miller step is made of, so
optimization effort goes where the time actually is.

Usage: PYTHONPATH=/root/repo python scripts/diag_pairing_perf.py [batch]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge

ge._configure_jax()

import jax
import jax.numpy as jnp

import importlib

pr = importlib.import_module("bls12_381_tpu.pairing.pairing")
from bls12_381_tpu.fields import fp, tower as tw


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.device_get(jax.tree.map(lambda v: v.reshape(-1)[:1], out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(
            jax.tree.map(lambda v: v.reshape(-1)[:1], fn(*args))
        )
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1e3:9.3f} ms")
    return best


B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
p_aff, q_aff = ge._tiny_pairing_inputs(B)

print(f"batch = {B}, platform = {jax.devices()[0].platform}")

t_pair = timeit("pairing (full)", jax.jit(pr.pairing), p_aff, q_aff)
t_prep = timeit("prepare_g2", pr.prepare_g2, q_aff)
prep = pr.prepare_g2(q_aff)
t_mill = timeit("miller_loop_batched",
                pr.miller_loop_batched, p_aff, prep)
f = pr.miller_loop_batched(p_aff, prep)
t_fexp = timeit("final_exponentiation", pr.final_exponentiation, f)
print(f"{'sum of stages':34s} {(t_prep+t_mill+t_fexp)*1e3:9.3f} ms")

# primitive costs at the same batch, via scan-chain differencing
from bench import _chain_rate  # reuse overhead-cancelled timing

f12 = f  # an fp12 batch [.., B]
one2 = tw.fp2_one(p_aff[0].shape[1:])

dt = _chain_rate(lambda x, _: tw.fp12_sqr(x), f12, jnp.zeros(()), n1=8, n2=40)
print(f"{'fp12_sqr per call':34s} {dt*1e3:9.3f} ms  (68/miller)")
dt = _chain_rate(
    lambda x, _: tw.fp12_mul_by_045(x, one2, one2, one2),
    f12, jnp.zeros(()), n1=8, n2=40,
)
print(f"{'fp12_mul_by_045 per call':34s} {dt*1e3:9.3f} ms  (68/miller)")
dt = _chain_rate(lambda x, _: tw.fp12_cyclotomic_sqr(x), f12,
                 jnp.zeros(()), n1=8, n2=40)
print(f"{'fp12_cyclotomic_sqr per call':34s} {dt*1e3:9.3f} ms  (~320/fexp)")
dt = _chain_rate(lambda x, y: tw.fp12_mul(x, y), f12, f12, n1=8, n2=40)
print(f"{'fp12_mul per call':34s} {dt*1e3:9.3f} ms")

a2 = (f12[0][0][0], f12[0][0][1])
dt = _chain_rate(lambda x, y: fp.add(x, y), a2[0], a2[1], n1=16, n2=80)
print(f"{'fp.add per call':34s} {dt*1e3:9.3f} ms")
dt = _chain_rate(lambda x, y: fp.mul(x, y), a2[0], a2[1], n1=16, n2=80)
print(f"{'fp.mul (1-group fold) per call':34s} {dt*1e3:9.3f} ms")
