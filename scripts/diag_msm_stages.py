#!/usr/bin/env python3
"""MSM stage decomposition on the real device: where does the time go?

Times, at a given batch/window (default 2^16, c=12, GLV lanes):
  digits : GLV split + signed digits + batched argsort
  gather : + per-window affine gather and sign application
  scan   : + segmented scan
  full   : the whole msm_g1

Usage: PYTHONPATH=/root/repo python scripts/diag_msm_stages.py [log_b] [c]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge

ge._configure_jax()

import jax
import jax.numpy as jnp
import numpy as np

from bls12_381_tpu import limbs, params
from bls12_381_tpu.curves import g1 as G1
from bls12_381_tpu.fields import fp
from bls12_381_tpu.ops import msm as mm


def timeit(fn, *args, reps=3):
    jax.device_get(jax.tree.map(lambda v: v.reshape(-1)[:1], fn(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jax.tree.map(lambda v: v.reshape(-1)[:1], fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


log_b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
c = int(sys.argv[2]) if len(sys.argv) > 2 else 12
B = 1 << log_b

rng = np.random.RandomState(3)
ks = rng.randint(0, 1 << 16, size=(limbs.FR.n_limbs, B)).astype(np.uint32)
ks[-1] &= 0x3FFF
ks = jnp.asarray(ks)
pts = G1.generator((B,))


@jax.jit
def stage_digits(points_proj, scalars_mont):
    canon = limbs.from_mont(limbs.FR, scalars_mont)
    k2, k1 = limbs.barrett_divmod(canon, params.BLS_X ** 2, 9)
    m1, n1 = mm._signed_digits(k1, c, 128)
    m2, n2 = mm._signed_digits(k2, c, 128)
    mags = jnp.concatenate([m1, m2], axis=-1)
    negs = jnp.concatenate([n1, n2], axis=-1)
    order = jnp.argsort(mags, axis=-1)
    mags_s = jnp.take_along_axis(mags, order, axis=-1)
    negs_s = jnp.take_along_axis(negs, order, axis=-1)
    return order, mags_s, negs_s


def make_windows(upto):
    """Jit the pipeline but truncate each window body at a stage."""

    @jax.jit
    def fn(points_proj, scalars_mont):
        canon = limbs.from_mont(limbs.FR, scalars_mont)
        (ax, ay), inf = mm._to_affine_xy(G1, points_proj, fp.batch_inv)
        k2, k1 = limbs.barrett_divmod(canon, params.BLS_X ** 2, 9)
        beta = fp.const(G1.BETA, ax.shape[1:])
        aff = tuple(
            jnp.concatenate([a, b], axis=-1)
            for a, b in zip((ax, ay), (fp.mul(beta, ax), fp.neg(ay)))
        )
        m1, n1 = mm._signed_digits(k1, c, 128)
        m2, n2 = mm._signed_digits(k2, c, 128)
        mags = jnp.concatenate([m1, m2], axis=-1)
        negs = jnp.concatenate([n1, n2], axis=-1)
        mags = jnp.where(jnp.concatenate([inf, inf])[None], 0, mags)
        order = jnp.argsort(mags, axis=-1)
        mags_s = jnp.take_along_axis(mags, order, axis=-1)
        negs_s = jnp.take_along_axis(negs, order, axis=-1)
        curve = G1.CURVE
        f = curve.f

        def body(acc, xs):
            order_w, mw, nw = xs
            x, y = jax.tree.map(lambda t: t[..., order_w], aff)
            ny = f.neg(y)
            y = jnp.where(nw, ny, y)
            if upto == "gather":
                return acc, (x[0, :8] + y[0, :8])
            ptsw = (x, y, f.one(order_w.shape))
            heads = jnp.concatenate(
                [jnp.ones((1,), dtype=bool), mw[1:] != mw[:-1]]
            )[None]
            scanned = mm._segmented_scan_add(curve, ptsw, heads)
            return acc, scanned[0][0, :8]

        _, out = jax.lax.scan(body, jnp.zeros((8,), jnp.uint32),
                              (order, mags_s, negs_s))
        return out

    return fn


plat = jax.devices()[0].platform
print(f"platform {plat}  B=2^{log_b}  c={c}", flush=True)
t0 = timeit(stage_digits, pts, ks)
print(f"digits+sort          : {t0*1e3:8.1f} ms", flush=True)
t1 = timeit(make_windows("gather"), pts, ks)
print(f"+affine+gather+sign  : {t1*1e3:8.1f} ms", flush=True)
t2 = timeit(make_windows("scan"), pts, ks)
print(f"+segmented scan      : {t2*1e3:8.1f} ms", flush=True)
t3 = timeit(jax.jit(lambda p, k: jax.tree.map(
    lambda v: v.reshape(-1)[:8], mm.msm_g1(p, k, c=c))), pts, ks)
print(f"full msm_g1          : {t3*1e3:8.1f} ms", flush=True)
