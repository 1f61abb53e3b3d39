#!/usr/bin/env python3
"""MXU int8 spike: is the 10x Montgomery headroom real?  (round-2 roadmap,
round-3 verdict item 8.)

The Montgomery reduction's m x p accumulation has a SHARED operand (the
modulus p), so over a [B]-lane batch it is a matmul against a fixed Toeplitz
matrix: cols[b, k] += sum_i m[b, i] * p_{k-i}  ==  M @ T_p, with M [B, 2L]
int8 half-limbs and T_p [2L, 4L] static int8.  That maps onto the MXU with
int32 accumulation.  The a x b half of fp_mul has NO shared operand (both
vary per lane) and stays a per-lane convolution on the VPU.

This script measures, on the real device:
  1. the int8 Toeplitz matmul at the m x p shapes ([B, 48] @ [48, 96]),
  2. the same contraction done the VPU way (uint32 shift-mul-accumulate),
  3. the current full fp_mul for scale.

Decision rule: fp_mul splits roughly 50/50 between a*b columns and the m*p
reduction fold.  If (1) is >> faster than (2), the reduction half can move
to the MXU for up to ~2x on fp_mul; the 10x figure would additionally need
the a*b half on MXU, which requires a shared operand the algorithm does not
have — in that case document the negative result.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge

ge._configure_jax()

import jax
import jax.numpy as jnp
import numpy as np

from bls12_381_tpu import limbs as lb
from bls12_381_tpu import params


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.device_get(jax.tree.map(lambda v: v.reshape(-1)[:1], out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jax.tree.map(lambda v: v.reshape(-1)[:1], fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def toeplitz_p8():
    """p as 8-bit half-limbs [48]; Toeplitz [48, 96] with T[i, i+j] = p8[j]."""
    p8 = []
    v = params.P
    for _ in range(48):
        p8.append(v & 0xFF)
        v >>= 8
    T = np.zeros((48, 96), dtype=np.int8)
    for i in range(48):
        for j in range(48):
            # int8 reinterpretation of the unsigned byte; accumulation in
            # int32 is exact either way for a feasibility timing
            T[i, (i + j) % 96] = np.int8((p8[j] + 128) % 256 - 128)
    return jnp.asarray(T)


def main():
    B = 1 << 20
    rng = np.random.RandomState(0)
    dev = jax.devices()[0].platform
    print(f"platform: {dev}", flush=True)

    # --- 1. MXU int8 Toeplitz matmul at the m x p shape
    M8 = jnp.asarray(
        rng.randint(-128, 128, size=(B, 48)).astype(np.int8))
    T = toeplitz_p8()

    @jax.jit
    def mxu(m):
        return jax.lax.dot_general(
            m, T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    t_mxu = timeit(mxu, M8)
    macs = B * 48 * 96
    print(f"int8 MXU toeplitz [B,48]@[48,96]: {t_mxu*1e3:8.2f} ms "
          f"= {macs/t_mxu/1e12:6.2f} Tmac/s", flush=True)

    # --- 2. same contraction, VPU-style (uint32 limbs, shift-accumulate)
    M16 = jnp.asarray(
        rng.randint(0, 1 << 16, size=(24, B)).astype(np.uint32))
    p_limbs = [int(x) for x in lb.FP.p_limbs]

    @jax.jit
    def vpu(m):
        cols = [jnp.zeros((B,), jnp.uint32) for _ in range(48)]
        for i in range(24):
            for j in range(24):
                cols[i + j] = cols[i + j] + m[i] * jnp.uint32(p_limbs[j])
        return jnp.stack(cols)

    t_vpu = timeit(vpu, M16)
    macs_v = B * 24 * 24
    print(f"VPU u32 toeplitz  [24,B] x p     : {t_vpu*1e3:8.2f} ms "
          f"= {macs_v/t_vpu/1e12:6.2f} Tmac/s (16-bit limbs: 1/4 the MACs)",
          flush=True)

    # --- 3. current full fp_mul for scale
    from bls12_381_tpu.fields import fp

    a = M16 % jnp.uint32(0x1000)

    @jax.jit
    def full(m, x):
        return fp.mul(m % jnp.uint32(0x9FFF), x)

    t_fp = timeit(full, M16, a)
    print(f"full fp_mul (current path)       : {t_fp*1e3:8.2f} ms "
          f"= {B/t_fp/1e6:6.1f} Mmul/s", flush=True)

    speedup = (t_vpu / t_mxu) if t_mxu > 0 else float("inf")
    print(f"reduction-fold speedup MXU vs VPU: {speedup:.2f}x "
          f"(full fp_mul ceiling if reduction is ~half: "
          f"{2*speedup/(1+speedup):.2f}x)", flush=True)


if __name__ == "__main__":
    main()
