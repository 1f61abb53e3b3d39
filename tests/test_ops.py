"""MSM and NTT: correctness vs folds of the host oracle."""

import random

import jax.numpy as jnp
import numpy as np

import conftest  # noqa: F401
from bls12_381_tpu import hostmath as hm
from bls12_381_tpu import params
from bls12_381_tpu.curves import g1
from bls12_381_tpu.fields import fp, fr
from bls12_381_tpu.ops import msm, ntt
from bls12_381_tpu.params import Q, G1_GEN

random.seed(13)


def enc_points(host_pts):
    n = len(host_pts)
    return g1.from_affine(
        (
            fp.from_ints([p[0] for p in host_pts]),
            fp.from_ints([p[1] for p in host_pts]),
            jnp.zeros((n,), dtype=bool),
        )
    )


def dec_point(proj):
    aff = g1.to_affine(proj)
    if bool(np.asarray(aff[2])):
        return None
    return (int(fp.to_ints(aff[0])), int(fp.to_ints(aff[1])))


def test_msm_g1_matches_serial():
    n = 32
    ks = [random.randrange(Q) for _ in range(n)]
    base_mults = [random.randrange(1, 1 << 20) for _ in range(n)]
    host_pts = [hm.g1_mul(G1_GEN, m) for m in base_mults]
    out = msm.msm_g1(enc_points(host_pts), fr.from_ints(ks), c=4)
    expected = None
    for k, p in zip(ks, host_pts):
        expected = hm.g1_add(expected, hm.g1_mul(p, k))
    assert dec_point(out) == expected


def test_msm_with_zero_scalars():
    n = 8
    ks = [0, 1, 2, 0, 5, 0, 7, Q - 1]
    host_pts = [hm.g1_mul(G1_GEN, i + 1) for i in range(n)]
    out = msm.msm_g1(enc_points(host_pts), fr.from_ints(ks), c=4)
    expected = None
    for k, p in zip(ks, host_pts):
        expected = hm.g1_add(expected, hm.g1_mul(p, k))
    assert dec_point(out) == expected


def test_msm_g2_matches_serial():
    from bls12_381_tpu.curves import g2
    from bls12_381_tpu.fields import tower as tw
    from bls12_381_tpu.params import G2_GEN

    n = 16
    ks = [random.randrange(Q) for _ in range(n)]
    base_mults = [random.randrange(1, 1 << 20) for _ in range(n)]
    host_pts = [hm.g2_mul(G2_GEN, m) for m in base_mults]
    pts = g2.from_affine(
        (
            tw.fp2_from_ints([p[0] for p in host_pts]),
            tw.fp2_from_ints([p[1] for p in host_pts]),
            jnp.zeros((n,), dtype=bool),
        )
    )
    out = msm.msm_g2(pts, fr.from_ints(ks), c=4)
    expected = None
    for k, p in zip(ks, host_pts):
        expected = hm.g2_add(expected, hm.g2_mul(p, k))
    aff = g2.to_affine(out)
    got = (
        tuple(int(v) for v in tw.fp2_to_ints(aff[0])),
        tuple(int(v) for v in tw.fp2_to_ints(aff[1])),
    )
    assert got == expected


def test_ntt_roundtrip_and_reference_eval():
    n = 32
    coeffs = [random.randrange(Q) for _ in range(n)]
    enc = fr.from_ints(coeffs)
    evals = ntt.ntt(enc)
    omega = pow(params.FR_ROOT_OF_UNITY, 1 << (params.FR_S - 5), Q)
    got = [int(v) for v in fr.to_ints(evals)]
    for k in range(n):
        exp = sum(c * pow(omega, i * k, Q) for i, c in enumerate(coeffs)) % Q
        assert got[k] == exp, k
    back = ntt.intt(evals)
    assert [int(v) for v in fr.to_ints(back)] == coeffs


def test_poly_mul_convolution():
    a = [3, 1, 4, 1]
    b = [2, 7, 1]
    prod = ntt.poly_mul(fr.from_ints(a), fr.from_ints(b))
    got = [int(v) for v in fr.to_ints(prod)]
    exp = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            exp[i + j] = (exp[i + j] + x * y) % Q
    assert got[: len(exp)] == exp
    assert all(v == 0 for v in got[len(exp) :])
