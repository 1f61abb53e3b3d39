"""Device pairing vs the host oracle (which is RELIC-validated)."""

import random

import pytest

import jax.numpy as jnp
import numpy as np

import conftest  # noqa: F401
from bls12_381_tpu import hostmath as hm
from bls12_381_tpu import pairing as pr
from bls12_381_tpu.fields import fp, tower as tw
from bls12_381_tpu.params import P, Q, G1_GEN, G2_GEN

random.seed(11)
B = 4
AV = [1, 2, random.randrange(Q), random.randrange(Q)]
BV = [1, 3, random.randrange(Q), random.randrange(Q)]
PHS = [hm.g1_mul(G1_GEN, a) for a in AV]
QHS = [hm.g2_mul(G2_GEN, b) for b in BV]


def enc_points():
    p_aff = (
        fp.from_ints([p[0] for p in PHS]),
        fp.from_ints([p[1] for p in PHS]),
        jnp.zeros((B,), dtype=bool),
    )
    q_aff = (
        tw.fp2_from_ints([q[0] for q in QHS]),
        tw.fp2_from_ints([q[1] for q in QHS]),
        jnp.zeros((B,), dtype=bool),
    )
    return p_aff, q_aff


def dec12_at(res, i):
    got = tw.fp12_to_host(res)
    return tuple(
        tuple((int(c2[0][i]), int(c2[1][i])) for c2 in c6) for c6 in got
    )


def dec12_scalar(res):
    got = tw.fp12_to_host(res)
    return tuple(
        tuple((int(c2[0]), int(c2[1])) for c2 in c6) for c6 in got
    )


def test_hard_part_digits_exact():
    """The digit decomposition used by final_exponentiation (cofactor 3)."""
    z = -0xD201000000010000
    l3 = (z - 1) ** 2
    l2 = l3 * z
    l1 = l2 * z - l3
    l0 = l1 * z + 3
    assert l0 + l1 * P + l2 * P**2 + l3 * P**3 == 3 * (P**4 - P**2 + 1) // Q


def test_prepared_coeff_count():
    """68 line-coefficient triples per prepared point (pairings.rs:539)."""
    import importlib

    pmod = importlib.import_module("bls12_381_tpu.pairing.pairing")
    assert pmod.N_COEFFS == 68
    assert pmod.N_DOUBLING_STEPS == 63


@pytest.mark.heavy
def test_pairing_bit_exact_vs_host():
    p_aff, q_aff = enc_points()
    res = pr.pairing(p_aff, q_aff)
    for i in range(B):
        assert dec12_at(res, i) == hm.pairing(PHS[i], QHS[i]), i


@pytest.mark.heavy
def test_identity_masking():
    p_aff, q_aff = enc_points()
    p_inf = (p_aff[0], p_aff[1], jnp.array([True, False, False, True]))
    res = pr.pairing(p_inf, q_aff)
    for i in range(B):
        exp = hm.pairing(None if i in (0, 3) else PHS[i], QHS[i])
        assert dec12_at(res, i) == exp, i
    q_inf = (q_aff[0], q_aff[1], jnp.array([False, True, False, False]))
    res = pr.pairing(p_aff, q_inf)
    for i in range(B):
        exp = hm.pairing(PHS[i], None if i == 1 else QHS[i])
        assert dec12_at(res, i) == exp, i


@pytest.mark.heavy
def test_multi_miller_loop():
    p_aff, q_aff = enc_points()
    prep = pr.prepare_g2(q_aff)
    agg = pr.final_exponentiation(pr.multi_miller_loop(p_aff, prep))
    acc = hm.FP12_ONE
    for i in range(B):
        acc = hm.fp12_mul(acc, hm.miller_loop(PHS[i], QHS[i]))
    assert dec12_scalar(agg) == hm.final_exponentiation(acc)


@pytest.mark.heavy
def test_bilinearity_on_device():
    """e([a]g1, [b]g2) == e(g1, g2)^(ab): derived fully on device values."""
    p_aff, q_aff = enc_points()
    res = pr.pairing(p_aff, q_aff)
    base = hm.pairing(G1_GEN, G2_GEN)
    for i in range(B):
        assert dec12_at(res, i) == hm.fp12_pow(base, AV[i] * BV[i] % Q), i


@pytest.mark.heavy
def test_gt_group_ops():
    """Additive Gt API (pairings.rs:204-337): generator, add/neg/double,
    scalar mul vs e([k]P, Q)."""
    from bls12_381_tpu.fields import fr
    from bls12_381_tpu.pairing import gt

    g = gt.generator()
    assert dec12_scalar(g) == hm.pairing(G1_GEN, G2_GEN)
    assert np.asarray(gt.is_identity(gt.sub(g, g))).all()
    assert np.asarray(tw.fp12_eq(gt.double(g), gt.add(g, g))).all()
    # GLS scalar mul (frobenius split) AND the generic ladder, on edge
    # scalars that cross the base-|z| digit boundaries
    from bls12_381_tpu.params import BLS_X

    ks = [987654321987654321, 0, 1, Q - 1, BLS_X**2, BLS_X**3 + 5]
    got = gt.scalar_mul(g, fr.from_ints(ks))
    got_gen = gt.scalar_mul_generic(g, fr.from_ints(ks))
    for i, k in enumerate(ks):
        exp = (
            hm.pairing(hm.g1_mul(G1_GEN, k), G2_GEN)
            if k
            else hm.FP12_ONE
        )
        for dev in (got, got_gen):
            flat = tw.fp12_to_host(dev)
            assert tuple(
                tuple((int(c2[0][i]), int(c2[1][i])) for c2 in c6)
                for c6 in flat
            ) == exp, (i, k)


def test_cyclotomic_square_matches_full_square():
    """GS cyclotomic squaring == full squaring on cyclotomic elements."""
    from bls12_381_tpu.fields import tower as tw

    # build a cyclotomic element on the host: easy part of a Miller value
    f = hm.miller_loop(PHS[0], QHS[0])
    f = hm.fp12_mul(hm.fp12_conjugate(f), hm.fp12_inv(f))
    f = hm.fp12_mul(hm.fp12_frobenius(hm.fp12_frobenius(f)), f)
    expected = hm.fp12_square(f)
    dev = tw.fp12_from_host(f, batch=(2,))
    got = tw.fp12_to_host(tw.fp12_cyclotomic_sqr(dev))
    for lane in range(2):
        flat = tuple(
            tuple((int(c2[0][lane]), int(c2[1][lane])) for c2 in c6)
            for c6 in got
        )
        assert flat == expected
