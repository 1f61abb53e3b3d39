"""Validate the host oracle (bls12_381_tpu.hostmath) against the reference
crate's committed test vectors.

Oracles used (see SURVEY.md §4):
  - the four .dat serialization vector files (reference src/tests/mod.rs:3-28)
  - the RELIC cross-implementation pairing value (src/tests/mod.rs:78-231)
  - draft-irtf-cfrg-hash-to-curve-16 appendix J KATs (reference tests/)
"""

import json
import os
import random

import pytest

from bls12_381_tpu import hostmath as hm
from bls12_381_tpu.params import (
    BLS_X,
    FR_ROOT_OF_UNITY,
    G1_GEN,
    G2_GEN,
    P,
    Q,
)
from conftest import VECTORS

# Multiples of the generator checked against the .dat files: the pure-Python
# decompression (one sqrt-by-pow per entry) dominates fast-tier wall time, so
# the default samples a prefix; the full 1000-entry walk (the reference's
# tests/mod.rs:3-28 workload) runs in the heavy tier.
N_WALK = 1000 if os.environ.get("BLS12_381_TPU_HEAVY_TESTS") == "1" else 64


def load_consts():
    raw = json.load(open(VECTORS / "ref_constants.json"))

    def dec(v):
        return int(v, 16) if isinstance(v, str) else tuple(dec(x) for x in v)

    return {k: dec(v) for k, v in raw.items()}


# ---------------------------------------------------------------------------
# Field sanity
# ---------------------------------------------------------------------------


def test_fp_basics():
    assert hm.fp_mul(hm.fp_inv(12345), 12345) == 1
    s = hm.fp_sqrt(4)
    assert s is not None and s * s % P == 4
    # sqrt(4) = -2 in this field per the reference KAT (fp.rs:735-749)
    assert s == P - 2
    assert hm.fp_sqrt(5) is None  # 5 is a QNR mod p


def test_fp2_sqrt():
    random.seed(7)
    for _ in range(10):
        a = (random.randrange(P), random.randrange(P))
        sq = hm.fp2_square(a)
        r = hm.fp2_sqrt(sq)
        assert r is not None and hm.fp2_square(r) == sq
    # nonresidue: u+1 has sqrt? verify is_square detection on a known QNR
    # construct QNR: if x is QR its negation times a QNR pattern — just count
    found_qnr = False
    for _ in range(20):
        a = (random.randrange(P), random.randrange(P))
        if hm.fp2_sqrt(a) is None:
            found_qnr = True
            break
    assert found_qnr


def test_fr_constants():
    assert pow(FR_ROOT_OF_UNITY, 1 << 32, Q) == 1
    assert pow(FR_ROOT_OF_UNITY, 1 << 31, Q) == Q - 1
    r = hm.fr_sqrt(4)
    assert r is not None and r * r % Q == 4


def test_fp12_frobenius_is_p_power():
    random.seed(3)
    a = tuple(
        tuple(
            (random.randrange(P), random.randrange(P)) for _ in range(3)
        )
        for _ in range(2)
    )
    assert hm.fp12_frobenius(a) == hm.fp12_pow(a, P)


# ---------------------------------------------------------------------------
# Group law + serialization vs .dat files
# ---------------------------------------------------------------------------


def test_g1_serialization_walk():
    comp = open(VECTORS / "g1_compressed_valid_test_vectors.dat", "rb").read()
    uncomp = open(VECTORS / "g1_uncompressed_valid_test_vectors.dat", "rb").read()
    acc = None
    for i in range(N_WALK):
        c = comp[i * 48 : (i + 1) * 48]
        u = uncomp[i * 96 : (i + 1) * 96]
        assert hm.g1_to_compressed(acc) == c, f"entry {i}"
        assert hm.g1_to_uncompressed(acc) == u, f"entry {i}"
        assert hm.g1_from_compressed(c, check_subgroup=False) == acc
        assert hm.g1_from_uncompressed(u, check=False) == acc
        acc = hm.g1_add(acc, G1_GEN)


def test_g2_serialization_walk():
    comp = open(VECTORS / "g2_compressed_valid_test_vectors.dat", "rb").read()
    uncomp = open(VECTORS / "g2_uncompressed_valid_test_vectors.dat", "rb").read()
    acc = None
    for i in range(N_WALK):
        c = comp[i * 96 : (i + 1) * 96]
        u = uncomp[i * 192 : (i + 1) * 192]
        assert hm.g2_to_compressed(acc) == c, f"entry {i}"
        assert hm.g2_to_uncompressed(acc) == u, f"entry {i}"
        assert hm.g2_from_compressed(c, check_subgroup=False) == acc
        assert hm.g2_from_uncompressed(u, check=False) == acc
        acc = hm.g2_add(acc, G2_GEN)


def test_g1_group_law():
    g = G1_GEN
    assert hm.g1_add(g, hm.g1_neg(g)) is None
    assert hm.g1_add(g, None) == g
    assert hm.g1_double(g) == hm.g1_add(g, g)
    # scalar-mul associativity: (a*b)*g == a*(b*g)
    random.seed(11)
    a, b = random.randrange(Q), random.randrange(Q)
    assert hm.g1_mul(hm.g1_mul(g, a), b) == hm.g1_mul(g, a * b % Q)


def test_g1_torsion_and_decompress_rejects():
    # a point on the curve but not in the q-order subgroup
    x = 5
    while True:
        rhs = (x * x % P * x + 4) % P
        y = hm.fp_sqrt(rhs)
        if y is not None:
            pt = (x, y)
            if not hm.g1_is_torsion_free(pt):
                break
        x += 1
    comp = hm.g1_to_compressed(pt)
    with pytest.raises(ValueError):
        hm.g1_from_compressed(comp)  # subgroup check on
    assert hm.g1_from_compressed(comp, check_subgroup=False) == pt


def test_malformed_encodings_rejected():
    g = hm.g1_to_compressed(G1_GEN)
    # uncompressed flag missing
    with pytest.raises(ValueError):
        hm.g1_from_uncompressed(g + bytes(48))
    # infinity with sort bit
    bad = bytearray(hm.g1_to_compressed(None))
    bad[0] |= 0b0010_0000
    with pytest.raises(ValueError):
        hm.g1_from_compressed(bytes(bad))
    # non-canonical x
    bad = bytearray(48)
    bad[0] = 0b1001_1111
    bad[1:] = b"\xff" * 47
    with pytest.raises(ValueError):
        hm.g1_from_compressed(bytes(bad))


def test_g2_psi_endomorphism():
    """psi(P) == [z]P for P in the q-order subgroup (reference g2.rs:475-482)."""
    z = (-BLS_X) % Q  # z is negative
    for k in (1, 7):
        pt = hm.g2_mul(G2_GEN, k)
        assert hm.g2_psi(pt) == hm.g2_mul(pt, z)


def test_g1_beta_endomorphism():
    beta = hm._compute_beta()
    assert pow(beta, 3, P) == 1 and beta != 1
    pt = hm.g1_mul(G1_GEN, 987654321)
    phi = (beta * pt[0] % P, pt[1])
    zsq = BLS_X * BLS_X % Q
    assert phi == hm.g1_neg(hm.g1_mul(pt, zsq))


# ---------------------------------------------------------------------------
# Pairing
# ---------------------------------------------------------------------------


def relic_expected():
    c = load_consts()["relic_pairing_fp12"]
    return (
        ((c[0], c[1]), (c[2], c[3]), (c[4], c[5])),
        ((c[6], c[7]), (c[8], c[9]), (c[10], c[11])),
    )


def test_pairing_vs_relic():
    assert hm.pairing(G1_GEN, G2_GEN) == relic_expected()


def test_pairing_identity_terms():
    assert hm.pairing(None, G2_GEN) == hm.FP12_ONE
    assert hm.pairing(G1_GEN, None) == hm.FP12_ONE


def test_bilinearity():
    random.seed(42)
    a, b = random.randrange(Q), random.randrange(Q)
    e = hm.pairing(hm.g1_mul(G1_GEN, a), hm.g2_mul(G2_GEN, b))
    assert e == hm.pairing(hm.g1_mul(G1_GEN, a * b % Q), G2_GEN)
    assert e == hm.fp12_pow(hm.pairing(G1_GEN, G2_GEN), a * b % Q)


def test_unitary():
    p1 = hm.g1_mul(G1_GEN, 5)
    q1 = hm.g2_mul(G2_GEN, 3)
    e = hm.pairing(p1, q1)
    assert hm.pairing(hm.g1_neg(p1), q1) == hm.fp12_conjugate(e)
    assert hm.pairing(p1, hm.g2_neg(q1)) == hm.fp12_conjugate(e)


def test_multi_miller_loop_matches_products():
    terms = [
        (hm.g1_mul(G1_GEN, i + 1), hm.g2_mul(G2_GEN, 2 * i + 1)) for i in range(3)
    ]
    terms += [(None, G2_GEN), (G1_GEN, None)]
    mm = hm.final_exponentiation(hm.multi_miller_loop(terms))
    acc = hm.FP12_ONE
    for p_, q_ in terms:
        acc = hm.fp12_mul(acc, hm.pairing(p_, q_))
    assert mm == acc


# ---------------------------------------------------------------------------
# hash-to-curve KATs (draft-16 appendix J)
# ---------------------------------------------------------------------------

DSTS = {
    "g1_ro": b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_RO_",
    "g1_nu": b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_NU_",
    "g2_ro": b"QUUX-V01-CS02-with-BLS12381G2_XMD:SHA-256_SSWU_RO_",
    "g2_nu": b"QUUX-V01-CS02-with-BLS12381G2_XMD:SHA-256_SSWU_NU_",
}

FNS = {
    "g1_ro": (hm.hash_to_curve_g1, hm.g1_to_uncompressed),
    "g1_nu": (hm.encode_to_curve_g1, hm.g1_to_uncompressed),
    "g2_ro": (hm.hash_to_curve_g2, hm.g2_to_uncompressed),
    "g2_nu": (hm.encode_to_curve_g2, hm.g2_to_uncompressed),
}


@pytest.mark.parametrize("suite", ["g1_ro", "g1_nu", "g2_ro", "g2_nu"])
def test_hash_to_curve_kats(suite):
    kats = json.load(open(VECTORS / "h2c_kats.json"))
    fn, ser = FNS[suite]
    for case in kats[suite]:
        pt = fn(case["msg"].encode(), DSTS[suite])
        assert ser(pt).hex() == case["expected"], case["msg"][:24]


def test_expand_message_xmd_known():
    """Spot-check expand_message_xmd against draft-16 appendix K.1 values."""
    dst = b"QUUX-V01-CS02-with-expander-SHA256-128"
    out = hm.expand_message_xmd(b"", dst, 0x20)
    assert (
        out.hex()
        == "68a985b87eb6b46952128911f2a4412bbc302a9d759667f87f7a21d803f07235"
    )
    out = hm.expand_message_xmd(b"abc", dst, 0x20)
    assert (
        out.hex()
        == "d8ccab23b5985ccea865c6c97b6e5b8350e794e603b4b97902f53a8a0d605615"
    )
    out = hm.expand_message_xmd(b"", dst, 0x80)
    assert out.hex().startswith("af84c27ccfd45d41914fdff5df25293e")


def test_expand_message_xmd_sha512():
    """draft-16 appendix K.3 vectors (reference tests/expand_msg.rs:361-512):
    expand_message_xmd with SHA-512."""
    dst = b"QUUX-V01-CS02-with-expander-SHA512-256"
    cases_20 = [
        (b"", "6b9a7312411d92f921c6f68ca0b6380730a1a4d982c507211a90964c394179ba"),
        (b"abc", "0da749f12fbe5483eb066a5f595055679b976e93abe9be6f0f6318bce7aca8dc"),
        (
            b"abcdef0123456789",
            "087e45a86e2939ee8b91100af1583c4938e0f5fc6c9db4b107b83346bc967f58",
        ),
        (
            b"q128_" + b"q" * 128,
            "7336234ee9983902440f6bc35b348352013becd88938d2afec44311caf8356b3",
        ),
        (
            b"a512_" + b"a" * 512,
            "57b5f7e766d5be68a6bfe1768e3c2b7f1228b3e4b3134956dd73a59b954c66f4",
        ),
    ]
    for msg, expected in cases_20:
        got = hm.expand_message_xmd(msg, dst, 0x20, hash_name="sha512")
        assert got.hex() == expected, msg[:16]
    # 0x80-byte expansions exercise the b_i chain (ell > 1)
    out = hm.expand_message_xmd(b"", dst, 0x80, hash_name="sha512")
    assert out.hex().startswith("41b037d1734a5f8df225dd8c7de38f851efdb45c")
    assert out.hex().endswith("78b318bd0e65ebff70bec88c753b159a805d2c89c55961")
    out = hm.expand_message_xmd(b"abc", dst, 0x80, hash_name="sha512")
    assert out.hex().startswith("7f1dddd13c08b543f2e2037b14cefb255b44c83c")
    out = hm.expand_message_xmd(b"abcdef0123456789", dst, 0x80,
                                hash_name="sha512")
    assert out.hex().startswith("3f721f208e6199fe903545abc26c837ce59ac6fa")
