"""Device hash-to-curve vs draft-16 KATs (via the host-validated oracle)."""

import json

import numpy as np

import conftest
from bls12_381_tpu import hash_to_curve as h2c
from bls12_381_tpu import hostmath as hm
from bls12_381_tpu.curves import g1, g2

DST_G1_RO = b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_RO_"
DST_G1_NU = b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_NU_"
DST_G2_RO = b"QUUX-V01-CS02-with-BLS12381G2_XMD:SHA-256_SSWU_RO_"
DST_G2_NU = b"QUUX-V01-CS02-with-BLS12381G2_XMD:SHA-256_SSWU_NU_"


def kats(name):
    data = json.load(open(conftest.VECTORS / "h2c_kats.json"))
    return data[name]


def test_g1_hash_to_curve_kats():
    cases = kats("g1_ro")
    msgs = [c["msg"].encode() for c in cases]
    out = g1.to_uncompressed_host(g1.to_affine(h2c.hash_to_curve_g1(msgs, DST_G1_RO)))
    for i, c in enumerate(cases):
        assert bytes(out[i].tolist()).hex() == c["expected"], c["msg"][:24]


def test_g1_encode_to_curve_kats():
    cases = kats("g1_nu")
    msgs = [c["msg"].encode() for c in cases]
    out = g1.to_uncompressed_host(g1.to_affine(h2c.encode_to_curve_g1(msgs, DST_G1_NU)))
    for i, c in enumerate(cases):
        assert bytes(out[i].tolist()).hex() == c["expected"], c["msg"][:24]


def test_g2_hash_to_curve_kats():
    cases = kats("g2_ro")
    msgs = [c["msg"].encode() for c in cases]
    out = g2.to_uncompressed_host(g2.to_affine(h2c.hash_to_curve_g2(msgs, DST_G2_RO)))
    for i, c in enumerate(cases):
        assert bytes(out[i].tolist()).hex() == c["expected"], c["msg"][:24]


def test_g2_encode_to_curve_kats():
    cases = kats("g2_nu")
    msgs = [c["msg"].encode() for c in cases]
    out = g2.to_uncompressed_host(g2.to_affine(h2c.encode_to_curve_g2(msgs, DST_G2_NU)))
    for i, c in enumerate(cases):
        assert bytes(out[i].tolist()).hex() == c["expected"], c["msg"][:24]


def test_sswu_exceptional_u_zero():
    """u = 0 exercises the tv == 0 exceptional branch (map_g1.rs:654-719)."""
    from bls12_381_tpu.fields import fp

    u = fp.from_ints([0, 1, 2, 3])
    pt = h2c.map_to_curve_g1(u)
    got = np.asarray(g1.is_on_curve(pt))
    assert got.all()
    # match host values
    aff = g1.to_affine(pt)
    x, y = fp.to_ints(aff[0]), fp.to_ints(aff[1])
    for i, uv in enumerate([0, 1, 2, 3]):
        assert (int(x[i]), int(y[i])) == hm.map_to_curve_g1(uv), uv
