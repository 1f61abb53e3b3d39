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


def test_device_sha256_and_expand_xmd():
    """Batched device SHA-256 + expand_message_xmd vs hashlib / host oracle
    (draft-16 §5.3 semantics incl. oversize-DST reduction)."""
    import hashlib

    from bls12_381_tpu.kernels import sha256_jax as sj

    rng = np.random.RandomState(0)
    for L in (0, 55, 56, 64, 150):
        msgs = rng.randint(0, 256, size=(3, L)).astype(np.uint8)
        got = np.asarray(sj.sha256(msgs))
        for i in range(3):
            assert bytes(got[i]) == hashlib.sha256(bytes(msgs[i])).digest()
    dst = b"QUUX-V01-CS02-with-expander-SHA256-128"
    for L, n_out in ((0, 32), (32, 128), (68, 256)):
        msgs = rng.randint(0, 256, size=(2, L)).astype(np.uint8)
        got = np.asarray(sj.expand_message_xmd_sha256(msgs, dst, n_out))
        for i in range(2):
            assert bytes(got[i]) == hm.expand_message_xmd(bytes(msgs[i]), dst, n_out)
    # oversize DST reduction (expand_msg.rs:19-105)
    got = np.asarray(sj.expand_message_xmd_sha256(msgs, b"y" * 300, 64))
    assert bytes(got[0]) == hm.expand_message_xmd(bytes(msgs[0]), b"y" * 300, 64)


def test_device_shake_and_expand_xof():
    """Batched device Keccak/SHAKE + expand_message_xof vs hashlib / host
    oracle (expand_msg.rs:167-217 semantics incl. oversize-DST)."""
    import hashlib

    from bls12_381_tpu.kernels import keccak_jax as kj

    rng = np.random.RandomState(1)
    for L in (0, 167, 168, 200):
        msgs = rng.randint(0, 256, size=(2, L)).astype(np.uint8)
        got = np.asarray(kj.shake128(msgs, 300))
        for i in range(2):
            assert bytes(got[i]) == hashlib.shake_128(bytes(msgs[i])).digest(300)
        got = np.asarray(kj.shake256(msgs, 100))
        for i in range(2):
            assert bytes(got[i]) == hashlib.shake_256(bytes(msgs[i])).digest(100)
    dst = b"QUUX-V01-CS02-with-expander-SHAKE128"
    msgs = rng.randint(0, 256, size=(2, 32)).astype(np.uint8)
    got = np.asarray(kj.expand_message_xof_shake(msgs, dst, 128, bits=128))
    for i in range(2):
        assert bytes(got[i]) == hm.expand_message_xof(
            bytes(msgs[i]), dst, 128, hash_name="shake_128"
        )
    got = np.asarray(kj.expand_message_xof_shake(msgs, b"z" * 300, 64, bits=128))
    assert bytes(got[0]) == hm.expand_message_xof(
        bytes(msgs[0]), b"z" * 300, 64, hash_name="shake_128"
    )


def test_device_hash_to_field_matches_host():
    from bls12_381_tpu.hash_to_curve.h2c import (
        hash_to_field_fp, hash_to_field_fp_device,
        hash_to_field_fp2, hash_to_field_fp2_device,
    )

    dst = DST_G1_RO
    msgs = [b"device-%02d" % i for i in range(4)]
    assert np.array_equal(
        np.asarray(hash_to_field_fp_device(msgs, dst, 2)),
        np.asarray(hash_to_field_fp(msgs, dst, 2)),
    )
    d = hash_to_field_fp2_device(msgs, dst, 2)
    h = hash_to_field_fp2(msgs, dst, 2)
    assert np.array_equal(np.asarray(d[0]), np.asarray(h[0]))
    assert np.array_equal(np.asarray(d[1]), np.asarray(h[1]))


def test_g1_hash_to_curve_device_expansion_kats():
    """Full single-graph pipeline (device SHA-256 expansion) vs draft-16 KATs
    — equal-length messages only."""
    cases = [c for c in kats("g1_ro") if len(c["msg"]) == 32]
    if not cases:
        cases = kats("g1_ro")[:1]
    msgs = [c["msg"].encode() for c in cases]
    if len({len(m) for m in msgs}) != 1:
        msgs, cases = msgs[:1], cases[:1]
    out = g1.to_uncompressed_host(
        g1.to_affine(h2c.hash_to_curve_g1(msgs, DST_G1_RO, expand="device"))
    )
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
