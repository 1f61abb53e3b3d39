"""draft-irtf-cfrg-hash-to-curve-16 appendix K expansion KATs.

The reference pins expand_message_xmd AND expand_message_xof against the
draft's appendix vectors, including the long-DST (>255 byte) reduction
(/root/reference/tests/expand_msg.rs:330-507 XMD, :514-973 XOF).  Round-2
verdict: the repo's XOF paths were only cross-checked host<->device<->hashlib,
so a shared framing bug (DST' suffix, len encoding) could pass every test.
This file closes that: every appendix case runs against the host oracle, and
the batched device expanders are checked on every case they implement.

Vectors live in tests/vectors/expand_msg_kats.json, machine-extracted from
the reference's test data by scripts/extract_expand_kats.py (published IETF
draft appendix values, not reference code).
"""

import json
import os

import numpy as np
import pytest

from bls12_381_tpu import hostmath as hm

VEC = os.path.join(os.path.dirname(__file__), "vectors", "expand_msg_kats.json")

with open(VEC) as f:
    KATS = json.load(f)

GROUPS = sorted(KATS)
HASH_NAME = {"Sha256": "sha256", "Sha512": "sha512",
             "Shake128": "shake_128", "Shake256": "shake_256"}


def _cases(group):
    for c in KATS[group]:
        yield (c["msg"].encode(), c["dst"].encode(), c["len_in_bytes"],
               bytes.fromhex(c["uniform_bytes"]), HASH_NAME[c["hash"]])


def test_vector_inventory():
    # all six appendix groups present, 10 cases each (expand_msg.rs)
    assert len(GROUPS) == 6
    assert sum(len(KATS[g]) for g in GROUPS) == 60
    assert any("xof" in g and "long_dst" in g for g in GROUPS)


@pytest.mark.parametrize("group", [g for g in GROUPS if "xmd" in g])
def test_host_xmd_kats(group):
    for msg, dst, ln, want, hname in _cases(group):
        got = hm.expand_message_xmd(msg, dst, ln, hash_name=hname)
        assert got[: len(want)] == want, (group, msg[:16], ln)


@pytest.mark.parametrize("group", [g for g in GROUPS if "xof" in g])
def test_host_xof_kats(group):
    for msg, dst, ln, want, hname in _cases(group):
        got = hm.expand_message_xof(msg, dst, ln, hash_name=hname)
        assert got[: len(want)] == want, (group, msg[:16], ln)


@pytest.mark.parametrize(
    "group", [g for g in GROUPS if "xmd" in g and "sha256" in g])
def test_device_xmd_sha256_kats(group):
    """Batched device SHA-256 XMD expander on every appendix sha256 case."""
    from bls12_381_tpu.kernels import sha256_jax as sj

    for msg, dst, ln, want, _ in _cases(group):
        msgs = np.frombuffer(msg, dtype=np.uint8).reshape(1, -1)
        got = bytes(np.asarray(sj.expand_message_xmd_sha256(msgs, dst, ln))[0])
        assert got[: len(want)] == want, (group, msg[:16], ln)


@pytest.mark.parametrize("group", [g for g in GROUPS if "xof" in g])
def test_device_xof_shake_kats(group):
    """Batched device SHAKE XOF expander on every appendix case (128 and 256),
    including the long-DST securityparam reduction."""
    from bls12_381_tpu.kernels import keccak_jax as kj

    for msg, dst, ln, want, hname in _cases(group):
        bits = 128 if hname == "shake_128" else 256
        msgs = np.frombuffer(msg, dtype=np.uint8).reshape(1, -1)
        got = bytes(
            np.asarray(kj.expand_message_xof_shake(msgs, dst, ln, bits=bits))[0])
        assert got[: len(want)] == want, (group, msg[:16], ln)
