#!/usr/bin/env python3
"""Extract draft-irtf-cfrg-hash-to-curve-16 appendix J KATs (test DATA) from
the reference's integration tests into JSON.

The five standard test messages are reconstructed programmatically; the
expected outputs (uncompressed affine point bytes) are parsed from the hex
literals in /root/reference/tests/hash_to_curve_g1.rs / _g2.rs, in test order.
These values are published in the IETF draft appendix J.9/J.10.
"""

import json
import re

MSGS = [
    "",
    "abc",
    "abcdef0123456789",
    "q128_" + "q" * 128,
    "a512_" + "a" * 512,
]

HEX_RE = re.compile(r'hex!\(\s*"([0-9a-fA-F"\s]+?)"\s*\)', re.S)
FN_RE = re.compile(r"fn (\w+)\(\) \{(.*?)\n\}", re.S)


def extract(path):
    src = open(path).read()
    out = {}
    for fn, body in FN_RE.findall(src):
        vals = []
        for h in HEX_RE.findall(body):
            vals.append(re.sub(r'[\s"]', "", h))
        if vals:
            out[fn] = vals
    return out


def main():
    g1 = extract("/root/reference/tests/hash_to_curve_g1.rs")
    g2 = extract("/root/reference/tests/hash_to_curve_g2.rs")
    data = {}
    for name, fns in (("g1", g1), ("g2", g2)):
        for fn, vals in fns.items():
            assert len(vals) == 5, (fn, len(vals))
            kind = "nu" if "_nu" in fn else "ro"
            data[f"{name}_{kind}"] = [
                {"msg": m, "expected": v} for m, v in zip(MSGS, vals)
            ]
    data["msgs"] = MSGS
    json.dump(data, open("tests/vectors/h2c_kats.json", "w"), indent=1)
    print("wrote tests/vectors/h2c_kats.json:", sorted(data))


if __name__ == "__main__":
    main()
