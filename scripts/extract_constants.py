#!/usr/bin/env python3
"""Extract DATA constants from the reference crate into canonical integers.

The reference (zkcrypto/bls12_381, mounted read-only at /root/reference) stores
field constants as 6x u64 limb arrays in Montgomery form (aR mod p, R = 2^384).
This script parses those limb literals (pure data, not code), converts them out
of Montgomery form, and emits JSON of plain integers (as hex strings).

Extracted data:
  - 11-isogeny map coefficients for G1 SSWU (reference: src/hash_to_curve/map_g1.rs:15-468)
  - 3-isogeny map coefficients for G2 SSWU  (reference: src/hash_to_curve/map_g2.rs:14-221)
  - SSWU curve constants A', B', xi, sqrt(-xi^3), eta values, RV1
  - F_2_256 from_okm constant (map_g1.rs:514)
  - The RELIC cross-implementation pairing vector (src/tests/mod.rs:78-231)

These values are all standardized (draft-irtf-cfrg-hash-to-curve-16 appendix E)
or third-party test data; extraction merely avoids manual transcription errors.
"""

import json
import re
import sys

P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
R = 1 << 384
R_INV = pow(R, -1, P)
REF = "/root/reference/src"

FP_EXPR = re.compile(
    r"Fp::zero\(\)|Fp::one\(\)|Fp::from_raw_unchecked\(\[\s*"
    r"((?:0x[0-9a-fA-F_]+\s*,\s*){5}0x[0-9a-fA-F_]+)\s*,?\s*\]\)",
    re.S,
)


def fp_value(m):
    text = m.group(0)
    if text.startswith("Fp::zero"):
        return 0
    if text.startswith("Fp::one"):
        return 1
    limbs = [int(x.strip().replace("_", ""), 16) for x in m.group(1).split(",")]
    mont = sum(l << (64 * i) for i, l in enumerate(limbs))
    return (mont * R_INV) % P


def const_block(src, name):
    """Return the source text of `const NAME: ... = ...;` (to the closing `];` or `};`)."""
    m = re.search(rf"const {name}\s*:[^=]+=", src)
    assert m, name
    start = m.end()
    # find matching end: scan for `];` or `);` or `};` at bracket depth 0
    depth = 0
    for i in range(start, len(src)):
        c = src[i]
        if c in "[({":
            depth += 1
        elif c in "])}":
            depth -= 1
            if depth == 0:
                return src[start : i + 1]
    raise AssertionError(name)


def parse_fp_array(src, name):
    return [fp_value(m) for m in FP_EXPR.finditer(const_block(src, name))]


def parse_fp2_array(src, name, n):
    """Parse [Fp2; n] where entries are Fp2{c0,c1}, Fp2::one(), or Fp2::zero()."""
    block = const_block(src, name)
    # split into top-level entries
    entries = []
    depth = 0
    cur = []
    inner = block.strip()
    assert inner[0] == "[" and inner[-1] == "]"
    for c in inner[1:-1]:
        if c in "[({":
            depth += 1
        elif c in "])}":
            depth -= 1
        if c == "," and depth == 0:
            entries.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    if "".join(cur).strip():
        entries.append("".join(cur))
    assert len(entries) == n, (name, len(entries))
    out = []
    for e in entries:
        e = e.strip()
        if e.startswith("Fp2::one"):
            out.append((1, 0))
        elif e.startswith("Fp2::zero"):
            out.append((0, 0))
        else:
            fps = [fp_value(m) for m in FP_EXPR.finditer(e)]
            assert len(fps) == 2, (name, e[:60])
            out.append((fps[0], fps[1]))
    return out


def parse_fp2_const(src, name):
    fps = [fp_value(m) for m in FP_EXPR.finditer(const_block(src, name))]
    assert len(fps) == 2, name
    return (fps[0], fps[1])


def main():
    g1src = open(f"{REF}/hash_to_curve/map_g1.rs").read()
    g2src = open(f"{REF}/hash_to_curve/map_g2.rs").read()
    data = {
        "iso11_xnum": parse_fp_array(g1src, "ISO11_XNUM"),
        "iso11_xden": parse_fp_array(g1src, "ISO11_XDEN"),
        "iso11_ynum": parse_fp_array(g1src, "ISO11_YNUM"),
        "iso11_yden": parse_fp_array(g1src, "ISO11_YDEN"),
        "g1_sswu_a": parse_fp_array(g1src, "SSWU_ELLP_A")[0],
        "g1_sswu_b": parse_fp_array(g1src, "SSWU_ELLP_B")[0],
        "g1_sswu_xi": parse_fp_array(g1src, "SSWU_XI")[0],
        "g1_sqrt_m_xi_cubed": parse_fp_array(g1src, "SQRT_M_XI_CUBED")[0],
        "f_2_256": parse_fp_array(g1src, "F_2_256")[0],
        "iso3_xnum": parse_fp2_array(g2src, "ISO3_XNUM", 4),
        "iso3_xden": parse_fp2_array(g2src, "ISO3_XDEN", 3),
        "iso3_ynum": parse_fp2_array(g2src, "ISO3_YNUM", 4),
        "iso3_yden": parse_fp2_array(g2src, "ISO3_YDEN", 4),
        "g2_sswu_a": parse_fp2_const(g2src, "SSWU_ELLP_A"),
        "g2_sswu_b": parse_fp2_const(g2src, "SSWU_ELLP_B"),
        "g2_sswu_xi": parse_fp2_const(g2src, "SSWU_XI"),
        "g2_sswu_etas": parse_fp2_array(g2src, "SSWU_ETAS", 4),
        "g2_sswu_rv1": parse_fp2_const(g2src, "SSWU_RV1"),
    }

    testsrc = open(f"{REF}/tests/mod.rs").read()
    relic = [fp_value(m) for m in FP_EXPR.finditer(testsrc)]
    assert len(relic) == 12, len(relic)
    data["relic_pairing_fp12"] = relic

    # sanity: the RELIC value is also given as plain hex in a comment; check c0.c0.c0
    hexlines = re.findall(r"^\s*((?:[0-9A-F]{16} ){5}[0-9A-F]{16})\s*$", testsrc, re.M)
    assert len(hexlines) == 12
    comment_vals = [int(h.replace(" ", ""), 16) for h in hexlines]
    assert sorted(comment_vals) == sorted(relic), "comment hex != converted limbs"

    def enc(v):
        if isinstance(v, int):
            return hex(v)
        if isinstance(v, (tuple, list)):
            return [enc(x) for x in v]
        return v

    json.dump({k: enc(v) for k, v in data.items()}, open(sys.argv[1], "w"), indent=1)
    print(f"wrote {sys.argv[1]}")


if __name__ == "__main__":
    main()
