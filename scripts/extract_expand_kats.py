#!/usr/bin/env python3
"""Extract draft-irtf-cfrg-hash-to-curve-16 appendix K expansion KATs (test
DATA) from the reference's integration tests into JSON.

Parses every TestCase { msg, dst?, len_in_bytes, uniform_bytes } literal in
/root/reference/tests/expand_msg.rs (appendix K.1-K.6 of the IETF draft:
XMD SHA-256 / long DST / SHA-512, XOF SHAKE-128 / long DST / SHAKE-256),
keyed by the enclosing #[test] function name.  These values are published in
the draft appendix; the reference merely embeds them.
"""

import json
import re

SRC = "/root/reference/tests/expand_msg.rs"
OUT = "/root/repo/tests/vectors/expand_msg_kats.json"

FN_RE = re.compile(r"fn (\w+)\(\) \{(.*?)\n\}", re.S)
CASE_RE = re.compile(
    r"TestCase\s*\{(.*?)\}\s*\.run::<(\w+)<(\w+)>>", re.S)
MSG_RE = re.compile(r'msg:\s*b"((?:[^"\\]|\\.)*?)"(.*?)(?=,\s*\n\s*(?:dst|len_in_bytes))',
                    re.S)
LEN_RE = re.compile(r"len_in_bytes:\s*0x([0-9a-fA-F]+)")
HEX_RE = re.compile(r'uniform_bytes:\s*&hex!\(\s*"([0-9a-fA-F\s]+?)"\s*\)', re.S)
DSTVAR_RE = re.compile(r'let (\w+)\s*=\s*b"((?:[^"\\]|\\.)*?)";', re.S)
LONGDST_RE = re.compile(r'let (\w+)\s*=\s*\[b"((?:[^"\\]|\\.)*?)"')


def unescape_rust_bytes(s: str) -> str:
    # rust multiline byte literals use `\` line continuations
    return re.sub(r"\\\s*\n\s*", "", s)


def main():
    src = open(SRC).read()
    data = {}
    for fn, body in FN_RE.findall(src):
        if "TestCase" not in body:
            continue
        # dst bound as a local (possibly [b"...", b"..."] chunked long DST)
        dsts = {}
        for name, val in DSTVAR_RE.findall(body):
            dsts[name] = unescape_rust_bytes(val)
        m = LONGDST_RE.search(body)
        if m:
            # chunked long-DST array: concatenate all chunks
            arr_body = body[m.start():body.index("];", m.start())]
            chunks = re.findall(r'b"((?:[^"\\]|\\.)*?)"', arr_body, re.S)
            dsts[m.group(1)] = "".join(unescape_rust_bytes(c) for c in chunks)
        cases = []
        for case_body, expander, hashname in CASE_RE.findall(body):
            msg_m = re.search(r'msg:\s*b"((?:[^"\\]|\\.)*?)",', case_body, re.S)
            msg = unescape_rust_bytes(msg_m.group(1))
            dst_m = re.search(r"dst[:,]\s*(\w+)?", case_body)
            dst = dsts.get((dst_m.group(1) or "dst") if dst_m else "dst",
                           dsts.get("dst", ""))
            ln = int(LEN_RE.search(case_body).group(1), 16)
            hexs = HEX_RE.search(case_body).group(1)
            ub = re.sub(r"\s+", "", hexs)
            cases.append({
                "msg": msg, "dst": dst, "len_in_bytes": ln,
                "uniform_bytes": ub, "expander": expander, "hash": hashname,
            })
        if cases:
            data[fn] = cases
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    total = sum(len(v) for v in data.values())
    print(f"wrote {total} cases in {len(data)} groups to {OUT}")
    for k, v in data.items():
        print(f"  {k}: {len(v)}")


if __name__ == "__main__":
    main()
