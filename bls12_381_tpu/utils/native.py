"""ctypes bindings for the native host runtime (csrc/bls_host.cpp).

Provides fast batch byte<->limb codecs (with Montgomery conversion) and
batched expand_message_xmd.  Falls back gracefully when the shared library
is not built — callers check `available()` and use the Python paths.

Build: `make -C csrc` (emits bls12_381_tpu/utils/libbls_host.so).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "libbls_host.so")
    if not os.path.exists(path):
        # try building on the fly (toolchain is available in the image)
        import subprocess

        csrc = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "csrc")
        try:
            subprocess.run(["make", "-C", csrc], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.bls_fp_from_bytes.restype = ctypes.c_int
    lib.bls_fp_to_bytes.restype = ctypes.c_int
    lib.bls_expand_msg_xmd_sha256.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def fp_from_bytes(data: np.ndarray, to_mont: bool = True):
    """uint8[n, 48] BE -> (uint32[24, n] limbs, bool[n] canonical mask)."""
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = data.shape[0]
    limbs = np.empty((24, n), dtype=np.uint32)
    ok = np.empty(n, dtype=np.uint8)
    lib.bls_fp_from_bytes(
        data.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_size_t(n),
        ctypes.c_int(1 if to_mont else 0),
        limbs.ctypes.data_as(ctypes.c_void_p),
        ok.ctypes.data_as(ctypes.c_void_p),
    )
    return limbs, ok.astype(bool)


def fp_to_bytes(limbs: np.ndarray, from_mont: bool = True) -> np.ndarray:
    """uint32[24, n] limbs -> uint8[n, 48] BE canonical."""
    lib = _load()
    limbs = np.ascontiguousarray(limbs, dtype=np.uint32)
    n = limbs.shape[1]
    out = np.empty((n, 48), dtype=np.uint8)
    lib.bls_fp_to_bytes(
        limbs.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_size_t(n),
        ctypes.c_int(1 if from_mont else 0),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def expand_message_xmd_sha256(msgs: list[bytes], dst: bytes,
                              len_in_bytes: int) -> np.ndarray:
    """Batched expand_message_xmd; returns uint8[n, len_in_bytes]."""
    lib = _load()
    blob = b"".join(msgs)
    offsets = np.zeros(len(msgs) + 1, dtype=np.uint64)
    np.cumsum([len(m) for m in msgs], out=offsets[1:])
    blob_arr = np.frombuffer(blob, dtype=np.uint8) if blob else np.zeros(
        1, dtype=np.uint8)
    dst_arr = np.frombuffer(dst, dtype=np.uint8) if dst else np.zeros(
        1, dtype=np.uint8)
    out = np.empty((len(msgs), len_in_bytes), dtype=np.uint8)
    rc = lib.bls_expand_msg_xmd_sha256(
        blob_arr.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_size_t(len(msgs)),
        dst_arr.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_size_t(len(dst)),
        ctypes.c_size_t(len_in_bytes),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError("expand_message_xmd parameters out of range")
    return out
