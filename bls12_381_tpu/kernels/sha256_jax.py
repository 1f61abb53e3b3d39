"""Batched SHA-256 and expand_message_xmd on device (pure uint32 jnp).

SHA-256 is a 32-bit-word algorithm — a perfect fit for TPU uint32 lanes: one
compression schedule, vectorized over a batch of equal-length messages.  This
moves the reference's host-side message expansion (expand_msg.rs:230-328,
RFC/draft-16 §5.3) onto the device, so the whole hash_to_curve pipeline
(expand -> hash_to_field -> SSWU -> isogeny -> clear_cofactor) is a single
jitted graph with no host round-trips.

Layouts: messages/OKM are [B, n_bytes] uint8; hash state is 8 x [B] uint32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_K = np.array([
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
], dtype=np.uint32)

_H0 = np.array([
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
], dtype=np.uint32)


def _rotr(x, n):
    return (x >> jnp.uint32(n)) | (x << jnp.uint32(32 - n))


def _compress(state, block_words):
    """One SHA-256 compression: state [8][B] uint32, block [16][B] uint32."""
    w = list(block_words)
    for i in range(16, 64):
        s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ (w[i - 15] >> jnp.uint32(3))
        s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ (w[i - 2] >> jnp.uint32(10))
        w.append(w[i - 16] + s0 + w[i - 7] + s1)
    a, b, c, d, e, f, g, h = state
    for i in range(64):
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + jnp.uint32(_K[i]) + w[i]
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    return [s + v for s, v in zip(state, (a, b, c, d, e, f, g, h))]


def _pad_message(msg_len: int) -> tuple[int, np.ndarray]:
    """SHA-256 padding for a fixed message length: returns (n_blocks,
    suffix bytes to append)."""
    bit_len = 8 * msg_len
    pad_len = (55 - msg_len) % 64  # zeros between 0x80 and the length field
    suffix = bytes([0x80]) + b"\x00" * pad_len + bit_len.to_bytes(8, "big")
    total = msg_len + len(suffix)
    assert total % 64 == 0
    return total // 64, np.frombuffer(suffix, dtype=np.uint8)


def _bytes_to_words(data):
    """[B, 4k] uint8 (big-endian) -> list of k [B] uint32 words."""
    b = data.astype(jnp.uint32)
    words = (
        (b[..., 0::4] << jnp.uint32(24))
        | (b[..., 1::4] << jnp.uint32(16))
        | (b[..., 2::4] << jnp.uint32(8))
        | b[..., 3::4]
    )
    return [words[..., i] for i in range(words.shape[-1])]


def _words_to_bytes(words):
    """list of k [B] uint32 -> [B, 4k] uint8 (big-endian)."""
    cols = []
    for w in words:
        for shift in (24, 16, 8, 0):
            cols.append(((w >> jnp.uint32(shift)) & jnp.uint32(0xFF)).astype(jnp.uint8))
    return jnp.stack(cols, axis=-1)


def sha256(data):
    """Batched SHA-256: [B, msg_len] uint8 -> [B, 32] uint8.

    msg_len is static (all messages in the batch share a length — the
    batched-h2c contract).
    """
    bsz, msg_len = data.shape
    n_blocks, suffix = _pad_message(msg_len)
    suf = jnp.broadcast_to(jnp.asarray(suffix), (bsz, suffix.size))
    padded = jnp.concatenate([data, suf], axis=1)
    state = [jnp.broadcast_to(jnp.uint32(h), (bsz,)) for h in _H0]
    for blk in range(n_blocks):
        block = padded[:, blk * 64 : (blk + 1) * 64]
        state = _compress(state, _bytes_to_words(block))
    return _words_to_bytes(state)


def expand_message_xmd_sha256(msgs, dst: bytes, len_in_bytes: int):
    """Batched draft-16 expand_message_xmd with SHA-256, fully on device.

    msgs: [B, msg_len] uint8 (device or numpy).  dst: static bytes (oversize
    DSTs are pre-reduced on host exactly like expand_msg.rs:19-105).
    Returns [B, len_in_bytes] uint8.
    """
    import hashlib

    if len(dst) > 255:
        dst = hashlib.sha256(b"H2C-OVERSIZE-DST-" + dst).digest()
    ell = -(-len_in_bytes // 32)
    if ell > 255 or len_in_bytes > 65535:
        raise ValueError("expand_message_xmd bounds exceeded")
    msgs = jnp.asarray(msgs, dtype=jnp.uint8)
    bsz = msgs.shape[0]
    dst_prime = np.frombuffer(dst + bytes([len(dst)]), dtype=np.uint8)
    dstp = jnp.broadcast_to(jnp.asarray(dst_prime), (bsz, dst_prime.size))

    def const_bytes(bs):
        arr = np.frombuffer(bytes(bs), dtype=np.uint8)
        return jnp.broadcast_to(jnp.asarray(arr), (bsz, arr.size))

    z_pad = const_bytes(b"\x00" * 64)
    lib = const_bytes(len_in_bytes.to_bytes(2, "big"))
    b0 = sha256(
        jnp.concatenate([z_pad, msgs, lib, const_bytes(b"\x00"), dstp], axis=1)
    )
    out = []
    b_prev = sha256(jnp.concatenate([b0, const_bytes(bytes([1])), dstp], axis=1))
    out.append(b_prev)
    for i in range(2, ell + 1):
        b_prev = sha256(
            jnp.concatenate([b0 ^ b_prev, const_bytes(bytes([i])), dstp], axis=1)
        )
        out.append(b_prev)
    return jnp.concatenate(out, axis=1)[:, :len_in_bytes]
