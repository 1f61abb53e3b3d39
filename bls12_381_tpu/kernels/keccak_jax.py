"""Batched Keccak-f[1600] / SHAKE-128/256 and expand_message_xof on device.

TPU has no 64-bit integers, so each Keccak lane is a (lo, hi) pair of uint32
tensors vectorized over the batch; 64-bit rotations become 4 shifts + 2 ors.
This is the device analog of the reference's ExpandMsgXof path
(expand_msg.rs:167-217), giving batched XOF expansion with no host hashing.

Layout: messages/output [B, n_bytes] uint8; state 25 lanes x ([B], [B]).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _rotl64(lane, n):
    lo, hi = lane
    n %= 64
    if n == 0:
        return lane
    if n == 32:
        return (hi, lo)
    if n < 32:
        return (
            (lo << jnp.uint32(n)) | (hi >> jnp.uint32(32 - n)),
            (hi << jnp.uint32(n)) | (lo >> jnp.uint32(32 - n)),
        )
    n -= 32
    return (
        (hi << jnp.uint32(n)) | (lo >> jnp.uint32(32 - n)),
        (lo << jnp.uint32(n)) | (hi >> jnp.uint32(32 - n)),
    )


def _xor(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def _keccak_f(state):
    """state: dict (x, y) -> lane; 24 rounds, fully unrolled (static)."""
    for rc in _RC:
        # theta
        c = [state[(x, 0)] for x in range(5)]
        for x in range(5):
            for y in range(1, 5):
                c[x] = _xor(c[x], state[(x, y)])
        d = [
            _xor(c[(x - 1) % 5], _rotl64(c[(x + 1) % 5], 1)) for x in range(5)
        ]
        for x in range(5):
            for y in range(5):
                state[(x, y)] = _xor(state[(x, y)], d[x])
        # rho + pi
        b = {}
        for x in range(5):
            for y in range(5):
                b[(y, (2 * x + 3 * y) % 5)] = _rotl64(
                    state[(x, y)], _ROT[x][y]
                )
        # chi
        for x in range(5):
            for y in range(5):
                nx0 = b[((x + 1) % 5, y)]
                nx1 = b[((x + 2) % 5, y)]
                state[(x, y)] = (
                    b[(x, y)][0] ^ (~nx0[0] & nx1[0]),
                    b[(x, y)][1] ^ (~nx0[1] & nx1[1]),
                )
        # iota
        state[(0, 0)] = (
            state[(0, 0)][0] ^ jnp.uint32(rc & 0xFFFFFFFF),
            state[(0, 0)][1] ^ jnp.uint32(rc >> 32),
        )
    return state


def _bytes_to_lanes(block):
    """[B, rate] uint8 (little-endian 64-bit lanes) -> list of (lo, hi)."""
    b = block.astype(jnp.uint32)
    lanes = []
    for i in range(block.shape[-1] // 8):
        w = b[..., 8 * i : 8 * i + 8]
        lo = w[..., 0] | (w[..., 1] << 8) | (w[..., 2] << 16) | (w[..., 3] << 24)
        hi = w[..., 4] | (w[..., 5] << 8) | (w[..., 6] << 16) | (w[..., 7] << 24)
        lanes.append((lo, hi))
    return lanes


def _lanes_to_bytes(lanes):
    cols = []
    for lo, hi in lanes:
        for w in (lo, hi):
            for shift in (0, 8, 16, 24):
                cols.append(
                    ((w >> jnp.uint32(shift)) & jnp.uint32(0xFF)).astype(
                        jnp.uint8
                    )
                )
    return jnp.stack(cols, axis=-1)


def shake(data, out_len: int, rate: int, domain: int = 0x1F):
    """Batched SHAKE sponge: [B, msg_len] uint8 -> [B, out_len] uint8.

    rate: 168 for SHAKE-128, 136 for SHAKE-256.
    """
    data = jnp.asarray(data, dtype=jnp.uint8)
    bsz, msg_len = data.shape
    # pad: domain byte, zeros, 0x80 at the rate boundary
    pad_len = rate - (msg_len % rate)
    pad = np.zeros(pad_len, dtype=np.uint8)
    pad[0] = domain
    pad[-1] |= 0x80
    padded = jnp.concatenate(
        [data, jnp.broadcast_to(jnp.asarray(pad), (bsz, pad_len))], axis=1
    )
    zero = jnp.zeros((bsz,), jnp.uint32)
    state = {(x, y): (zero, zero) for x in range(5) for y in range(5)}
    order = [(x, y) for y in range(5) for x in range(5)]  # lane index order
    for blk in range(padded.shape[1] // rate):
        lanes = _bytes_to_lanes(padded[:, blk * rate : (blk + 1) * rate])
        for i, lane in enumerate(lanes):
            state[order[i]] = _xor(state[order[i]], lane)
        state = _keccak_f(state)
    # squeeze
    out = []
    got = 0
    while got < out_len:
        out.append(_lanes_to_bytes([state[xy] for xy in order[: rate // 8]]))
        got += rate
        if got < out_len:
            state = _keccak_f(state)
    return jnp.concatenate(out, axis=1)[:, :out_len]


def shake128(data, out_len: int):
    return shake(data, out_len, rate=168)


def shake256(data, out_len: int):
    return shake(data, out_len, rate=136)


def expand_message_xof_shake(msgs, dst: bytes, len_in_bytes: int,
                             bits: int = 128):
    """Batched draft-16 expand_message_xof (expand_msg.rs:167-217):
    XOF(msg || len_in_bytes(2B BE) || DST || len(DST)) read len_in_bytes.

    Oversize DSTs are pre-reduced with SHAKE(dst, ceil(2*k/8)) on host.
    """
    import hashlib

    if len(dst) > 255:
        h = hashlib.shake_128() if bits == 128 else hashlib.shake_256()
        h.update(b"H2C-OVERSIZE-DST-" + dst)
        dst = h.digest(bits // 4)  # ceil(2k/8) bytes, k = bits security
    if len_in_bytes > 65535:
        raise ValueError("expand_message_xof bounds exceeded")
    msgs = jnp.asarray(msgs, dtype=jnp.uint8)
    bsz = msgs.shape[0]
    suffix = (
        len_in_bytes.to_bytes(2, "big") + dst + bytes([len(dst)])
    )
    suf = np.frombuffer(suffix, dtype=np.uint8)
    full = jnp.concatenate(
        [msgs, jnp.broadcast_to(jnp.asarray(suf), (bsz, suf.size))], axis=1
    )
    rate = 168 if bits == 128 else 136
    return shake(full, len_in_bytes, rate=rate)
