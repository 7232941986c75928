"""Fixed-width bit-packing for unsigned integer vectors (numpy, vectorized).

Semantics follow the Apache ORC v1 spec's "Direct" bit-packing idea
(width-W big-endian packing of non-negative integers); the byte layout
here is our own (documented below), chosen for fast numpy round-trips.

Layout: values are split into little-endian W-bit fields packed LSB-first
into a contiguous bit stream, materialized via ``np.packbits(bitorder='little')``.
Width 0 encodes an all-zeros vector in zero payload bytes.

No per-row Python: everything is numpy array ops (input_hint mandate).
"""

from __future__ import annotations

import numpy as np


def bit_width(max_value: int) -> int:
    """Minimum bits to represent ``max_value`` (unsigned). 0 for 0."""
    if max_value < 0:
        raise ValueError("bit_width requires non-negative input")
    return int(max_value).bit_length()


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative int64/uint64 values into a width-bit stream.

    O(n) word-level algorithm: each value contributes to at most two
    64-bit little-endian words via shift-or. Values are processed in
    ``ceil(64/width)`` strided groups so that no two values in one
    fancy-indexed ``|=`` touch the same word (duplicate indices are
    silently dropped by numpy otherwise).
    """
    if width < 0 or width > 64:
        raise ValueError(f"width out of range: {width}")
    n = len(values)
    if n == 0 or width == 0:
        return b""
    v = np.ascontiguousarray(values).astype(np.uint64, copy=False)
    total_bits = n * width
    # Pairwise width-doubling: merging adjacent values preserves the
    # LSB-first stream layout exactly, and turns up-to-32 strided group
    # passes below into at most two (O(n log) contiguous ops instead).
    w = width
    while 2 * w <= 64:
        if len(v) & 1:
            v = np.append(v, np.uint64(0))  # tail pad truncated by n_bytes
        v = v[0::2] | (v[1::2] << np.uint64(w))
        w *= 2
    width = w
    n = len(v)
    n_words = (total_bits + 63) >> 6
    out = np.zeros(n_words + 1, dtype=np.uint64)  # +1 slack for hi spill
    start = np.arange(n, dtype=np.uint64) * np.uint64(width)
    widx = (start >> np.uint64(6)).astype(np.int64)
    bit = start & np.uint64(63)
    lo = v << bit
    # v >> (64-bit) with bit==0 meaning "no hi part" (shift by 64 is UB)
    inv = np.uint64(64) - bit
    hi = np.where(bit == 0, np.uint64(0), v >> np.minimum(inv, np.uint64(63)))
    # for bit==1..63 the shift is exact; recompute the bit==1 edge where
    # minimum() clamped (inv==63 is fine; clamp only hits inv==64/bit==0)
    k = max(1, -(-64 // width))  # ceil(64/width)
    for g in range(k):
        sl = slice(g, None, k)
        out[widx[sl]] |= lo[sl]
        out[widx[sl] + 1] |= hi[sl]
    n_bytes = (total_bits + 7) >> 3
    return out.tobytes()[:n_bytes]


def unpack(data: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack`; returns uint64 array of length ``n``."""
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint64)
    total_bits = n * width
    n_words = (total_bits + 63) >> 6
    padded = data + b"\x00" * (n_words * 8 + 8 - len(data))
    words = np.frombuffer(padded, dtype="<u8")
    start = np.arange(n, dtype=np.uint64) * np.uint64(width)
    widx = (start >> np.uint64(6)).astype(np.int64)
    bit = start & np.uint64(63)
    lo = words[widx] >> bit
    inv = np.uint64(64) - bit
    hi = np.where(
        bit == 0, np.uint64(0), words[widx + 1] << np.minimum(inv, np.uint64(63))
    )
    val = lo | hi
    if width < 64:
        val &= np.uint64((1 << width) - 1)
    return val


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """Map signed int64 → unsigned so small magnitudes stay small.

    Standard zigzag (as used by ORC RLEv2 / protobuf): n → (n<<1)^(n>>63).
    """
    v = values.astype(np.int64, copy=False)
    return ((v.astype(np.uint64) << np.uint64(1)) ^ (v >> np.int64(63)).astype(np.uint64))


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    u = values.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(np.int64)
