"""Integer codecs in the spirit of ORC RLEv2's four sub-encodings.

Semantics derive from the public Apache ORC v1 spec (RLEv2:
SHORT_REPEAT, DIRECT, DELTA, PATCHED_BASE) and the FOR/delta literature
(PAPERS.md: "Can Delta Compete with Frame-of-Reference...", VLDB 2024).
The byte layout is our own byte-aligned framing — we are not producing
ORC files, we are reproducing the *capabilities* (see SURVEY.md §2.2).

All kernels: int64 ndarray in → bytes out, fully numpy-vectorized.
Nulls are handled one layer up (framing.py) — kernels see dense values.

Codecs
------
rle_sr      run-length: (value, run_length) pairs, both bit-packed.
            Wins on low-run-count data (all-equal, snapped timestamps).
rle_direct  frame-of-reference: min-subtract then fixed-width bit-pack.
            Wins on small value ranges.
rle_delta   first value + zigzag(diff) bit-packed. Wins on monotonic /
            smooth sequences (doc ids, crawl timestamps).
rle_pb      patched base: FOR at a reduced width covering ~99% of
            values, plus a sparse patch list for outliers. Wins when a
            few huge values would blow up rle_direct's width.
"""

from __future__ import annotations

import struct

import numpy as np

from . import bitpack

_U64 = np.uint64


def _header(*fields: int) -> bytes:
    return struct.pack("<" + "q" * len(fields), *fields)


def _read_header(data: bytes, n_fields: int) -> tuple[tuple[int, ...], int]:
    size = 8 * n_fields
    return struct.unpack("<" + "q" * n_fields, data[:size]), size


# ---------------------------------------------------------------- rle_sr

def rle_sr_encode(values: np.ndarray) -> bytes:
    """Run-length encode: bit-packed run values (zigzag) + run lengths."""
    v = values.astype(np.int64, copy=False)
    n = len(v)
    if n == 0:
        return _header(0, 0, 0)
    # Vectorized run detection.
    change = np.flatnonzero(np.diff(v)) + 1
    starts = np.concatenate(([0], change))
    lengths = np.diff(np.concatenate((starts, [n])))
    run_vals = v[starts]
    zz = bitpack.zigzag_encode(run_vals)
    wv = bitpack.bit_width(int(zz.max())) if len(zz) else 0
    wl = bitpack.bit_width(int(lengths.max()))
    payload_v = bitpack.pack(zz, wv)
    payload_l = bitpack.pack(lengths.astype(np.uint64), wl)
    return (
        _header(len(run_vals), wv, wl)
        + struct.pack("<q", len(payload_v))
        + payload_v
        + payload_l
    )


def rle_sr_decode(data: bytes, n: int) -> np.ndarray:
    (n_runs, wv, wl), off = _read_header(data, 3)
    if n_runs == 0:
        return np.zeros(0, dtype=np.int64)
    (lv,) = struct.unpack("<q", data[off : off + 8])
    off += 8
    zz = bitpack.unpack(data[off : off + lv], wv, n_runs)
    lengths = bitpack.unpack(data[off + lv :], wl, n_runs).astype(np.int64)
    run_vals = bitpack.zigzag_decode(zz)
    return np.repeat(run_vals, lengths)


# ------------------------------------------------------------ rle_direct

def rle_direct_encode(values: np.ndarray) -> bytes:
    """Frame-of-reference: subtract min, bit-pack the residuals."""
    v = values.astype(np.int64, copy=False)
    n = len(v)
    if n == 0:
        return _header(0, 0)
    base = int(v.min())
    # Residuals fit in uint64 even when (max-min) overflows int64.
    resid = v.astype(np.uint64) - np.uint64(np.int64(base)).astype(np.uint64)
    w = bitpack.bit_width(int(resid.max()))
    return _header(base, w) + bitpack.pack(resid, w)


def rle_direct_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    (base, w), off = _read_header(data, 2)
    resid = bitpack.unpack(data[off:], w, n)
    return (resid + np.uint64(np.int64(base)).astype(np.uint64)).astype(np.int64)


# ------------------------------------------------------------- rle_delta

def rle_delta_encode(values: np.ndarray) -> bytes:
    """First value verbatim + zigzag(first-differences) bit-packed."""
    v = values.astype(np.int64, copy=False)
    n = len(v)
    if n == 0:
        return _header(0, 0)
    first = int(v[0])
    deltas = np.diff(v)
    zz = bitpack.zigzag_encode(deltas)
    w = bitpack.bit_width(int(zz.max())) if len(zz) else 0
    return _header(first, w) + bitpack.pack(zz, w)


def rle_delta_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    (first, w), off = _read_header(data, 2)
    zz = bitpack.unpack(data[off:], w, n - 1)
    deltas = bitpack.zigzag_decode(zz)
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    # Wrap-around-safe cumulative sum in uint64 space.
    np.cumsum(deltas.astype(np.uint64), out=out[1:].view(np.uint64))
    out[1:] = (out[1:].view(np.uint64) + np.uint64(np.int64(first)).astype(np.uint64)).astype(
        np.int64
    )
    return out


# ---------------------------------------------------------------- rle_pb

_PB_PERCENTILE = 99.0


def rle_pb_encode(values: np.ndarray) -> bytes:
    """Patched base: FOR at a width covering ~99% of values + patches.

    Mirrors ORC RLEv2 PATCHED_BASE semantics: residuals are packed at a
    reduced width; the few values that do not fit store their overflow
    bits in a sparse (position, high-bits) patch list.
    """
    v = values.astype(np.int64, copy=False)
    n = len(v)
    if n == 0:
        return _header(0, 0, 0, 0)
    base = int(v.min())
    resid = v.astype(np.uint64) - np.uint64(np.int64(base)).astype(np.uint64)
    full_w = bitpack.bit_width(int(resid.max()))
    # Pick the reduced width minimizing total bits: for each candidate w,
    # cost ≈ n*w + n_patch(w)*(position_width + overflow_width).
    # Vectorized via a histogram of per-value bit widths.
    # exact per-value bit widths: bw = #{powers of two <= resid}
    pow2 = np.uint64(1) << np.arange(64, dtype=np.uint64)
    bw = np.searchsorted(pow2, resid, side="right").astype(np.int64)
    hist = np.bincount(bw, minlength=full_w + 1)
    n_patch_at = hist[::-1].cumsum()[::-1]  # n_patch_at[w] = count of bw > w-1... adjust below
    wpos_est = bitpack.bit_width(n - 1) if n > 1 else 1
    ws = np.arange(full_w + 1)
    n_patch = np.concatenate((n_patch_at[1:], [0]))  # values needing > w bits
    cost = n * ws + n_patch * (wpos_est + (full_w - ws))
    w = int(ws[np.argmin(cost)])
    mask = _U64((1 << w) - 1) if w < 64 else _U64(0xFFFFFFFFFFFFFFFF)
    low = resid & mask
    high = resid >> _U64(w) if w < 64 else np.zeros_like(resid)
    patch_pos = np.flatnonzero(high)
    patch_vals = high[patch_pos]
    wp = bitpack.bit_width(int(patch_vals.max())) if len(patch_vals) else 0
    wpos = bitpack.bit_width(n - 1) if n > 1 else 1
    p_low = bitpack.pack(low, w)
    p_pos = bitpack.pack(patch_pos.astype(np.uint64), wpos)
    p_val = bitpack.pack(patch_vals, wp)
    return (
        _header(base, w, len(patch_pos), wp)
        + struct.pack("<qqq", wpos, len(p_low), len(p_pos))
        + p_low
        + p_pos
        + p_val
    )


def rle_pb_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    (base, w, n_patch, wp), off = _read_header(data, 4)
    wpos, l_low, l_pos = struct.unpack("<qqq", data[off : off + 24])
    off += 24
    low = bitpack.unpack(data[off : off + l_low], w, n)
    off += l_low
    resid = low
    if n_patch:
        pos = bitpack.unpack(data[off : off + l_pos], wpos, n_patch).astype(np.int64)
        vals = bitpack.unpack(data[off + l_pos :], wp, n_patch)
        resid = low.copy()
        resid[pos] |= vals << _U64(w)
    return (resid + np.uint64(np.int64(base)).astype(np.uint64)).astype(np.int64)
