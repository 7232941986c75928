"""Stripe framing: pyarrow column <-> self-describing encoded blob.

A *stripe* is one Arrow batch's worth of one column, encoded as a
single binary blob:

    magic(2)=b"OS" | ver(1) | codec_id(1) | dtype(1) | flags(1)
    | n_rows(<q) | params_len(<H) | params(utf8 json)
    | [flags&1: nullmap_len(<I) | nullmap]   # arrow-style LSB validity
    | payload                     # flags&2: zlib / flags&4: lzma

Codec kernels (bitpack / rle / fsst / dict) see only dense non-null
values; this layer strips and reinserts nulls, preserving the
None-vs-"" distinction bit-identically (FIXTURES.md F2 `str_with_nulls`).

flags bit 2 layers an optional general block compressor (stdlib zlib)
over the lightweight-encoded payload — the ORC spec's CompressionKind
layered over column encodings (semantics, not byte layout). The bit is
only set when deflate actually shrinks the payload, so `raw`+bit2 is
the unconditional floor and old blobs (bit clear) decode unchanged.
flags bit 3 marks stdlib-lzma instead (the cold-storage tier: denser,
slower) — per-frame flags mean a table can mix compressors and still
decode with no out-of-band config.

Mirrors the role of ORC's stripe footer (public ORC v1 spec: per-column
encoding id + parameters), not its byte layout.
"""

from __future__ import annotations

import hashlib
import json
import lzma
import struct
import zlib

import numpy as np
import pyarrow as pa

from . import fsst, rle

MAGIC = b"OS"
VERSION = 1
# below this payload size the deflate header/dictionary overhead and the
# per-call latency outweigh any win — skip the attempt entirely
_COMPRESS_MIN_BYTES = 256
# adaptive attempt-skip (see encode_frame): a frame gaining less than
# this fraction counts as a miss; after this many consecutive misses a
# column's later frames skip the deflate attempt (per-task state).
# While skipping, every _COMPRESS_REPROBE-th frame re-attempts anyway
# so a column whose data turns compressible mid-partition re-arms
# (ADVICE r3: once skipping started, no win could ever reset it).
_COMPRESS_WORTH_RATIO = 0.95
_COMPRESS_SKIP_AFTER = 2
_COMPRESS_REPROBE = 8

# codec ids
CODECS = {
    "raw": 0,
    "rle_sr": 1,
    "rle_direct": 2,
    "rle_delta": 3,
    "rle_pb": 4,
    "rle_auto": 5,  # pick cheapest int submode from exact size formulas
    "dict": 6,
    "fsst": 7,
    "for_ts": 8,  # frame-of-reference for timestamps (rle_auto on int64 view)
    "alp": 9,  # decimal-scaled doubles -> int codecs, verbatim exceptions
    "list": 10,  # ORC LIST type analogue: length stream + child frame
    "struct": 11,  # ORC STRUCT type analogue: per-field child frames
    "map": 12,  # ORC MAP type analogue: length stream + key/value frames
    "prefix": 13,  # front coding (Parquet DELTA_BYTE_ARRAY semantics)
    "xorf": 14,  # XOR-with-previous byte planes for floats (Gorilla idea)
}
CODEC_NAMES = {v: k for k, v in CODECS.items()}

_INT_SUBMODES = {
    "rle_sr": (1, rle.rle_sr_encode, rle.rle_sr_decode),
    "rle_direct": (2, rle.rle_direct_encode, rle.rle_direct_decode),
    "rle_delta": (3, rle.rle_delta_encode, rle.rle_delta_decode),
    "rle_pb": (4, rle.rle_pb_encode, rle.rle_pb_decode),
}
_SUBMODE_BY_ID = {i: (enc, dec) for _, (i, enc, dec) in _INT_SUBMODES.items()}

# dtype ids
_DT_INT64 = 1
_DT_FLOAT64 = 2
_DT_STRING = 3
_DT_BINARY = 4
_DT_TS_US = 5
_DT_INT32 = 6
_DT_LARGE_STRING = 7
_DT_LARGE_BINARY = 8
_DT_FLOAT32 = 9
_DT_DATE32 = 10
_DT_BOOL = 11
_DT_DECIMAL128 = 12
_DT_LIST = 13
_DT_STRUCT = 14
_DT_MAP = 15


def _dtype_id(t: pa.DataType) -> int:
    if pa.types.is_int64(t):
        return _DT_INT64
    if pa.types.is_float64(t):
        return _DT_FLOAT64
    if pa.types.is_string(t):
        return _DT_STRING
    if pa.types.is_binary(t):
        return _DT_BINARY
    if pa.types.is_timestamp(t):
        return _DT_TS_US
    if pa.types.is_int32(t):
        return _DT_INT32
    if pa.types.is_large_string(t):
        return _DT_LARGE_STRING
    if pa.types.is_large_binary(t):
        return _DT_LARGE_BINARY
    if pa.types.is_float32(t):
        return _DT_FLOAT32
    if pa.types.is_date32(t):
        return _DT_DATE32
    if pa.types.is_boolean(t):
        return _DT_BOOL
    if pa.types.is_decimal128(t):
        return _DT_DECIMAL128
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        _dtype_id(t.value_type)  # child must itself be encodable
        return _DT_LIST
    if pa.types.is_struct(t):
        for f in t:
            _dtype_id(f.type)  # every field must itself be encodable
        return _DT_STRUCT
    if pa.types.is_map(t):
        _dtype_id(t.key_type)
        _dtype_id(t.item_type)
        return _DT_MAP
    raise TypeError(f"unsupported column type: {t}")


_STRING_DTS = {_DT_STRING, _DT_BINARY, _DT_LARGE_STRING, _DT_LARGE_BINARY}
_INT_DTS = {_DT_INT64, _DT_INT32, _DT_TS_US, _DT_DATE32}


def _int64_values(dense: pa.Array) -> np.ndarray:
    """int64 numpy view of a dense int-family array. Arrow has no
    direct date32->int64 cast kernel, so dates hop through int32
    (epoch-days are preserved exactly)."""
    if pa.types.is_date32(dense.type):
        dense = dense.cast(pa.int32())
    return dense.cast(pa.int64()).to_numpy(zero_copy_only=False)


# ------------------------------------------------------------ int helpers

def encode_ints_auto(values: np.ndarray) -> bytes:
    """Pick the cheapest RLE submode from exact size formulas (no trial
    encodes) — this is the inner 'writer heuristic' (ORC spec writer)."""
    v = values.astype(np.int64, copy=False)
    n = len(v)
    if n == 0:
        sub_id, enc, _ = _INT_SUBMODES["rle_direct"]
        return struct.pack("<B", sub_id) + enc(v)
    costs: dict[str, int] = {}
    # direct: n * width(max-min)
    vmin, vmax = int(v.min()), int(v.max())
    span = (vmax - vmin) % (1 << 64)
    w_direct = span.bit_length()
    costs["rle_direct"] = n * w_direct
    # sr: n_runs * (width(zigzag vals) + width(max run len))
    n_runs = int(np.count_nonzero(np.diff(v))) + 1
    if n_runs < n:  # only worth considering with actual runs
        costs["rle_sr"] = n_runs * (64 + 16)  # conservative upper estimate
    # delta: n * width(zigzag deltas)
    if n > 1:
        d = np.diff(v)
        zz_max = int(rle.bitpack.zigzag_encode(d).max())
        costs["rle_delta"] = (n - 1) * zz_max.bit_length()
    # pb: only when direct width is inflated by outliers
    if w_direct > 16 and n > 64:
        costs["rle_pb"] = costs["rle_direct"]  # refined by trial below
    best = min(costs, key=lambda k: (costs[k], k))
    if "rle_pb" in costs:
        # pb's benefit needs the histogram — do the one trial encode.
        trial = rle.rle_pb_encode(v)
        if len(trial) * 8 < costs[best]:
            return struct.pack("<B", _INT_SUBMODES["rle_pb"][0]) + trial
    sub_id, enc, _ = _INT_SUBMODES[best]
    return struct.pack("<B", sub_id) + enc(v)


def decode_ints_auto(data: bytes, n: int) -> np.ndarray:
    (sub_id,) = struct.unpack("<B", data[:1])
    _, dec = _SUBMODE_BY_ID[sub_id]
    return dec(data[1:], n)


# --------------------------------------------------------- string helpers

def _string_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(lengths int64, concatenated value bytes) of the NON-NULL values.

    The data component is a zero-copy uint8 view into the Arrow buffer
    (the encode path moves hundreds of MB per task — copies here were
    the memory-bandwidth hot spot)."""
    dense = arr.drop_null()
    big = dense.cast(
        pa.large_binary()
        if pa.types.is_binary(dense.type) or pa.types.is_large_binary(dense.type)
        else pa.large_string()
    )
    buffers = big.buffers()  # [validity, offsets(int64), data]
    offs = np.frombuffer(buffers[1], dtype=np.int64, count=len(big) + 1, offset=big.offset * 8)
    if buffers[2] is not None and offs[-1] > offs[0]:
        data = np.frombuffer(
            buffers[2], dtype=np.uint8, count=int(offs[-1] - offs[0]), offset=int(offs[0])
        )
    else:
        data = np.zeros(0, dtype=np.uint8)
    return np.diff(offs), data


def _to_bytes(data) -> bytes:
    return data.tobytes() if isinstance(data, np.ndarray) else data


def _encode_strings_raw(lengths: np.ndarray, data: bytes) -> bytes:
    lb = encode_ints_auto(lengths)
    return struct.pack("<I", len(lb)) + lb + _to_bytes(data)


def _decode_strings_raw(payload: bytes, n_valid: int) -> tuple[np.ndarray, bytes]:
    (lb_len,) = struct.unpack("<I", payload[:4])
    lengths = decode_ints_auto(payload[4 : 4 + lb_len], n_valid)
    return lengths, payload[4 + lb_len :]


def _encode_strings_fsst(
    lengths: np.ndarray, data: bytes, table: "fsst.SymbolTable | None" = None
) -> bytes:
    lb = encode_ints_auto(lengths)
    comp = fsst.compress(data, table)
    return struct.pack("<I", len(lb)) + lb + comp


def _decode_strings_fsst(payload: bytes, n_valid: int) -> tuple[np.ndarray, bytes]:
    (lb_len,) = struct.unpack("<I", payload[:4])
    lengths = decode_ints_auto(payload[4 : 4 + lb_len], n_valid)
    return lengths, fsst.decompress(payload[4 + lb_len :])


def _encode_strings_dict(arr: pa.Array) -> bytes:
    """Sorted symbol table + indices (ORC DICTIONARY_V2 semantics)."""
    dense = arr.drop_null()
    denc = dense.dictionary_encode()
    dictionary = denc.dictionary
    indices = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # sort the dictionary; remap indices to sorted ranks
    order = pa.compute.array_sort_indices(dictionary).to_numpy(zero_copy_only=False)
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order))
    sorted_dict = dictionary.take(pa.array(order))
    new_indices = rank[indices]
    dlen, ddata = _string_parts(sorted_dict)
    ddata = _to_bytes(ddata)
    dl = encode_ints_auto(dlen)
    ib = encode_ints_auto(new_indices)
    return (
        struct.pack("<qI", len(sorted_dict), len(dl))
        + dl
        + struct.pack("<q", len(ddata))
        + ddata
        + ib
    )


def _decode_strings_dict(payload: bytes, n_valid: int) -> tuple[np.ndarray, bytes]:
    n_uniq, dl_len = struct.unpack("<qI", payload[:12])
    off = 12
    dlen = decode_ints_auto(payload[off : off + dl_len], n_uniq)
    off += dl_len
    (ddata_len,) = struct.unpack("<q", payload[off : off + 8])
    off += 8
    ddata = payload[off : off + ddata_len]
    off += ddata_len
    indices = decode_ints_auto(payload[off:], n_valid)
    # gather value bytes: lengths per row, then a single flat gather
    d_off = np.concatenate(([0], np.cumsum(dlen)))
    lengths = dlen[indices]
    starts = d_off[indices]
    total = int(lengths.sum())
    if total:
        dbuf = np.frombuffer(ddata, dtype=np.uint8)
        # cumsum-trick gather (see fsst.decompress fallback); zero-length
        # rows are dropped first — duplicate indices break fancy `+=`.
        nz = lengths > 0
        ls, ss = lengths[nz], starts[nz]
        d = np.ones(total, dtype=np.int64)
        out_off = np.cumsum(ls) - ls
        if len(ls) > 1:
            d[out_off[1:]] += ss[1:] - (ss[:-1] + ls[:-1])
        d[0] = ss[0]
        data = dbuf[np.cumsum(d)].tobytes()
    else:
        data = b""
    return lengths, data


# ------------------------------------------------- front coding (prefix)

# Incremental / front coding of adjacent string values (the public
# Parquet DELTA_BYTE_ARRAY encoding and the ORC dictionary's sorted
# symbol-table layout both use this idea — semantics only, not a
# port): each value stores only (shared-prefix length with the
# PREVIOUS value, suffix). On URL columns clustered by url the host +
# path prefix repeats for runs of thousands of rows, so the prefix
# stream RLEs to almost nothing and only the varying tails remain —
# which an optional FSST pass over the suffix stream then compresses
# further. Prefix lengths are capped so the encode-side pairwise
# comparison stays a bounded padded-matrix numpy op.

_PREFIX_CAP = 255


def consecutive_prefix_lengths(
    lengths: np.ndarray, data, cap: int = _PREFIX_CAP
) -> np.ndarray:
    """p[i] = len(common prefix of value i-1 and value i), capped.

    Vectorized: the first ``min(cap, maxlen)`` bytes of every value are
    gathered into one padded uint8 matrix; consecutive-row inequality +
    argmax gives the first mismatch column. Padding bytes can only
    produce false matches BEYOND min(len[i-1], len[i]), which the final
    clamp removes. Shared with the codec selector's prefix-savings
    stat, so the planning estimate and the codec agree by construction.
    """
    n = len(lengths)
    p = np.zeros(n, dtype=np.int64)
    if n <= 1:
        return p
    dbuf = data if isinstance(data, np.ndarray) else np.frombuffer(data, dtype=np.uint8)
    take = np.minimum(lengths, cap)
    w = int(take.max()) if n else 0
    if w == 0:
        return p
    offs = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    mat = np.zeros((n, w), dtype=np.uint8)
    mask = np.arange(w)[None, :] < take[:, None]
    src = offs[:, None] + np.arange(w)[None, :]
    mat[mask] = dbuf[src[mask]]
    neq = mat[1:] != mat[:-1]
    first = np.where(neq.any(axis=1), neq.argmax(axis=1), w)
    p[1:] = np.minimum(first, np.minimum(take[1:], take[:-1]))
    return p


def _range_gather_indices(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat indices covering [starts[i], starts[i]+lens[i]) per row, in
    row order — the cumsum trick from _decode_strings_dict, shared."""
    nz = lens > 0
    ls, ss = lens[nz], starts[nz]
    total = int(ls.sum())
    if not total:
        return np.zeros(0, dtype=np.int64)
    d = np.ones(total, dtype=np.int64)
    out_off = np.cumsum(ls) - ls
    if len(ls) > 1:
        d[out_off[1:]] += ss[1:] - (ss[:-1] + ls[:-1])
    d[0] = ss[0]
    return np.cumsum(d)


def _encode_strings_prefix(
    lengths: np.ndarray, data, state: dict | None = None
) -> bytes:
    """prefix-length stream + suffix-length stream (both through the
    int auto-selector) + suffix bytes (FSST when it pays, flag bit 0)."""
    lengths = np.asarray(lengths, dtype=np.int64)
    dbuf = data if isinstance(data, np.ndarray) else np.frombuffer(data, dtype=np.uint8)
    p = consecutive_prefix_lengths(lengths, dbuf)
    s = lengths - p
    offs = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    sfx = dbuf[_range_gather_indices(offs + p, s)].tobytes()
    pb = encode_ints_auto(p)
    sb = encode_ints_auto(s)
    flag = 0
    if len(sfx) >= _COMPRESS_MIN_BYTES:
        table = state.get("prefix_fsst_table") if state is not None else None
        if table is None and state is not None and len(sfx) >= 4096:
            table = fsst.train(sfx)
            state["prefix_fsst_table"] = table
        comp = fsst.compress(sfx, table)
        if len(comp) < len(sfx):
            sfx, flag = comp, 1
    return struct.pack("<BII", flag, len(pb), len(sb)) + pb + sb + sfx


def _decode_strings_prefix(payload: bytes, n_valid: int) -> tuple[np.ndarray, bytes]:
    flag, pb_len, sb_len = struct.unpack("<BII", payload[:9])
    off = 9
    p = decode_ints_auto(payload[off : off + pb_len], n_valid)
    off += pb_len
    s = decode_ints_auto(payload[off : off + sb_len], n_valid)
    off += sb_len
    sfx = payload[off:]
    if flag & 1:
        sfx = fsst.decompress(sfx)
    sfx_b = sfx if isinstance(sfx, np.ndarray) else np.frombuffer(sfx, dtype=np.uint8)
    lengths = (p + s).astype(np.int64)
    n = n_valid
    if n == 0:
        return lengths, b""
    sfx_off = np.concatenate(([0], np.cumsum(s)))[:-1]
    out_off = np.concatenate(([0], np.cumsum(lengths)))
    out = np.zeros(int(out_off[-1]), dtype=np.uint8)
    starts = out_off[:-1]
    # Byte j of value i lives in the suffix of the LAST row r <= i with
    # p[r] <= j (rows above it in the chain copied it forward). One
    # vectorized maximum.accumulate per column resolves the whole chain
    # for that position; only columns below max(p) can be inherited —
    # everything at or past max(p) is each row's own suffix (bulk path).
    w = int(p.max())
    idx = np.arange(n)
    for j in range(w):
        rows = lengths > j
        if not rows.any():
            break
        src = np.maximum.accumulate(np.where(p <= j, idx, -1))
        r = src[rows]
        out[starts[rows] + j] = sfx_b[sfx_off[r] + (j - p[r])]
    tail = np.maximum(lengths - w, 0)
    if int(tail.sum()):
        src_idx = _range_gather_indices(sfx_off + (w - p), tail)
        dst_idx = _range_gather_indices(starts + w, tail)
        out[dst_idx] = sfx_b[src_idx]
    return lengths, out.tobytes()


# ---------------------------------------------------------- float helpers

# ALP-style decimal scaling (public algorithm family: pseudodecimal in
# BtrBlocks, SIGMOD 2023; ALP, SIGMOD 2024 — semantics only, not a
# port): most real-world doubles are decimals, so v * 10^e rounds to an
# integer that divides back BITWISE-identically. Store the integers via
# the existing RLE/bitpack path (they are tiny: a 2-decimal price column
# packs in ~20 bits vs 64) and patch the few non-conforming values
# (NaN/inf/-0.0/true reals) verbatim. Exactness is *verified per value
# at encode time* with the identical float op decode will run, so the
# round trip is bit-identical by construction.

_ALP_MAX_EXP = 14
_F64_EXACT = float(1 << 53)
_ALP_MAX_EXC_FRAC = 0.05


def _alp_ok_mask(v: np.ndarray, e: int) -> np.ndarray:
    """True where int64(round(v*10^e)) -> float64 -> /10^e reproduces v
    bitwise — the exact op chain the decoder performs (the int64 cast
    matters: it is what drops -0.0's sign, so -0.0 must patch)."""
    scale = np.float64(10.0**e)
    with np.errstate(invalid="ignore", over="ignore"):
        r = np.rint(v * scale)
        ok = np.isfinite(r) & (np.abs(r) < _F64_EXACT)
        ints = np.where(ok, r, 0.0).astype(np.int64)
        back = ints.astype(np.float64) / scale
    return ok & (back.view(np.int64) == v.view(np.int64))


def alp_pick_exponent(v: np.ndarray) -> int | None:
    """Smallest decimal exponent covering >=95% of values exactly
    (exact coverage short-circuits); None = column is not decimal-like
    and alp should not be attempted."""
    if len(v) == 0:
        return 0
    best_e, best_bad = None, 1.0
    for e in range(_ALP_MAX_EXP + 1):
        bad = 1.0 - float(_alp_ok_mask(v, e).mean())
        if bad == 0.0:
            return e
        if bad < best_bad:
            best_e, best_bad = e, bad
    return best_e if best_bad <= _ALP_MAX_EXC_FRAC else None


def alp_viable(sample: np.ndarray) -> bool:
    return alp_pick_exponent(sample) is not None


def _encode_float_alp(values: np.ndarray) -> bytes:
    """values: dense (no-null) float64. Layout:
    e(1) | n_exc(<I) | ints_len(<I) | encode_ints_auto(rounded, exc=0)
    | pos_len(<I) | encode_ints_auto(exc positions) | exc f8 verbatim
    """
    v = values.astype(np.float64, copy=False)
    # exponent from a bounded sample (the full mask below still verifies
    # every value, so a sample-unlucky exponent only costs size)
    sample = v[:: max(1, len(v) // 4096)] if len(v) > 4096 else v
    e = alp_pick_exponent(sample)
    if e is None:
        e = 0  # encode everything as exceptions; size budget takes raw
    ok = _alp_ok_mask(v, e)
    scale = np.float64(10.0**e)
    with np.errstate(invalid="ignore", over="ignore"):
        ints = np.where(ok, np.rint(v * scale), 0.0).astype(np.int64)
    exc_pos = np.flatnonzero(~ok).astype(np.int64)
    ib = encode_ints_auto(ints)
    pb = encode_ints_auto(exc_pos)
    return (
        struct.pack("<BII", e, len(exc_pos), len(ib))
        + ib
        + struct.pack("<I", len(pb))
        + pb
        + v[~ok].astype("<f8").tobytes()
    )


def _decode_float_alp(payload: bytes, n_valid: int) -> np.ndarray:
    e, n_exc, ib_len = struct.unpack("<BII", payload[:9])
    off = 9
    ints = decode_ints_auto(payload[off : off + ib_len], n_valid)
    off += ib_len
    (pb_len,) = struct.unpack("<I", payload[off : off + 4])
    off += 4
    exc_pos = decode_ints_auto(payload[off : off + pb_len], n_exc)
    off += pb_len
    exc_vals = np.frombuffer(payload, dtype="<f8", count=n_exc, offset=off)
    # identical op sequence to the encoder's verification pass
    out = ints.astype(np.float64) / np.float64(10.0**e)
    if n_exc:
        out[exc_pos] = exc_vals
    return out


# --------------------------------------------- xorf (XOR byte planes)
#
# Lightweight float codec for temporally-correlated or
# reduced-precision floats where ALP's decimal scaling cannot apply
# (semantics from public work only, not a port: the XOR-with-previous
# transform is Facebook Gorilla, VLDB'15; the byte-plane decomposition
# is Parquet's BYTE_STREAM_SPLIT encoding). Bit-level leading/trailing
# zero windows (Gorilla's control bits) resist vectorization, so this
# codec works byte-aligned: XOR each value with its predecessor, split
# the result into its little-endian byte planes, and store only the
# planes that are not entirely zero (1-byte presence mask). A float64
# column holding float32-precision values drops >= 3 of 8 planes; a
# truly random column drops none and the size budget routes it to raw.
# Fully numpy-vectorized both ways (one bitwise_xor.accumulate on
# decode); composes with the frame-level zlib/lzma like every codec.


def _xor_byte_planes(values: np.ndarray) -> np.ndarray:
    """(itemsize, n) uint8 byte planes of XOR-with-previous, LE order."""
    itemsize = values.dtype.itemsize
    u_dt = np.uint64 if itemsize == 8 else np.uint32
    u = np.ascontiguousarray(values).view(u_dt)
    d = u.copy()
    if len(d) > 1:
        d[1:] ^= u[:-1]
    return d.view(np.uint8).reshape(-1, itemsize).T


def xorf_zero_planes(sample: np.ndarray) -> int:
    """Number of all-zero XOR byte planes — the selector's viability
    stat (same op chain as the encoder, so estimate == encoder)."""
    if len(sample) == 0:
        return 0
    planes = _xor_byte_planes(sample)
    return int(sum(1 for k in range(planes.shape[0]) if not planes[k].any()))


def _encode_float_xorf(values: np.ndarray) -> bytes:
    """values: dense (no-null) float64/float32.
    Layout: presence_mask(1 byte, bit k = plane k stored) then each
    stored plane's n bytes back to back (plane length is implied by
    the frame's row count, so no per-plane header is needed)."""
    planes = _xor_byte_planes(values)
    mask = 0
    parts = []
    for k in range(planes.shape[0]):
        plane = planes[k]
        if plane.any():
            mask |= 1 << k
            parts.append(np.ascontiguousarray(plane).tobytes())
    return struct.pack("<B", mask) + b"".join(parts)


def _decode_float_xorf(payload: bytes, n_valid: int, itemsize: int) -> np.ndarray:
    (mask,) = struct.unpack("<B", payload[:1])
    planes = np.zeros((itemsize, n_valid), dtype=np.uint8)
    pos = 1
    for k in range(itemsize):
        if (mask >> k) & 1:
            planes[k] = np.frombuffer(payload, np.uint8, n_valid, pos)
            pos += n_valid
    u_dt = np.uint64 if itemsize == 8 else np.uint32
    d = np.ascontiguousarray(planes.T).reshape(-1).view(u_dt)
    u = np.bitwise_xor.accumulate(d)
    return u.view(np.float64 if itemsize == 8 else np.float32)


# -------------------------------------------------- bool/decimal helpers

def _decimal_halves(dense: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(lo, hi) little-endian int64 halves of decimal128's 16-byte
    two's-complement values. A value fits in int64 iff hi is the sign
    extension of lo (always true for precision <= 18)."""
    n = len(dense)
    if n == 0 or dense.buffers()[1] is None:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    raw = np.frombuffer(
        dense.buffers()[1], dtype=np.int64, count=2 * n, offset=dense.offset * 16
    )
    return raw[0::2], raw[1::2]


def _interleave_decimal(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    out = np.empty(2 * len(lo), dtype=np.int64)
    out[0::2] = lo
    out[1::2] = hi
    return out


# ------------------------------------------------------------- the frame

def _list_child_codec(child: pa.Array) -> str:
    """Static child-codec rule for LIST frames (the per-stripe budget
    walk happens at the outer level; the child picks by type family):
    int-family -> rle_auto, strings -> fsst when the data can amortize
    a symbol table, nested lists recurse, floats raw (embeddings are
    near-random mantissas; the outer frame's zlib still applies)."""
    t = child.type
    if (
        pa.types.is_integer(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_date32(t)
        or pa.types.is_boolean(t)
    ):
        return "rle_auto"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_map(t):
        return "map"
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        return "fsst" if child.nbytes >= 4096 else "raw"
    return "raw"


def _child_state(state: dict | None, key: str) -> dict | None:
    """Per-child sub-state for nested frames: fsst tables and adaptive
    zlib-skip counters must not leak between siblings (a table trained
    on one field's distribution would silently degrade another's).
    LIST keeps the parent state directly — one child, no siblings."""
    if state is None:
        return None
    return state.setdefault("\x00children", {}).setdefault(key, {})


def _map_parts(dense: pa.Array):
    """(keys, items, lengths) for a MapArray — via the offsets buffer,
    because MapArray.keys/.items are NOT slice-aware (they return the
    whole child) while .offsets is; slicing the children to
    [offsets[0], offsets[-1]) realigns them."""
    off = np.asarray(dense.offsets, dtype=np.int64)
    if len(off) == 0:  # zero-length array has empty offsets
        off = np.zeros(1, dtype=np.int64)
    lengths = np.diff(off)
    start, end = int(off[0]), int(off[-1])
    keys = dense.keys.slice(start, end - start)
    items = dense.items.slice(start, end - start)
    return keys, items, lengths


def encode_frame(
    arr: pa.Array,
    codec: str,
    params: dict | None = None,
    state: dict | None = None,
    compression: str | None = None,
    compression_level: int = 1,
) -> bytes:
    """Encode one Arrow column chunk into a self-describing blob.

    ``compression='zlib'`` deflates the lightweight-encoded payload
    (ORC CompressionKind semantics); the frame's flags bit 2 records
    whether it actually won, so decode needs no out-of-band config.

    ``state`` is an optional mutable per-caller cache: fsst reuses the
    symbol table trained on the first stripe (key "fsst_table") —
    blobs stay self-describing (each embeds its table), decode is
    unaffected, and training cost amortizes across a task's stripes.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dt = _dtype_id(arr.type)
    n = len(arr)
    params = dict(params or {})
    if dt == _DT_TS_US:
        t = arr.type
        params["unit"] = t.unit
        if t.tz:
            params["tz"] = t.tz
    has_nulls = arr.null_count > 0
    flags = 1 if has_nulls else 0

    # dense values
    if dt in _INT_DTS:
        dense = arr.drop_null()
        values = _int64_values(dense)
        if codec == "raw":
            payload = values.astype("<i8").tobytes()
        elif codec in ("rle_auto", "for_ts"):
            payload = encode_ints_auto(values)
        elif codec in _INT_SUBMODES:
            sub_id, enc, _ = _INT_SUBMODES[codec]
            payload = struct.pack("<B", sub_id) + enc(values)
            codec = "rle_auto"  # stored uniformly as submode-tagged
        else:
            raise ValueError(f"codec {codec} not valid for int column")
    elif dt in (_DT_FLOAT64, _DT_FLOAT32):
        dense = arr.drop_null()
        np_dt = "<f8" if dt == _DT_FLOAT64 else "<f4"
        values = dense.to_numpy(zero_copy_only=False)
        if codec == "alp" and dt == _DT_FLOAT64:
            payload = _encode_float_alp(values)
        elif codec == "xorf":
            payload = _encode_float_xorf(values.astype(np_dt, copy=False))
        elif codec == "raw" or (codec == "alp" and dt == _DT_FLOAT32):
            codec = "raw"  # alp is defined over f8; f4 takes raw
            payload = values.astype(np_dt).tobytes()
        else:
            raise ValueError(f"codec {codec} not valid for float column")
    elif dt == _DT_BOOL:
        dense = arr.drop_null()
        values = dense.cast(pa.int64()).to_numpy(zero_copy_only=False)
        if codec == "raw":
            payload = np.packbits(
                values.astype(np.uint8), bitorder="little"
            ).tobytes()
        elif codec == "rle_auto" or codec in _INT_SUBMODES:
            payload = encode_ints_auto(values)
            codec = "rle_auto"
        else:
            raise ValueError(f"codec {codec} not valid for bool column")
    elif dt == _DT_DECIMAL128:
        t = arr.type
        params["precision"], params["scale"] = t.precision, t.scale
        dense = arr.drop_null()
        if isinstance(dense, pa.ChunkedArray):
            dense = dense.combine_chunks()
        lo, hi = _decimal_halves(dense)
        fits64 = bool(np.all(hi == (lo >> 63)))
        if codec in ("rle_auto", *_INT_SUBMODES) and fits64:
            payload = encode_ints_auto(lo)
            codec = "rle_auto"
        elif codec in ("raw", "rle_auto", *_INT_SUBMODES):
            codec = "raw"  # 16-byte verbatim (covers precision > 18)
            payload = _interleave_decimal(lo, hi).astype("<i8").tobytes()
        else:
            raise ValueError(f"codec {codec} not valid for decimal column")
    elif dt in _STRING_DTS:
        if codec == "dict":
            payload = _encode_strings_dict(arr)
        elif codec == "fsst":
            lengths, data = _string_parts(arr)
            table = state.get("fsst_table") if state is not None else None
            if table is None and state is not None and len(data) >= 4096:
                table = fsst.train(data)
                state["fsst_table"] = table
            payload = _encode_strings_fsst(lengths, data, table)
        elif codec == "prefix":
            lengths, data = _string_parts(arr)
            payload = _encode_strings_prefix(lengths, data, state)
        elif codec == "raw":
            lengths, data = _string_parts(arr)
            payload = _encode_strings_raw(lengths, data)
        else:
            raise ValueError(f"codec {codec} not valid for string/binary column")
    elif dt == _DT_LIST:
        # ORC LIST type analogue (public ORC v1 spec: PRESENT + LENGTH
        # streams over a recursively-encoded child column): lengths go
        # through the int auto-selector (uniform-length vectors — the
        # embedding case — RLE to a few bytes), the flattened child
        # through its own self-describing frame. "raw" aliases "list":
        # the structural encoding IS the floor for nested data, so the
        # budget fallback chain still terminates.
        if codec not in ("list", "raw"):
            raise ValueError(f"codec {codec} not valid for list column")
        codec = "list"
        params["large"] = bool(pa.types.is_large_list(arr.type))
        # round-trip the child FIELD identity, not just its type:
        # parquet names list children "element", arrow defaults to
        # "item" — a decode that renamed the child would break the
        # bit-identical contract at the schema level (and spuriously
        # fail checksum verification, which hashes the type string)
        vf = arr.type.value_field
        if vf.name != "item":
            params["field"] = vf.name
        if not vf.nullable:
            params["field_nullable"] = False
        dense = arr.drop_null()
        if isinstance(dense, pa.ChunkedArray):
            dense = dense.combine_chunks()
        lengths = pa.compute.list_value_length(dense).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        child = dense.flatten()
        child_blob = encode_frame(
            child, _list_child_codec(child), state=state
        )
        lb = encode_ints_auto(lengths)
        payload = struct.pack("<I", len(lb)) + lb + child_blob
    elif dt == _DT_STRUCT:
        # ORC STRUCT type analogue (public ORC v1 spec: the struct
        # column itself carries only a PRESENT stream; each field is a
        # child column encoded on its own): one recursively
        # self-describing frame per field, each picking its codec by
        # type family. "raw" aliases "struct" — the per-field framing
        # IS the structural floor, so the budget chain terminates.
        if codec not in ("struct", "raw"):
            raise ValueError(f"codec {codec} not valid for struct column")
        codec = "struct"
        params["fields"] = [[f.name, bool(f.nullable)] for f in arr.type]
        # flatten() (not .field(i)) is slice-offset-safe and propagates
        # parent nulls into the children — the ORC semantics (child
        # values under a null parent are not data); decode re-attaches
        # the parent PRESENT stream from the frame head.
        # each field gets its own sub-state slot: a shared slot would
        # let one child's trained fsst table / zlib-skip counter leak
        # onto a sibling with a different distribution
        blobs = [
            encode_frame(
                child,
                _list_child_codec(child),
                state=_child_state(state, field.name),
            )
            for field, child in zip(arr.type, arr.flatten())
        ]
        payload = struct.pack("<H", len(blobs)) + b"".join(
            struct.pack("<I", len(b)) + b for b in blobs
        )
    elif dt == _DT_MAP:
        # ORC MAP type analogue (public ORC v1 spec: PRESENT + LENGTH
        # streams over parallel key and value child columns):
        # structurally a LIST of (key, value) pairs — the LENGTH
        # stream rides the int auto-selector, keys and values each get
        # their own recursively self-describing frame. "raw" aliases
        # the structural floor so budget chains terminate.
        if codec not in ("map", "raw"):
            raise ValueError(f"codec {codec} not valid for map column")
        codec = "map"
        params["keys_sorted"] = bool(arr.type.keys_sorted)
        dense = arr.drop_null()
        if isinstance(dense, pa.ChunkedArray):
            dense = dense.combine_chunks()
        keys, items, lengths = _map_parts(dense)
        kb = encode_frame(
            keys, _list_child_codec(keys), state=_child_state(state, "\x00keys")
        )
        vb = encode_frame(
            items, _list_child_codec(items), state=_child_state(state, "\x00items")
        )
        lb = encode_ints_auto(lengths)
        payload = (
            struct.pack("<II", len(lb), len(kb)) + lb + kb + vb
        )
    else:
        raise TypeError(f"unhandled dtype id {dt}")

    want_compress = compression is not None and len(payload) >= _COMPRESS_MIN_BYTES
    if (
        want_compress
        and state is not None
        and state.get("zlib_skip", 0) >= _COMPRESS_SKIP_AFTER
    ):
        # skip mode: probe every Nth frame so the state can re-arm
        probe = state.get("zlib_probe", 0) + 1
        state["zlib_probe"] = probe
        want_compress = probe % _COMPRESS_REPROBE == 0
    if want_compress:
        if compression == "zlib":
            deflated = zlib.compress(payload, compression_level)
            won_flag = 2
        elif compression == "lzma":
            # cold-tier option: ~always denser than deflate, several
            # times slower — pick per table, not per stripe. preset
            # clamped to lzma's 0-9 range; flag bit 3 marks the frame
            # so mixed-compressor runs decode unambiguously.
            deflated = lzma.compress(
                payload, preset=max(0, min(9, compression_level))
            )
            won_flag = 4
        else:
            raise ValueError(f"unknown compression {compression!r}")
        if len(deflated) < len(payload):
            if state is not None:
                # adaptive: a column whose frames keep gaining <5%
                # (random ints, pre-compressed bytes) stops paying the
                # deflate attempt after _COMPRESS_SKIP_AFTER misses in
                # a row; any real win resets the counter
                if len(deflated) > _COMPRESS_WORTH_RATIO * len(payload):
                    state["zlib_skip"] = state.get("zlib_skip", 0) + 1
                else:
                    state["zlib_skip"] = 0
            payload = deflated
            flags |= won_flag
        elif state is not None:
            state["zlib_skip"] = state.get("zlib_skip", 0) + 1
    pjson = json.dumps(params, separators=(",", ":")).encode() if params else b""
    head = (
        MAGIC
        + struct.pack("<BBBB", VERSION, CODECS[codec], dt, flags)
        + struct.pack("<q", n)
        + struct.pack("<H", len(pjson))
        + pjson
    )
    if has_nulls:
        validity = np.zeros(n, dtype=np.uint8)
        valid_mask = ~np.asarray(arr.is_null())
        validity[valid_mask] = 1
        nullmap = np.packbits(validity, bitorder="little").tobytes()
        head += struct.pack("<I", len(nullmap)) + nullmap
    return head + payload


def decode_frame(blob: bytes) -> pa.Array:
    """Exact inverse of :func:`encode_frame` — bit-identical round trip."""
    if blob[:2] != MAGIC:
        raise ValueError("bad magic")
    ver, codec_id, dt, flags = struct.unpack("<BBBB", blob[2:6])
    (n,) = struct.unpack("<q", blob[6:14])
    (plen,) = struct.unpack("<H", blob[14:16])
    off = 16
    params = json.loads(blob[off : off + plen]) if plen else {}
    off += plen
    valid_mask = None
    n_valid = n
    if flags & 1:
        (nm_len,) = struct.unpack("<I", blob[off : off + 4])
        off += 4
        nullmap = np.frombuffer(blob, dtype=np.uint8, count=nm_len, offset=off)
        off += nm_len
        valid_mask = np.unpackbits(nullmap, bitorder="little", count=n).astype(bool)
        n_valid = int(valid_mask.sum())
    payload = blob[off:]
    if flags & 2:
        payload = zlib.decompress(payload)
    elif flags & 4:
        payload = lzma.decompress(payload)
    codec = CODEC_NAMES[codec_id]

    if dt in _INT_DTS:
        if codec == "raw":
            values = np.frombuffer(payload, dtype="<i8").astype(np.int64)
        else:
            values = decode_ints_auto(payload, n_valid)
        return _build_int_array(values, valid_mask, n, dt, params)
    if dt in (_DT_FLOAT64, _DT_FLOAT32):
        if codec == "alp":
            values = _decode_float_alp(payload, n_valid)
        elif codec == "xorf":
            values = _decode_float_xorf(
                payload, n_valid, 8 if dt == _DT_FLOAT64 else 4
            )
        else:
            np_dt = "<f8" if dt == _DT_FLOAT64 else "<f4"
            values = np.frombuffer(payload, dtype=np_dt)
        return _build_float_array(values, valid_mask, n, dt)
    if dt in _STRING_DTS:
        if codec == "dict":
            lengths, data = _decode_strings_dict(payload, n_valid)
        elif codec == "fsst":
            lengths, data = _decode_strings_fsst(payload, n_valid)
        elif codec == "prefix":
            lengths, data = _decode_strings_prefix(payload, n_valid)
        else:
            lengths, data = _decode_strings_raw(payload, n_valid)
        return _build_string_array(lengths, data, valid_mask, n, dt)
    if dt == _DT_BOOL:
        if codec == "raw":
            values = np.unpackbits(
                np.frombuffer(payload, dtype=np.uint8),
                bitorder="little", count=n_valid,
            ).astype(np.int64)
        else:
            values = decode_ints_auto(payload, n_valid)
        return _build_bool_array(values, valid_mask, n)
    if dt == _DT_DECIMAL128:
        if codec == "raw":
            pairs = np.frombuffer(payload, dtype="<i8")
            lo, hi = pairs[0::2], pairs[1::2]
        else:
            lo = decode_ints_auto(payload, n_valid)
            hi = lo >> 63  # sign extension (verified <= int64 at encode)
        return _build_decimal_array(lo, hi, valid_mask, n, params)
    if dt == _DT_LIST:
        (lb_len,) = struct.unpack("<I", payload[:4])
        lengths = decode_ints_auto(payload[4 : 4 + lb_len], n_valid)
        child = decode_frame(payload[4 + lb_len :])
        full_lengths = _expand_valid(lengths.astype(np.int64), valid_mask, n)
        large = bool(params.get("large"))
        off_dt = np.int64 if large else np.int32
        offsets = np.zeros(n + 1, dtype=off_dt)
        np.cumsum(full_lengths, out=offsets[1:], dtype=off_dt)
        vf = pa.field(
            params.get("field", "item"),
            child.type,
            nullable=params.get("field_nullable", True),
        )
        t = pa.large_list(vf) if large else pa.list_(vf)
        return pa.Array.from_buffers(
            t, n,
            [_arrow_validity(valid_mask, n), pa.py_buffer(offsets.tobytes())],
            children=[child],
            null_count=-1 if valid_mask is not None else 0,
        )
    if dt == _DT_STRUCT:
        (nf,) = struct.unpack("<H", payload[:2])
        pos = 2
        children = []
        for _ in range(nf):
            (blen,) = struct.unpack("<I", payload[pos : pos + 4])
            pos += 4
            children.append(decode_frame(payload[pos : pos + blen]))
            pos += blen
        t = pa.struct(
            [
                pa.field(name, child.type, nullable=bool(nullable))
                for (name, nullable), child in zip(params["fields"], children)
            ]
        )
        return pa.Array.from_buffers(
            t, n,
            [_arrow_validity(valid_mask, n)],
            children=children,
            null_count=-1 if valid_mask is not None else 0,
        )
    if dt == _DT_MAP:
        lb_len, kb_len = struct.unpack("<II", payload[:8])
        pos = 8
        lengths = decode_ints_auto(payload[pos : pos + lb_len], n_valid)
        pos += lb_len
        keys = decode_frame(payload[pos : pos + kb_len])
        pos += kb_len
        items = decode_frame(payload[pos:])
        full_lengths = _expand_valid(lengths.astype(np.int64), valid_mask, n)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(full_lengths, out=offsets[1:], dtype=np.int32)
        t = pa.map_(keys.type, items.type, bool(params.get("keys_sorted")))
        entries = pa.StructArray.from_arrays(
            [keys, items], fields=[t.key_field, t.item_field]
        )
        return pa.Array.from_buffers(
            t, n,
            [_arrow_validity(valid_mask, n), pa.py_buffer(offsets.tobytes())],
            children=[entries],
            null_count=-1 if valid_mask is not None else 0,
        )
    raise TypeError(f"unhandled dtype id {dt}")


def _expand_valid(values: np.ndarray, valid_mask, n: int, fill=0) -> np.ndarray:
    if valid_mask is None:
        return values
    out = np.full(n, fill, dtype=values.dtype)
    out[valid_mask] = values
    return out


def _arrow_validity(valid_mask, n: int):
    if valid_mask is None:
        return None
    return pa.py_buffer(np.packbits(valid_mask.astype(np.uint8), bitorder="little").tobytes())


def _build_int_array(values, valid_mask, n, dt, params):
    full = _expand_valid(values.astype(np.int64), valid_mask, n)
    if dt == _DT_TS_US:
        t = pa.timestamp(params.get("unit", "us"), tz=params.get("tz"))
    elif dt == _DT_INT32:
        t = pa.int32()
        full = full.astype(np.int32)
    elif dt == _DT_DATE32:
        t = pa.date32()
        full = full.astype(np.int32)
    else:
        t = pa.int64()
    buf = pa.py_buffer(full.tobytes())
    return pa.Array.from_buffers(
        t, n, [_arrow_validity(valid_mask, n), buf],
        null_count=-1 if valid_mask is not None else 0,
    )


def _build_float_array(values, valid_mask, n, dt):
    full = _expand_valid(values, valid_mask, n)
    t = pa.float64() if dt == _DT_FLOAT64 else pa.float32()
    return pa.Array.from_buffers(
        t, n, [_arrow_validity(valid_mask, n), pa.py_buffer(full.tobytes())],
        null_count=-1 if valid_mask is not None else 0,
    )


def _build_bool_array(values, valid_mask, n):
    full = _expand_valid(values.astype(np.uint8), valid_mask, n)
    bits = np.packbits(full, bitorder="little")
    return pa.Array.from_buffers(
        pa.bool_(), n,
        [_arrow_validity(valid_mask, n), pa.py_buffer(bits.tobytes())],
        null_count=-1 if valid_mask is not None else 0,
    )


def _build_decimal_array(lo, hi, valid_mask, n, params):
    lo_f = _expand_valid(lo.astype(np.int64), valid_mask, n)
    hi_f = _expand_valid(hi.astype(np.int64), valid_mask, n)
    buf = _interleave_decimal(lo_f, hi_f).astype("<i8").tobytes()
    t = pa.decimal128(params["precision"], params["scale"])
    return pa.Array.from_buffers(
        t, n,
        [_arrow_validity(valid_mask, n), pa.py_buffer(buf)],
        null_count=-1 if valid_mask is not None else 0,
    )


def _build_string_array(lengths, data, valid_mask, n, dt):
    full_lengths = _expand_valid(lengths.astype(np.int64), valid_mask, n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(full_lengths, out=offsets[1:])
    total = int(offsets[-1])
    large = dt in (_DT_LARGE_STRING, _DT_LARGE_BINARY)
    if not large and total > (1 << 31) - 1:
        large = True  # safety upgrade; callers compare values, not types
        dt = _DT_LARGE_STRING if dt == _DT_STRING else _DT_LARGE_BINARY
    if large:
        t = pa.large_string() if dt == _DT_LARGE_STRING else pa.large_binary()
        off_buf = pa.py_buffer(offsets.tobytes())
    else:
        t = pa.string() if dt == _DT_STRING else pa.binary()
        off_buf = pa.py_buffer(offsets.astype(np.int32).tobytes())
    return pa.Array.from_buffers(
        t, n,
        [_arrow_validity(valid_mask, n), off_buf, pa.py_buffer(data)],
        null_count=-1 if valid_mask is not None else 0,
    )


# ------------------------------------------------------------- checksums

def column_checksum(arr: pa.Array) -> str:
    """Representation-independent checksum of a column's logical content.

    Normalizes to (validity bits, value bytes) before hashing so the
    same logical data hashes equal regardless of Arrow buffer layout,
    chunking, offsets, or dictionary encoding. blake2b-64 hex.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    h = hashlib.blake2b(digest_size=8)
    h.update(str(arr.type).encode())
    validity = np.zeros(len(arr), dtype=np.uint8)
    if arr.null_count:
        validity[~np.asarray(arr.is_null())] = 1
    else:
        validity[:] = 1
    h.update(validity.tobytes())
    dt = _dtype_id(arr.type)
    if dt in _INT_DTS:
        vals = _int64_values(arr.drop_null())
        h.update(vals.astype("<i8").tobytes())
    elif dt in (_DT_FLOAT64, _DT_FLOAT32):
        vals = arr.drop_null().to_numpy(zero_copy_only=False)
        h.update(vals.tobytes())
    elif dt in _STRING_DTS:
        lengths, data = _string_parts(arr)
        h.update(lengths.astype("<i8").tobytes())
        h.update(data)
    elif dt == _DT_BOOL:
        vals = arr.drop_null().cast(pa.int64()).to_numpy(zero_copy_only=False)
        h.update(vals.astype("<i8").tobytes())
    elif dt == _DT_DECIMAL128:
        dense = arr.drop_null()
        if isinstance(dense, pa.ChunkedArray):
            dense = dense.combine_chunks()
        lo, hi = _decimal_halves(dense)
        h.update(_interleave_decimal(lo, hi).astype("<i8").tobytes())
    elif dt == _DT_LIST:
        dense = arr.drop_null()
        if isinstance(dense, pa.ChunkedArray):
            dense = dense.combine_chunks()
        lengths = pa.compute.list_value_length(dense).to_numpy(
            zero_copy_only=False
        ).astype("<i8")
        h.update(lengths.tobytes())
        h.update(column_checksum(dense.flatten()).encode())
    elif dt == _DT_STRUCT:
        # flatten() propagates parent nulls into the children — both
        # the pre-encode original and the decoded rebuild hash the same
        # child masks (child values under a null parent are not data)
        for f, child in zip(arr.type, arr.flatten()):
            h.update(f.name.encode())
            h.update(column_checksum(child).encode())
    elif dt == _DT_MAP:
        dense = arr.drop_null()
        if isinstance(dense, pa.ChunkedArray):
            dense = dense.combine_chunks()
        keys, items, lengths = _map_parts(dense)
        h.update(lengths.astype("<i8").tobytes())
        h.update(column_checksum(keys).encode())
        h.update(column_checksum(items).encode())
    else:
        raise TypeError(str(arr.type))
    return h.hexdigest()
