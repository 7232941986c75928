"""FSST-style string compression (Fast Static Symbol Table).

Semantics derive from the public FSST paper (VLDB 2020, PAPERS.md): a
table of at most 255 symbols of 1..8 bytes, greedy longest-match
encoding, one escape code for bytes not covered by any symbol.

Deviations from the paper's bitstream (documented; we reproduce the
*capability*, not the file format — SURVEY.md §2.2):

- The token stream is split into a ``codes`` stream (one byte per
  token; 255 = escape) and a separate ``literals`` stream holding the
  escaped bytes, instead of interleaving them. This keeps both encode
  and decode numpy-vectorizable (decode is a single gather).
- Compression is applied to the concatenated column buffer; per-string
  boundaries are restored from the (separately encoded) length vector.

Training is the paper's iterative bottom-up scheme: start from single
bytes, repeatedly re-compress a sample with the current table, count
gains of used symbols and of adjacent-token concatenations (truncated
to 8 bytes), keep the top-255 by ``count * len(symbol)``.

All hot paths are numpy; the only scalar loop is the greedy
longest-match walk (one iteration per emitted token).
"""

from __future__ import annotations

import struct

import numpy as np

MAX_SYMBOLS = 255  # code 255 is the escape marker
MAX_SYM_LEN = 8
ESCAPE = 255
_TRAIN_SAMPLE = 1 << 16
_TRAIN_ROUNDS = 3
_CHUNK = 1 << 20  # matcher chunk size (bounds temp memory)


_HASH_MULT = np.uint64(0x9E3779B97F4A7C15)
_HT_BITS = 12
_HT_SIZE = 1 << _HT_BITS


_KEY_SENTINEL = 0xFFFFFFFFFFFFFFFF


class SymbolTable:
    __slots__ = ("symbols", "_by_len", "_native")

    def __init__(self, symbols: list[bytes]):
        if len(symbols) > MAX_SYMBOLS:
            raise ValueError("too many symbols")
        self.symbols = symbols
        # Matcher: per symbol length, a direct-address hash table of
        # (gram key, code) keyed by multiplicative-hash(key). A collision
        # (or a key equal to the empty-slot sentinel) simply drops that
        # symbol from the *matcher* — it still decodes fine, we just
        # never emit it (compression cost only, never correctness).
        by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for code, s in enumerate(symbols):
            key = _gram_key(s)
            if key == _KEY_SENTINEL:
                continue
            entry = by_len.get(len(s))
            if entry is None:
                entry = by_len[len(s)] = (
                    np.full(_HT_SIZE, _KEY_SENTINEL, dtype=np.uint64),
                    np.zeros(_HT_SIZE, dtype=np.int64),
                )
            ht_key, ht_code = entry
            slot = ((key * 0x9E3779B97F4A7C15) % (1 << 64)) >> (64 - _HT_BITS)
            if ht_key[slot] == _KEY_SENTINEL:
                ht_key[slot] = key
                ht_code[slot] = code
        self._by_len = by_len
        self._native = None  # lazily-built concatenated tables for the C path

    def serialize(self) -> bytes:
        lens = bytes(len(s) for s in self.symbols)
        return struct.pack("<H", len(self.symbols)) + lens + b"".join(self.symbols)

    @classmethod
    def deserialize(cls, data: bytes) -> tuple["SymbolTable", int]:
        (n,) = struct.unpack("<H", data[:2])
        lens = data[2 : 2 + n]
        off = 2 + n
        syms = []
        for ln in lens:
            syms.append(data[off : off + ln])
            off += ln
        return cls(syms), off


def _gram_key(s: bytes) -> int:
    """Big-endian integer key of a 1..8 byte gram."""
    return int.from_bytes(s, "big")


def _gram_keys(buf: np.ndarray, ln: int) -> np.ndarray:
    """Vectorized big-endian keys of every ln-gram of ``buf`` (uint8)."""
    n = len(buf)
    if n < ln:
        return np.zeros(0, dtype=np.uint64)
    k = _rolling_key8(buf)[: n - ln + 1]
    return k >> np.uint64(8 * (MAX_SYM_LEN - ln))


def _rolling_key8(buf: np.ndarray) -> np.ndarray:
    """8-byte big-endian key at every position (zero-padded past the end).

    One pass of 8 shift-or ops; every shorter gram key is derived from
    this by a right shift, so the matcher touches each byte O(1) times.
    """
    n = len(buf)
    padded = np.concatenate((buf, np.zeros(MAX_SYM_LEN, dtype=np.uint8)))
    out = np.zeros(n, dtype=np.uint64)
    for j in range(MAX_SYM_LEN):
        out |= padded[j : j + n].astype(np.uint64) << np.uint64(
            8 * (MAX_SYM_LEN - 1 - j)
        )
    return out


def _match_arrays(buf: np.ndarray, table: SymbolTable) -> tuple[np.ndarray, np.ndarray]:
    """Per-position (longest-match length, code); length 0 = no match.

    Processes in chunks so temp arrays stay bounded regardless of
    stripe size.
    """
    n = len(buf)
    mlen = np.zeros(n, dtype=np.int64)
    mcode = np.zeros(n, dtype=np.int64)
    if not table.symbols or n == 0:
        return mlen, mcode
    lens_desc = sorted(table._by_len, reverse=True)
    shift_idx = np.uint64(64 - _HT_BITS)
    for start in range(0, n, _CHUNK):
        stop = min(n, start + _CHUNK)
        ext = min(n, stop + MAX_SYM_LEN - 1)
        m = stop - start
        k8 = _rolling_key8(buf[start:ext])[:m]
        cm_len = np.zeros(m, dtype=np.int64)
        cm_code = np.zeros(m, dtype=np.int64)
        local_last = n - start  # position p may match ln only if p+ln <= local_last
        # `active`: positions still unmatched, compacted so each shorter-
        # length pass only touches what the longer passes left behind.
        active = np.arange(m, dtype=np.int64)
        k8a = k8
        for ln in lens_desc:
            ht_key, ht_code = table._by_len[ln]
            gk = k8a >> np.uint64(8 * (MAX_SYM_LEN - ln))
            slot = ((gk * _HASH_MULT) >> shift_idx).astype(np.int64)
            hit = ht_key[slot] == gk
            if ln == MAX_SYM_LEN:
                # an all-0xFF 8-gram equals the empty-slot sentinel
                hit &= gk != np.uint64(_KEY_SENTINEL)
            if ln > 1 and local_last < m + ln:
                hit &= active <= local_last - ln
            if hit.any():
                pos = active[hit]
                cm_len[pos] = ln
                cm_code[pos] = ht_code[slot[hit]]
                keep = ~hit
                active = active[keep]
                k8a = k8a[keep]
            if len(active) == 0:
                break
        mlen[start:stop] = cm_len
        mcode[start:stop] = cm_code
    return mlen, mcode


def _greedy_walk(
    mlen: np.ndarray, mcode: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy longest-match scan over the per-position match arrays.

    The chain pos -> pos + match_len[pos] is inherently sequential; this
    is the single scalar loop in the codec, and it only appends token
    start positions (codes and literals are derived vectorized after).

    Returns (codes uint8, literal_positions, token_starts).
    """
    n = len(mlen)
    if n == 0:
        return (
            np.zeros(0, dtype=np.uint8),
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
        )
    ml = mlen.tolist()
    starts_list: list[int] = []
    append = starts_list.append
    pos = 0
    while pos < n:
        append(pos)
        ln = ml[pos]
        pos += ln if ln else 1
    tok_starts = np.array(starts_list, dtype=np.int64)
    lens_at = mlen[tok_starts]
    is_escape = lens_at == 0
    codes = np.where(is_escape, ESCAPE, mcode[tok_starts]).astype(np.uint8)
    lits = tok_starts[is_escape]
    return codes, lits, tok_starts


def _compress_tokens(buf: np.ndarray, table: SymbolTable):
    mlen, mcode = _match_arrays(buf, table)
    return _greedy_walk(mlen, mcode)


def train(sample: bytes, rounds: int = _TRAIN_ROUNDS) -> SymbolTable:
    """Iterative bottom-up symbol-table construction (FSST paper §3)."""
    sample = sample[:_TRAIN_SAMPLE]
    buf = np.frombuffer(sample, dtype=np.uint8)
    table = SymbolTable([])
    if len(buf) == 0:
        return table
    for _ in range(rounds):
        codes, lit_pos, starts = _compress_tokens(buf, table)
        n_tok = len(starts)
        tok_lens = np.diff(np.concatenate((starts, [len(buf)])))
        gains: dict[bytes, int] = {}
        # Gain of symbols as used this round (count * len).
        if table.symbols:
            cnt = np.bincount(codes, minlength=256)
            for code, s in enumerate(table.symbols):
                if cnt[code]:
                    gains[s] = gains.get(s, 0) + int(cnt[code]) * len(s)
        # Single escaped bytes are always candidates.
        if len(lit_pos):
            vals, cnts = np.unique(buf[lit_pos], return_counts=True)
            for v, c in zip(vals.tolist(), cnts.tolist()):
                b = bytes([v])
                gains[b] = gains.get(b, 0) + int(c)
        # Concatenations of adjacent tokens, truncated to 8 bytes.
        if n_tok > 1:
            pair_start = starts[:-1]
            pair_len = np.minimum(tok_lens[:-1] + tok_lens[1:], MAX_SYM_LEN)
            # Key = (len, 8-byte window value masked to len) for vectorized
            # unique-counting; decode keys back to bytes after.
            padded = np.concatenate((buf, np.zeros(MAX_SYM_LEN, dtype=np.uint8)))
            win8 = _gram_keys(padded, MAX_SYM_LEN)[pair_start]
            shift = (np.uint64(8) * (MAX_SYM_LEN - pair_len).astype(np.uint64))
            keyval = win8 >> shift
            short = pair_len < MAX_SYM_LEN  # len fits in top byte w/o collision
            combo = (pair_len[short].astype(np.uint64) << np.uint64(56)) | keyval[short]
            uq, cnts = np.unique(combo, return_counts=True)
            for k, c in zip(uq.tolist(), cnts.tolist()):
                ln = k >> 56
                b = int(k & ((1 << 56) - 1)).to_bytes(8, "big")[-ln:]
                gains[b] = gains.get(b, 0) + int(c) * ln
            # Length-8 candidates counted separately (full 64-bit keys).
            uq8, cnt8 = np.unique(win8[~short], return_counts=True)
            for k, c in zip(uq8.tolist(), cnt8.tolist()):
                b = int(k).to_bytes(8, "big")
                gains[b] = gains.get(b, 0) + int(c) * MAX_SYM_LEN
        # Keep top candidates by gain.
        ranked = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))
        table = SymbolTable([s for s, _ in ranked[:MAX_SYMBOLS]])
    return table


def _tokenize_native(buf: np.ndarray, table: SymbolTable):
    """C fast path; semantically identical to _compress_tokens."""
    from . import _native

    lib = _native.get_lib()
    if lib is None or len(buf) == 0:
        return None
    if table._native is None:
        ht_key = np.full(MAX_SYM_LEN * _HT_SIZE, _KEY_SENTINEL, dtype=np.uint64)
        ht_code = np.zeros(MAX_SYM_LEN * _HT_SIZE, dtype=np.int64)
        mask = 0
        for ln, (k, c) in table._by_len.items():
            ht_key[(ln - 1) * _HT_SIZE : ln * _HT_SIZE] = k
            ht_code[(ln - 1) * _HT_SIZE : ln * _HT_SIZE] = c
            mask |= 1 << (ln - 1)
        table._native = (ht_key, ht_code, mask)
    ht_key, ht_code, mask = table._native
    import ctypes

    n = len(buf)
    out_codes = np.empty(n, dtype=np.uint8)
    out_lits = np.empty(n, dtype=np.uint8)
    n_lits = ctypes.c_long(0)
    n_tok = lib.fsst_tokenize(
        buf.ctypes.data,
        n,
        ht_key.ctypes.data,
        ht_code.ctypes.data,
        mask,
        out_codes.ctypes.data,
        out_lits.ctypes.data,
        ctypes.byref(n_lits),
    )
    return out_codes[:n_tok], out_lits[: n_lits.value].tobytes()


def compress(data: bytes, table: SymbolTable | None = None) -> bytes:
    """Compress ``data``; payload = table + codes stream + literals."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if table is None:
        table = train(data)
    native = _tokenize_native(buf, table) if len(buf) else None
    if native is not None:
        codes, literals = native
    else:
        codes, lit_pos, _ = _compress_tokens(buf, table)
        literals = buf[lit_pos].tobytes()
    tbl = table.serialize()
    header = struct.pack("<QQ", len(codes), len(literals))
    return tbl + header + codes.tobytes() + literals


def decompress(payload: bytes) -> bytes:
    """Decode a token stream (C fast path, numpy gather fallback)."""
    table, off = SymbolTable.deserialize(payload)
    n_codes, n_lit = struct.unpack("<QQ", payload[off : off + 16])
    off += 16
    codes = np.frombuffer(payload, dtype=np.uint8, count=n_codes, offset=off)
    literals = np.frombuffer(
        payload, dtype=np.uint8, count=n_lit, offset=off + n_codes
    )
    if n_codes == 0:
        return b""

    from . import _native

    lib = _native.get_lib()
    if lib is not None:
        sym_flat = np.zeros((256, MAX_SYM_LEN), dtype=np.uint8)
        sym_len8 = np.zeros(256, dtype=np.uint8)
        for code, s in enumerate(table.symbols):
            sym_flat[code, : len(s)] = np.frombuffer(s, dtype=np.uint8)
            sym_len8[code] = len(s)
        counts = np.bincount(codes, minlength=256)
        out_total = int(counts @ np.where(np.arange(256) == ESCAPE, 1, sym_len8))
        out = np.empty(out_total + MAX_SYM_LEN, dtype=np.uint8)  # 8B slack
        wrote = lib.fsst_decode(
            codes.ctypes.data,
            len(codes),
            literals.ctypes.data,
            sym_flat.ctypes.data,
            sym_len8.ctypes.data,
            out.ctypes.data,
        )
        return out[:wrote].tobytes()

    # Numpy fallback: one gather over a flattened symbol table, with the
    # gather index built by a cumsum trick (np.repeat over millions of
    # tiny segments is far slower).
    sym_lens = np.zeros(256, dtype=np.int64)
    sym_off = np.zeros(256, dtype=np.int64)
    flat_parts = []
    cursor = 0
    for code, s in enumerate(table.symbols):
        sym_lens[code] = len(s)
        sym_off[code] = cursor
        flat_parts.append(np.frombuffer(s, dtype=np.uint8))
        cursor += len(s)
    flat = (
        np.concatenate(flat_parts + [literals]) if flat_parts else literals.copy()
    )
    tok_len = sym_lens[codes]
    tok_src = sym_off[codes]
    esc = codes == ESCAPE
    tok_len[esc] = 1
    tok_src[esc] = cursor + np.arange(int(esc.sum()), dtype=np.int64)
    out_total = int(tok_len.sum())
    out_off = np.cumsum(tok_len) - tok_len  # start offset of each token
    # idx steps by +1 inside a token; at each token start it jumps to
    # tok_src[t]. Encode the jumps as deltas and cumsum.
    d = np.ones(out_total, dtype=np.int64)
    if len(tok_len) > 1:
        d[out_off[1:]] += tok_src[1:] - (tok_src[:-1] + tok_len[:-1])
    d[0] = tok_src[0]
    idx = np.cumsum(d)
    return flat[idx].tobytes()
