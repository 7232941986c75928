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
_HT_BITS = 10
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


def _compress_tokens(buf: np.ndarray, table: SymbolTable, want_starts: bool = False):
    """(codes uint8, literal bytes, token_starts|None) — native C path
    when available, numpy otherwise (identical token streams)."""
    native = _tokenize_native(buf, table, want_starts)
    if native is not None:
        return native
    mlen, mcode = _match_arrays(buf, table)
    codes, lit_pos, starts = _greedy_walk(mlen, mcode)
    return codes, buf[lit_pos].tobytes(), (starts if want_starts else None)


def _as_u8(data) -> np.ndarray:
    """bytes | ndarray | arrow buffer -> uint8 view (no copy)."""
    if isinstance(data, np.ndarray):
        return data.view(np.uint8)
    return np.frombuffer(data, dtype=np.uint8)


def train(sample, rounds: int = _TRAIN_ROUNDS) -> SymbolTable:
    """Iterative bottom-up symbol-table construction (FSST paper §3)."""
    buf = _as_u8(sample)[:_TRAIN_SAMPLE]
    table = SymbolTable([])
    if len(buf) == 0:
        return table
    for _ in range(rounds):
        codes, literals, starts = _compress_tokens(buf, table, want_starts=True)
        n_tok = len(starts)
        tok_lens = np.diff(np.concatenate((starts, [len(buf)])))
        # Candidates as parallel arrays: combo key = (len << 56) | value
        # for len < 8, plus a separate full-64-bit class for len == 8.
        combos: list[np.ndarray] = []
        gains: list[np.ndarray] = []
        combos8: list[np.ndarray] = []
        gains8: list[np.ndarray] = []
        # Gain of symbols as used this round (count * len).
        if table.symbols:
            cnt = np.bincount(codes, minlength=256)
            for code, s in enumerate(table.symbols):
                if cnt[code]:
                    k = _gram_key(s)
                    g = np.array([int(cnt[code]) * len(s)], dtype=np.int64)
                    if len(s) == MAX_SYM_LEN:
                        combos8.append(np.array([k], dtype=np.uint64))
                        gains8.append(g)
                    else:
                        combos.append(
                            np.array([(len(s) << 56) | k], dtype=np.uint64)
                        )
                        gains.append(g)
        # Single escaped bytes are always candidates.
        lit_arr = np.frombuffer(literals, dtype=np.uint8)
        if len(lit_arr):
            vals, cnts = np.unique(lit_arr, return_counts=True)
            combos.append((np.uint64(1) << np.uint64(56)) | vals.astype(np.uint64))
            gains.append(cnts.astype(np.int64))
        # Concatenations of adjacent tokens, truncated to 8 bytes.
        if n_tok > 1:
            pair_start = starts[:-1]
            pair_len = np.minimum(tok_lens[:-1] + tok_lens[1:], MAX_SYM_LEN)
            padded = np.concatenate((buf, np.zeros(MAX_SYM_LEN, dtype=np.uint8)))
            win8 = _gram_keys(padded, MAX_SYM_LEN)[pair_start]
            shift = np.uint64(8) * (MAX_SYM_LEN - pair_len).astype(np.uint64)
            keyval = win8 >> shift
            short = pair_len < MAX_SYM_LEN
            combo = (pair_len[short].astype(np.uint64) << np.uint64(56)) | keyval[short]
            uq, cnts = np.unique(combo, return_counts=True)
            combos.append(uq)
            gains.append(cnts.astype(np.int64) * (uq >> np.uint64(56)).astype(np.int64))
            uq8, cnt8 = np.unique(win8[~short], return_counts=True)
            combos8.append(uq8)
            gains8.append(cnt8.astype(np.int64) * MAX_SYM_LEN)

        # Merge duplicate candidates, take top-MAX_SYMBOLS by gain.
        def _merge(cs, gs):
            if not cs:
                return np.zeros(0, np.uint64), np.zeros(0, np.int64)
            c = np.concatenate(cs)
            g = np.concatenate(gs)
            uq, inv = np.unique(c, return_inverse=True)
            return uq, np.bincount(inv, weights=g).astype(np.int64)

        c_lo, g_lo = _merge(combos, gains)
        c_8, g_8 = _merge(combos8, gains8)
        all_g = np.concatenate((g_lo, g_8))
        all_is8 = np.concatenate(
            (np.zeros(len(g_lo), bool), np.ones(len(g_8), bool))
        )
        all_c = np.concatenate((c_lo, c_8))
        if len(all_g) > MAX_SYMBOLS:
            top = np.argpartition(-all_g, MAX_SYMBOLS)[:MAX_SYMBOLS]
        else:
            top = np.arange(len(all_g))
        # Deterministic order: gain desc, then (len, key) asc.
        sel_len = np.where(
            all_is8[top], MAX_SYM_LEN, (all_c[top] >> np.uint64(56)).astype(np.int64)
        )
        sel_key = np.where(
            all_is8[top], all_c[top], all_c[top] & np.uint64((1 << 56) - 1)
        )
        order = np.lexsort((sel_key, sel_len, -all_g[top]))
        syms = [
            int(k).to_bytes(8, "big")[-int(ln):]
            for k, ln in zip(sel_key[order].tolist(), sel_len[order].tolist())
        ]
        table = SymbolTable(syms)
    return table


def _tokenize_native(buf: np.ndarray, table: SymbolTable, want_starts: bool = False):
    """C fast path; emits the same token stream as the numpy matcher."""
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
    out_starts = np.empty(n, dtype=np.int64) if want_starts else None
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
        out_starts.ctypes.data if want_starts else None,
    )
    return (
        out_codes[:n_tok],
        out_lits[: n_lits.value].tobytes(),
        out_starts[:n_tok] if want_starts else None,
    )


def compress(data, table: SymbolTable | None = None) -> bytes:
    """Compress ``data`` (bytes or uint8 ndarray); payload = table +
    codes stream + literals."""
    buf = _as_u8(data)
    if table is None:
        table = train(data)
    if len(buf):
        codes, literals, _ = _compress_tokens(buf, table)
    else:
        codes, literals = np.zeros(0, dtype=np.uint8), b""
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
