/* Optional C fast path for the FSST greedy tokenizer.
 *
 * Semantically identical to the numpy path in fsst.py (_match_arrays +
 * _greedy_walk): greedy longest-match against per-length direct-address
 * hash tables, escape code 255 for unmatched bytes.
 *
 * Compiled lazily by _native.py with the system cc; everything degrades
 * gracefully to the pure-numpy implementation when no compiler exists.
 */
#include <stdint.h>
#include <string.h>

#define HT_BITS 10
#define HT_SIZE (1u << HT_BITS)
#define MAX_SYM_LEN 8
#define ESCAPE 255
#define MULT 0x9E3779B97F4A7C15ULL
#define KEY_SENTINEL 0xFFFFFFFFFFFFFFFFULL

/* Tokenize buf[0..n) greedily.
 * ht_key / ht_code: 8 concatenated tables, one per symbol length 1..8;
 *   table for length L occupies [(L-1)*HT_SIZE, L*HT_SIZE).
 * len_mask: bit L-1 set iff any symbol of length L exists.
 * out_codes: >= n bytes.  out_lits: >= n bytes.  out_starts: >= n
 * entries or NULL.  Returns token count; *n_lits_out receives the
 * number of literals. */
long fsst_tokenize(const uint8_t *buf, long n,
                   const uint64_t *ht_key, const int64_t *ht_code,
                   unsigned len_mask,
                   uint8_t *out_codes, uint8_t *out_lits,
                   long *n_lits_out, int64_t *out_starts)
{
    long pos = 0, n_tok = 0, n_lit = 0;
    int max_len = 0, min_len = 9;
    for (int l = MAX_SYM_LEN; l >= 1; l--)
        if (len_mask & (1u << (l - 1))) { if (!max_len) max_len = l; min_len = l; }
    if (!max_len) { /* no symbols: everything escapes */
        memcpy(out_lits, buf, (size_t)n);
        memset(out_codes, ESCAPE, (size_t)n);
        if (out_starts)
            for (long i = 0; i < n; i++) out_starts[i] = i;
        *n_lits_out = n;
        return n;
    }
    long n_full = n - MAX_SYM_LEN; /* positions with 8 readable bytes */
    while (pos < n) {
        if (out_starts) out_starts[n_tok] = pos;
        /* big-endian 8-byte key at pos, zero-padded past the end */
        uint64_t key8;
        int lim;
        if (pos <= n_full) {
            /* one unaligned load + byteswap instead of 8 shifts */
            uint64_t raw;
            memcpy(&raw, buf + pos, 8);
            key8 = __builtin_bswap64(raw);
            lim = MAX_SYM_LEN;
        } else {
            key8 = 0;
            lim = (int)(n - pos);
            for (int j = 0; j < lim; j++)
                key8 |= (uint64_t)buf[pos + j] << (8 * (MAX_SYM_LEN - 1 - j));
        }
        int matched = 0;
        int top = lim < max_len ? lim : max_len;
        for (int l = top; l >= min_len; l--) {
            if (!(len_mask & (1u << (l - 1)))) continue;
            uint64_t k = key8 >> (8 * (MAX_SYM_LEN - l));
            uint64_t slot = (k * MULT) >> (64 - HT_BITS);
            const uint64_t *tk = ht_key + (size_t)(l - 1) * HT_SIZE;
            /* k == KEY_SENTINEL (an all-0xFF 8-gram) must not match an
             * empty slot whose key is the sentinel. */
            if (tk[slot] == k && k != KEY_SENTINEL) {
                out_codes[n_tok++] = (uint8_t)ht_code[(size_t)(l - 1) * HT_SIZE + slot];
                pos += l;
                matched = 1;
                break;
            }
        }
        if (!matched) {
            out_codes[n_tok++] = ESCAPE;
            out_lits[n_lit++] = buf[pos++];
        }
    }
    *n_lits_out = n_lit;
    return n_tok;
}

/* Decode a token stream. sym_flat: 256*8 bytes (symbol bytes, left-
 * aligned); sym_len: 256 entries. out must have 8 bytes of slack past
 * the true output size (we always store 8 bytes per symbol token).
 * Returns bytes written. */
long fsst_decode(const uint8_t *codes, long n_codes, const uint8_t *lits,
                 const uint8_t *sym_flat, const uint8_t *sym_len,
                 uint8_t *out)
{
    long o = 0, li = 0;
    for (long i = 0; i < n_codes; i++) {
        unsigned c = codes[i];
        if (c == ESCAPE) {
            out[o++] = lits[li++];
        } else {
            memcpy(out + o, sym_flat + (size_t)c * 8, 8);
            o += sym_len[c];
        }
    }
    return o;
}
