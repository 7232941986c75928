"""Deterministic synthetic Common-Crawl-style web table (FIXTURES.md F1).

Seed-42 generation of (url, warc_ts, html, text, lang) with Zipf host
skew, Zipf token text, timestamp runs, and host-clustered ordering so
the skew machinery has something real to defuse. Pure numpy/arrow —
generated in the driver (or per-partition for large scales) and
handed to Spark via Arrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEED = 42
N_HOSTS = 1000
VOCAB_SIZE = 50_000
LANGS = ["en", "de", "fr", "es", "zh", "ru", "pt", "ja", "other"]
LANG_P = [0.55, 0.08, 0.07, 0.07, 0.06, 0.05, 0.05, 0.04, 0.03]
TS_BASE_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
TS_RANGE_S = 90 * 86_400


def _zipf_choice(rng: np.random.Generator, n_items: int, size: int, a: float) -> np.ndarray:
    """Zipf-distributed indices in [0, n_items) (rejection-free: use
    normalized harmonic weights — exact and fast for moderate n_items)."""
    ranks = np.arange(1, n_items + 1, dtype=np.float64)
    w = ranks**-a
    w /= w.sum()
    return rng.choice(n_items, size=size, p=w)


def _vocab() -> np.ndarray:
    # deterministic pseudo-words: base26 of the index, 3..9 chars
    letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)
    rng = np.random.default_rng(SEED)
    lens = rng.integers(3, 10, VOCAB_SIZE)
    total = int(lens.sum())
    chars = letters[rng.integers(0, 26, total)]
    offs = np.concatenate(([0], np.cumsum(lens)))
    flat = chars.tobytes()
    return np.array([flat[offs[i] : offs[i + 1]] for i in range(VOCAB_SIZE)], dtype=object)


def generate(
    n_rows: int, seed: int = SEED, with_html: bool = True, id_offset: int = 0
) -> pa.Table:
    """Generate the F1 webpages table, ordered by (host, url).

    ``id_offset`` shifts the unique path component so distributed
    generation (one generate() per partition) yields globally unique
    urls."""
    rng = np.random.default_rng(seed)
    host_idx = _zipf_choice(rng, N_HOSTS, n_rows, a=1.3)
    # cluster by host (sorted), keep row index as the unique path
    order = np.argsort(host_idx, kind="stable")
    host_idx = host_idx[order]
    row_ids = np.arange(id_offset, id_offset + n_rows)[order]

    hosts = np.array([f"www.site{h:04d}.example" for h in range(N_HOSTS)], dtype=object)
    urls = np.array(
        [f"https://{hosts[h]}/p/{i:08d}" for h, i in zip(host_idx, row_ids)],
        dtype=object,
    )

    ts = TS_BASE_US + rng.integers(0, TS_RANGE_S, n_rows) * 1_000_000
    snap = rng.random(n_rows) < 0.05
    snap[0] = False
    idx = np.arange(n_rows)
    keep = np.where(snap, 0, idx)  # 5% snap to previous row's value
    np.maximum.accumulate(keep, out=keep)
    ts = ts[keep]

    # text: Zipf tokens, deterministic per url (seeded by row id)
    vocab = _vocab()
    n_tok = rng.integers(20, 220, n_rows)
    empty = rng.random(n_rows) < 0.02
    n_tok[empty] = 0
    tok_total = int(n_tok.sum())
    tok_ids = _zipf_choice(rng, VOCAB_SIZE, tok_total, a=1.2)
    tok_offs = np.concatenate(([0], np.cumsum(n_tok)))
    texts = np.empty(n_rows, dtype=object)
    for i in range(n_rows):
        texts[i] = b" ".join(vocab[tok_ids[tok_offs[i] : tok_offs[i + 1]]]).decode()

    lang = rng.choice(len(LANGS), n_rows, p=LANG_P)
    langs = np.array(LANGS, dtype=object)[lang]

    cols = {
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(ts, type=pa.timestamp("us")),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    }
    if with_html:
        htmls = np.empty(n_rows, dtype=object)
        for i in range(n_rows):
            body = texts[i].encode()
            htmls[i] = (
                b"<html><head><title>" + urls[i].encode() + b"</title></head><body>"
                + body + b"</body></html>"
            )
        cols["html"] = pa.array(htmls, type=pa.binary())
    names = ["url", "warc_ts", "html", "text", "lang"] if with_html else [
        "url", "warc_ts", "text", "lang"
    ]
    return pa.table({k: cols[k] for k in names})


def generate_spark(spark, n_rows: int, seed: int = SEED, with_html: bool = True):
    """Spark DataFrame of the synthetic table (driver-generated)."""
    return spark.createDataFrame(generate(n_rows, seed, with_html).to_pandas())


def generate_distributed(
    spark, n_rows: int, n_partitions: int = 32, seed: int = SEED,
    with_html: bool = True,
):
    """Distributed synthetic web table: each partition generates its
    slice independently with a derived seed, so the table scales to
    arbitrary row counts without driver memory (the 10^12-row story:
    generation is mapInArrow over a range, embarrassingly parallel).

    Rows differ from the driver-side generate() (independent streams)
    but follow the same distributions; determinism holds per
    (n_rows, n_partitions, seed).
    """
    import pyarrow as pa

    per = -(-n_rows // n_partitions)

    def fn(batches):
        for batch in batches:
            for pid in batch.column("id").to_pylist():
                lo = pid * per
                hi = min(n_rows, lo + per)
                if hi <= lo:
                    continue
                tbl = generate(
                    hi - lo, seed=seed + 1 + pid, with_html=with_html, id_offset=lo
                )
                for rb in tbl.to_batches():
                    yield rb

    schema = generate(1, with_html=with_html).schema
    parts = spark.range(0, n_partitions, 1, n_partitions).toDF("id")
    fields = ", ".join(
        f"{f.name} {'binary' if f.type == pa.binary() else 'timestamp' if pa.types.is_timestamp(f.type) else 'string'}"
        for f in schema
    )
    return parts.mapInArrow(fn, fields)
