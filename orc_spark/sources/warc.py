"""WARC / WET source + sink (ISO 28500, the Common-Crawl formats).

The north rule's input is "Common-Crawl-style web pages"; crawls ship
as WARC (`response` records: HTTP envelope + raw html) and WET
(`conversion` records: extracted text). This module admits both into
the canonical (url, warc_ts, html|text) table and exports back out,
so a crawl corpus flows straight into `encode` without a parquet
detour (reference parity: the reference orchestrator is data-plane
free — config.go/runner.go dispatch only; the WARC grammar here is
from the public ISO 28500 / WARC 1.0 spec and the Common-Crawl
per-record-gzip convention, not from any reference code).

Scale notes
- Read side: `spark.read.format("binaryFile")` gives ONE task per
  WARC file with the bytes as a single cell — the Common-Crawl
  convention is ~1 GB per file, so task memory is bounded by the
  file, and a 100 TB crawl parallelizes across its ~100k files.
  Parsing is bytes-slicing inside `mapInPandas` (Arrow-batched; Spark
  has no WARC reader, so this is the sanctioned Python hop), and the
  html/text blocks move driver-free from file bytes to stripe encode.
- Write side: one WARC file per input partition via `mapInPandas`,
  records gzipped as independent members (the CC layout, which lets
  a remote range-request decompress one record). No shuffle either
  direction.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import zlib
from datetime import datetime, timezone
from typing import Iterable, Iterator

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"
_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"


# ---------------------------------------------------------------- format


def _record_id(url: str, ts: datetime) -> str:
    """Deterministic WARC-Record-ID (uuid-shaped md5 of url+ts) so a
    re-export of the same table is byte-identical (resume-friendly)."""
    h = hashlib.md5(
        (url + "\x00" + ts.strftime(_DATE_FMT)).encode()
    ).hexdigest()
    return (
        f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def _fmt_date(ts) -> str:
    if hasattr(ts, "to_pydatetime"):
        ts = ts.to_pydatetime()
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    return ts.strftime(_DATE_FMT)


def format_warc(
    records: Iterable[tuple[str, object, bytes]],
    kind: str = "response",
    gzip_records: bool = True,
) -> bytes:
    """Serialize (url, warc_ts, payload) triples into WARC file bytes.

    ``kind="response"`` wraps the payload in an HTTP/1.1 200 envelope
    (the crawl shape); ``kind="conversion"`` writes WET-style plain
    blocks. Each record is its own gzip member when ``gzip_records``
    (the Common-Crawl convention)."""
    if kind not in ("response", "conversion"):
        raise ValueError(f"unsupported WARC record kind: {kind!r}")
    out = io.BytesIO()
    for url, ts, payload in records:
        if payload is None:
            raise ValueError(f"null payload for {url!r} — filter first")
        if kind == "response":
            block = (
                b"HTTP/1.1 200 OK" + _CRLF
                + b"Content-Type: text/html; charset=UTF-8" + _CRLF
                + b"Content-Length: " + str(len(payload)).encode() + _CRLF
                + _CRLF + payload
            )
            ctype = b"application/http; msgtype=response"
        else:
            block = payload
            ctype = b"text/plain"
        date = _fmt_date(ts)
        rec = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: " + kind.encode() + _CRLF
            + b"WARC-Record-ID: " + _record_id(url, _parse_date(date)).encode() + _CRLF
            + b"WARC-Date: " + date.encode() + _CRLF
            + b"WARC-Target-URI: " + url.encode() + _CRLF
            + b"Content-Type: " + ctype + _CRLF
            + b"Content-Length: " + str(len(block)).encode() + _CRLF
            + _CRLF + block + _SEP
        )
        out.write(gzip.compress(rec, 6, mtime=0) if gzip_records else rec)
    return out.getvalue()


# ----------------------------------------------------------------- parse


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated-gzip-member decompression (the CC layout)."""
    buf = bytearray()
    rest = data
    while rest:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        buf += d.decompress(rest)
        buf += d.flush()
        if d.unused_data == rest:  # no progress — corrupt trailer
            raise ValueError("corrupt gzip member in WARC file")
        rest = d.unused_data
    return bytes(buf)


def _parse_date(s: str) -> datetime:
    # WARC-Date is UTC Zulu; tolerate fractional seconds (1.1 allows)
    s = s.strip()
    if "." in s and s.endswith("Z"):
        head, frac = s[:-1].split(".", 1)
        dt = datetime.strptime(head, "%Y-%m-%dT%H:%M:%S")
        return dt.replace(microsecond=int((frac + "000000")[:6]))
    return datetime.strptime(s, _DATE_FMT)


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield every record of one WARC file as
    ``{"kind", "url", "warc_ts", "block"}``.

    Strict ISO 28500 framing: version line, header lines to a blank
    line, exactly Content-Length block bytes, CRLF CRLF trailer. A
    truncated or unframed file raises rather than yielding a partial
    tail (corrupt crawl shards must surface, not shrink)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(_CRLF, pos):  # inter-record padding
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC version line at byte {pos}")
        hdr_end = data.find(_SEP, pos)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header")
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing Content-Length") from None
        bstart = hdr_end + 4
        if bstart + clen > n:
            raise ValueError("truncated WARC block")
        yield {
            "kind": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri"),
            "warc_ts": _parse_date(headers["warc-date"])
            if "warc-date" in headers else None,
            "block": data[bstart : bstart + clen],
        }
        pos = bstart + clen


def _http_payload(block: bytes) -> bytes:
    """Payload of an HTTP response block (after the header CRLFCRLF)."""
    i = block.find(_SEP)
    if i < 0 or not block.startswith(b"HTTP/"):
        raise ValueError("response record block is not an HTTP message")
    return block[i + 4 :]


# ------------------------------------------------------------ spark side


def _read_records(spark, path: str, kind: str, payload_name: str, decode_text: bool):
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType(), True),
            StructField("warc_ts", TimestampType(), True),
            StructField(
                payload_name,
                StringType() if decode_text else BinaryType(),
                True,
            ),
        ]
    )

    def fn(batches):
        for pdf in batches:
            for raw in pdf["content"]:
                urls, tss, payloads = [], [], []
                for rec in parse_warc(bytes(raw)):
                    if rec["kind"] != kind:
                        continue  # warcinfo/request/metadata records
                    p = rec["block"]
                    if kind == "response":
                        p = _http_payload(p)
                    urls.append(rec["url"])
                    tss.append(rec["warc_ts"])
                    payloads.append(p.decode() if decode_text else p)
                yield pd.DataFrame(
                    {
                        "url": pd.Series(urls, dtype=object),
                        "warc_ts": pd.Series(tss, dtype="datetime64[us]"),
                        payload_name: pd.Series(payloads, dtype=object),
                    }
                )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(fn, schema)


def read_warc(spark, path: str):
    """DataFrame[url, warc_ts, html:binary] from WARC response records
    under ``path`` (file, dir, or glob; .warc and .warc.gz)."""
    return _read_records(spark, path, "response", "html", decode_text=False)


def read_wet(spark, path: str):
    """DataFrame[url, warc_ts, text:string] from WET conversion
    records (Common-Crawl extracted-text sidecar files)."""
    return _read_records(spark, path, "conversion", "text", decode_text=True)


def _write(df, out_dir: str, kind: str, payload_col: str, gzip_records: bool):
    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    os.makedirs(out_dir, exist_ok=True)
    manifest = StructType(
        [
            StructField("path", StringType(), False),
            StructField("n_records", IntegerType(), False),
            StructField("bytes", LongType(), False),
        ]
    )
    ext = ".warc.gz" if gzip_records else ".warc"

    def fn(batches):
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        n = 0
        with open(path, "wb") as f:
            for pdf in batches:
                payloads = [
                    p if isinstance(p, (bytes, bytearray)) else str(p).encode()
                    for p in pdf[payload_col]
                ]
                f.write(
                    format_warc(
                        zip(pdf["url"], pdf["warc_ts"], payloads),
                        kind=kind,
                        gzip_records=gzip_records,
                    )
                )
                n += len(pdf)
        size = os.path.getsize(path)
        if n == 0:
            os.remove(path)  # empty partition leaves no empty shard
            return
        yield pd.DataFrame({"path": [path], "n_records": [n], "bytes": [size]})

    return df.select("url", "warc_ts", payload_col).mapInPandas(fn, manifest)


def write_warc(df, out_dir: str, gzip_records: bool = True):
    """Export DataFrame[url, warc_ts, html] as WARC response shards,
    one file per partition. Returns the manifest DataFrame (lazy —
    the write happens when the manifest is consumed)."""
    return _write(df, out_dir, "response", "html", gzip_records)


def write_wet(df, out_dir: str, gzip_records: bool = True):
    """Export DataFrame[url, warc_ts, text] as WET conversion shards."""
    return _write(df, out_dir, "conversion", "text", gzip_records)
