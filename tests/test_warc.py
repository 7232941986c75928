"""WARC/WET source + sink (orc_spark.sources.warc — ISO 28500 / the
Common-Crawl per-record-gzip convention). Mirrors the reference's
round-trip test discipline (TestReader/TestWriter pairs) on the crawl
format: format → parse must be identity, corrupt shards must raise,
and the Spark hop must be bit-identical per url."""

from __future__ import annotations

import gzip
import os
import sys
import tempfile
from datetime import datetime

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from orc_spark.sources import warc as W  # noqa: E402

RECS = [
    ("https://a.example/1", datetime(2021, 6, 1, 0, 0, 5), b"<html>hi</html>"),
    ("https://b.example/2", datetime(2021, 6, 1, 3, 2, 1), b""),
    ("https://c.example/é", datetime(2024, 2, 29, 23, 59, 59), b"\x00\xff raw"),
]


@pytest.mark.parametrize("gz", [True, False])
def test_response_roundtrip(gz):
    data = W.format_warc(RECS, "response", gzip_records=gz)
    out = [
        (r["url"], r["warc_ts"], W._http_payload(r["block"]))
        for r in W.parse_warc(data)
        if r["kind"] == "response"
    ]
    assert out == RECS


def test_conversion_roundtrip():
    txt = [(u, t, p) for u, t, p in RECS]
    data = W.format_warc(txt, "conversion")
    out = [(r["url"], r["warc_ts"], r["block"]) for r in W.parse_warc(data)]
    assert out == txt


def test_non_response_records_are_skipped_by_kind():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"WARC-Date: 2021-06-01T00:00:00Z\r\n"
        b"Content-Length: 4\r\n\r\nxy\r\n\r\n\r\n"
    )
    mixed = gzip.compress(info, 6) + W.format_warc(RECS[:1], "response")
    kinds = [r["kind"] for r in W.parse_warc(mixed)]
    assert kinds == ["warcinfo", "response"]


def test_fractional_seconds_date():
    assert W._parse_date("2021-06-01T00:00:05.250Z") == datetime(
        2021, 6, 1, 0, 0, 5, 250000
    )


def test_truncated_block_raises():
    data = W.format_warc(RECS, "response", gzip_records=False)[:-20]
    with pytest.raises(ValueError, match="truncated"):
        list(W.parse_warc(data))


def test_corrupt_gzip_raises():
    data = W.format_warc(RECS[:1], "response")
    with pytest.raises(Exception):
        list(W.parse_warc(data[:2] + b"\x00" * 40))


def test_missing_content_length_raises():
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Date: 2021-06-01T00:00:00Z\r\n\r\nbody\r\n\r\n"
    )
    with pytest.raises(ValueError, match="Content-Length"):
        list(W.parse_warc(bad))


def test_null_payload_refused():
    with pytest.raises(ValueError, match="null payload"):
        W.format_warc([("u", datetime(2021, 1, 1), None)], "response")


def test_record_id_deterministic():
    a = W.format_warc(RECS, "response", gzip_records=False)
    b = W.format_warc(RECS, "response", gzip_records=False)
    assert a == b  # re-export is byte-identical (resume-friendly)


@pytest.fixture(scope="module")
def src(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.select(
        F.concat(F.lit("https://example.com/"), F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2021-06-01 00:00:00").cast("timestamp"))
            + F.col("doc_id") % 86400
        ).alias("warc_ts"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
        F.col("text"),
    ).repartition(3, "url")


def test_spark_warc_roundtrip_bit_identical(spark, src):
    from pyspark.sql import functions as F

    d = tempfile.mkdtemp(prefix="warc_rt_")
    man = W.write_warc(src.select("url", "warc_ts", "html"), d).collect()
    assert sum(r.n_records for r in man) == src.count()
    assert all(r.path.endswith(".warc.gz") for r in man)
    back = W.read_warc(spark, d).select(
        "url", "warc_ts", F.decode("html", "UTF-8").alias("text")
    )
    a = sorted(map(tuple, back.collect()))
    b = sorted(map(tuple, src.select("url", "warc_ts", "text").collect()))
    assert a == b


def test_spark_wet_roundtrip(spark, src):
    d = tempfile.mkdtemp(prefix="wet_rt_")
    W.write_wet(src.select("url", "warc_ts", "text"), d).collect()
    a = sorted(map(tuple, W.read_wet(spark, d).collect()))
    b = sorted(map(tuple, src.select("url", "warc_ts", "text").collect()))
    assert a == b


def test_cli_encode_admits_warc(spark, src, tmp_path):
    """encode --input-format warc end-to-end: WARC shards → stripes →
    decode matches the source table."""
    from orc_spark.engine import pipeline

    d = str(tmp_path / "shards")
    W.write_warc(src.select("url", "warc_ts", "html"), d).collect()
    from orc_spark.__main__ import main

    out = str(tmp_path / "store")
    rc = main(
        [
            "encode", d, "--input-format", "warc", "--out", out,
            "--run-id", "w1", "--key", "url", "--partitions", "2",
        ]
    )
    assert rc == 0
    crawl = W.read_warc(spark, d)
    dec = pipeline.decode_job(spark, out, "w1", crawl.schema)
    assert sorted(map(tuple, dec.collect())) == sorted(
        map(tuple, crawl.collect())
    )
