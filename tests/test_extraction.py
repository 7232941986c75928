"""html -> text extraction: the input_hint per-row invariant
(byte-identical extracted text per url)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from pyspark.sql import functions as F

from orc_spark.engine import webgen
from orc_spark.textops import extraction


def test_extract_inverts_webgen_html():
    tbl = webgen.generate(2000)
    html = pd.Series(tbl.column("html").to_pylist())
    text = tbl.column("text").to_pylist()
    got = extraction.extract_series(html).tolist()
    assert got == text  # byte-identical per row


def test_extract_messy_html():
    pages = pd.Series(
        [
            "<html><body><p>hello <b>world</b></p></body></html>",
            "<body><script>var x = '<p>no</p>';</script>keep me</body>",
            "<body><style>p { color: red }</style>styled</body>",
            "<body><!-- secret --><p>visible</p></body>",
            "<p>no body tag at all</p>",
            "<body>5 &lt; 6 &amp;&amp; 7 &gt; 3 &#65;&#x42;</body>",
            "<body>a&amp;lt;b</body>",  # double escape survives
            "<BODY CLASS='x'>upper case</BODY>",
        ]
    )
    got = extraction.extract_series(pages).tolist()
    assert got == [
        "hello world",
        "keep me",
        "styled",
        "visible",
        "no body tag at all",
        "5 < 6 && 7 > 3 AB",
        "a&lt;b",
        "upper case",
    ]


def test_wrap_extract_roundtrip_spark(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wrapped = docs.select(
        "doc_id",
        "text",
        extraction.wrap_html_expr(
            F.concat(F.lit("doc "), F.col("doc_id").cast("string")), F.col("text")
        ).alias("html"),
    )
    out = extraction.extract_text(wrapped).filter(
        F.col("extracted") != F.col("text")
    )
    assert out.count() == 0


def test_wrap_escapes_special_chars(spark):
    df = spark.createDataFrame(
        [(1, "a < b & c > d"), (2, "plain")], "id long, text string"
    )
    wrapped = df.select(
        "id", "text", extraction.wrap_html_expr(F.lit("t"), F.col("text")).alias("html")
    )
    got = {
        r.id: r.extracted for r in extraction.extract_text(wrapped).collect()
    }
    assert got == {1: "a < b & c > d", 2: "plain"}
