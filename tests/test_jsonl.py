"""JSONL source/sink: enforced schema, corrupt-line accounting, gzip
round trip."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from orc_spark.sources import jsonl


def test_jsonl_roundtrip_gzip_and_corrupt_counting(spark, tmp_path):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "lang")
    dest = str(tmp_path / "corpus")
    jsonl.write_jsonl(docs.repartition(2, "doc_id"), dest)
    # gzipped part files, one per partition
    parts = glob.glob(os.path.join(dest, "part-*.json.gz"))
    assert len(parts) == 2, parts

    with open(os.path.join(dest, "extra.json"), "w") as fh:
        fh.write('{"doc_id": 900000007, "text": "ok line", "lang": "en"}\n')
        fh.write("not json at all\n")
        fh.write('{"doc_id": "not-a-number", "text": 3}\n')

    schema_before = docs.schema.jsonValue()
    clean, n_corrupt = jsonl.read_jsonl(spark, dest, docs.schema)
    assert docs.schema.jsonValue() == schema_before  # caller schema unmutated
    assert n_corrupt == 2
    assert clean.count() == docs.count() + 1
    # the original rows survive byte-identically
    a = docs.orderBy("doc_id").collect()
    b = (
        clean.filter(F.col("doc_id") != 900000007)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b


def test_jsonl_trusted_read_skips_corrupt_job(spark, tmp_path):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang")
    dest = str(tmp_path / "t")
    jsonl.write_jsonl(docs.coalesce(1), dest, compression=None)
    df, n = jsonl.read_jsonl(spark, dest, docs.schema, count_corrupt=False)
    assert n == 0 and df.count() == docs.count()
    assert "_corrupt_record" not in df.columns


def test_encode_cli_admits_jsonl(spark, tmp_path, capsys):
    """encode --input-format jsonl: schema enforced from parquet,
    corrupt lines counted, clean rows encoded + decoded back."""
    import json as _json
    import os

    from orc_spark.__main__ import main as _main
    from orc_spark.engine import pipeline

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "lang")
    schema_src = str(tmp_path / "schema.parquet")
    docs.limit(1).write.parquet(schema_src)
    corpus = str(tmp_path / "corpus")
    jsonl.write_jsonl(docs.coalesce(1), corpus)
    with open(os.path.join(corpus, "bad.json"), "w") as fh:
        fh.write("{broken\n")

    out = str(tmp_path / "run")
    assert _main([
        "encode", corpus, "--input-format", "jsonl",
        "--schema-from", schema_src, "--out", out,
        "--run-id", "j", "--key", "doc_id", "--partitions", "2",
    ]) == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    reports = [_json.loads(ln) for ln in lines]
    assert any(r.get("corrupt_lines_excluded") == 1 for r in reports)
    dec = pipeline.decode_job(spark, out, "j", docs.schema)
    assert dec.count() == docs.count()


def test_streaming_jsonl_dlq_quarantines_and_encodes(spark, tmp_path):
    """Corrupt lines land in the epoch-keyed quarantine with the raw
    text preserved; clean rows encode; a second drain with a new file
    continues (WAL) without re-quarantining old lines."""
    from orc_spark.engine import pipeline
    from orc_spark.streaming import ingest

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang")
    in_dir = str(tmp_path / "in")
    jsonl.write_jsonl(docs.coalesce(1), in_dir, compression=None)
    import os

    with open(os.path.join(in_dir, "bad.json"), "w") as fh:
        fh.write("not json\n")
        fh.write('{"doc_id": "x"}\n')

    cfg = pipeline.EncodeJobConfig(
        out_dir=str(tmp_path / "run"), run_id="dlq", key="doc_id",
        n_partitions=2,
    )
    results, n_q = ingest.incremental_encode_jsonl(
        spark, in_dir, docs.schema, cfg, str(tmp_path / "ckpt"),
        str(tmp_path / "quar"),
    )
    assert n_q == 2
    quar = spark.read.parquet(str(tmp_path / "quar/epoch-0"))
    assert {r.raw_line for r in quar.collect()} == {
        "not json", '{"doc_id": "x"}'
    }
    total = sum(r.partitions_encoded for r in results)
    assert total == 2

    # new clean file: second drain consumes ONLY it
    spark.createDataFrame(
        [(900001, "en")], "doc_id long, lang string"
    ).coalesce(1).write.mode("append").json(in_dir)
    r2, q2 = ingest.incremental_encode_jsonl(
        spark, in_dir, docs.schema, cfg, str(tmp_path / "ckpt"),
        str(tmp_path / "quar"),
    )
    assert q2 == 0 and len(r2) == 1


def test_csv_roundtrip_quoting_and_corrupt_counting(spark, tmp_path):
    """RFC 4180 sink/reader: commas, doubled quotes, and (with
    multi_line) embedded newlines survive; type-garbled and
    quote-broken rows are counted, not silently dropped."""
    import os

    from orc_spark.sources import csvfile

    df = spark.createDataFrame(
        [
            (1, 'has,comma and "quotes"', "en"),
            (2, "line1\nline2", "de"),
            (3, "", "fr"),
            (4, None, "es"),
        ],
        "doc_id bigint, text string, lang string",
    )
    d = str(tmp_path / "csv")
    csvfile.write_csv(df.repartition(2, "doc_id"), d)
    with open(os.path.join(d, "part-corrupt.csv"), "w") as fh:
        fh.write("doc_id,text,lang\n")
        fh.write('nope,"broken,en\n')
    clean, nc = csvfile.read_csv(spark, d, df.schema, multi_line=True)
    assert nc == 1
    got = {r.doc_id: (r.text, r.lang) for r in clean.collect()}
    want = {r.doc_id: (r.text, r.lang) for r in df.collect()}
    # CSV cannot distinguish empty string from NULL (both serialize
    # to an empty field) — normalize that one lossy equivalence and
    # require everything else byte-identical
    norm = lambda m: {k: (t or "", g) for k, (t, g) in m.items()}
    assert norm(got) == norm(want)

    # trusted read skips the counting job
    clean2, nc2 = csvfile.read_csv(
        spark, d, df.schema, multi_line=True, count_corrupt=False
    )
    assert nc2 == 0 and clean2.count() == 5  # corrupt row parses as nulls


def test_export_cli_jsonl_and_csv(spark, tmp_path, capsys):
    """`export --format jsonl|csv`: a decoded run publishes as the
    interchange format and reads back row-complete."""
    import json

    from orc_spark.__main__ import main
    from orc_spark.engine import pipeline

    df = spark.range(300).selectExpr(
        "id AS doc_id", "concat('t-', id) AS text"
    )
    src = str(tmp_path / "src")
    df.write.mode("overwrite").parquet(src)
    cfg = pipeline.EncodeJobConfig(
        out_dir=str(tmp_path / "r"), run_id="x", key="doc_id",
        columns=["doc_id", "text"], n_partitions=2,
    )
    pipeline.run_encode_job(spark, df, cfg)
    for fmt in ("jsonl", "csv"):
        dest = str(tmp_path / f"pub_{fmt}")
        assert main([
            "export", "--out", cfg.out_dir, "--run-id", "x",
            "--schema-from", src, "--dest", dest, "--format", fmt,
        ]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows"] == 300 and rep["format"] == fmt
