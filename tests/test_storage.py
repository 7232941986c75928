"""Storage facade: parquet mode semantics + Iceberg seam detection."""

from __future__ import annotations

from pyspark.sql.types import LongType, StringType, StructField, StructType

from orc_spark.engine import storage

SCHEMA = StructType(
    [StructField("k", StringType()), StructField("v", LongType())]
)


def test_parquet_append_read_roundtrip(spark, tmp_path):
    target = str(tmp_path / "tbl")
    df = spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA)
    storage.append_table(df, target)
    storage.append_table(df, target)
    got = storage.read_table(spark, target, SCHEMA)
    assert got.count() == 4
    assert storage.exists(target)


def test_missing_table_reads_empty_with_schema(spark, tmp_path):
    got = storage.read_table(spark, str(tmp_path / "nope"), SCHEMA)
    assert got.count() == 0
    assert got.schema == SCHEMA


def test_iceberg_detection(spark):
    assert storage.is_iceberg("iceberg://cat.db.t")
    assert not storage.is_iceberg("/data/stripes")
    # sandbox ships no iceberg runtime jar; the seam must report that
    assert storage.iceberg_available(spark) is False


def test_orc_interchange_roundtrip(spark, tmp_path):
    """Export -> independent C++ re-read -> import: the three views
    (JVM ORC reader, pyarrow ORC reader, plain DataFrame) agree on
    count + fingerprint, for both zlib and uncompressed stripes."""
    import pytest
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang", "n_chars")
    )
    n_src = docs.count()

    def fp(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.col("doc_id").cast("string"),
                                F.col("lang"),
                                F.col("n_chars").cast("string"),
                            )
                        ),
                        1, 8,
                    ),
                    16, 10,
                ).cast("long")
            ).alias("fp"),
        ).first()
        return int(r.n), int(r.fp)

    want = fp(docs)
    for comp in ("zlib", "none"):
        dest = str(tmp_path / f"orc_{comp}")
        storage.export_orc(docs.repartition(3, "doc_id"), dest, comp)
        assert fp(storage.read_orc(spark, dest)) == want
        chk = storage.orc_interchange_check(
            spark, dest, ["doc_id", "lang", "n_chars"]
        ).first()
        assert (int(chk.rows_pyarrow), int(chk.fp_pyarrow)) == want
    assert n_src == want[0]

    with pytest.raises(ValueError, match="no .orc files"):
        storage.orc_interchange_check(
            spark, str(tmp_path), ["doc_id"]
        )


def test_export_cli_roundtrip(spark, tmp_path, capsys):
    """CLI export: encode a run, export it to ORC via the CLI, read
    the ORC back with both readers and match the source."""
    import json

    from pyspark.sql import functions as F

    from orc_spark.__main__ import main
    from orc_spark.engine import pipeline

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang", "n_chars")
    )
    src = str(tmp_path / "src.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "run")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id="ex", key="doc_id",
        columns=["doc_id", "lang", "n_chars"], n_partitions=4,
    )
    pipeline.run_encode_job(spark, docs, cfg)
    dest = str(tmp_path / "orc_out")
    assert main([
        "export", "--out", out, "--run-id", "ex",
        "--schema-from", src, "--dest", dest,
    ]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["rows"] == docs.count()
    back = storage.read_orc(spark, dest)
    assert back.count() == docs.count()
    assert back.join(docs, ["doc_id", "lang", "n_chars"]).count() == docs.count()
    chk = storage.orc_interchange_check(
        spark, dest, ["doc_id", "lang", "n_chars"]
    ).first()
    assert int(chk.rows_pyarrow) == docs.count()

    # and back in: admit the exported ORC corpus via the encode CLI
    out2 = str(tmp_path / "run2")
    assert main([
        "encode", dest, "--input-format", "orc", "--out", out2,
        "--run-id", "back", "--key", "doc_id", "--partitions", "4",
    ]) == 0
    rep2 = json.loads(capsys.readouterr().out)
    assert rep2["partitions_encoded"] == 4
    dec = pipeline.decode_job(spark, out2, "back", docs.schema)
    assert dec.join(docs, ["doc_id", "lang", "n_chars"]).count() == docs.count()


def test_export_partitioned_prunes_and_overwrites_dynamically(spark, tmp_path):
    """Partition-filtered reads open only matching lang= directories;
    a re-export of a subset run replaces only ITS partitions."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, storage

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang", "n_chars")
    out = str(tmp_path / "run")
    dest = str(tmp_path / "pub")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id="pe", key="doc_id",
        columns=["doc_id", "lang", "n_chars"], n_partitions=2,
    )
    pipeline.run_encode_job(spark, docs, cfg)
    info = storage.export_partitioned(
        spark, out, "pe", docs.schema, "lang", dest
    )
    assert info["rows"] == docs.count()
    assert info["partitions"] == docs.select("lang").distinct().count()

    # planning-time pruning: the lang filter lands in PartitionFilters
    # (directory-level skip), not PushedFilters (row-group level)
    filtered = spark.read.parquet(dest).filter(F.col("lang") == "en")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "= en)" in pf[0], plan[:2000]
    assert filtered.count() == docs.filter(F.col("lang") == "en").count()

    # dynamic overwrite: re-export an en-only run; other partitions stay
    en_only = docs.filter(F.col("lang") == "en")
    cfg2 = pipeline.EncodeJobConfig(
        out_dir=str(tmp_path / "run2"), run_id="pe2", key="doc_id",
        columns=["doc_id", "lang", "n_chars"], n_partitions=2,
    )
    pipeline.run_encode_job(spark, en_only, cfg2)
    storage.export_partitioned(
        spark, cfg2.out_dir, "pe2", docs.schema, "lang", dest
    )
    back = spark.read.parquet(dest)
    assert back.count() == docs.count()  # de/es/fr/zh untouched
    assert back.filter(F.col("lang") == "de").count() == docs.filter(
        F.col("lang") == "de"
    ).count()


def test_export_bucketed_joins_without_exchange(spark, tmp_path):
    """Two runs published bucketed on the same (count, column) join
    with zero Exchange; results equal the plain join."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, storage

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    od = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    names = {}
    for tag, df, key in (("f", li, "l_orderkey"), ("d", od, "o_orderkey")):
        cfg = pipeline.EncodeJobConfig(
            out_dir=str(tmp_path / tag), run_id=tag, key=key,
            n_partitions=2,
        )
        pipeline.run_encode_job(spark, df, cfg)
        name = f"test_bk_{tag}"
        storage.export_bucketed(
            spark, cfg.out_dir, tag, df.schema, key, name,
            str(tmp_path / f"tbl_{tag}"), n_buckets=4,
        )
        names[tag] = name
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table(names["f"]).join(
                spark.table(names["d"]),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan[:1500]
            assert "Bucketed: true" in plan
            got = j.groupBy("o_orderpriority").count().collect()
            want = (
                li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderpriority").count().collect()
            )
            assert sorted(map(tuple, got)) == sorted(map(tuple, want))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        for n in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_export_sorted_range_disjoint_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, storage

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "value"
    )
    cfg = pipeline.EncodeJobConfig(
        out_dir=str(tmp_path / "r"), run_id="s", key="event_id",
        n_partitions=2,
    )
    pipeline.run_encode_job(spark, ev, cfg)
    dest = str(tmp_path / "sorted")
    man = storage.export_sorted(
        spark, cfg.out_dir, "s", ev.schema, "event_id", dest, n_files=4
    ).collect()
    assert len(man) == 4
    assert sum(m.n_rows for m in man) == ev.count()
    for a, b in zip(man, man[1:]):
        assert a.hi < b.lo, (a, b)
    # a range slice equals the plain filter and rows come back whole
    got = spark.read.parquet(dest).filter(F.col("event_id") <= man[0].hi)
    want = ev.filter(F.col("event_id") <= man[0].hi)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_topn_sorted_prunes_files_and_is_exact(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, storage

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "value"
    )
    cfg = pipeline.EncodeJobConfig(
        out_dir=str(tmp_path / "r"), run_id="t", key="event_id",
        n_partitions=2,
    )
    pipeline.run_encode_job(spark, ev, cfg)
    dest = str(tmp_path / "sorted")
    man = storage.export_sorted(
        spark, cfg.out_dir, "t", ev.schema, "event_id", dest, n_files=4
    )
    n_total = ev.count()
    per_file = n_total // 4

    # top-N inside the first file scans exactly one file
    top, scanned, total = storage.topn_sorted(
        spark, man, "event_id", per_file // 2
    )
    assert (scanned, total) == (1, 4)
    want = [
        r.event_id
        for r in ev.orderBy("event_id").limit(per_file // 2).collect()
    ]
    assert [r.event_id for r in top.collect()] == want

    # N spanning two files scans two; descending symmetric
    _, scanned2, _ = storage.topn_sorted(
        spark, man, "event_id", per_file + 1
    )
    assert scanned2 == 2
    bot, b_scanned, _ = storage.topn_sorted(
        spark, man, "event_id", 3, ascending=False
    )
    assert b_scanned == 1
    want_desc = [
        r.event_id
        for r in ev.orderBy(F.desc("event_id")).limit(3).collect()
    ]
    assert [r.event_id for r in bot.collect()] == want_desc

    # N >= table scans everything and returns every row
    allr, a_scanned, _ = storage.topn_sorted(
        spark, man, "event_id", n_total + 10
    )
    assert a_scanned == 4
    assert allr.count() == n_total

    with pytest.raises(ValueError, match="positive"):
        storage.topn_sorted(spark, man, "event_id", 0)


def test_publish_table_cli_three_modes(spark, tmp_path, capsys):
    import json

    from orc_spark.__main__ import main
    from orc_spark.engine import pipeline

    df = spark.range(1000).selectExpr(
        "id AS doc_id", "CAST(id % 5 AS STRING) AS lang"
    )
    src = str(tmp_path / "src")
    df.write.mode("overwrite").parquet(src)
    cfg = pipeline.EncodeJobConfig(
        out_dir=str(tmp_path / "r"), run_id="p", key="doc_id",
        columns=["doc_id", "lang"], n_partitions=2,
    )
    pipeline.run_encode_job(spark, df, cfg)

    assert main([
        "publish-table", "--out", cfg.out_dir, "--run-id", "p",
        "--schema-from", src, "--dest", str(tmp_path / "hive"),
        "--mode", "partitioned", "--by", "lang",
    ]) == 0
    capsys.readouterr()
    import os
    assert any(
        d.startswith("lang=") for d in os.listdir(tmp_path / "hive")
    )

    assert main([
        "publish-table", "--out", cfg.out_dir, "--run-id", "p",
        "--schema-from", src, "--dest", str(tmp_path / "sorted"),
        "--mode", "sorted", "--by", "doc_id", "--n", "4",
        "--topn", "50",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["files"] == 4
    assert rep["topn"]["files_scanned"] == 1
    assert rep["topn"]["first"] == "0"
