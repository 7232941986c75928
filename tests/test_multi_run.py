"""Multi-run union reads (pipeline.read_runs): several runs of one
store read as one logical table — the append workflow (crawl
snapshots), with per-run epoch selection, deletes, and schema
evolution intact."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from orc_spark.engine import pipeline

from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_read_runs_unions_snapshots_with_isolated_deletes(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    out = tempfile.mkdtemp(prefix="orcspark_mr_")
    for i, part in enumerate(
        (docs.filter(F.col("doc_id") % 2 == 0),
         docs.filter(F.col("doc_id") % 2 == 1))
    ):
        cfg = pipeline.EncodeJobConfig(
            out_dir=out, run_id=f"snap{i}", key="doc_id",
            columns=["doc_id", "lang", "n_chars"], n_partitions=2,
        )
        pipeline.run_encode_job(spark, part, cfg)
    # a delete on snapshot 0 must not leak into snapshot 1
    pipeline.delete_rows(
        spark, out, "snap0", docs.schema, [("lang", "==", "de")]
    )
    got = pipeline.read_runs(spark, out, ["snap0", "snap1"], docs.schema)
    want = docs.filter(
        ~((F.col("doc_id") % 2 == 0) & (F.col("lang") == "de"))
    )
    assert _rows(got) == _rows(want)


def test_read_runs_schema_evolution_across_snapshots(spark):
    """An early snapshot predating an added column null-fills it."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    out = tempfile.mkdtemp(prefix="orcspark_mr2_")
    old = docs.filter(F.col("doc_id") < 100).drop("n_chars")
    cfg0 = pipeline.EncodeJobConfig(
        out_dir=out, run_id="old", key="doc_id",
        columns=["doc_id", "lang"], n_partitions=2,
    )
    pipeline.run_encode_job(spark, old, cfg0)
    new = docs.filter(F.col("doc_id") >= 100)
    cfg1 = pipeline.EncodeJobConfig(
        out_dir=out, run_id="new", key="doc_id",
        columns=["doc_id", "lang", "n_chars"], n_partitions=2,
    )
    pipeline.run_encode_job(spark, new, cfg1)
    got = pipeline.read_runs(
        spark, out, ["old", "new"], docs.schema,
        allow_missing_columns=True,
    )
    assert got.count() == docs.count()
    assert got.filter(
        F.col("n_chars").isNull() & (F.col("doc_id") < 100)
    ).count() == 100
    with pytest.raises(Exception):
        # strict mode: the missing column fails the read loudly (at
        # the action — the incomplete stripe groups are detected
        # inside the decode task)
        pipeline.read_runs(spark, out, ["old", "new"], docs.schema).count()

    with pytest.raises(ValueError, match="at least one"):
        pipeline.read_runs(spark, out, [], docs.schema)


def test_merge_runs_materializes_deletes_and_guards_keys(spark, tmp_path):
    from pyspark.sql import functions as F

    from orc_spark.engine import deletes, pipeline

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang", "n_chars")
    out = str(tmp_path / "store")
    for i, part in enumerate(
        (docs.filter(F.col("doc_id") % 2 == 0),
         docs.filter(F.col("doc_id") % 2 == 1))
    ):
        cfg = pipeline.EncodeJobConfig(
            out_dir=out, run_id=f"s{i}", key="doc_id", n_partitions=2,
        )
        pipeline.run_encode_job(spark, part, cfg)
    pipeline.delete_rows(
        spark, out, "s0", docs.schema, [("lang", "==", "en")]
    )
    pipeline.merge_runs(spark, out, ["s0", "s1"], docs.schema, "m")

    want = docs.filter(
        ~((F.col("doc_id") % 2 == 0) & (F.col("lang") == "en"))
    )
    got = pipeline.decode_job(spark, out, "m", docs.schema)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    d = deletes.delete_stats(spark, out, "m")
    assert d["n_vectors"] == 0 and d["n_eq_values"] == 0

    # conflicting persisted keys refuse to merge silently
    cfg3 = pipeline.EncodeJobConfig(
        out_dir=out, run_id="other", key="lang", n_partitions=2,
    )
    pipeline.run_encode_job(spark, docs, cfg3)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="disagree"):
        pipeline.merge_runs(
            spark, out, ["s0", "other"], docs.schema, "m2"
        )


def test_clone_run_backup_restore_bit_identical(spark, tmp_path):
    """A cloned run decodes bit-identically at the destination (with
    checksum verification), deletes travel, and an existing run_id at
    the destination refuses."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang", "n_chars")
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    cfg = pipeline.EncodeJobConfig(
        out_dir=src, run_id="r", key="doc_id", n_partitions=2,
    )
    pipeline.run_encode_job(spark, docs, cfg)
    pipeline.delete_rows(
        spark, src, "r", docs.schema, [("lang", "==", "zh")]
    )
    info = pipeline.clone_run(spark, src, "r", dst)
    assert info["stripes"] > 0 and info["lineage"] > 0

    want = docs.filter(F.col("lang") != "zh")
    got = pipeline.decode_job(
        spark, dst, "r", docs.schema, verify_checksums=True
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # persisted config travelled: compaction at dst inherits identity
    assert pipeline.load_run_config(dst, "r")["key"] == "doc_id"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="already exists"):
        pipeline.clone_run(spark, src, "r", dst)


def test_cli_merge_and_clone(spark, tmp_path, capsys):
    import json

    from pyspark.sql import functions as F

    from orc_spark.__main__ import main as _main
    from orc_spark.engine import pipeline

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang")
    src_schema = str(tmp_path / "schema.parquet")
    docs.limit(1).write.parquet(src_schema)
    out = str(tmp_path / "store")
    for i, part in enumerate(
        (docs.filter(F.col("doc_id") % 2 == 0),
         docs.filter(F.col("doc_id") % 2 == 1))
    ):
        cfg = pipeline.EncodeJobConfig(
            out_dir=out, run_id=f"s{i}", key="doc_id", n_partitions=2,
        )
        pipeline.run_encode_job(spark, part, cfg)

    assert _main([
        "merge", "--out", out, "--run-ids", "s0,s1",
        "--new-run-id", "all", "--schema-from", src_schema,
    ]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["run_id"] == "all"
    assert pipeline.decode_job(
        spark, out, "all", docs.schema
    ).count() == docs.count()

    dest = str(tmp_path / "backup")
    assert _main([
        "clone", "--out", out, "--run-id", "all", "--dest", dest,
    ]) == 0
    rep2 = json.loads(capsys.readouterr().out)
    assert rep2["stripes"] > 0
    assert pipeline.decode_job(
        spark, dest, "all", docs.schema, verify_checksums=True
    ).count() == docs.count()
