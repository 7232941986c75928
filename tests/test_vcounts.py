"""metadata_value_counts: exact GROUP BY col, COUNT(*) answered from
per-stripe value-count histograms (engine/vcounts.py) on UNCLUSTERED
low-cardinality columns — the impure-stripe complement of
metadata_group_aggregate. Invariants:

- exactness: folded histograms == row-level groupBy().count() for
  string/int/bool/timestamp/date keys, with and without predicates,
  NULL group included (SQL semantics);
- effectiveness: on an unclustered categorical column ZERO stripe
  groups decode — the whole answer is footer metadata;
- honesty: histograms decline (null) past VCS_CAP / for long text /
  floats and those stripes route to the exact decode path; live
  deletes raise; a coverage-broken histogram raises rather than
  undercounts.
"""

from __future__ import annotations

import datetime
import tempfile
import uuid

import pyarrow as pa
import pytest

from orc_spark.engine import vcounts


def _encode(spark, df, columns, **kw):
    from orc_spark.engine import pipeline

    out = tempfile.mkdtemp(prefix="orcspark_vcs_")
    kw.setdefault("stripe_rows", 256)
    cfg = pipeline.EncodeJobConfig(
        out_dir=out,
        run_id=f"vcs-{uuid.uuid4().hex[:8]}",
        key=columns[0],
        columns=columns,
        n_partitions=4,
        **kw,
    )
    pipeline.run_encode_job(spark, df, cfg)
    return out, cfg


def _check(spark, df, out, cfg, column, predicate=None):
    import pyspark.sql.functions as F

    from orc_spark.engine import pipeline, zonemap

    res = pipeline.metadata_value_counts(
        spark, out, cfg.run_id, df.schema, column, predicate
    )
    key = lambda t: (t[0] is not None, str(t[0]))  # noqa: E731
    got = sorted((tuple(r) for r in res.collect()), key=key)
    q = df.filter(zonemap.predicate_expr(predicate)) if predicate else df
    truth = sorted(
        (
            tuple(r)
            for r in q.groupBy(column)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        ),
        key=key,
    )
    assert got == truth, (column, predicate, got, truth)


# ---------------------------------------------------------------- kernel


def test_kernel_roundtrip_kinds():
    cases = [
        ("s", pa.array(["a", "b", "a", None, "c"])),
        ("i", pa.array([1, 2, 1, 1, None], pa.int64())),
        ("b", pa.array([True, False, True, None])),
        ("ts", pa.array(
            [datetime.datetime(2024, 3, 1, 12), None],
            pa.timestamp("us"),
        )),
        ("d", pa.array([datetime.date(2024, 3, 1)] * 3, pa.date32())),
    ]
    for kind, arr in cases:
        blob = vcounts.stripe_value_counts(arr)
        assert blob is not None, kind
        k, pairs = vcounts.parse_vcs(blob)
        assert k == kind
        # exact counts, nulls excluded, sorted by value
        nn = sum(c for _, c in pairs)
        assert nn == len(arr) - arr.null_count
        assert pairs == sorted(pairs, key=lambda p: p[0])


def test_kernel_ts_units_canonical_us():
    t = datetime.datetime(2024, 3, 1, 12, 0, 0)
    blobs = [
        vcounts.stripe_value_counts(pa.array([t, t], pa.timestamp(u)))
        for u in ("s", "ms", "us", "ns")
    ]
    vals = {vcounts.parse_vcs(b)[1][0][0] for b in blobs}
    assert vals == {int(t.timestamp() * 1_000_000)}


def test_kernel_declines():
    # floats: equality semantics — decline
    assert vcounts.stripe_value_counts(pa.array([1.0, 2.0])) is None
    # > VCS_CAP distinct overall
    many = pa.array([str(i) for i in range(vcounts.VCS_CAP + 1)])
    assert vcounts.stripe_value_counts(many) is None
    # prefix-sample guard: distinct-heavy head declines after O(sample)
    head_heavy = pa.array(
        [str(i) for i in range(vcounts._SAMPLE)] + ["x"] * 4000
    )
    assert vcounts.stripe_value_counts(head_heavy) is None
    # long-form text declines by the bloom avg-length policy
    from orc_spark.engine.zonemap import BLOOM_MAX_AVG_LEN

    long_text = pa.array(["y" * (BLOOM_MAX_AVG_LEN * 2)] * 8)
    assert vcounts.stripe_value_counts(long_text) is None
    # empty stripe declines
    assert vcounts.stripe_value_counts(pa.array([], pa.string())) is None


def test_kernel_parse_rejects_unknown_version():
    with pytest.raises(ValueError):
        vcounts.parse_vcs(b"\x02{}")


# ------------------------------------------------------------- pipeline


def test_value_counts_unclustered_exact(spark):
    rows = [
        (
            i,
            None if i % 11 == 0 else f"lang{(i * 7919) % 6}",
            bool(i % 3 == 0),
            datetime.date(2024, 1 + (i % 3), 1),
        )
        for i in range(3000)
    ]
    df = spark.createDataFrame(
        rows, "id bigint, lang string, flag boolean, d date"
    )
    # key-ordered layout: lang/flag/d are impure in every stripe
    out, cfg = _encode(spark, df, ["id", "lang", "flag", "d"])
    _check(spark, df, out, cfg, "lang")           # NULL group included
    _check(spark, df, out, cfg, "flag")
    _check(spark, df, out, cfg, "d")
    _check(spark, df, out, cfg, "lang", [("id", ">=", 500), ("id", "<", 2200)])
    _check(spark, df, out, cfg, "flag", [("lang", "==", "lang2")])


def test_value_counts_is_pure_metadata_when_histograms_cover(
    spark, monkeypatch
):
    """Unclustered low-cardinality column, no predicate: every stripe
    carries a histogram, so NO decode_job call happens at all."""
    from orc_spark.engine import pipeline

    rows = [(i, f"g{i % 4}") for i in range(3000)]
    df = spark.createDataFrame(rows, "id bigint, g string")
    out, cfg = _encode(spark, df, ["id", "g"])

    def boom(*a, **kw):
        raise AssertionError("decode path must not be touched")

    monkeypatch.setattr(pipeline, "decode_job", boom)
    _check(spark, df, out, cfg, "g")


def test_value_counts_declined_stripes_decode_exactly(spark):
    """High-cardinality key column: every stripe declines the
    histogram, the operator degrades to a full (restricted) decode and
    is still exact."""
    import pyspark.sql.functions as F

    rows = [(i, f"u{i}") for i in range(1500)]
    df = spark.createDataFrame(rows, "id bigint, u string")
    out, cfg = _encode(spark, df, ["id", "u"], stripe_rows=2048)
    from orc_spark.engine import pipeline

    res = pipeline.metadata_value_counts(
        spark, out, cfg.run_id, df.schema, "u"
    )
    assert res.agg(F.sum("cnt")).first()[0] == 1500
    assert res.count() == 1500


def test_value_counts_int_and_ts_keys(spark):
    base = datetime.datetime(2024, 3, 1)
    rows = [
        (i, i % 5, base + datetime.timedelta(hours=i % 4))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id bigint, bucket bigint, ts timestamp")
    out, cfg = _encode(spark, df, ["id", "bucket", "ts"])
    _check(spark, df, out, cfg, "bucket")
    _check(spark, df, out, cfg, "ts")
    _check(spark, df, out, cfg, "bucket", [("id", "<", 777)])


def test_value_counts_refusals(spark):
    from orc_spark.engine import pipeline

    rows = [(i, f"g{i % 3}") for i in range(600)]
    df = spark.createDataFrame(rows, "id bigint, g string")
    out, cfg = _encode(spark, df, ["id", "g"])
    with pytest.raises(ValueError, match="not in result_schema"):
        pipeline.metadata_value_counts(
            spark, out, cfg.run_id, df.schema, "nope"
        )
    pipeline.delete_rows(
        spark, out, cfg.run_id, df.schema, [("id", "==", 7)]
    )
    with pytest.raises(ValueError, match="live deletes"):
        pipeline.metadata_value_counts(
            spark, out, cfg.run_id, df.schema, "g"
        )


def test_value_counts_corrupt_histogram_is_loud(spark):
    """A histogram whose counts don't cover n_rows (footer corruption)
    must raise, never return an undercounted GROUP BY."""
    import pyspark.sql.functions as F

    from orc_spark.engine import lineage, pipeline
    from orc_spark.engine.encode import STRIPE_SCHEMA

    rows = [(i, f"g{i % 3}") for i in range(600)]
    df = spark.createDataFrame(rows, "id bigint, g string")
    out, cfg = _encode(spark, df, ["id", "g"])
    sdir = lineage.stripes_dir(out)
    bad = vcounts._VERSION + b'{"t":"s","p":[["g0",1]]}'
    fixed = (
        spark.read.schema(STRIPE_SCHEMA).parquet(sdir)
        .withColumn(
            "vcs",
            F.when(F.col("column") == "g", F.lit(bad)).otherwise(
                F.col("vcs")
            ),
        )
    )
    tmp = tempfile.mkdtemp(prefix="orcspark_vcs_bad_")
    fixed.write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(sdir)
    shutil.move(tmp, sdir)
    with pytest.raises(Exception, match="covers|corrupt"):
        pipeline.metadata_value_counts(
            spark, out, cfg.run_id, df.schema, "g"
        ).collect()
