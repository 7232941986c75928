"""metadata_count: exact COUNT(*) WHERE p answered from zone-map
ALL/NONE proofs, decoding only MIXED boundary stripes
(pipeline.metadata_count + zonemap._conjunct_all). Invariants:

- exactness: metadata_count == row-level filter().count() for every
  supported op, including nulls (SQL 3-value logic), temporal
  literals, strings, and multi-conjunct predicates;
- effectiveness: on a clustered column most rows come from metadata
  and only the range's boundary stripes decode;
- honesty: missing stats, live deletes, and an empty predicate raise
  rather than guess.
"""

from __future__ import annotations

import datetime
import tempfile
import uuid

import pytest

from tests.conftest import SF_DIR


def _encode(spark, df, columns, **kw):
    from orc_spark.engine import pipeline

    out = tempfile.mkdtemp(prefix="orcspark_mc_")
    kw.setdefault("stripe_rows", 256)
    cfg = pipeline.EncodeJobConfig(
        out_dir=out,
        run_id=f"mc-{uuid.uuid4().hex[:8]}",
        key=columns[0],
        columns=columns,
        n_partitions=4,
        **kw,
    )
    pipeline.run_encode_job(spark, df, cfg)
    return out, cfg


def _check(spark, df, out, cfg, predicate):
    from orc_spark.engine import pipeline, zonemap

    cnt, detail = pipeline.metadata_count(
        spark, out, cfg.run_id, df.schema, predicate
    )
    truth = df.filter(zonemap.predicate_expr(predicate)).count()
    assert cnt == truth, (predicate, cnt, truth, detail)
    return detail


def test_metadata_count_ops_exact(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "ts", "value", "event_type")
        .limit(4000)
    )
    out, cfg = _encode(spark, df, ["event_id", "ts", "value", "event_type"])
    lo_ts = datetime.datetime(2024, 3, 1)
    for pred in [
        [("event_id", "<", 700)],
        [("event_id", ">=", 100), ("event_id", "<=", 2500)],
        [("event_id", "!=", 42)],
        [("event_id", "between", (0, 10**9))],  # ALL everywhere
        [("value", ">", 40.0)],
        [("event_type", "==", "click")],
        [("event_type", "in", ("click", "view"))],
        [("ts", ">=", lo_ts)],
        [("event_id", "<", 0)],  # NONE everywhere
    ]:
        _check(spark, df, out, cfg, pred)


def test_metadata_count_clustered_touches_boundaries_only(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "value")
        .limit(4000)
    )
    out, cfg = _encode(
        spark, df, ["event_id", "value"], cluster_by="event_id"
    )
    detail = _check(
        spark, df, out, cfg,
        [("event_id", ">=", 500), ("event_id", "<", 3000)],
    )
    # clustered: interior stripes are proven ALL (counted from
    # metadata); only the two boundary stripes per overlapping
    # partition may decode
    assert detail["rows_from_metadata"] > 0
    assert detail["n_all"] >= 1
    assert detail["n_mixed"] <= 2 * cfg.n_partitions


def test_metadata_count_null_semantics(spark):
    rows = [(i, None if i % 5 == 0 else float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    out, cfg = _encode(spark, df, ["id", "v"])
    # one null in a stripe breaks every comparison ALL-proof; counts
    # must still be exact (nulls fail the predicate row-level)
    _check(spark, df, out, cfg, [("v", ">", -1.0)])
    _check(spark, df, out, cfg, [("v", "!=", 3.0)])
    d_null = _check(spark, df, out, cfg, [("v", "is_null", None)])
    d_nn = _check(spark, df, out, cfg, [("v", "not_null", None)])
    # neither is zone-provable here (every stripe mixes null/non-null)
    assert d_null["rows_from_metadata"] == 0
    assert d_nn["rows_from_metadata"] == 0


def test_metadata_count_all_nulls_stripe_proves_is_null(spark):
    rows = [(i, None) for i in range(600)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    out, cfg = _encode(spark, df, ["id", "v"])
    cnt_detail = _check(spark, df, out, cfg, [("v", "is_null", None)])
    assert cnt_detail["n_mixed"] == 0  # all-null stripes: pure metadata
    assert cnt_detail["rows_from_metadata"] == 600


def test_metadata_count_string_prefix(spark):
    rows = [(i, f"{'abc' if i % 2 else 'xyz'}-{i:05d}") for i in range(4000)]
    df = spark.createDataFrame(rows, "id bigint, tag string")
    out, cfg = _encode(spark, df, ["id", "tag"], cluster_by="tag")
    d = _check(spark, df, out, cfg, [("tag", "like_prefix", "abc")])
    assert d["rows_from_metadata"] > 0  # clustered prefix: ALL-provable


def test_metadata_count_refusals(spark):
    from orc_spark.engine import pipeline

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(500)], "id bigint, v double"
    )
    out, cfg = _encode(spark, df, ["id", "v"])
    with pytest.raises(ValueError, match="needs a predicate"):
        pipeline.metadata_count(spark, out, cfg.run_id, df.schema, [])
    with pytest.raises(ValueError, match="no stats rows"):
        pipeline.metadata_count(
            spark, out, cfg.run_id, df.schema, [("nope", "==", 1)]
        )
    pipeline.delete_rows_eq(spark, out, cfg.run_id, "id", [3])
    with pytest.raises(ValueError, match="live deletes"):
        pipeline.metadata_count(
            spark, out, cfg.run_id, df.schema, [("id", ">", 0)]
        )


def test_conjunct_all_dual_of_keep_property(spark):
    """Property link between the keep- and all-proofs on real stats
    rows: ALL implies KEEP, and a NONE verdict (not keep) implies the
    row-level count for that stripe is 0 — checked over every stripe
    of a small table for a grid of predicates."""
    import pyspark.sql.functions as F

    from orc_spark.engine import pipeline, zonemap

    df = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "value")
        .limit(2000)
    )
    out, cfg = _encode(spark, df, ["event_id", "value"])
    stripes = pipeline.read_stripes(spark, out, cfg.run_id).drop("data")
    for col, op, val in [
        ("event_id", ">=", 1000),
        ("event_id", "<", 250),
        ("value", ">", 55.0),
        ("event_id", "==", 7),
    ]:
        rows = (
            stripes.filter(F.col("column") == col)
            .withColumn("_keep", zonemap._conjunct_keep(op, val))
            .withColumn("_all", zonemap._conjunct_all(op, val))
            .select("_keep", "_all", "n_rows", "null_count")
            .collect()
        )
        assert rows
        for r in rows:
            if r._all:
                assert r._keep, (col, op, val, r)


# ----------------------------------------------------- sum pushdown

def _check_sum(spark, df, out, cfg, column, predicate):
    import pyspark.sql.functions as F

    from orc_spark.engine import pipeline, zonemap

    s, c, detail = pipeline.metadata_sum(
        spark, out, cfg.run_id, df.schema, column, predicate
    )
    q = df.filter(zonemap.predicate_expr(predicate)) if predicate else df
    r = q.agg(F.sum(column).alias("s"), F.count(column).alias("c")).first()
    assert c == int(r.c), (column, predicate, c, r.c, detail)
    if s is None or r.s is None:
        assert s == r.s, (column, predicate, s, r.s)
    elif isinstance(s, float):
        assert abs(s - float(r.s)) <= 1e-9 * max(1.0, abs(float(r.s)))
    else:
        assert s == r.s, (column, predicate, s, r.s)
    return detail


def test_metadata_sum_exact_and_metadata_dominant(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "value", "event_type")
        .limit(4000)
    )
    out, cfg = _encode(
        spark, df, ["event_id", "value", "event_type"],
        cluster_by="event_id",
    )
    n = df.count()
    # unfiltered: pure metadata, zero decodes
    d = _check_sum(spark, df, out, cfg, "event_id", None)
    assert d["n_mixed"] == 0 and d["rows_from_metadata"] == n
    d = _check_sum(spark, df, out, cfg, "value", None)
    assert d["n_mixed"] == 0
    # clustered range: interior stripes from metadata, boundaries decode
    pred = [("event_id", ">=", 500), ("event_id", "<", 3000)]
    d = _check_sum(spark, df, out, cfg, "value", pred)
    assert d["rows_from_metadata"] > 0
    assert d["n_mixed"] <= 2 * cfg.n_partitions
    # unclustered predicates: everything decodes, still exact
    _check_sum(spark, df, out, cfg, "value", [("event_type", "==", "click")])
    _check_sum(spark, df, out, cfg, "event_id", [("value", ">", 50.0)])
    # NONE everywhere: SQL SUM of the empty set is NULL
    from orc_spark.engine import pipeline

    s, c, _ = pipeline.metadata_sum(
        spark, out, cfg.run_id, df.schema, "value",
        [("event_id", "<", -1)],
    )
    assert s is None and c == 0


def test_metadata_sum_null_and_nan_handling(spark):
    import math

    rows = [
        (i, None if i % 3 == 0 else float(i), math.nan if i >= 900 else 1.0)
        for i in range(1200)
    ]
    df = spark.createDataFrame(rows, "id bigint, v double, w double")
    out, cfg = _encode(spark, df, ["id", "v", "w"])
    # SUM skips nulls; stripe sums already count non-null only
    d = _check_sum(spark, df, out, cfg, "v", None)
    assert d["rows_from_metadata"] > 0
    # NaN-poisoned stripes never record a sum -> those groups decode;
    # the result (a NaN sum, like SQL) comes from the decode path
    from orc_spark.engine import pipeline

    s, c, d = pipeline.metadata_sum(spark, out, cfg.run_id, df.schema, "w", None)
    assert c == 1200 and math.isnan(s)
    assert d["n_mixed"] > 0


def test_metadata_sum_all_null_column_no_decode(spark, monkeypatch):
    """A column that is entirely null sums to (None, 0) straight from
    metadata — the all-null shortcut (nn == 0 with a stats row) must
    not decode a single stripe, on both classifier paths."""
    from orc_spark.engine import pipeline

    df = spark.createDataFrame(
        [(i, None) for i in range(1200)], "id bigint, v double"
    )
    out, cfg = _encode(spark, df, ["id", "v"])

    called = {}
    real = pipeline.decode_job

    def spy(*a, **kw):
        called["hit"] = True
        return real(*a, **kw)

    monkeypatch.setattr(pipeline, "decode_job", spy)
    s, c, d = pipeline.metadata_sum(spark, out, cfg.run_id, df.schema, "v")
    assert s is None and c == 0
    assert d["n_mixed"] == 0 and "hit" not in called
    # distributed path too (footer budget forced past)
    from orc_spark.engine import zonemap

    monkeypatch.setattr(zonemap, "_driver_plan_budget_ok", lambda _: False)
    s, c, d = pipeline.metadata_sum(spark, out, cfg.run_id, df.schema, "v")
    assert s is None and c == 0
    assert d["n_mixed"] == 0 and "hit" not in called


def test_stripe_sum_stats_overflow_guard():
    """Unit: the encode-side sum stat is exact or absent — values
    whose n·max|bound| could wrap int64 record NO sum (the group then
    decodes), small values record the exact python-int sum."""
    import pyarrow as pa

    from orc_spark.engine import zonemap

    small = zonemap.stripe_zone_stats(pa.array([5, -3, None, 12]))
    assert small["sum_int"] == 14
    assert small["sum_num"] is None
    huge = zonemap.stripe_zone_stats(
        pa.array([(1 << 61) + i for i in range(8)])
    )
    assert huge["sum_int"] is None  # declined, never wrapped
    fl = zonemap.stripe_zone_stats(pa.array([1.5, 2.5, None]))
    assert fl["sum_num"] == 4.0 and fl["sum_int"] is None
    nan = zonemap.stripe_zone_stats(pa.array([1.0, float("nan")]))
    assert nan["sum_num"] is None  # NaN-poisoned: no stats at all


def test_metadata_sum_refuses_live_deletes_and_missing(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(400)], "id bigint, v double"
    )
    out, cfg = _encode(spark, df, ["id", "v"])
    from orc_spark.engine import pipeline

    with pytest.raises(ValueError, match="no stats rows"):
        pipeline.metadata_sum(spark, out, cfg.run_id, df.schema, "nope")
    pipeline.delete_rows_eq(spark, out, cfg.run_id, "id", [7])
    with pytest.raises(ValueError, match="live deletes"):
        pipeline.metadata_sum(spark, out, cfg.run_id, df.schema, "v")


# ------------------------------------------------ group-by pushdown

def _check_group(spark, df, out, cfg, group_col, agg_col, predicate):
    import pyspark.sql.functions as F

    from orc_spark.engine import pipeline, zonemap

    res = pipeline.metadata_group_aggregate(
        spark, out, cfg.run_id, df.schema, group_col, agg_col, predicate
    )
    key = lambda t: (t[0] is not None, str(t[0]))  # noqa: E731 — NULL group first
    got = sorted((tuple(r) for r in res.collect()), key=key)
    q = df.filter(zonemap.predicate_expr(predicate)) if predicate else df
    aggs = [F.count(F.lit(1)).alias("cnt")]
    if agg_col:
        aggs.append(F.sum(agg_col).alias(f"sum_{agg_col}"))
    truth = sorted(
        (tuple(r) for r in q.groupBy(group_col).agg(*aggs).collect()), key=key
    )
    assert len(got) == len(truth), (group_col, agg_col, predicate, got, truth)
    for g, t in zip(got, truth):
        assert g[0] == t[0] and g[1] == t[1], (g, t)
        if agg_col:
            if isinstance(g[2], float):
                assert abs(g[2] - float(t[2])) <= 1e-9 * max(
                    1.0, abs(float(t[2]))
                ), (g, t)
            else:
                assert g[2] == t[2], (g, t)


def test_metadata_group_aggregate_exact(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "value", "event_type")
    )
    out, cfg = _encode(
        spark, df, ["event_id", "value", "event_type"],
        cluster_by="event_type",
    )
    _check_group(spark, df, out, cfg, "event_type", None, None)
    _check_group(spark, df, out, cfg, "event_type", "event_id", None)
    _check_group(spark, df, out, cfg, "event_type", "value", None)
    _check_group(
        spark, df, out, cfg, "event_type", "event_id",
        [("event_id", "<", 500)],
    )
    # high-cardinality unclustered group key: everything decodes,
    # result still exact
    _check_group(
        spark, df, out, cfg, "event_id", "value",
        [("event_id", "<", 40)],
    )


def test_metadata_group_aggregate_is_metadata_dominant(spark, monkeypatch):
    """On a group-clustered layout the decode set is only the stripes
    where two groups meet — spy on decode_job's restriction to prove
    most stripe groups were answered from metadata."""
    from orc_spark.engine import pipeline

    rows = [(i, float(i % 97), f"g{(i * 7919) % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, "event_id bigint, value double, event_type string")
    out, cfg = _encode(
        spark, df, ["event_id", "value", "event_type"],
        cluster_by="event_type", stripe_rows=128,
    )
    total_groups = (
        pipeline.read_stripes(spark, out, cfg.run_id)
        .select("partition_id", "stripe_idx").distinct().count()
    )
    seen = {}
    real = pipeline.decode_job

    def spy(*a, **kw):
        og = kw.get("_only_groups")
        seen["n"] = og if isinstance(og, int) else (
            len(og) if isinstance(og, list) else -1
        )
        return real(*a, **kw)

    monkeypatch.setattr(pipeline, "decode_job", spy)
    _check_group(spark, df, out, cfg, "event_type", "event_id", None)
    n_types = df.select("event_type").distinct().count()
    # boundary stripes only: at most (groups-1) per partition
    assert seen.get("n", 0) <= (n_types - 1) * cfg.n_partitions
    assert seen.get("n", 0) < total_groups / 2


def test_metadata_group_aggregate_nulls_in_group_key(spark):
    rows = [
        (i, None if i % 7 == 0 else f"g{i % 3}", float(i))
        for i in range(1500)
    ]
    df = spark.createDataFrame(rows, "id bigint, g string, v double")
    out, cfg = _encode(spark, df, ["id", "g", "v"], cluster_by="g")
    # NULL is a group in SQL GROUP BY; null-bearing stripes are impure
    # so they decode — the NULL group must come back exactly
    _check_group(spark, df, out, cfg, "g", "v", None)
    _check_group(spark, df, out, cfg, "g", "id", [("id", ">=", 300)])


def _check_group_mm(spark, df, out, cfg, group_col, agg_col, agg, predicate):
    import pyspark.sql.functions as F

    from orc_spark.engine import pipeline, zonemap

    res = pipeline.metadata_group_aggregate(
        spark, out, cfg.run_id, df.schema, group_col, agg_col,
        predicate, agg=agg,
    )
    key = lambda t: (t[0] is not None, str(t[0]))  # noqa: E731
    got = sorted((tuple(r) for r in res.collect()), key=key)
    q = df.filter(zonemap.predicate_expr(predicate)) if predicate else df
    fold = F.min(agg_col) if agg == "min" else F.max(agg_col)
    truth = sorted(
        (
            tuple(r)
            for r in q.groupBy(group_col)
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                fold.alias(f"{agg}_{agg_col}"),
            )
            .collect()
        ),
        key=key,
    )
    assert got == truth, (group_col, agg_col, agg, predicate, got, truth)


def test_metadata_group_aggregate_minmax(spark):
    """agg='min'/'max' fold per-stripe zone bounds: every stat family
    (int, float, string, timestamp) must match Spark's row-level
    GROUP BY exactly, with and without a predicate."""
    df = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "value", "event_type", "ts")
    )
    out, cfg = _encode(
        spark, df, ["event_id", "value", "event_type", "ts"],
        cluster_by="event_type",
    )
    for agg in ("min", "max"):
        _check_group_mm(spark, df, out, cfg, "event_type", "value", agg, None)
        _check_group_mm(spark, df, out, cfg, "event_type", "ts", agg, None)
        _check_group_mm(
            spark, df, out, cfg, "event_type", "event_id", agg,
            [("event_id", ">=", 3000)],
        )
    # string agg col folds through min_str/max_str
    _check_group_mm(spark, df, out, cfg, "event_type", "event_type", "max", None)


def test_metadata_group_aggregate_minmax_is_metadata_dominant(
    spark, monkeypatch
):
    """On a group-clustered layout MIN/MAX decodes only the stripes
    where two groups meet — same decode-set spy as the sum test."""
    from orc_spark.engine import pipeline

    rows = [(i, float(i % 97), f"g{(i * 7919) % 4}") for i in range(4000)]
    df = spark.createDataFrame(
        rows, "event_id bigint, value double, event_type string"
    )
    out, cfg = _encode(
        spark, df, ["event_id", "value", "event_type"],
        cluster_by="event_type", stripe_rows=128,
    )
    total_groups = (
        pipeline.read_stripes(spark, out, cfg.run_id)
        .select("partition_id", "stripe_idx").distinct().count()
    )
    seen = {}
    real = pipeline.decode_job

    def spy(*a, **kw):
        og = kw.get("_only_groups")
        seen["n"] = og if isinstance(og, int) else (
            len(og) if isinstance(og, list) else -1
        )
        return real(*a, **kw)

    monkeypatch.setattr(pipeline, "decode_job", spy)
    _check_group_mm(spark, df, out, cfg, "event_type", "value", "max", None)
    n_types = 4
    assert seen.get("n", 0) <= (n_types - 1) * cfg.n_partitions
    assert seen.get("n", 0) < total_groups / 2


def test_metadata_group_aggregate_minmax_all_null_and_decimal(spark):
    """An all-null agg stripe contributes its rows to cnt with a null
    value (never decoded, never dropped); a decimal agg column — whose
    zone bounds are widened, hence inexact — routes every stripe to
    decode and still returns the exact answer."""
    import decimal

    import pyspark.sql.functions as F

    from orc_spark.engine import pipeline

    rows = [
        (
            i,
            f"g{i % 2}",
            None if i % 2 == 0 else float(i),  # g0's v entirely null
            decimal.Decimal(i) / 4,
        )
        for i in range(1200)
    ]
    df = spark.createDataFrame(
        rows, "id bigint, g string, v double, d decimal(12,2)"
    )
    out, cfg = _encode(spark, df, ["id", "g", "v", "d"], cluster_by="g")
    _check_group_mm(spark, df, out, cfg, "g", "v", "max", None)
    _check_group_mm(spark, df, out, cfg, "g", "v", "min", None)
    # SUM too: the all-null group's sum is SQL-null straight from
    # metadata (rows counted, nothing decoded for the null stripes)
    _check_group(spark, df, out, cfg, "g", "v", None)
    res = pipeline.metadata_group_aggregate(
        spark, out, cfg.run_id, df.schema, "g", "d", agg="max"
    )
    got = {r.g: r.max_d for r in res.collect()}
    exp = {
        r.g: r.m
        for r in df.groupBy("g").agg(F.max("d").alias("m")).collect()
    }
    assert got == exp, (got, exp)


def test_metadata_group_aggregate_bad_agg(spark):
    from orc_spark.engine import pipeline

    df = spark.createDataFrame(
        [(i, f"g{i%2}") for i in range(64)], "id bigint, g string"
    )
    out, cfg = _encode(spark, df, ["id", "g"])
    with pytest.raises(ValueError, match="agg must be"):
        pipeline.metadata_group_aggregate(
            spark, out, cfg.run_id, df.schema, "g", "id", agg="median"
        )


def test_metadata_group_aggregate_refusals(spark):
    from orc_spark.engine import pipeline

    df = spark.createDataFrame(
        [(i, f"g{i%2}", float(i)) for i in range(400)],
        "id bigint, g string, v double",
    )
    out, cfg = _encode(spark, df, ["id", "g", "v"])
    with pytest.raises(ValueError, match="not in result_schema"):
        pipeline.metadata_group_aggregate(
            spark, out, cfg.run_id, df.schema, "nope"
        )
    pipeline.delete_rows_eq(spark, out, cfg.run_id, "id", [3])
    with pytest.raises(ValueError, match="live deletes"):
        pipeline.metadata_group_aggregate(
            spark, out, cfg.run_id, df.schema, "g"
        )


def test_temporal_pin_enables_ts_range_all_proofs(spark):
    """Upper-bounded timestamp conjuncts must prove ALL on a
    ts-clustered layout once the column type pins the int encoding
    (zonemap._conjunct_all pin="us") — without the pin the epoch-days
    candidate always failed `max_int < hi` and everything decoded."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i)) for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp")
    out, cfg = _encode(spark, df, ["id", "ts"], cluster_by="ts")
    lo = base + datetime.timedelta(minutes=800)
    hi = base + datetime.timedelta(minutes=3200)
    d = _check(spark, df, out, cfg, [("ts", ">=", lo), ("ts", "<", hi)])
    assert d["rows_from_metadata"] > 0, d  # the pin makes proofs fire
    assert d["n_mixed"] <= 2 * cfg.n_partitions
    # sum through the same pins
    _check_sum(spark, df, out, cfg, "id", [("ts", "<", hi)])


def test_pushdown_distributed_path_same_answers(spark, monkeypatch):
    """The driver fast path is budget-gated; force the distributed
    classifier (the 100 TB route) and re-check exactness + dominance
    parity between both paths."""
    import datetime

    from orc_spark.engine import pipeline, zonemap

    monkeypatch.setattr(
        zonemap, "_driver_plan_budget_ok", lambda _p: False
    )
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), float(i % 101))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp, v double")
    out, cfg = _encode(spark, df, ["id", "ts", "v"], cluster_by="ts")
    pred = [
        ("ts", ">=", base + datetime.timedelta(minutes=600)),
        ("ts", "<", base + datetime.timedelta(minutes=2400)),
    ]
    d = _check(spark, df, out, cfg, pred)
    assert d["rows_from_metadata"] > 0  # pins work distributed too
    _check_sum(spark, df, out, cfg, "v", pred)
    _check_sum(spark, df, out, cfg, "id", None)
    with pytest.raises(ValueError, match="no stats rows"):
        pipeline.metadata_count(
            spark, out, cfg.run_id, df.schema, [("nope", "==", 1)]
        )


# ------------------------------------------------- top-k pushdown

def test_metadata_topk_exact_and_prunes(spark, monkeypatch):
    import datetime

    import pyspark.sql.functions as F

    from orc_spark.engine import pipeline, zonemap

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), float((i * 37) % 211))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp, v double")
    out, cfg = _encode(spark, df, ["id", "ts", "v"], cluster_by="ts")

    seen = {}
    real = pipeline.decode_job

    def spy(*a, **kw):
        og = kw.get("_only_groups")
        seen["n"] = len(og) if isinstance(og, list) else -1
        return real(*a, **kw)

    monkeypatch.setattr(pipeline, "decode_job", spy)

    def check(order_col, k, desc, pred, tb):
        r = pipeline.metadata_topk(
            spark, out, cfg.run_id, df.schema, order_col, k,
            descending=desc, tiebreak=tb, predicate=pred,
        )
        got = [tuple(x) for x in r.collect()]
        q = df.filter(zonemap.predicate_expr(pred)) if pred else df
        o = [F.col(order_col).desc() if desc else F.col(order_col).asc()]
        if tb:
            o.append(F.col(tb).asc())
        tru = [
            tuple(x)
            for x in q.filter(F.col(order_col).isNotNull())
            .orderBy(*o).limit(k).collect()
        ]
        assert got == tru, (order_col, k, desc, pred, got[:3], tru[:3])

    total_groups = (
        pipeline.read_stripes(spark, out, cfg.run_id)
        .select("partition_id", "stripe_idx").distinct().count()
    )
    check("ts", 10, True, None, "id")
    # ts-clustered: "newest 10" decodes only the tail stripes
    assert 0 < seen["n"] <= cfg.n_partitions + 1, seen
    assert seen["n"] < total_groups / 2
    check("ts", 10, False, None, "id")
    check("v", 6, True, None, "id")          # unclustered: still exact
    check("id", 5, True, [("v", ">", 100.0)], None)
    check("ts", 2000, True, None, "id")      # k beyond one stripe


def test_metadata_topk_nulls_and_refusals(spark):
    from orc_spark.engine import pipeline

    rows = [(i, None if i % 4 == 0 else float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    out, cfg = _encode(spark, df, ["id", "v"])
    r = pipeline.metadata_topk(
        spark, out, cfg.run_id, df.schema, "v", 5, tiebreak="id"
    )
    got = [tuple(x) for x in r.collect()]
    assert [g[1] for g in got] == [999.0, 998.0, 997.0, 995.0, 994.0]
    with pytest.raises(ValueError, match="k must be positive"):
        pipeline.metadata_topk(spark, out, cfg.run_id, df.schema, "v", 0)
    with pytest.raises(ValueError, match="not in result_schema"):
        pipeline.metadata_topk(spark, out, cfg.run_id, df.schema, "nope", 3)
    pipeline.delete_rows_eq(spark, out, cfg.run_id, "id", [1])
    with pytest.raises(ValueError, match="live deletes"):
        pipeline.metadata_topk(spark, out, cfg.run_id, df.schema, "v", 3)


def test_ne_fractional_datetime_on_date_column_never_prunes_rows(spark):
    """Regression: a `!=` literal with a TIME component against a DATE
    column used to prune through the literal's TRUNCATED epoch-days
    candidate — a stripe single-valued at that day lost all its rows,
    though midnight dates differ from a 12:30 literal and match `!=`.
    The days candidate may now prove only when faithful (midnight)."""
    import datetime

    from orc_spark.engine import pipeline, zonemap

    d0 = datetime.date(2024, 1, 20)
    rows = [(i, d0 if i < 500 else datetime.date(2024, 3, 1))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "id bigint, d date")
    out, cfg = _encode(spark, df, ["id", "d"], cluster_by="d")
    pred = [("d", "!=", datetime.datetime(2024, 1, 20, 12, 30))]
    dec = pipeline.decode_job(
        spark, out, cfg.run_id, df.schema, predicate=pred
    ).filter(zonemap.predicate_expr(pred))
    # every row's date-as-midnight differs from the 12:30 literal
    assert dec.count() == 1000
    cnt, _ = pipeline.metadata_count(spark, out, cfg.run_id, df.schema, pred)
    assert cnt == 1000
    # the faithful (midnight) literal still prunes / proves normally
    pred_mid = [("d", "!=", datetime.datetime(2024, 1, 20))]
    cnt2, _ = pipeline.metadata_count(
        spark, out, cfg.run_id, df.schema, pred_mid
    )
    assert cnt2 == 500


def test_keep_pins_prune_lower_bounded_ts_scan(spark, monkeypatch):
    """'Everything since date X' on a ts-clustered table must PRUNE:
    the keep-side OR over temporal candidates kept every stripe for
    lower-bounded ts predicates until pins selected the true unit."""
    import datetime

    import pyspark.sql.functions as F

    from orc_spark.engine import pipeline, zonemap

    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(minutes=i)) for i in range(4000)]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp")
    out, cfg = _encode(spark, df, ["id", "ts"], cluster_by="ts")
    lo = base + datetime.timedelta(minutes=3000)
    pred = [("ts", ">=", lo)]
    dec = pipeline.decode_job(
        spark, out, cfg.run_id, df.schema, predicate=pred
    )
    got = dec.filter(zonemap.predicate_expr(pred)).count()
    assert got == 1000
    # the predicated plan touched fewer stripe groups than exist:
    # count survivors through the same prune the decode ran
    stripes = pipeline.read_stripes(spark, out, cfg.run_id)
    pins = pipeline._temporal_pins(df.schema, pred)
    kept = zonemap.prune_stripes(
        pipeline._epoch_keep_filter(spark, stripes, {"ts"}),
        pred, pins=pins,
    ).select("partition_id", "stripe_idx").distinct().count()
    total = stripes.select("partition_id", "stripe_idx").distinct().count()
    assert kept < total / 2, (kept, total)


def test_metadata_topk_distributed_threshold_path(spark, monkeypatch):
    """Force the windowed distributed threshold (the 100 TB route) and
    check it selects the same top-k as the driver fast path."""
    import datetime

    import pyspark.sql.functions as F

    from orc_spark.engine import pipeline, zonemap

    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(minutes=i), float((i * 13) % 97))
            for i in range(3000)]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp, v double")
    out, cfg = _encode(spark, df, ["id", "ts", "v"], cluster_by="ts")
    monkeypatch.setattr(zonemap, "_driver_plan_budget_ok", lambda _p: False)
    for order_col, k, desc, pred in [
        ("ts", 7, True, None),
        ("ts", 7, False, None),
        ("v", 5, True, [("ts", ">=", base + datetime.timedelta(minutes=500))]),
        ("id", 4000, True, None),  # k beyond the table
    ]:
        r = pipeline.metadata_topk(
            spark, out, cfg.run_id, df.schema, order_col, k,
            descending=desc, tiebreak="id", predicate=pred,
        )
        got = [tuple(x) for x in r.collect()]
        q = df.filter(zonemap.predicate_expr(pred)) if pred else df
        o = [F.col(order_col).desc() if desc else F.col(order_col).asc(),
             F.col("id").asc()]
        tru = [tuple(x) for x in q.filter(F.col(order_col).isNotNull())
               .orderBy(*o).limit(k).collect()]
        assert got == tru, (order_col, k, desc, got[:3], tru[:3])


# --------------------------------------------- review-r5 regressions

def test_as_scalar_matches_pyspark_literal_rule():
    """zonemap._as_scalar must produce the SAME epoch-us a
    predicate_expr F.lit literal carries (PySpark's
    TimestampType.toInternal: naive → driver-local mktime, tz-aware →
    UTC); naive-as-UTC here silently skews every metadata ALL/NONE
    proof by the driver's UTC offset (review r5 #2 — verified live
    under TZ=America/New_York that F.lit follows toInternal)."""
    from pyspark.sql.types import TimestampType

    from orc_spark.engine import zonemap

    tt = TimestampType()
    for dt in [
        datetime.datetime(2024, 3, 1, 12, 0, 0),
        datetime.datetime(2024, 7, 4, 23, 59, 59, 123456),
        datetime.datetime(
            2024, 3, 1, 12, 0, 0, tzinfo=datetime.timezone.utc
        ),
        datetime.datetime(
            2024, 3, 1, 12, 0, 0,
            tzinfo=datetime.timezone(datetime.timedelta(hours=-5)),
        ),
    ]:
        ints, num, s = zonemap._as_scalar(dt)
        assert num is None and s is None
        assert ints[0] == tt.toInternal(dt), dt


def test_metadata_topk_mixed_groups_never_satisfy_k_guarantee(
    spark, monkeypatch
):
    """A zone/bloom-kept MIXED stripe group can hold ZERO matching
    rows; counting its rows toward the k-guarantee pushes the
    threshold past the stripes holding the true top-k (review r5 #1).
    Layout: the high-ts stripes are all predicate-misses, the only
    matches live at low ts — both driver and distributed paths must
    return them."""
    from orc_spark.engine import pipeline, zonemap

    base = datetime.datetime(2024, 1, 1)
    # rows 0..999: status mixes 'err' (matching) ONLY at i < 500;
    # the newest half is pure 'ok' (MIXED at stripe grain because
    # each 100-row stripe spans the boundary region unevenly)
    rows = [
        (i, base + datetime.timedelta(minutes=i),
         "err" if i < 500 and i % 7 == 0 else "ok")
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp, st string")
    out, cfg = _encode(
        spark, df, ["id", "ts", "st"], cluster_by="ts", stripe_rows=100
    )
    pred = [("st", "==", "err")]
    import pyspark.sql.functions as F

    tru = [
        tuple(x)
        for x in df.filter("st = 'err'")
        .orderBy(F.col("ts").desc(), F.col("id").asc())
        .limit(5).collect()
    ]
    for force_distributed in (False, True):
        if force_distributed:
            monkeypatch.setattr(
                zonemap, "_driver_plan_budget_ok", lambda _p: False
            )
        got = [
            tuple(x)
            for x in pipeline.metadata_topk(
                spark, out, cfg.run_id, df.schema, "ts", 5,
                descending=True, tiebreak="id", predicate=pred,
            ).collect()
        ]
        assert got == tru, (force_distributed, got, tru)


def test_metadata_group_aggregate_nested_group_and_agg(spark):
    """Dotted group/agg columns: the old code crashed at the final
    groupBy (unbackticked literal dotted name) and misrouted nested
    int leaves onto the float family (review r5 #4/#5). The leaf type
    now drives the family and grouping rides an internal key."""
    import pyspark.sql.functions as F

    from orc_spark.engine import pipeline

    df = spark.createDataFrame(
        [(i, ("s" + str(i % 5), i * 3)) for i in range(2000)],
        "id bigint, meta struct<status:string, cnt:bigint>",
    )
    out, cfg = _encode(
        spark, df, ["id", "meta"], cluster_by="meta.status",
        stripe_rows=200,
    )
    got = pipeline.metadata_group_aggregate(
        spark, out, cfg.run_id, df.schema, "meta.status", "meta.cnt"
    )
    assert got.schema["sum_meta.cnt"].dataType.typeName() == "long"
    truth = (
        df.groupBy(F.col("meta.status").alias("meta.status"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("meta.cnt").alias("sum_meta.cnt"),
        )
    )
    g = sorted(tuple(r) for r in got.collect())
    t = sorted(tuple(r) for r in truth.collect())
    assert g == t


def test_metadata_sum_distributed_no_int64_wrap(spark, monkeypatch):
    """Stripe sums are individually bounded by the encode guard, but
    their TOTAL is not: the distributed path must accumulate in
    decimal, matching the driver fast path's unbounded Python ints
    (review r5 #6). 2048 values near 2^53 → stripe sums ~2^61 (guard
    passes), total ~2^64 (a plain long SUM wraps negative)."""
    from orc_spark.engine import pipeline

    vals = [(i, (1 << 53) + i) for i in range(2048)]
    df = spark.createDataFrame(vals, "id bigint, big bigint")
    out, cfg = _encode(spark, df, ["id", "big"], stripe_rows=256)
    expected = sum(v for _, v in vals)
    assert expected > (1 << 63)  # the wrap territory
    s_fast, c_fast, d_fast = pipeline.metadata_sum(
        spark, out, cfg.run_id, df.schema, "big"
    )
    monkeypatch.setattr(
        pipeline.zonemap, "_driver_plan_budget_ok", lambda _p: False
    )
    s_dist, c_dist, d_dist = pipeline.metadata_sum(
        spark, out, cfg.run_id, df.schema, "big"
    )
    assert s_fast == s_dist == expected
    assert c_fast == c_dist == 2048
    # both answered from metadata alone (sums were recorded)
    assert d_fast["rows_from_metadata"] == 2048
    assert d_dist["rows_from_metadata"] == 2048


def test_metadata_group_aggregate_int_overflow_loud_not_wrapped(spark):
    """A per-group total past int64 surfaces LOUDLY — an ANSI cast
    overflow error (Spark 4 default) or NULL under non-ANSI — never a
    silently wrapped number (the decimal accumulator makes the
    overflow detectable at all; a long SUM would just wrap)."""
    from orc_spark.engine import pipeline

    df = spark.createDataFrame(
        [(i, "g", (1 << 53) + i) for i in range(2048)],
        "id bigint, grp string, big bigint",
    )
    out, cfg = _encode(
        spark, df, ["id", "grp", "big"], cluster_by="grp",
        stripe_rows=256,
    )
    res = pipeline.metadata_group_aggregate(
        spark, out, cfg.run_id, df.schema, "grp", "big"
    )
    try:
        rows = res.collect()
    except Exception as e:  # ANSI: decimal→long cast overflow error
        assert "OVERFLOW" in str(e).upper(), e
    else:  # non-ANSI: NULL, not a wrapped value
        assert len(rows) == 1 and rows[0]["cnt"] == 2048
        assert rows[0]["sum_big"] is None


def test_cli_plan_missing_column_errors(spark, tmp_path):
    """`plan` must fail loudly on a stats-less predicate column like
    every metadata entry point — an all-zero classification silently
    reads as 'everything prunes' (review r5 #9)."""
    from orc_spark.__main__ import main

    src = str(tmp_path / "plan_src.parquet")
    spark.createDataFrame(
        [(i, float(i)) for i in range(500)], "id bigint, v double"
    ).write.parquet(src)
    out = str(tmp_path / "plan_stripes")
    assert main([
        "encode", src, "--out", out, "--run-id", "p1", "--key", "id",
        "--partitions", "2", "--stripe-rows", "128",
    ]) == 0
    with pytest.raises(SystemExit, match="no stats rows"):
        main([
            "plan", "--out", out, "--run-id", "p1",
            "--schema-from", src, "--where", "idd>=100",
        ])


def test_metadata_count_dnf_matches_and_uses_metadata(spark, tmp_path):
    """DNF count: equals the plain OR filter on clustered AND hash
    layouts; on the clustered layout most rows come from metadata;
    overlapping branches are not double-counted."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "event_type", "value"
    )
    mx = int(ev.agg(F.max("event_id")).first()[0])
    for cluster in (True, False):
        cfg = pipeline.EncodeJobConfig(
            out_dir=str(tmp_path / f"c{cluster}"), run_id="d",
            key="event_id", n_partitions=2, stripe_rows=64,
            cluster_by="event_id" if cluster else None,
        )
        pipeline.run_encode_job(spark, ev, cfg)
        branches = [
            [("event_id", "<=", mx // 4)],
            # overlaps branch 1 on purpose:
            [("event_id", "<=", mx // 8), ("event_type", "==", "click")],
            [("event_id", ">=", mx - mx // 10)],
        ]
        n, detail = pipeline.metadata_count_dnf(
            spark, cfg.out_dir, "d", ev.schema, branches
        )
        want = ev.filter(
            (F.col("event_id") <= mx // 4)
            | (
                (F.col("event_id") <= mx // 8)
                & (F.col("event_type") == "click")
            )
            | (F.col("event_id") >= mx - mx // 10)
        ).count()
        assert n == want, (cluster, n, want, detail)
        if cluster:
            assert detail["rows_from_metadata"] > want * 0.5, detail

    # missing column is loud
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no stats rows"):
        pipeline.metadata_count_dnf(
            spark, str(tmp_path / "cTrue"), "d", ev.schema,
            [[("nope", ">=", 1)]],
        )


def test_metadata_sum_dnf_matches_including_nulls_and_overlap(spark, tmp_path):
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline

    rows = [
        (i, None if i % 9 == 0 else float(i % 97)) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "k long, v double")
    cfg = pipeline.EncodeJobConfig(
        out_dir=str(tmp_path / "r"), run_id="s", key="k",
        n_partitions=2, stripe_rows=128, cluster_by="k",
    )
    pipeline.run_encode_job(spark, df, cfg)
    branches = [
        [("k", "<=", 300)],
        [("k", ">=", 150), ("k", "<=", 400)],   # overlaps branch 1
        [("k", ">=", 1800)],
    ]
    total, detail = pipeline.metadata_sum_dnf(
        spark, cfg.out_dir, "s", df.schema, "v", branches
    )
    want = df.filter(
        (F.col("k") <= 300)
        | ((F.col("k") >= 150) & (F.col("k") <= 400))
        | (F.col("k") >= 1800)
    ).agg(F.sum("v")).first()[0]
    assert abs(total - want) < 1e-9, (total, want, detail)
    assert detail["from_metadata"], detail

    # empty match -> None (SQL SUM of no rows)
    t2, _ = pipeline.metadata_sum_dnf(
        spark, cfg.out_dir, "s", df.schema, "v",
        [[("k", ">=", 10_000)]],
    )
    assert t2 is None


def test_metadata_minmax_dnf_families_and_truncation_refusal(spark, tmp_path):
    """DNF MIN/MAX matches the plain OR filter for int, float, and
    SHORT string leaves; long (truncated-stat) strings route entirely
    through the decode half and stay exact."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline

    rows = [
        (i, float((i * 13) % 997), f"k{i % 83:04d}", "x" * 300 + f"{i:05d}")
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "k long, v double, s string, t string")
    cfg = pipeline.EncodeJobConfig(
        out_dir=str(tmp_path / "r"), run_id="mm", key="k",
        n_partitions=2, stripe_rows=128, cluster_by="k",
    )
    pipeline.run_encode_job(spark, df, cfg)
    branches = [[("k", "<=", 200)], [("k", ">=", 1800)]]
    want_df = df.filter((F.col("k") <= 200) | (F.col("k") >= 1800))
    for col in ("k", "v", "s", "t"):
        mn, mx, detail = pipeline.metadata_minmax_dnf(
            spark, cfg.out_dir, "mm", df.schema, col, branches
        )
        w = want_df.agg(F.min(col), F.max(col)).first()
        assert (mn, mx) == (w[0], w[1]), (col, mn, mx, w, detail)
        if col in ("k", "v", "s"):
            assert detail["from_metadata"], (col, detail)
        else:
            # truncated stats are inexact: every group decodes
            assert not detail["from_metadata"], detail
