"""Zone maps: per-stripe min/max stats + metadata-only predicate
pushdown (orc_spark/engine/zonemap.py). The invariant under test:
decode(prune(P)) + residual filter == decode() + filter — and, when
the encode clustered the filter column, pruning actually drops stripe
groups (effectiveness, not just safety)."""

from __future__ import annotations

import datetime
import os
import tempfile
import uuid

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import SF_DIR


# ------------------------------------------------------ stats kernel

def test_zone_stats_int_family():
    from orc_spark.engine import zonemap

    s = zonemap.stripe_zone_stats(pa.array([5, -3, None, 12]))
    assert (s["min_int"], s["max_int"], s["null_count"]) == (-3, 12, 1)
    assert s["min_num"] is None and s["min_str"] is None

    b = zonemap.stripe_zone_stats(pa.array([True, True, False]))
    assert (b["min_int"], b["max_int"]) == (0, 1)

    ts = pa.array(
        [datetime.datetime(2024, 1, 1), datetime.datetime(2024, 6, 1)],
        type=pa.timestamp("us"),
    )
    t = zonemap.stripe_zone_stats(ts)
    assert t["min_int"] == 1704067200 * 10**6
    assert t["max_int"] == int(
        datetime.datetime(2024, 6, 1).timestamp() * 10**6
    )


def test_zone_stats_float_and_nan_poison():
    from orc_spark.engine import zonemap

    s = zonemap.stripe_zone_stats(pa.array([1.5, -2.25, 0.0]))
    assert (s["min_num"], s["max_num"]) == (-2.25, 1.5)
    # NaN orders above every number in Spark: bounds would wrongly
    # prune `c > huge`, so a NaN stripe must record no stats at all
    p = zonemap.stripe_zone_stats(pa.array([1.0, float("nan")]))
    assert p["min_num"] is None and p["max_num"] is None


def test_zone_stats_string_empty_allnull():
    from orc_spark.engine import zonemap

    s = zonemap.stripe_zone_stats(pa.array(["pear", "apple", None, "fig"]))
    assert (s["min_str"], s["max_str"], s["null_count"]) == ("apple", "pear", 1)
    e = zonemap.stripe_zone_stats(pa.array([], type=pa.int64()))
    assert all(
        e[k] is None for k in ("min_int", "max_int", "min_num", "min_str")
    )
    a = zonemap.stripe_zone_stats(pa.array([None, None], type=pa.string()))
    assert a["null_count"] == 2 and a["min_str"] is None


# --------------------------------------------------------- end-to-end

def _encode(spark, df, key, cluster_by=None, n_partitions=4):
    from orc_spark.engine import pipeline

    out = tempfile.mkdtemp(prefix="orcspark_zm_")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out,
        run_id=f"zm-{uuid.uuid4().hex[:8]}",
        key=key,
        columns=[f.name for f in df.schema.fields],
        n_partitions=n_partitions,
        cluster_by=cluster_by,
    )
    pipeline.run_encode_job(spark, df, cfg)
    return out, cfg


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("clustered", [True, False])
def test_prune_matches_plain_filter(spark, clustered):
    """Safety on both layouts; effectiveness on the clustered one."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "event_type", "value")
    )
    out, cfg = _encode(
        spark, events, "event_id",
        cluster_by="event_id" if clustered else None,
    )
    pred = [("event_id", "between", (2000, 3999))]
    got = pipeline.decode_job(
        spark, out, cfg.run_id, events.schema, predicate=pred
    ).filter(zonemap.predicate_expr(pred))
    want = events.filter(F.col("event_id").between(2000, 3999))
    assert _rows(got) == _rows(want)

    stripes = pipeline.read_stripes(spark, out, cfg.run_id)
    total = stripes.count()
    kept = zonemap.prune_stripes(stripes, pred).count()
    if clustered:
        # ~20% selectivity over a clustered column must drop groups
        assert kept < total * 0.8, (kept, total)
    else:
        assert kept <= total  # safety only: hash layout may keep all


def test_prune_string_and_float_conjuncts(spark):
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "event_type", "value")
    )
    # partition BY the string key: each partition then holds one or
    # two event_types, so equality pruning can drop whole partitions
    # (clustering within a hash-by-id layout can't — every stripe
    # would still contain every type)
    out, cfg = _encode(spark, events, "event_type", cluster_by="event_type")
    pred = [("event_type", "==", "click"), ("value", ">=", 50.0)]
    got = pipeline.decode_job(
        spark, out, cfg.run_id, events.schema, predicate=pred
    ).filter(zonemap.predicate_expr(pred))
    want = events.filter(
        (F.col("event_type") == "click") & (F.col("value") >= 50.0)
    )
    assert _rows(got) == _rows(want)
    stripes = pipeline.read_stripes(spark, out, cfg.run_id)
    assert (
        zonemap.prune_stripes(stripes, pred).count() < stripes.count()
    )  # string clustering prunes the == conjunct


def test_prune_timestamp_predicate(spark):
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts"
    )
    out, cfg = _encode(spark, events, "event_id", cluster_by="ts")
    cut = datetime.datetime(2024, 6, 1)
    pred = [("ts", ">=", cut)]
    got = pipeline.decode_job(
        spark, out, cfg.run_id, events.schema, predicate=pred
    ).filter(zonemap.predicate_expr(pred))
    want = events.filter(F.col("ts") >= F.lit(cut))
    assert _rows(got) == _rows(want)


def test_nan_stripes_never_pruned(spark):
    """A stripe containing NaN records no bounds and must survive any
    numeric predicate (Spark orders NaN above all numbers, so
    `value > 1e300` still matches the NaN rows)."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    rows = [(i, float("nan") if i % 7 == 0 else float(i)) for i in range(256)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    out, cfg = _encode(spark, df, "event_id", cluster_by="value")
    pred = [("value", ">", 1e300)]
    got = pipeline.decode_job(
        spark, out, cfg.run_id, df.schema, predicate=pred
    ).filter(zonemap.predicate_expr(pred))
    want = df.filter(F.col("value") > 1e300)
    # repr-compare: NaN != NaN would fail a plain tuple comparison
    # even on identical rows
    assert sorted(map(repr, _rows(got))) == sorted(map(repr, _rows(want)))
    assert want.count() > 0  # the NaN rows — the trap this test pins


def test_predicate_validation():
    from orc_spark.engine import zonemap

    with pytest.raises(ValueError):
        zonemap._conjunct_keep("like", "x%")  # != is supported since r4
    with pytest.raises(TypeError):
        zonemap._as_scalar(object())


# ---------------------------------------------------------- CLI surface

def test_cli_where_parse():
    from orc_spark.__main__ import _parse_where

    assert _parse_where("event_id>=2500") == ("event_id", ">=", 2500)
    assert _parse_where("value < 1.5") == ("value", "<", 1.5)
    assert _parse_where("lang=='en'") == ("lang", "==", "en")
    assert _parse_where("lang = en") == ("lang", "=", "en")
    # quoting forces string VERBATIM — numeric/date-shaped values in
    # string columns stay strings (ADVICE r3: there was no way to
    # express this, and coercion + bloom mismatch silently lost rows)
    assert _parse_where("id='123'") == ("id", "=", "123")
    assert _parse_where('day="2024-03-01"') == ("day", "=", "2024-03-01")
    assert _parse_where("day=2024-03-01") == (
        "day", "=", datetime.date(2024, 3, 1)
    )
    # operator characters INSIDE a quoted literal are data, not
    # operators — the scan is anchored after the column name, so the
    # embedded `<` / `>=` can't split the clause (ADVICE r4 #3)
    assert _parse_where("tag='a<b'") == ("tag", "=", "a<b")
    assert _parse_where("id='x>=1'") == ("id", "=", "x>=1")
    assert _parse_where('note=="a=b<c"') == ("note", "==", "a=b<c")
    with pytest.raises(ValueError):
        _parse_where("no clause here")
    with pytest.raises(ValueError):
        _parse_where(">=5")


def test_cli_encode_cluster_decode_where(spark, tmp_path):
    """encode --cluster-by -> decode --where/--columns through the CLI
    entry (in-process: the CLI reuses the session via getOrCreate)."""
    import pyarrow.parquet as pq

    from orc_spark.__main__ import main

    src = str(tmp_path / "events_src.parquet")
    (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "event_type", "value")
        .write.mode("overwrite").parquet(src)
    )
    out = str(tmp_path / "stripes")
    dec_out = str(tmp_path / "decoded.parquet")
    assert main([
        "encode", src, "--out", out, "--run-id", "cli-zm",
        "--key", "event_id", "--partitions", "4",
        "--cluster-by", "event_id",
    ]) == 0
    assert main([
        "decode", "--out", out, "--run-id", "cli-zm",
        "--schema-from", src, "--output", dec_out,
        "--columns", "event_id,value",
        "--where", "event_id>=2000", "--where", "event_id<=3999",
    ]) == 0
    got = pq.read_table(dec_out)
    assert got.schema.names == ["event_id", "value"]
    ids = sorted(got.column("event_id").to_pylist())
    want = sorted(
        r.event_id
        for r in spark.read.parquet(src)
        .filter("event_id between 2000 and 3999")
        .select("event_id").collect()
    )
    assert ids == want


def test_date_column_and_mismatched_temporal_predicates(spark):
    """Date32 stats are epoch-days; a datetime predicate (epoch-us,
    11 orders of magnitude off) must still never wrongly prune — both
    encodings are checked, OR-combined. And the matched date-on-date
    case both prunes and stays exact."""
    import datetime as dt

    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    base = dt.date(2024, 1, 1)
    # partition BY quarter: partitions carry disjoint date ranges, so
    # a selective date predicate can drop whole stripe groups (the
    # test_prune_string_and_float_conjuncts layout trick)
    rows = [
        ((i % 365) // 92, base + dt.timedelta(days=i % 365))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "q long, d date")
    out, cfg = _encode(spark, df, "q", cluster_by="d")

    cut = dt.date(2024, 10, 1)
    for pred_val in (cut, dt.datetime(2024, 10, 1, 12, 0)):
        pred = [("d", ">=", pred_val)]
        got = pipeline.decode_job(
            spark, out, cfg.run_id, df.schema, predicate=pred
        ).filter(zonemap.predicate_expr(pred))
        want = df.filter(F.col("d") >= F.lit(pred_val))
        assert _rows(got) == _rows(want), type(pred_val)

    stripes = pipeline.read_stripes(spark, out, cfg.run_id)
    kept = zonemap.prune_stripes(stripes, [("d", ">=", cut)]).count()
    assert kept < stripes.count()  # matched-type pruning is effective


def test_bloom_point_lookup_prunes_hash_layout(spark):
    """Equality on a high-cardinality UNCLUSTERED int column: zone maps
    keep every group (each spans the whole range after hashing), the
    bloom bitset keeps ~1 — and absent values prune everything while
    decode stays exact."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "event_type", "value")
    )
    eid = int(events.agg(F.max("event_id")).first()[0]) // 2  # present at any sf
    out, cfg = _encode(spark, events, "event_id", n_partitions=8)
    stripes = pipeline.read_stripes(spark, out, cfg.run_id)
    total = stripes.select("partition_id", "epoch", "stripe_idx").distinct().count()
    pred = [("event_id", "==", eid)]
    kept = (
        zonemap.prune_stripes(stripes, pred)
        .select("partition_id", "epoch", "stripe_idx").distinct().count()
    )
    assert kept < total / 2, (kept, total)  # fp-rate slack; typically 1
    got = pipeline.decode_job(
        spark, out, cfg.run_id, events.schema, predicate=pred
    ).filter(zonemap.predicate_expr(pred))
    want = events.filter(F.col("event_id") == eid)
    assert _rows(got) == _rows(want) and want.count() >= 1
    # absent values (int and string) prune every group
    assert zonemap.prune_stripes(stripes, [("event_id", "==", 10**12)]).count() == 0
    assert zonemap.prune_stripes(
        stripes, [("event_type", "==", "zzz_not_there")]
    ).count() == 0


def test_bloom_kernel_properties():
    """No false negatives by construction; long text skips the bloom."""
    import pyarrow as pa

    from orc_spark.engine import zonemap

    arr = pa.array([f"u{i}" for i in range(2000)] + [None])
    bloom = zonemap.stripe_bloom(arr)
    assert bloom is not None
    text = pa.array(["long article body " * 50] * 100)
    assert zonemap.stripe_bloom(text) is None  # avg len gate
    assert zonemap.stripe_bloom(pa.array([], type=pa.int64())) is None
    assert zonemap.stripe_bloom(pa.array([1.5, 2.5])) is None  # floats: eq is fuzzy


def test_row_level_residual_filters_inside_decode(spark):
    """With a predicate, decode_job's output is already row-filtered
    (Arrow-side, before the Spark boundary) — except float-NaN rows,
    which are conservatively kept for Spark's NaN ordering. The outer
    predicate_expr stays the exactness gate either way."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    rows = [(i, float("nan") if i % 50 == 0 else float(i)) for i in range(400)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    out, cfg = _encode(spark, df, "event_id")
    pred = [("event_id", "between", (100, 199)), ("value", ">", 150.0)]
    dec = pipeline.decode_job(spark, out, cfg.run_id, df.schema, predicate=pred)
    raw_rows = dec.collect()
    # int conjunct applied exactly; float conjunct keeps its NaN rows
    ids = sorted(r.event_id for r in raw_rows)
    import math

    expect = sorted(
        i for i in range(100, 200) if (i % 50 == 0) or i > 150
    )
    assert ids == expect, ids
    got = dec.filter(zonemap.predicate_expr(pred))
    want = df.filter(
        F.col("event_id").between(100, 199) & (F.col("value") > 150.0)
    )
    assert sorted(map(repr, _rows(got))) == sorted(map(repr, _rows(want)))


def test_in_list_predicate_prunes_and_stays_exact(spark):
    """IN-list point lookups: blooms OR-combined across members, zone
    ranges OR-combined; empty IN-list prunes everything; decode ==
    plain isin filter."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "event_type", "value")
    )
    mx = int(events.agg(F.max("event_id")).first()[0])
    wanted = [mx // 4, mx // 2, mx - 1]
    out, cfg = _encode(spark, events, "event_id", n_partitions=8)
    stripes = pipeline.read_stripes(spark, out, cfg.run_id)
    total = stripes.select("partition_id", "epoch", "stripe_idx").distinct().count()
    pred = [("event_id", "in", wanted)]
    kept = (
        zonemap.prune_stripes(stripes, pred)
        .select("partition_id", "epoch", "stripe_idx").distinct().count()
    )
    assert kept <= min(total, len(wanted) + 1), (kept, total)
    got = pipeline.decode_job(
        spark, out, cfg.run_id, events.schema, predicate=pred
    ).filter(zonemap.predicate_expr(pred))
    want = events.filter(F.col("event_id").isin(wanted))
    assert _rows(got) == _rows(want) and want.count() == len(wanted)
    assert zonemap.prune_stripes(stripes, [("event_id", "in", [])]).count() == 0


def test_cli_where_in_parse():
    from orc_spark.__main__ import _parse_where

    assert _parse_where("event_id in 1,2,3") == ("event_id", "in", [1, 2, 3])
    assert _parse_where("lang IN en,fr") == ("lang", "in", ["en", "fr"])
    # 'in' inside a comparison clause must not be misparsed
    assert _parse_where("domain=='login'") == ("domain", "==", "login")
    # quoted IN-list members keep embedded commas/operators verbatim
    assert _parse_where("tag in 'a,b','c<d',e") == (
        "tag", "in", ["a,b", "c<d", "e"]
    )


def test_bloom_hash_quality_on_near_identical_strings():
    """Same-length URLs differing in a few digits (the crawl shape)
    must not collapse the hash space: distinct prehashes == distinct
    inputs, and the probe-side false-positive rate stays near theory
    (~0.4% at 14 bits/value) instead of the ~80% a linear byte-sum
    gives. Regression test for the v1->v2 bloom hash."""
    import numpy as np

    from orc_spark.codecs.framing import _string_parts
    from orc_spark.engine import zonemap as zm

    urls = [f"https://www.site{i % 16:04d}.example/p/{i:08d}" for i in range(20000)]
    arr = pa.array(urls)
    lengths, data = _string_parts(arr)
    pre = zm._string_prehash(lengths, np.frombuffer(data, np.uint8))
    assert len(np.unique(pre)) == len(urls)

    blob = zm.stripe_bloom(arr)
    assert blob[:1] == zm._BLOOM_VERSION
    assert blob[1:2] == zm.BLOOM_DOMAIN_STR

    def member(v):
        pairs, domain = zm._value_hash_pairs(v)
        return bool(zm.bloom_membership([blob], pairs, domain)[0])

    assert all(member(u) for u in urls[:200])  # no false negatives
    fp = sum(
        member(f"https://www.nope{i:04d}.example/q/{i:08d}") for i in range(1000)
    )
    assert fp < 30, fp  # <3% observed; linear hash scored ~800 here


def test_bloom_unknown_version_never_vetoes(spark):
    """A bloom written by a different hash version must keep, not
    prune (false negatives = wrong results)."""
    import pandas as pd

    from orc_spark.engine import zonemap as zm

    expr = zm.bloom_keep_expr("x")
    df = spark.createDataFrame(
        [(b"\x01" + b"\x00" * 128,), (None,), (b"",)], "bloom binary"
    )
    assert [r[0] for r in df.select(expr).collect()] == [True, True, True]


def test_bloom_cross_domain_never_vetoes():
    """ADVICE r3 (high): a probe value hashing in a DIFFERENT domain
    than the bloom's writer must keep, never veto — Spark's residual
    row filter can still match via implicit casts ('123' == 123)."""
    from orc_spark.engine import zonemap as zm

    str_blob = zm.stripe_bloom(pa.array(["abc", "456", "2024-03-01"]))
    int_blob = zm.stripe_bloom(pa.array([1, 2, 123456]))
    assert str_blob[1:2] == zm.BLOOM_DOMAIN_STR
    assert int_blob[1:2] == zm.BLOOM_DOMAIN_INT

    def keeps(blob, value):
        pairs, domain = zm._value_hash_pairs(value)
        return bool(zm.bloom_membership([blob], pairs, domain)[0])

    # int literal vs string bloom: '456' is present as a STRING — the
    # int-domain probe must not veto (and vice versa)
    assert keeps(str_blob, 456)
    assert keeps(str_blob, datetime.date(2024, 3, 1))
    assert keeps(int_blob, "123456")
    # same-domain absent values still veto (pruning works at all)
    assert not keeps(str_blob, "zzz-not-there")
    assert not keeps(int_blob, 999_999_999)


def test_bloom_temporal_probe_checks_both_encodings():
    """A datetime literal must probe BOTH the epoch-us and epoch-days
    hash streams: a date32 column's bloom holds epoch-days hashes and
    r3's us-only probe falsely vetoed it (ADVICE r3, high)."""
    from orc_spark.engine import zonemap as zm

    days = pa.array(
        [datetime.date(2024, 3, 1), datetime.date(2024, 3, 2)],
        type=pa.date32(),
    )
    ts = pa.array(
        [datetime.datetime(2024, 3, 1), datetime.datetime(2024, 3, 2)],
        type=pa.timestamp("us"),
    )
    date_blob = zm.stripe_bloom(days)
    ts_blob = zm.stripe_bloom(ts)

    def keeps(blob, value):
        pairs, domain = zm._value_hash_pairs(value)
        return bool(zm.bloom_membership([blob], pairs, domain)[0])

    # datetime literal vs date32 column and date literal vs timestamp
    # column: either encoding matching keeps the stripe
    assert keeps(date_blob, datetime.datetime(2024, 3, 1))
    assert keeps(ts_blob, datetime.date(2024, 3, 2))
    assert keeps(date_blob, datetime.date(2024, 3, 1))
    assert keeps(ts_blob, datetime.datetime(2024, 3, 2))
    # absent dates still veto under both encodings
    assert not keeps(date_blob, datetime.date(2031, 1, 1))
    assert not keeps(ts_blob, datetime.datetime(2031, 1, 1))


def test_bloom_membership_vectorized_beats_loop():
    """bloom_membership is pure array ops — >=10x over a per-blob
    Python probe loop on a metadata-scale batch (VERDICT r3 #5; at
    10^12-doc scale the stripes table is 10^7+ rows and the loop was
    the pruning bottleneck). Rates compared on process-time."""
    import time

    from orc_spark.engine import zonemap as zm

    blob = zm.stripe_bloom(pa.array([f"u{i}" for i in range(2000)]))
    pairs, domain = zm._value_hash_pairs("u77")
    n_vec, n_loop = 1_000_000, 50_000
    # the arrow UDF hands bloom_membership the pa.Array itself — build
    # it outside the timed region, exactly as Spark does
    blobs_vec = pa.array([blob] * n_vec, type=pa.large_binary())

    # warm at full size: this VM's first-touch page faults are ~1000x
    # slow in degraded phases and would charge one-off allocation cost
    # to the kernel under test (see tests/conftest.py malloc tunables)
    zm.bloom_membership(blobs_vec, pairs, domain)
    t0 = time.process_time()
    got = zm.bloom_membership(blobs_vec, pairs, domain)
    vec_per_row = (time.process_time() - t0) / n_vec
    assert got.all() and len(got) == n_vec

    mask = 0xFFFFFFFFFFFFFFFF

    def loop_member(b):
        bits = np.frombuffer(b, np.uint8, offset=2)
        m = len(bits) << 3
        keep = False
        for h1, h2 in pairs:
            ok = True
            for k in range(zm.BLOOM_K):
                idx = ((h1 + k * h2) & mask) % m
                if not (bits[idx >> 3] >> (idx & 7)) & 1:
                    ok = False
                    break
            keep = keep or ok
        return keep

    t0 = time.process_time()
    for _ in range(n_loop):
        loop_member(blob)
    loop_per_row = (time.process_time() - t0) / n_loop

    assert vec_per_row * 10 <= loop_per_row, (vec_per_row, loop_per_row)


def test_fused_prune_equals_two_job_path_and_caps(spark):
    """The ONE-job fused prune (epoch keep + zone + driver-side bloom)
    must select exactly the stripe groups the two-job path
    (_epoch_keep_filter -> prune_stripes) selects; above max_groups it
    signals fallback with None; an absent value keeps nothing."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "event_type", "value")
    )
    # two epochs: resume after faulting one partition, so epoch keep
    # logic is actually exercised by the fused job
    out = tempfile.mkdtemp(prefix="orcspark_fused_")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id="fz", key="event_id",
        columns=["event_id", "event_type", "value"], n_partitions=4,
        cluster_by="event_id",
        fault_spec={"columns": ["value"], "partitions": [1]},
    )
    pipeline.run_encode_job(spark, events, cfg)
    cfg2 = pipeline.EncodeJobConfig(
        out_dir=out, run_id="fz", key="event_id",
        columns=["event_id", "event_type", "value"], n_partitions=4,
        cluster_by="event_id",
    )
    pipeline.run_encode_job(spark, events, cfg2)

    stripes = pipeline.read_stripes(spark, out, "fz")
    want = {"event_id", "event_type", "value"}
    mx = int(events.agg(F.max("event_id")).first()[0])
    pred = [("event_id", "between", (0, mx // 3)), ("event_type", "==", "click")]

    def groups(df):
        return sorted(
            (int(r.partition_id), int(r.epoch), int(r.stripe_idx))
            for r in df.select("partition_id", "epoch", "stripe_idx")
            .distinct().collect()
        )

    fused = zonemap.fused_prune(stripes, want, pred)
    assert fused is not None
    old = zonemap.prune_stripes(
        pipeline._epoch_keep_filter(spark, stripes, want), pred
    )
    assert groups(fused) == groups(old)
    assert groups(fused)  # non-degenerate: something survives

    # the driver-side fast path (footer-gated planning off the local
    # stripes dir) must select exactly the same groups as the
    # distributed metadata job — same epoch keep, zones, and blooms
    sdir = os.path.join(out, "stripes")
    assert zonemap._driver_plan_budget_ok(sdir)
    fast = zonemap.fused_prune(stripes, want, pred, stripes_path=sdir)
    assert fast is not None and groups(fast) == groups(old)

    # cap: one group allowed, more survive -> fallback signal
    assert zonemap.fused_prune(stripes, want, pred, max_groups=0) is None
    assert (
        zonemap.fused_prune(
            stripes, want, pred, max_groups=0, stripes_path=sdir
        )
        is None
    )

    # absent value: bloom + zones veto everything, empty result
    gone = zonemap.fused_prune(stripes, want, [("event_id", "==", 10**12)])
    assert gone is not None and gone.count() == 0

    # end-to-end: fused-predicated decode equals the plain filter
    dec = pipeline.decode_job(
        spark, out, "fz", events.schema, predicate=pred
    ).filter(zonemap.predicate_expr(pred))
    expect = events.filter(
        F.col("event_id").between(0, mx // 3)
        & (F.col("event_type") == "click")
    )
    assert _rows(dec) == _rows(expect) and expect.count() > 0


def test_fused_prune_epoch0_matches_unpredicated_keep(spark):
    """ADVICE r4 #2: a faulted, never-resumed SINGLE-epoch table must
    select the same stripe set on the predicated and unpredicated
    decode paths. _epoch_keep_filter short-circuits at max epoch == 0
    and keeps incomplete partitions; fused_prune (both the driver fast
    path and the distributed job) now mirrors that instead of silently
    dropping them to zero rows."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "event_type", "value")
        .limit(2000)
    )
    out = tempfile.mkdtemp(prefix="orcspark_ep0_")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id="e0", key="event_id",
        columns=["event_id", "event_type", "value"], n_partitions=4,
        fault_spec={"columns": ["value"], "partitions": [1]},
    )
    try:
        pipeline.run_encode_job(spark, events, cfg)
    except Exception:
        pass  # the faulted run reports its failure; stripes are on disk

    stripes = pipeline.read_stripes(spark, out, "e0")
    want = {"event_id", "event_type", "value"}

    def groups(df):
        return sorted(
            (int(r.partition_id), int(r.epoch), int(r.stripe_idx))
            for r in df.select("partition_id", "epoch", "stripe_idx")
            .distinct().collect()
        )

    # a predicate zones can never prune: both paths must keep exactly
    # what the unpredicated epoch filter keeps — including the faulted
    # partition's completed columns
    pred = [("event_id", ">=", -1)]
    unpred = groups(pipeline._epoch_keep_filter(spark, stripes, want))
    assert any(pid == 1 for pid, _, _ in unpred)  # incomplete, still kept
    sdir = os.path.join(out, "stripes")
    fast = zonemap.fused_prune(stripes, want, pred, stripes_path=sdir)
    dist = zonemap.fused_prune(stripes, want, pred, stripes_path=None)
    assert groups(fast) == unpred
    assert groups(dist) == unpred


def test_null_and_inequality_predicates(spark):
    """r4 ops: is_null / not_null prune on the per-stripe null_count;
    != prunes only provably single-valued stripes. Exactness against
    plain filters on both; effectiveness on clustered layouts."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("lang")).alias("lang_n"),
    )
    out = tempfile.mkdtemp(prefix="orcspark_nullpred_")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id="np", key="doc_id",
        columns=["doc_id", "lang_n"], n_partitions=4,
        cluster_by="lang_n", stripe_rows=32,
    )
    pipeline.run_encode_job(spark, docs, cfg)
    stripes = pipeline.read_stripes(spark, out, "np")
    total = stripes.select("partition_id", "epoch", "stripe_idx").distinct().count()

    # is_null: exact + prunes (nulls sort first under cluster_by, so
    # most stripes are provably null-free)
    pred = [("lang_n", "is_null", None)]
    got = pipeline.decode_job(
        spark, out, "np", docs.schema, predicate=pred
    ).filter(zonemap.predicate_expr(pred))
    assert _rows(got) == _rows(docs.filter(F.col("lang_n").isNull()))
    kept = (
        zonemap.prune_stripes(stripes, pred)
        .select("partition_id", "epoch", "stripe_idx").distinct().count()
    )
    assert 0 < kept < total, (kept, total)

    # not_null + != composition: exact; != prunes the single-valued
    # stripes of the excluded language
    pred2 = [("lang_n", "not_null", None), ("lang_n", "!=", "en")]
    got2 = pipeline.decode_job(
        spark, out, "np", docs.schema, predicate=pred2
    ).filter(zonemap.predicate_expr(pred2))
    want2 = docs.filter(F.col("lang_n").isNotNull() & (F.col("lang_n") != "en"))
    assert _rows(got2) == _rows(want2) and want2.count() > 0
    kept2 = (
        zonemap.prune_stripes(stripes, pred2)
        .select("partition_id", "epoch", "stripe_idx").distinct().count()
    )
    assert kept2 < total, (kept2, total)

    # fused path agrees with the two-job path on the composed predicate
    fused = zonemap.fused_prune(stripes, {"doc_id", "lang_n"}, pred2)
    old = zonemap.prune_stripes(
        pipeline._epoch_keep_filter(spark, stripes, {"doc_id", "lang_n"}),
        pred2,
    )
    key3 = lambda df: sorted(
        (int(r.partition_id), int(r.epoch), int(r.stripe_idx))
        for r in df.select("partition_id", "epoch", "stripe_idx")
        .distinct().collect()
    )
    assert key3(fused) == key3(old)

    # a stripe with min==max==v and nulls still prunes != v (null rows
    # never match != under Spark WHERE)
    import pyarrow as pa_

    from orc_spark.engine.zonemap import stripe_zone_stats
    df1 = spark.createDataFrame(
        [("en",), ("en",), (None,)], "lang_n string"
    ).withColumn("doc_id", F.lit(1).cast("long"))
    s = stripe_zone_stats(pa_.array(["en", "en", None]))
    assert s["min_str"] == s["max_str"] == "en" and s["null_count"] == 1


def test_cli_where_null_and_ne_parse():
    from orc_spark.__main__ import _parse_where

    assert _parse_where("lang is null") == ("lang", "is_null", None)
    assert _parse_where("lang IS NOT NULL") == ("lang", "not_null", None)
    assert _parse_where("lang!=en") == ("lang", "!=", "en")
    assert _parse_where("event_id != 5") == ("event_id", "!=", 5)


def test_decimal_zone_stats_and_prune(spark):
    """Decimal columns prune through one-ulp-widened double bounds
    (conservative by construction), and the predicated decode over a
    decimal-clustered layout stays exact."""
    import pyarrow as pa

    from orc_spark.engine import pipeline, zonemap

    from decimal import Decimal

    s = zonemap.stripe_zone_stats(
        pa.array(
            [Decimal("1.25"), Decimal("7.50")], type=pa.decimal128(12, 2)
        )
    )
    assert s["min_num"] is not None and s["min_num"] <= 1.25
    assert s["max_num"] >= 7.50

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .selectExpr(
            "l_orderkey", "CAST(l_extendedprice AS DECIMAL(12,2)) AS price"
        )
    )
    out = tempfile.mkdtemp(prefix="orcspark_zm_dec_")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id=f"zmdec-{uuid.uuid4().hex[:8]}",
        key="l_orderkey", columns=["l_orderkey", "price"],
        n_partitions=4, cluster_by="price", stripe_rows=400,
    )
    pipeline.run_encode_job(spark, li, cfg)
    pred = [("price", ">", 50000.0)]
    got = pipeline.decode_job(
        spark, out, cfg.run_id, li.schema, predicate=pred
    ).filter(zonemap.predicate_expr(pred))
    from pyspark.sql import functions as F

    want = li.filter(F.col("price") > 50000.0)
    assert _rows(got) == _rows(want)
    stripes = pipeline.read_stripes(spark, out, cfg.run_id)
    total = stripes.count()
    kept = zonemap.prune_stripes(stripes, pred).count()
    assert kept < total, (kept, total)


def test_decimal_metadata_aggregate_refuses_widened_bounds(spark):
    """agg on a decimal column must be LOUD: the widened pruning
    bounds are not the exact min/max."""
    from orc_spark.engine import pipeline

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .selectExpr(
            "l_orderkey", "CAST(l_extendedprice AS DECIMAL(12,2)) AS price"
        )
        .limit(500)
    )
    out, cfg = _encode(spark, li, "l_orderkey")
    with pytest.raises(ValueError, match="widened"):
        pipeline.metadata_aggregate(spark, out, cfg.run_id, ["price"])
    # the int column next to it still answers exactly
    res = pipeline.metadata_aggregate(
        spark, out, cfg.run_id, ["l_orderkey"]
    ).first()
    assert res.n_rows == 500


# ------------------------------------------------------- like_prefix

def test_prefix_upper_bounds():
    """Exclusive upper bound of the prefix range: increment, ceiling
    carry, surrogate skip."""
    from orc_spark.engine import zonemap

    assert zonemap._prefix_upper("ab") == "ac"
    assert zonemap._prefix_upper("a" + chr(0x10FFFF)) == "b"
    assert zonemap._prefix_upper(chr(0x10FFFF)) is None
    # U+D7FF increments past the surrogate block to U+E000
    assert zonemap._prefix_upper("x" + chr(0xD7FF)) == "x" + chr(0xE000)


def test_like_prefix_conjunct_keep_matrix(spark):
    """Zone-level keep/prune decisions straight off a stats frame."""
    from orc_spark.engine import zonemap

    rows = [
        # (min_str, max_str) -> expect keep for prefix 'src1'
        ("src1", "src19", True),     # fully inside the range
        ("src0", "src0", False),     # below [src1, src2)
        ("src2", "src9", False),     # above
        ("src0", "src3", True),      # straddles
        (None, None, True),          # absent stats: conservative keep
    ]
    df = spark.createDataFrame(
        [(lo, hi) for lo, hi, _ in rows], "min_str string, max_str string"
    )
    got = [
        r.k for r in df.select(
            zonemap._conjunct_keep("like_prefix", "src1").alias("k")
        ).collect()
    ]
    assert got == [e for _, _, e in rows]
    # empty prefix matches everything
    assert all(
        r.k for r in df.select(
            zonemap._conjunct_keep("like_prefix", "").alias("k")
        ).collect()
    )


def test_like_prefix_decode_matches_filter_and_prunes(spark):
    """Predicated decode with LIKE-prefix equals plain startswith
    filter, and clustered layout actually prunes stripes."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source")
    )
    out = tempfile.mkdtemp(prefix="orcspark_zm_lp_")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id=f"zmlp-{uuid.uuid4().hex[:8]}",
        key="doc_id", columns=["doc_id", "source"],
        n_partitions=2, cluster_by="source", stripe_rows=8,
    )
    pipeline.run_encode_job(spark, docs, cfg)
    pred = [("source", "like_prefix", "src1")]
    got = pipeline.decode_job(
        spark, out, cfg.run_id, docs.schema, predicate=pred
    ).filter(zonemap.predicate_expr(pred))
    want = docs.filter(F.col("source").startswith("src1"))
    assert _rows(got) == _rows(want)
    stripes = pipeline.read_stripes(spark, out, cfg.run_id)
    total = stripes.filter(F.col("status") == "completed").count()
    kept = zonemap.prune_stripes(stripes, pred).count()
    assert kept < total, (kept, total)


def test_like_prefix_cli_parse():
    from orc_spark.__main__ import _parse_where

    assert _parse_where("url like 'https://a%'") == (
        "url", "like_prefix", "https://a"
    )
    assert _parse_where("source like src1%") == (
        "source", "like_prefix", "src1"
    )
    import pytest as _pytest

    for bad in ("url like '%x'", "url like 'a_b%'", "url like 'a%b%'",
                "url like 'abc'"):
        with _pytest.raises(ValueError):
            _parse_where(bad)


# ----------------------------------------------------- contains_token

def test_token_bloom_build_and_probe():
    """Token bitset vetoes absent tokens, keeps present ones, and is
    domain-isolated from value-equality probes."""
    from orc_spark.engine import zonemap

    arr = pa.array(
        ["The quick brown-fox", "jumps Over", None, "lazy dog42"]
    )
    blob = zonemap.stripe_bloom(arr, token_mode=True)
    assert blob is not None and blob[1:2] == zonemap.BLOOM_DOMAIN_TOK

    def probe(tok):
        pairs, domain = zonemap._probe_hash_pairs("contains_token", tok)
        return bool(zonemap.bloom_membership([blob], pairs, domain)[0])

    for present in ("quick", "fox", "over", "dog42", "the"):
        assert probe(present), present
    assert not probe("zebra")
    # equality probe (string domain) never consults the token bitset
    pairs, domain = zonemap._value_hash_pairs("zebra")
    assert bool(zonemap.bloom_membership([blob], pairs, domain)[0])
    # and a token probe never consults a VALUE bitset
    vblob = zonemap.stripe_bloom(pa.array(["a", "b"]))
    pairs, domain = zonemap._probe_hash_pairs("contains_token", "zebra")
    assert bool(zonemap.bloom_membership([vblob], pairs, domain)[0])


def test_norm_token():
    from orc_spark.engine import zonemap

    assert zonemap._norm_token("Quick") == "quick"
    assert zonemap._norm_token("dog42") == "dog42"
    for bad in ("two words", "semi;colon", "", 42, "héllo"):
        assert zonemap._norm_token(bad) is None


def test_contains_token_decode_matches_filter_and_prunes(spark):
    """Seeded rare token: predicated decode equals the split-based
    row filter, the bloom prunes non-matching stripes, and an absent
    token prunes everything."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 50 == 7,
                F.concat(F.col("text"), F.lit(" xylograph")),
            ).otherwise(F.col("text")).alias("text"),
        )
    )
    out = tempfile.mkdtemp(prefix="orcspark_zm_tok_")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id=f"zmtok-{uuid.uuid4().hex[:8]}",
        key="doc_id", columns=["doc_id", "text"],
        n_partitions=2, stripe_rows=16,
        token_bloom_columns=("text",),
    )
    pipeline.run_encode_job(spark, docs, cfg)
    pred = [("text", "contains_token", "Xylograph")]  # case-folded
    got = pipeline.decode_job(
        spark, out, cfg.run_id, docs.schema, predicate=pred
    ).filter(zonemap.predicate_expr(pred))
    want = docs.filter(
        F.array_contains(F.split(F.lower("text"), "[^a-z0-9]+"), "xylograph")
    )
    assert _rows(got) == _rows(want) and got.count() > 0
    stripes = pipeline.read_stripes(spark, out, cfg.run_id)
    total = stripes.filter(F.col("status") == "completed").count()
    kept = zonemap.prune_stripes(stripes, pred).count()
    assert kept < total, (kept, total)
    # absent token: everything pruned, zero rows decoded
    pred0 = [("text", "contains_token", "zzz9absent")]
    assert zonemap.prune_stripes(stripes, pred0).count() == 0
    assert pipeline.decode_job(
        spark, out, cfg.run_id, docs.schema, predicate=pred0
    ).count() == 0
    # malformed token errors loudly, never silently empty
    with pytest.raises(Exception, match="contains_token"):
        pipeline.decode_job(
            spark, out, cfg.run_id, docs.schema,
            predicate=[("text", "contains_token", "two words")],
        ).count()


def test_contains_token_cli_parse():
    from orc_spark.__main__ import _parse_where

    assert _parse_where("text contains 'dup'") == (
        "text", "contains_token", "dup"
    )
    assert _parse_where("text contains dup") == (
        "text", "contains_token", "dup"
    )


def test_dnf_decode_prunes_union_and_stays_exact(spark, tmp_path):
    """OR branches prune as the UNION of keep-sets: middle stripes of
    a clustered layout never decode; rows equal the plain OR filter;
    mixed-column branches stay conservative-correct."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    mx = int(ev.agg(F.max("event_id")).first()[0])
    cfg = pipeline.EncodeJobConfig(
        out_dir=str(tmp_path / "r"), run_id="dnf", key="event_id",
        n_partitions=2, stripe_rows=64, cluster_by="event_id",
    )
    pipeline.run_encode_job(spark, ev, cfg)

    branches = [
        [("event_id", "<=", mx // 20)],
        [("event_id", ">=", mx - mx // 20), ("event_type", "==", "click")],
    ]
    got = pipeline.decode_job_dnf(
        spark, cfg.out_dir, "dnf", ev.schema, branches
    ).filter(zonemap.predicate_dnf_expr(branches))
    want = ev.filter(
        (F.col("event_id") <= mx // 20)
        | (
            (F.col("event_id") >= mx - mx // 20)
            & (F.col("event_type") == "click")
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # the union keep-set is a small fraction of the stripes
    stripes = pipeline.read_stripes(spark, cfg.out_dir, "dnf")
    total = stripes.select(
        "partition_id", "stripe_idx"
    ).distinct().count()
    kept = 0
    seen = set()
    for br in branches:
        for r in zonemap.prune_stripes(stripes, br).select(
            "partition_id", "stripe_idx"
        ).distinct().collect():
            seen.add((r.partition_id, r.stripe_idx))
    kept = len(seen)
    assert kept < total * 0.5, (kept, total)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        pipeline.decode_job_dnf(
            spark, cfg.out_dir, "dnf", ev.schema, [[("a", "==", 1)], []]
        )


def test_long_string_stats_truncate_but_prune_safely(spark, tmp_path):
    """>256-char strings record truncated bounds (footer stays lean at
    crawl scale): stat_exact flips false, range predicates still
    prune-and-match exactly, and metadata-only MIN/MAX refuses rather
    than reporting a truncated bound."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    rows = [
        (i, chr(ord("a") + (i // 50)) * 300 + f"tail{i:04d}")
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "k long, body string")
    cfg = pipeline.EncodeJobConfig(
        out_dir=str(tmp_path / "r"), run_id="t", key="k",
        n_partitions=2, stripe_rows=64, cluster_by="body",
    )
    pipeline.run_encode_job(spark, df, cfg)
    stripes = pipeline.read_stripes(spark, cfg.out_dir, "t").filter(
        F.col("column") == "body"
    )
    st = stripes.select("min_str", "max_str", "stat_exact").collect()
    assert all(len(r.min_str) <= 256 for r in st)
    assert all(r.max_str is None or len(r.max_str) <= 256 for r in st)
    assert all(r.stat_exact is False for r in st)

    # pruning with truncated bounds: exact results, real skipping
    pred = [("body", "<=", "b")]
    got = pipeline.decode_job(
        spark, cfg.out_dir, "t", df.schema, predicate=pred
    ).filter(zonemap.predicate_expr(pred))
    want = df.filter(F.col("body") <= "b")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    total = stripes.count()
    kept = zonemap.prune_stripes(
        pipeline.read_stripes(spark, cfg.out_dir, "t"), pred
    ).filter(F.col("column") == "body").count()
    assert kept < total, (kept, total)

    # metadata-only MIN/MAX refuses truncated bounds
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pipeline.metadata_aggregate(spark, cfg.out_dir, "t", ["body"])


def test_bloom_sized_by_distinct_not_rows():
    """A low-cardinality stripe carries a small bitset, a
    high-cardinality stripe of the SAME row count a large one, and
    membership stays exact (no false negative) in both."""
    import pyarrow as pa

    from orc_spark.engine import zonemap

    n = 60000
    low = pa.array([f"lang{i % 13}" for i in range(n)])
    high = pa.array([f"url-{i}" for i in range(n)])
    b_low = zonemap.stripe_bloom(low)
    b_high = zonemap.stripe_bloom(high)
    assert len(b_low) * 16 <= len(b_high)

    def probe(blob, v):
        pairs, dom = zonemap._value_hash_pairs(v)
        return bool(zonemap.bloom_membership([blob], pairs, dom)[0])

    for i in range(13):
        assert probe(b_low, f"lang{i}")
    for i in (0, 5, 1234, n - 1):
        assert probe(b_high, f"url-{i}")
    # absent values still veto (sized for ~2.4% fpp per distinct key)
    false_keeps = sum(probe(b_low, f"nope-{i}") for i in range(200))
    assert false_keeps <= 15
