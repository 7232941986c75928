"""Per-stripe order-statistic quantile sketches
(orc_spark/engine/quantiles.py) and the metadata-only percentile
operator built on them (pipeline.metadata_percentile)."""

from __future__ import annotations

import math
import tempfile
import uuid

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from orc_spark.engine import pipeline, quantiles

from tests.conftest import SF_DIR


# ------------------------------------------------ sketch unit tests

def test_sketch_roundtrip_weights_sum():
    for n in (1, 5, 63, 64, 65, 10_000):
        arr = pa.array(np.arange(n, dtype=np.int64))
        blob = quantiles.stripe_qsketch(arr)
        vals, w = quantiles.unpack_points(blob, n)
        assert int(w.sum()) == n
        assert len(vals) == min(n, quantiles.QSK_K)
        assert vals[0] == 0 and vals[-1] == n - 1  # min & max recorded
        assert (np.diff(vals) >= 0).all()


def test_sketch_small_n_is_exact():
    arr = pa.array([7, 1, 5, 3], type=pa.int64())
    vals, w = quantiles.unpack_points(quantiles.stripe_qsketch(arr), 4)
    assert list(vals) == [1, 3, 5, 7] and list(w) == [1, 1, 1, 1]


def test_sketch_declines_and_empty():
    assert quantiles.stripe_qsketch(pa.array(["a", "b"])) is None
    assert (
        quantiles.stripe_qsketch(pa.array([1.0, float("nan")])) is None
    )  # NaN has no rank
    # all-null numeric stripe: a valid empty sketch
    blob = quantiles.stripe_qsketch(pa.array([None, None], type=pa.int64()))
    vals, w = quantiles.unpack_points(blob, 0)
    assert len(vals) == 0 and len(w) == 0
    with pytest.raises(ValueError, match="version"):
        quantiles.unpack_points(b"\x99junk!!", 5)


def test_sketch_int64_points_stay_exact_past_2_53():
    big = (1 << 60) + 12345
    arr = pa.array([big, big + 1, big + 2], type=pa.int64())
    vals, _ = quantiles.unpack_points(quantiles.stripe_qsketch(arr), 3)
    assert list(vals) == [big, big + 1, big + 2]  # no double rounding


# ------------------------------------------------ operator e2e

def _encode_q(spark, df, columns, **kw):
    out = tempfile.mkdtemp(prefix="orcspark_qtl_")
    kw.setdefault("stripe_rows", 512)
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id=f"q-{uuid.uuid4().hex[:8]}",
        key=columns[0], columns=columns, n_partitions=4, **kw,
    )
    pipeline.run_encode_job(spark, df, cfg)
    return out, cfg


def test_metadata_percentile_rank_bound(spark):
    """The returned value's true rank must sit in
    [ceil(q·N), ceil(q·N) + Σ per-stripe gaps] — the provable bound,
    checked for every numeric family on real data."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "value", "ts"
    )
    out, cfg = _encode_q(spark, ev, ["event_id", "value", "ts"])
    n_stripe_groups = (
        pipeline.read_stripes(spark, out, cfg.run_id)
        .select("partition_id", "stripe_idx").distinct().count()
    )
    gap = -(-(512 - 1) // (quantiles.QSK_K - 1))  # ceil per-stripe gap
    budget = n_stripe_groups * gap
    for col in ("value", "event_id", "ts"):
        nn = ev.filter(F.col(col).isNotNull()).count()
        res = pipeline.metadata_percentile(
            spark, out, cfg.run_id, ev.schema, col, [0.1, 0.5, 0.9, 0.99]
        ).collect()
        assert len(res) == 4
        for r in res:
            target = math.ceil(r.q * nn - 1e-9)
            rank = ev.filter(F.col(col) <= F.lit(r.value)).count()
            assert target <= rank <= target + budget, (
                col, r.q, rank, target, budget
            )


def test_metadata_percentile_refusals_and_empty(spark):
    rows = [(i, f"s{i}", None) for i in range(600)]
    df = spark.createDataFrame(rows, "id bigint, s string, v double")
    out, cfg = _encode_q(spark, df, ["id", "s", "v"])
    with pytest.raises(ValueError, match="no quantile-sketch family"):
        pipeline.metadata_percentile(
            spark, out, cfg.run_id, df.schema, "s", [0.5]
        )
    with pytest.raises(ValueError, match="not in result_schema"):
        pipeline.metadata_percentile(
            spark, out, cfg.run_id, df.schema, "nope", [0.5]
        )
    with pytest.raises(ValueError, match="qs must be"):
        pipeline.metadata_percentile(
            spark, out, cfg.run_id, df.schema, "id", [0.0]
        )
    # an entirely-null column: (q, NULL), no error
    got = pipeline.metadata_percentile(
        spark, out, cfg.run_id, df.schema, "v", [0.5, 0.9]
    ).collect()
    assert [(r.q, r.value) for r in got] == [(0.5, None), (0.9, None)]
    pipeline.delete_rows_eq(spark, out, cfg.run_id, "id", [3])
    with pytest.raises(ValueError, match="live deletes"):
        pipeline.metadata_percentile(
            spark, out, cfg.run_id, df.schema, "id", [0.5]
        )


def test_metadata_percentile_nan_raises_from_decode(spark):
    """NaN-poisoned stripes have no sketch so they route to the decode
    half — whose batch re-sketch raises loudly on the NaN values (NaN
    has no rank; engines disagree on its sort position)."""
    import math as _m

    rows = [(i, _m.nan if i >= 500 else float(i)) for i in range(600)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    out, cfg = _encode_q(spark, df, ["id", "v"])
    with pytest.raises(Exception, match="unsketchable|has no rank"):
        pipeline.metadata_percentile(
            spark, out, cfg.run_id, df.schema, "v", [0.5]
        ).collect()


def test_metadata_percentile_predicate(spark, monkeypatch):
    """Predicated percentile: ALL stripes keep their sketches, MIXED
    boundary stripes decode and re-sketch — result honors the provable
    rank bound over the MATCHING rows only, and the decode set stays
    boundary-sized on a clustered layout (decode_job spy)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "value"
    )
    stripe_rows = 32  # many stripes per partition at the tiny test SF
    out, cfg = _encode_q(
        spark, ev, ["event_id", "value"], cluster_by="event_id",
        stripe_rows=stripe_rows,
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
    lo, hi = 200, 800  # interior slice at any test SF (ids are 0..N-1)
    pred = [("event_id", ">=", lo), ("event_id", "<", hi)]
    sub = ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
    nn = sub.filter(F.col("value").isNotNull()).count()
    gap = -(-(stripe_rows - 1) // (quantiles.QSK_K - 1))
    budget = total_groups * gap
    res = pipeline.metadata_percentile(
        spark, out, cfg.run_id, ev.schema, "value", [0.5, 0.9],
        predicate=pred,
    ).collect()
    for r in res:
        import math as _m

        target = _m.ceil(r.q * nn - 1e-9)
        rank = sub.filter(F.col("value") <= F.lit(r.value)).count()
        assert target <= rank <= target + budget, (r.q, rank, target)
    # boundary decode only: the event_id-clustered interior stays
    # metadata-side
    assert 0 <= seen.get("n", -1) < total_groups / 2


def test_cli_percentile(spark, capsys):
    import json

    from orc_spark.__main__ import main

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "value"
    )
    out, cfg = _encode_q(spark, ev, ["event_id", "value"])
    assert main(
        ["percentile", "--out", out, "--run-id", cfg.run_id,
         "--column", "value", "--q", "0.5,0.95",
         "--schema-from", f"{SF_DIR}/events.parquet"]
    ) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["q"] for r in got["percentiles"]] == [0.5, 0.95]
    assert all(r["value"] is not None for r in got["percentiles"])


# ------------------------------------------------ table profile

def test_table_profile_and_cli(spark, capsys):
    """Exact cells (counts, min/max reprs) match the raw table; the
    estimate cells degrade to null on columns whose loud operators
    would raise (float NDV), never failing the whole profile."""
    import json

    from orc_spark.__main__ import main

    rows = [
        (i, f"u{i % 37}", None if i % 5 == 0 else float(i % 113))
        for i in range(1500)
    ]
    df = spark.createDataFrame(rows, "id bigint, u string, v double")
    out, cfg = _encode_q(spark, df, ["id", "u", "v"])
    prof = {
        r.column: r
        for r in pipeline.table_profile(
            spark, out, cfg.run_id, df.schema, ["id", "u", "v"]
        ).collect()
    }
    assert prof["id"].n_rows == 1500 and prof["id"].n_nulls == 0
    assert prof["id"].min_repr == "0" and prof["id"].max_repr == "1499"
    assert prof["v"].n_nulls == 300
    assert prof["u"].min_repr == "u0"
    # id: sketched int -> both estimates present and sane
    assert abs(prof["id"].ndv_estimate - 1500) / 1500 <= 0.05
    assert prof["id"].p50_repr is not None
    # v: float -> NDV declines (null), p50 present (order stats exist)
    assert prof["v"].ndv_estimate is None
    assert prof["v"].p50_repr is not None
    # u: string -> NDV present, p50 declines (no numeric sketch)
    assert abs(prof["u"].ndv_estimate - 37) / 37 <= 0.05
    assert prof["u"].p50_repr is None
    assert main(
        ["profile", "--out", out, "--run-id", cfg.run_id,
         "--columns", "id,v", "--schema-from", f"{SF_DIR}/events.parquet"]
    ) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {r["column"] for r in got["profile"]} == {"id", "v"}


# ------------------------------------------------ grouped percentile

def test_metadata_group_percentile(spark, monkeypatch):
    """Per-group rank bound on a type-clustered layout, with the
    decode spy proving the clustered interior stays metadata-side."""
    rows = [
        (i, float((i * 37) % 211), f"g{(i * 7919) % 4}") for i in range(4000)
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, value double, event_type string"
    )
    stripe_rows = 128
    out, cfg = _encode_q(
        spark, ev, ["event_id", "value", "event_type"],
        cluster_by="event_type", stripe_rows=stripe_rows,
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
    res = pipeline.metadata_group_percentile(
        spark, out, cfg.run_id, ev.schema, "event_type", "value",
        [0.5, 0.9],
    ).collect()
    n_types = ev.select("event_type").distinct().count()
    assert len(res) == 2 * n_types
    gap = -(-(stripe_rows - 1) // (quantiles.QSK_K - 1))
    budget = total_groups * gap
    for r in res:
        sub = ev.filter(F.col("event_type") == r.event_type)
        nn = sub.filter(F.col("value").isNotNull()).count()
        target = math.ceil(r.q * nn - 1e-9)
        rank = sub.filter(F.col("value") <= F.lit(r.value)).count()
        assert target <= rank <= target + budget, (
            r.event_type, r.q, rank, target
        )
    # boundary decode only on the clustered layout
    assert 0 <= seen.get("n", -1) < total_groups / 2


def test_metadata_group_percentile_null_group_and_predicate(spark):
    rows = [
        (i, None if i % 13 == 0 else f"g{i % 3}", float((i * 37) % 211))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "id bigint, g string, v double")
    out, cfg = _encode_q(spark, df, ["id", "g", "v"], cluster_by="g")
    pred = [("id", ">=", 500)]
    sub = df.filter("id >= 500")
    res = pipeline.metadata_group_percentile(
        spark, out, cfg.run_id, df.schema, "g", "v", [0.5],
        predicate=pred,
    ).collect()
    keys = {r.g for r in res}
    assert None in keys and keys == {None, "g0", "g1", "g2"}
    for r in res:
        grp = (
            sub.filter(F.col("g").isNull())
            if r.g is None
            else sub.filter(F.col("g") == r.g)
        )
        nn = grp.filter(F.col("v").isNotNull()).count()
        target = math.ceil(0.5 * nn - 1e-9)
        rank = grp.filter(F.col("v") <= F.lit(r.value)).count()
        # generous budget: every stripe is its own unit at this size
        assert target <= rank <= target + nn // 4 + 64, (r.g, rank, target)


def test_metadata_group_percentile_refusals(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 2}", f"s{i}") for i in range(400)],
        "id bigint, g string, s string",
    )
    out, cfg = _encode_q(spark, df, ["id", "g", "s"])
    with pytest.raises(ValueError, match="no quantile-sketch family"):
        pipeline.metadata_group_percentile(
            spark, out, cfg.run_id, df.schema, "g", "s", [0.5]
        )
    with pytest.raises(ValueError, match="not in result_schema"):
        pipeline.metadata_group_percentile(
            spark, out, cfg.run_id, df.schema, "nope", "id", [0.5]
        )
