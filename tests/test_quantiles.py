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


def test_metadata_percentile_unsketched_stripes_raise(spark, monkeypatch):
    """Pre-upgrade / NaN-poisoned stripes (qsk null with non-null
    rows) must raise — a biased percentile is worse than a decode."""
    import math as _m

    rows = [(i, _m.nan if i >= 500 else float(i)) for i in range(600)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    out, cfg = _encode_q(spark, df, ["id", "v"])
    with pytest.raises(ValueError, match="without a quantile sketch"):
        pipeline.metadata_percentile(
            spark, out, cfg.run_id, df.schema, "v", [0.5]
        )


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
