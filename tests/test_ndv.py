"""Per-stripe HyperLogLog NDV sketches (orc_spark/engine/ndv.py) and
the metadata-only approximate COUNT(DISTINCT) built on them."""

from __future__ import annotations

import tempfile
import uuid

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from orc_spark.engine import ndv, pipeline

from tests.conftest import SF_DIR


@pytest.mark.parametrize("n", [1, 50, 1000, 60000])
def test_estimate_within_tolerance(n):
    est = ndv.estimate(ndv.stripe_hll(pa.array([f"v{i}" for i in range(n)])))
    assert abs(est - n) / n < 0.05, (n, est)


def test_merge_equals_union_sketch():
    a = pa.array([f"v{i}" for i in range(0, 5000)])
    b = pa.array([f"v{i}" for i in range(2500, 7500)])
    u = pa.array([f"v{i}" for i in range(0, 7500)])
    m = ndv.merge_sketches([ndv.stripe_hll(a), ndv.stripe_hll(b)])
    assert m == ndv.stripe_hll(u)  # register-wise max is exact-assoc


def test_unsketchable_and_poisoned_merge():
    assert ndv.stripe_hll(pa.array([1.5, 2.5])) is None  # floats decline
    ok = ndv.stripe_hll(pa.array([1, 2, 3]))
    assert ndv.merge_sketches([ok, None]) is None
    assert ndv.merge_sketches([ok, b"\x99junk"]) is None
    # all-null stripe sketches as zero values
    z = ndv.stripe_hll(pa.array([None, None], type=pa.string()))
    assert ndv.estimate(z) == 0.0


def test_metadata_ndv_end_to_end(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    out = tempfile.mkdtemp(prefix="orcspark_ndv_")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id=f"nv-{uuid.uuid4().hex[:8]}",
        key="event_id",
        columns=["event_id", "event_type", "user_id"],
        n_partitions=4, stripe_rows=256,
    )
    pipeline.run_encode_job(spark, ev, cfg)
    got = {
        r.column: r.ndv_estimate
        for r in pipeline.metadata_ndv(
            spark, out, cfg.run_id,
            ["event_id", "event_type", "user_id"],
        ).collect()
    }
    exact = ev.agg(
        *[
            F.countDistinct(c).alias(c)
            for c in ("event_id", "event_type", "user_id")
        ]
    ).first()
    for c, est in got.items():
        e = getattr(exact, c)
        assert abs(est - e) / max(e, 1) < 0.05, (c, est, e)


def test_metadata_ndv_refuses_floats_and_live_deletes(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "value"
    )
    out = tempfile.mkdtemp(prefix="orcspark_ndvf_")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id="nvf", key="event_id",
        columns=["event_id", "value"], n_partitions=2,
    )
    pipeline.run_encode_job(spark, ev, cfg)
    with pytest.raises(ValueError, match="unsketched"):
        pipeline.metadata_ndv(spark, out, "nvf", ["value"])
    # int column still answers
    assert pipeline.metadata_ndv(
        spark, out, "nvf", ["event_id"]
    ).count() == 1
    pipeline.delete_rows_eq(spark, out, "nvf", "event_id", [1])
    with pytest.raises(ValueError, match="delete"):
        pipeline.metadata_ndv(spark, out, "nvf", ["event_id"])


def test_cli_ndv_and_history(spark, capsys):
    import json

    from orc_spark.__main__ import main

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type"
    )
    out = tempfile.mkdtemp(prefix="orcspark_ndvcli_")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id="c", key="event_id",
        columns=["event_id", "event_type"], n_partitions=2,
    )
    pipeline.run_encode_job(spark, ev, cfg)
    assert main(
        ["ndv", "--out", out, "--run-id", "c",
         "--columns", "event_id,event_type"]
    ) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {c["column"] for c in got["columns"]} == {
        "event_id", "event_type"
    }
    assert main(["history", "--out", out, "--run-id", "c"]) == 0
    h = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert h["epochs"][0]["epoch"] == 0
    assert h["live_deletes"]["n_vectors"] == 0
