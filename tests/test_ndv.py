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


# ------------------------------------------------ grouped NDV

def _encode_g(spark, df, columns, **kw):
    out = tempfile.mkdtemp(prefix="orcspark_gndv_")
    kw.setdefault("stripe_rows", 512)
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id=f"g-{uuid.uuid4().hex[:8]}",
        key=columns[0], columns=columns, n_partitions=4, **kw,
    )
    pipeline.run_encode_job(spark, df, cfg)
    return out, cfg


def test_grouped_ndv_matches_exact(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    out, cfg = _encode_g(
        spark, ev, ["event_id", "user_id", "event_type"],
        cluster_by="event_type",
    )
    got = {
        r.event_type: r.ndv_estimate
        for r in pipeline.metadata_group_ndv(
            spark, out, cfg.run_id, ev.schema, "event_type", "user_id"
        ).collect()
    }
    exact = {
        r.event_type: r.d
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, e in exact.items():
        assert abs(got[k] - e) / max(e, 1) <= 0.05, (k, got[k], e)
    # predicate variant: only matching rows count
    got2 = {
        r.event_type: r.ndv_estimate
        for r in pipeline.metadata_group_ndv(
            spark, out, cfg.run_id, ev.schema, "event_type", "user_id",
            predicate=[("event_id", ">=", 3000)],
        ).collect()
    }
    exact2 = {
        r.event_type: r.d
        for r in ev.filter("event_id >= 3000")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert set(got2) == set(exact2)
    for k, e in exact2.items():
        assert abs(got2[k] - e) / max(e, 1) <= 0.05, (k, got2[k], e)


def test_grouped_ndv_null_group_and_dominance(spark, monkeypatch):
    """NULL group keys form their own group (their stripes decode —
    purity requires null-free); pure stripes stay metadata-only,
    proven with the decode_job spy."""
    rows = [
        (i, None if i % 11 == 0 else f"g{i % 3}", i % 257)
        for i in range(6000)
    ]
    df = spark.createDataFrame(rows, "id bigint, g string, v bigint")
    out, cfg = _encode_g(
        spark, df, ["id", "g", "v"], cluster_by="g", stripe_rows=128,
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
    got = {
        r.g: r.ndv_estimate
        for r in pipeline.metadata_group_ndv(
            spark, out, cfg.run_id, df.schema, "g", "v"
        ).collect()
    }
    exact = {
        r.g: r.d
        for r in df.groupBy("g")
        .agg(F.countDistinct("v").alias("d"))
        .collect()
    }
    assert set(got) == set(exact)  # includes the None group
    for k, e in exact.items():
        assert abs(got[k] - e) / max(e, 1) <= 0.05, (k, got[k], e)
    # null-bearing + boundary stripes decode; the clustered interior
    # must have stayed metadata-only
    assert 0 < seen.get("n", -1) < total_groups / 2


def test_grouped_ndv_refusals(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 2}", float(i % 7)) for i in range(600)],
        "id bigint, g string, x double",
    )
    out, cfg = _encode_g(spark, df, ["id", "g", "x"], cluster_by="g")
    with pytest.raises(ValueError, match="not in result_schema"):
        pipeline.metadata_group_ndv(
            spark, out, cfg.run_id, df.schema, "nope", "x"
        )
    # float ndv_col: unsketchable everywhere -> loud task error
    with pytest.raises(Exception, match="unsketchable|PythonException"):
        pipeline.metadata_group_ndv(
            spark, out, cfg.run_id, df.schema, "g", "x"
        ).collect()
    pipeline.delete_rows_eq(spark, out, cfg.run_id, "id", [5])
    with pytest.raises(ValueError, match="live deletes"):
        pipeline.metadata_group_ndv(
            spark, out, cfg.run_id, df.schema, "g", "id"
        )


def test_cli_grouped_ndv(spark, capsys):
    import json

    from orc_spark.__main__ import main

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    out, cfg = _encode_g(
        spark, ev, ["event_id", "user_id", "event_type"],
        cluster_by="event_type",
    )
    assert main(
        ["ndv", "--out", out, "--run-id", cfg.run_id,
         "--columns", "user_id", "--group-by", "event_type",
         "--schema-from", f"{SF_DIR}/events.parquet"]
    ) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(got["groups"]) == 5
    assert all("ndv_estimate" in g for g in got["groups"])


def test_metadata_union_ndv_partitioning_invariant(spark):
    """HLL registers are max-folds over per-value ranks, so the merged
    sketch over ANY partitioning of the same multiset is identical:
    the two-run union estimate must EQUAL the single-run estimate over
    the whole table, and sit within tolerance of the exact count."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    cols = ["event_id", "event_type", "user_id"]
    out = tempfile.mkdtemp(prefix="orcspark_unv_")
    for run_id, part in [
        ("whole", ev),
        ("snap0", ev.filter(F.col("event_id") % 2 == 0)),
        ("snap1", ev.filter(F.col("event_id") % 2 == 1)),
    ]:
        cfg = pipeline.EncodeJobConfig(
            out_dir=out, run_id=run_id, key="event_id",
            columns=cols, n_partitions=4, stripe_rows=256,
        )
        pipeline.run_encode_job(spark, part, cfg)
    union_est = {
        r.column: r.ndv_estimate
        for r in pipeline.metadata_union_ndv(
            spark, out, ["snap0", "snap1"], cols
        ).collect()
    }
    whole_est = {
        r.column: r.ndv_estimate
        for r in pipeline.metadata_ndv(spark, out, "whole", cols).collect()
    }
    assert union_est == whole_est
    exact = ev.agg(*[F.countDistinct(c).alias(c) for c in cols]).first()
    for c in cols:
        e = int(getattr(exact, c))
        assert abs(union_est[c] - e) / max(e, 1) <= 0.05, (c, union_est[c], e)
    # a live delete on either run poisons the union loudly
    pipeline.delete_rows_eq(spark, out, "snap1", "event_id", [1])
    with pytest.raises(ValueError, match="live deletes"):
        pipeline.metadata_union_ndv(spark, out, ["snap0", "snap1"], cols)
