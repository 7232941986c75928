"""Z-order clustering (orc_spark/engine/zorder.py): Morton key
construction, and the layout's payoff — a multi-column BOX predicate
prunes stripe groups that single-column clustering keeps."""

from __future__ import annotations

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from orc_spark.engine import pipeline, zonemap, zorder
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_interleave_layout(spark):
    """bits=2, two columns with bounds (0,3): bucket bits interleave
    round-robin — key bit i*2+j is bucket bit i of column j."""
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (2, 1)], "x long, y long"
    )
    bounds = {"x": (0.0, 3.0), "y": (0.0, 3.0)}
    key = zorder.zorder_key(df, ["x", "y"], bounds=bounds, bits=2)
    got = {(r.x, r.y): r.k for r in df.select("x", "y", key.alias("k")).collect()}
    # (x=3 -> bucket 0b11 at even positions 0,2; y=3 -> odd 1,3)
    assert got[(0, 0)] == 0
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010
    assert got[(3, 3)] == 0b1111
    # x=2 -> bucket 2 (bits 10 -> positions 2), y=1 -> bucket 1 (pos 1)
    assert got[(2, 1)] == 0b0110


def test_nulls_and_degenerate_bounds(spark):
    df = spark.createDataFrame([(None, 5.0), (1, None)], "x long, y double")
    key = zorder.zorder_key(
        df, ["x", "y"], bounds={"x": (0.0, 1.0), "y": (5.0, 5.0)}, bits=4
    )
    vals = [r.k for r in df.select(key.alias("k")).collect()]
    assert all(v is not None for v in vals)  # nulls bucket to 0


def test_bounds_validation(spark):
    df = spark.createDataFrame([(None,)], "x long")
    with pytest.raises(ValueError, match="all-null"):
        zorder.column_bounds(df, ["x"])
    df2 = spark.createDataFrame([("a",)], "s string")
    with pytest.raises(ValueError, match="numeric/temporal"):
        zorder.zorder_key(df2, ["s"], bounds={"s": (0, 1)})
    with pytest.raises(ValueError, match="exceeds int64"):
        zorder.zorder_key(df2, ["a", "b", "c", "d"], bits=16, bounds={})


def test_cluster_by_zorder_by_exclusive(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    cfg = pipeline.EncodeJobConfig(
        out_dir=tempfile.mkdtemp(prefix="orcspark_zo_"),
        run_id="zo-bad",
        key="a",
        columns=["a", "b"],
        n_partitions=2,
        cluster_by="a",
        zorder_by=["a", "b"],
    )
    with pytest.raises(ValueError, match="exclusive"):
        pipeline.run_encode_job(spark, df, cfg)


def _encode(spark, df, **kw):
    out = tempfile.mkdtemp(prefix="orcspark_zo_")
    kw.setdefault("stripe_rows", 512)
    cfg = pipeline.EncodeJobConfig(
        out_dir=out,
        run_id=f"zo-{uuid.uuid4().hex[:8]}",
        key="event_id",
        columns=[f.name for f in df.schema.fields],
        n_partitions=4,
        **kw,
    )
    pipeline.run_encode_job(spark, df, cfg)
    return out, cfg


def test_box_predicate_prunes_more_than_linear(spark):
    """On a 64x64 uniform grid, a bucket-aligned box predicate
    selective in BOTH dimensions: z-order keeps fewer stripe groups
    than clustering on x alone (which is blind to y), and the decode
    stays exact.

    Geometry: bounds (0, 65535) make the bucket equal the raw value
    (identity scaling), so the aligned 16x16 box [16,31]^2 is ONE
    contiguous Morton interval covering 1/16 of the rows — each
    partition's ~64 box rows land in 1-2 of its ~16 64-row stripes.
    Linear clustering on x keeps every stripe overlapping x in
    [16,31] — ~1/4 of them — because it cannot see y."""
    n = 4096
    grid = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    pred = [("x", "between", (16, 31)), ("y", "between", (16, 31))]

    out_lin, cfg_lin = _encode(spark, grid, cluster_by="x", stripe_rows=64)
    out_zo, cfg_zo = _encode(
        spark,
        grid,
        zorder_by=["x", "y"],
        zorder_bounds={"x": (0.0, 65535.0), "y": (0.0, 65535.0)},
        stripe_rows=64,
    )

    kept_lin = zonemap.prune_stripes(
        pipeline.read_stripes(spark, out_lin, cfg_lin.run_id), pred
    ).count()
    kept_zo = zonemap.prune_stripes(
        pipeline.read_stripes(spark, out_zo, cfg_zo.run_id), pred
    ).count()
    assert kept_zo < kept_lin, (kept_zo, kept_lin)

    got = pipeline.decode_job(
        spark, out_zo, cfg_zo.run_id, grid.schema, predicate=pred
    ).filter(zonemap.predicate_expr(pred))
    want = grid.filter(
        F.col("x").between(16, 31) & F.col("y").between(16, 31)
    )
    assert _rows(got) == _rows(want)


def test_supplied_bounds_skip_the_pass(spark):
    """zorder_bounds short-circuits the min/max aggregate and still
    round-trips exactly (bounds only shape the layout, never the
    data)."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    out, cfg = _encode(
        spark,
        events,
        zorder_by=["user_id", "value"],
        zorder_bounds={"user_id": (0.0, 150.0), "value": (0.0, 100.0)},
    )
    got = pipeline.decode_job(spark, out, cfg.run_id, events.schema)
    assert _rows(got) == _rows(events)
