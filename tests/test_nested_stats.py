"""Nested-column statistics (ORC's per-descendant column statistics
analogue): encode emits blob-free stats rows for a struct column's
scalar descendants ("meta.status"), so nested-field predicates prune
stripe groups, probe blooms, and row-filter exactly like top-level
columns; runs without the rows hard-error instead of silently pruning
everything."""

from __future__ import annotations

import tempfile
import uuid

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from orc_spark.engine import lineage, pipeline, zonemap
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def struct_run(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    df = orders.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        ).alias("meta"),
    )
    out = tempfile.mkdtemp(prefix="orcspark_nested_")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out,
        run_id=f"ns-{uuid.uuid4().hex[:8]}",
        key="o_orderkey",
        columns=["o_orderkey", "meta"],
        n_partitions=4,
        cluster_by="meta.status",  # stripes become status-homogeneous
        stripe_rows=100,
    )
    pipeline.run_encode_job(spark, df, cfg)
    return orders, df, out, cfg


def test_stats_rows_emitted_per_descendant(spark, struct_run):
    _, _, out, cfg = struct_run
    lin = lineage.read_lineage(spark, out)
    stats = lin.filter("codec = 'stats'")
    names = {r.column for r in stats.select("column").distinct().collect()}
    assert names == {"meta.status", "meta.total"}
    # blob-free: no bytes, no checksum
    row = stats.first()
    assert row.bytes_out == 0 and row.checksum == ""


def test_nested_predicate_decode_exact(spark, struct_run):
    orders, df, out, cfg = struct_run
    dec = pipeline.decode_job(
        spark, out, cfg.run_id, df.schema, ["o_orderkey", "meta"],
        predicate=[("meta.status", "==", "F")],
    )
    got = sorted((r.o_orderkey, r.meta.status, r.meta.total) for r in dec.collect())
    want = sorted(
        (r.o_orderkey, r.o_orderstatus, r.o_totalprice)
        for r in orders.filter("o_orderstatus = 'F'").collect()
    )
    assert got == want and len(got) > 0


def test_nested_predicate_prunes_clustered_stripes(spark, struct_run):
    _, _, out, cfg = struct_run
    stripes = pipeline.read_stripes(spark, out, cfg.run_id)
    total_groups = (
        stripes.select("partition_id", "stripe_idx").distinct().count()
    )
    kept = zonemap.prune_stripes(
        stripes, [("meta.status", "==", "F")]
    )
    kept_groups = kept.select("partition_id", "stripe_idx").distinct().count()
    # 3 statuses, status-clustered stripes: most groups are single-
    # valued in another status and must drop
    assert kept_groups < total_groups, (kept_groups, total_groups)


def test_nested_float_range_predicate(spark, struct_run):
    orders, df, out, cfg = struct_run
    dec = pipeline.decode_job(
        spark, out, cfg.run_id, df.schema, ["o_orderkey", "meta"],
        predicate=[("meta.total", ">", 150000.0)],
    )
    got = sorted(r.o_orderkey for r in dec.collect()
                 if r.meta.total > 150000.0)
    want = sorted(
        r.o_orderkey for r in orders.filter("o_totalprice > 150000").collect()
    )
    assert got == want


def test_unknown_nested_path_raises(spark, struct_run):
    _, df, out, cfg = struct_run
    with pytest.raises(ValueError, match="no nested stats"):
        pipeline.decode_job(
            spark, out, cfg.run_id, df.schema, ["o_orderkey"],
            predicate=[("meta.nope", "==", "x")],
        ).count()


def test_nested_stat_children_shapes():
    arr = pa.array(
        [
            {"a": 1, "s": "x", "inner": {"b": 2.0}, "v": [1.0]},
            None,
        ],
        type=pa.struct(
            [
                ("a", pa.int64()),
                ("s", pa.string()),
                ("inner", pa.struct([("b", pa.float64())])),
                ("v", pa.list_(pa.float64())),
            ]
        ),
    )
    names = [n for n, _ in zonemap.nested_stat_children(arr, prefix="m.")]
    # scalar + recursed struct child; list child skipped
    assert names == ["m.a", "m.s", "m.inner.b"]
    # parent null propagated into child null_count
    child = dict(zonemap.nested_stat_children(arr, prefix="m."))["m.a"]
    assert child.null_count == 1


def test_metadata_aggregate_on_nested_column(spark, struct_run):
    """agg over a struct descendant answers from the same stats rows —
    zero data bytes, exact bounds (the nested rows make it free)."""
    orders, _, out, cfg = struct_run
    res = {
        r.column: r
        for r in pipeline.metadata_aggregate(
            spark, out, cfg.run_id, ["meta.total", "meta.status"]
        ).collect()
    }
    exact = orders.agg(
        F.min("o_totalprice"), F.max("o_totalprice"),
        F.min("o_orderstatus"), F.max("o_orderstatus"),
        F.count("*"),
    ).first()
    t = res["meta.total"]
    assert t.min_num == exact[0] and t.max_num == exact[1]
    s = res["meta.status"]
    assert s.min_str == exact[2] and s.max_str == exact[3]
    assert t.n_rows == exact[4]


def test_nested_stats_follow_resume_epochs(spark, tmp_path):
    """A faulted struct-column stripe re-encodes whole at the next
    epoch; its nested stats rows must follow that epoch, and the
    predicated decode over the resumed run stays exact."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    df = orders.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        ).alias("meta"),
    )
    out = str(tmp_path / "run")

    def cfg(**kw):
        base = dict(
            out_dir=out, run_id="nsr", key="o_orderkey",
            columns=["o_orderkey", "meta"], n_partitions=4,
        )
        base.update(kw)
        return pipeline.EncodeJobConfig(**base)

    r1 = pipeline.run_encode_job(
        spark, df, cfg(fault_spec={"columns": ["meta"], "partitions": [1]})
    )
    assert r1.partitions_failed == 1
    r2 = pipeline.run_encode_job(spark, df, cfg())  # resume, epoch 1
    assert r2.partitions_failed == 0
    lin = lineage.read_lineage(spark, out)
    stats_rows = lin.filter("codec = 'stats'")
    # failed pass emitted no nested rows for the faulted stripe; the
    # resume epoch carries them for the re-encoded partition
    e1 = stats_rows.filter("partition_id = 1 AND epoch = 1")
    assert e1.count() > 0
    # and a nested predicate over the resumed run is still exact
    dec = pipeline.decode_job(
        spark, out, "nsr", df.schema, ["o_orderkey", "meta"],
        predicate=[("meta.status", "==", "O")],
    )
    got = sorted(r.o_orderkey for r in dec.collect())
    want = sorted(
        r.o_orderkey for r in orders.filter("o_orderstatus = 'O'").collect()
    )
    assert got == want
