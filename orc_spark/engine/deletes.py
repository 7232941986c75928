"""Row-level deletes: Iceberg v2 position-delete semantics over the
stripe store (merge-on-read).

A delete marks rows by their decode coordinates — (partition_id,
epoch, stripe_idx, row position) — without rewriting any stripe.
Vectors are packed little-endian bitmaps, one row per affected stripe
group per delete operation, appended to ``<out_dir>/deletes`` as an
APPEND-ONLY parquet table (no read-modify-write races: concurrent
deletes both land, readers OR every vector for a group — exactly how
Iceberg accumulates delete files until a compaction). ``compact_run``
re-encodes the deletes-applied view, so compaction naturally drops
them (≙ Iceberg rewrite_data_files).

At 100 TB the metadata math holds: one bitmap row per touched stripe,
≤ stripe_rows/8 bytes each (64k-row stripes → ≤8 KB); the read-side
join onto the stripes table is keyed by the stripe-group id and
broadcastable until deletes touch millions of stripes — at which
point compaction is overdue anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DELETES_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("epoch", LongType(), False),
        StructField("stripe_idx", LongType(), False),
        StructField("n_deleted", LongType(), False),
        StructField("vec", BinaryType(), False),
    ]
)

_GROUP_KEYS = ["run_id", "partition_id", "epoch", "stripe_idx"]


def deletes_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "deletes")


def write_delete_vectors(
    spark: SparkSession, positions: DataFrame, out_dir: str, run_id: str
) -> int:
    """Pack a positions DF (``_pid``, ``_epoch``, ``_sidx``,
    ``_rowpos`` — decode_stage POSITION_COLS) into per-stripe bitmaps
    and APPEND them to the deletes table. Returns rows marked.

    Packing runs distributed (applyInPandas per stripe group — a
    group's positions are bounded by stripe_rows, so each pandas
    frame is small by construction)."""
    import pandas as pd

    n_total = positions.count()
    if n_total == 0:
        return 0

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pos = np.unique(pdf["_rowpos"].to_numpy(dtype=np.int64))
        bits = np.zeros(int(pos.max()) + 1, dtype=bool)
        bits[pos] = True
        return pd.DataFrame(
            [
                {
                    "run_id": run_id,
                    "partition_id": int(pdf["_pid"].iloc[0]),
                    "epoch": int(pdf["_epoch"].iloc[0]),
                    "stripe_idx": int(pdf["_sidx"].iloc[0]),
                    "n_deleted": int(len(pos)),
                    "vec": np.packbits(bits, bitorder="little").tobytes(),
                }
            ]
        )

    vectors = positions.groupBy("_pid", "_epoch", "_sidx").applyInPandas(
        _pack, DELETES_SCHEMA
    )
    vectors.write.mode("append").parquet(deletes_dir(out_dir))
    return int(n_total)


def read_delete_vectors(
    spark: SparkSession, out_dir: str, run_id: str
) -> DataFrame | None:
    """All delete vectors of a run, one row per (group, delete file)
    — callers OR them; None when the table has no deletes."""
    d = deletes_dir(out_dir)
    if not os.path.isdir(d):
        return None
    df = spark.read.schema(DELETES_SCHEMA).parquet(d).filter(
        F.col("run_id") == run_id
    )
    return df


def grouped_delete_vecs(deletes: DataFrame) -> DataFrame:
    """(partition_id, epoch, stripe_idx, _delete_vecs array<binary>)
    — the join-ready shape decode_stage consumes."""
    return deletes.groupBy("partition_id", "epoch", "stripe_idx").agg(
        F.collect_list("vec").alias("_delete_vecs")
    )


def delete_stats(spark: SparkSession, out_dir: str, run_id: str) -> dict:
    """Live-delete accounting for reports/doctor: vectors, touched
    stripe groups, marked rows (upper bound — overlapping delete
    files may re-mark a row)."""
    df = read_delete_vectors(spark, out_dir, run_id)
    if df is None:
        return {"n_vectors": 0, "n_groups": 0, "rows_marked_ub": 0}
    agg = df.agg(
        F.count(F.lit(1)).alias("nv"),
        F.countDistinct("partition_id", "epoch", "stripe_idx").alias("ng"),
        F.sum("n_deleted").alias("nr"),
    ).first()
    return {
        "n_vectors": int(agg.nv),
        "n_groups": int(agg.ng),
        "rows_marked_ub": int(agg.nr or 0),
    }
