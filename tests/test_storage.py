"""Storage facade: parquet mode semantics + Iceberg seam detection."""

from __future__ import annotations

from pyspark.sql.types import LongType, StringType, StructField, StructType

from orc_spark.engine import storage

SCHEMA = StructType(
    [StructField("k", StringType()), StructField("v", LongType())]
)


def test_parquet_append_read_roundtrip(spark, tmp_path):
    target = str(tmp_path / "tbl")
    df = spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA)
    storage.append_table(df, target)
    storage.append_table(df, target)
    got = storage.read_table(spark, target, SCHEMA)
    assert got.count() == 4
    assert storage.exists(target)


def test_missing_table_reads_empty_with_schema(spark, tmp_path):
    got = storage.read_table(spark, str(tmp_path / "nope"), SCHEMA)
    assert got.count() == 0
    assert got.schema == SCHEMA


def test_iceberg_detection(spark):
    assert storage.is_iceberg("iceberg://cat.db.t")
    assert not storage.is_iceberg("/data/stripes")
    # sandbox ships no iceberg runtime jar; the seam must report that
    assert storage.iceberg_available(spark) is False
