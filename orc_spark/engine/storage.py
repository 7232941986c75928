"""Table-storage facade: parquet directories now, Iceberg when present.

The north rule targets Iceberg tables; this sandbox ships no
iceberg-spark-runtime jar (verified: pyspark jars dir has none and no
catalog is configured), so the engine persists stripes/lineage as
plain parquet directories and implements snapshots/retention itself
(`retention.py`). All writes route through this facade, making the
production switch a *configuration* change, not a code change:

    spark.sql.extensions = org.apache.iceberg.spark.extensions
                           .IcebergSparkSessionExtensions
    spark.sql.catalog.<cat> = org.apache.iceberg.spark.SparkCatalog

then pass ``iceberg://<cat>.<db>.<table>`` targets instead of paths.

Iceberg mapping of the engine's own mechanisms (kept equivalent here):

| engine mechanism (parquet mode)       | Iceberg equivalent          |
|---------------------------------------|-----------------------------|
| wave append = atomic parquet commit   | snapshot commit             |
| lineage manifest anti-join (resume)   | snapshot diff / WAP branch  |
| retention.prune_runs                  | expire_snapshots            |
| read_lineage empty-dir fallback       | empty table scan            |
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg://"


def is_iceberg(target: str) -> bool:
    return target.startswith(ICEBERG_PREFIX)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog class is loadable in the session JVM."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def append_table(df: DataFrame, target: str, precompressed: bool = False) -> None:
    """Append rows atomically (parquet commit protocol / Iceberg snapshot).

    ``precompressed=True`` marks tables whose payload bytes are already
    compressed by the engine's own codecs (the stripes table): parquet's
    page compression and dictionary attempts on such blobs cost CPU on
    both write and scan and recover nothing, so they are disabled. In
    Iceberg mode the same intent is a table property
    (write.parquet.compression-codec=uncompressed); small metadata
    tables keep the defaults.
    """
    if is_iceberg(target):
        df.writeTo(target[len(ICEBERG_PREFIX) :]).append()
    else:
        w = df.write.mode("append")
        if precompressed:
            w = w.option("compression", "none").option(
                "parquet.enable.dictionary", "false"
            )
        w.parquet(target)


def read_table(spark: SparkSession, target: str, schema=None) -> DataFrame:
    """Read the table; missing parquet dir -> empty DataFrame of schema."""
    if is_iceberg(target):
        return spark.read.table(target[len(ICEBERG_PREFIX) :])
    if not os.path.exists(target):
        if schema is None:
            raise FileNotFoundError(target)
        return spark.createDataFrame([], schema)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(target)


def exists(target: str, spark: SparkSession | None = None) -> bool:
    if is_iceberg(target):
        assert spark is not None
        return spark.catalog.tableExists(target[len(ICEBERG_PREFIX) :])
    return os.path.exists(target)
