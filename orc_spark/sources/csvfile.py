"""CSV source + sink — the long tail of published tabular corpora.

Many curated datasets (metadata tables, label files, eval manifests)
ship as gzipped CSV rather than JSONL. Spark has a native JVM-side CSV
reader/writer, so as with sources/jsonl.py this is a thin discipline
layer over the built-in source, not a parser:

- **Schema is mandatory.** `spark.read.csv` with inference runs a full
  extra pass over the data; callers pass the table schema, nothing is
  inferred.
- **Corrupt lines are counted, not dropped silently.** PERMISSIVE mode
  routes rows that fail to parse under the schema (type mismatch,
  field-count mismatch, broken quoting) to a `_corrupt_record`
  column; `read_csv` returns (clean_df, n_corrupt) so pipelines gate
  on a corruption budget — the same loud-failure stance as the encode
  ledger and the JSONL source.
- **RFC 4180 quoting.** The sink quotes every field and escapes
  embedded quotes by doubling (escape='"'), so free text with commas,
  quotes, and newlines round-trips; the reader uses the same dialect.
- **Gzip rides the codec layer** exactly like JSONL.

Scale shape and its one honest caveat: with `multi_line=False` (the
default here) the read is one JVM task per file split, zero Python,
zero shuffle. Embedded NEWLINES in quoted fields, however, force
`multi_line=True`, which makes a file unsplittable (one task per
file, like gzip) — corpora with newline-bearing text columns should
prefer JSONL/parquet, and this module documents rather than hides
that cost.

Reference parity: the reference orchestrator has no data plane; CSV
handling follows the public RFC 4180 + Spark DataFrameReader
conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CORRUPT = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema,
    header: bool = True,
    multi_line: bool = False,
    count_corrupt: bool = True,
) -> tuple[DataFrame, int]:
    """Read a CSV directory/file with an ENFORCED schema.

    Returns (clean_df, n_corrupt). Rows that fail to parse under the
    schema are counted (PERMISSIVE + _corrupt_record) and excluded
    from the clean frame; pass count_corrupt=False to skip the count
    job on trusted input. `multi_line=True` is required when quoted
    fields contain newlines (see module note on the parallelism cost).
    """
    from pyspark.sql.types import StringType, StructField, StructType

    read_schema = (
        StructType(list(schema.fields) + [StructField(_CORRUPT, StringType())])
        if count_corrupt
        else schema
    )
    df = (
        spark.read.schema(read_schema)
        .option("header", str(bool(header)).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", str(bool(multi_line)).lower())
        .csv(path)
    )
    if not count_corrupt:
        return df, 0
    df = df.cache()  # corrupt count and clean frame share one parse
    n_corrupt = df.filter(F.col(_CORRUPT).isNotNull()).count()
    clean = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    return clean, int(n_corrupt)


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    compression: str | None = "gzip",
) -> None:
    """Write one RFC 4180 CSV file per partition (gzipped by default).
    Every field is quoted and embedded quotes are doubled, so free
    text survives; no shuffle — file count = partition count."""
    w = (
        df.write.mode("overwrite")
        .option("header", str(bool(header)).lower())
        .option("quoteAll", "true")
        .option("quote", '"')
        .option("escape", '"')
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)
