"""JSONL source + sink — the LLM training-data interchange format.

Curated corpora ship as gzipped JSON-Lines (one document object per
line: Dolma, RedPajama, FineWeb, c4 all publish this shape). Spark has
a native, JVM-side JSON reader/writer, so unlike WARC (sources/warc.py,
bytes-parsing in Python) the right engine mapping here is a thin
discipline layer over the built-in source:

- **Schema is mandatory.** `spark.read.json` without a schema runs a
  full inference pass over the data — a second 100 TB scan. Callers
  pass the table schema; nothing is ever inferred.
- **Corrupt lines are counted, not dropped silently.** PERMISSIVE mode
  routes unparseable lines to a `_corrupt_record` column; `read_jsonl`
  returns (clean_df, corrupt_count_df) so a pipeline can gate on a
  corruption budget instead of discovering missing rows downstream —
  the same loud-failure stance as the encode ledger.
- **Gzip rides the codec layer.** `.json.gz` inputs decompress
  transparently (one task per gzip member — CC-style many-file layouts
  parallelize by file count); the sink writes gzip per part-file.

Reference parity: the reference orchestrator has no data plane; JSONL
handling follows the public Dolma/HF dataset conventions.

Scale shape: read = one JVM task per file, zero Python, zero shuffle;
write = one file per partition, zero shuffle. A 100 TB JSONL corpus
parallelizes across its files exactly like the parquet path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema,
    count_corrupt: bool = True,
) -> tuple[DataFrame, int]:
    """Read a JSONL directory/file with an ENFORCED schema.

    Returns (clean_df, n_corrupt). Lines that fail to parse as the
    given schema are counted (PERMISSIVE + _corrupt_record) and
    excluded from the clean frame; pass count_corrupt=False to skip
    the counting job when the input is trusted.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    # don't .add() in place — StructType.add mutates the caller's schema
    read_schema = (
        StructType(list(schema.fields) + [StructField(_CORRUPT, StringType())])
        if count_corrupt
        else schema
    )
    df = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    if not count_corrupt:
        return df, 0
    # cache so the corrupt count and the clean frame share one parse
    df = df.cache()
    n_corrupt = df.filter(F.col(_CORRUPT).isNotNull()).count()
    clean = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    return clean, int(n_corrupt)


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = "gzip"
) -> None:
    """Write one JSONL file per partition (gzipped by default — the
    published-corpus convention). No shuffle: file count = partition
    count, so callers size partitions with the usual knobs."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
