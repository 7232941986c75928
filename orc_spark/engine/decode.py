"""Decode stage: stripes DataFrame -> reconstructed DataFrame.

Stripes are shuffled so that all columns of one (partition_id,
stripe_idx) group land in the same task, then reassembled into Arrow
batches inside mapInArrow — exact Arrow types end-to-end, no pandas
lossiness (nullable ints stay ints; None-vs-"" survives).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..codecs import decode_frame


def decode_stage(
    stripes: DataFrame,
    result_schema: StructType,
    columns: list[str] | None = None,
    colocated: bool = False,
    fill_missing: list[str] | None = None,
    verify_checksums: bool = False,
) -> DataFrame:
    """Rebuild the original (encoded-column subset of the) table.

    ``result_schema`` must name the decoded columns in their Spark
    types; ``columns`` defaults to the schema's field names.

    ``verify_checksums=True`` recomputes each decoded stripe's value
    checksum and compares it against the one the ENCODE task recorded
    (the reference's TestReader round-trip discipline applied at read
    time): a corrupted blob, a truncated write, or a codec regression
    fails the read loudly instead of returning silently-wrong rows.
    Costs one blake2b pass per stripe.

    ``fill_missing`` names requested columns that have NO stripes in
    this run (added to the table schema after the run was encoded);
    they are rebuilt as all-null arrays of the schema type — Iceberg
    add-column read semantics. Callers (decode_job) compute the list
    from the stripe metadata.

    ``colocated=True`` skips the blob shuffle: every encode task writes
    *all* columns of its partitions into one parquet file, so stripe
    groups never span files — as long as no file is split into
    multiple scan tasks, each task sees complete groups. The caller
    (decode_job) proves that by checking file sizes against
    ``spark.sql.files.maxPartitionBytes``; the in-task completeness
    check below still hard-fails rather than silently dropping rows if
    the assumption is ever violated.
    """
    from pyspark.sql.pandas.types import to_arrow_type

    cols = columns or [f.name for f in result_schema.fields]
    missing = set(fill_missing or ())
    want = set(cols) - missing
    n_cols = len(want)
    arrow_types = {
        f.name: to_arrow_type(f.dataType) for f in result_schema.fields
    }

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..codecs import column_checksum

        def _decode_one(col: str, blob: bytes, expect: str):
            arr = decode_frame(blob)
            if verify_checksums and expect:
                got = column_checksum(arr)
                if got != expect:
                    raise RuntimeError(
                        f"checksum mismatch decoding column {col!r}: "
                        f"stripe recorded {expect}, decoded {got}"
                    )
            return arr.cast(arrow_types[col])

        pending: dict[tuple[int, int], dict[str, tuple[bytes, str]]] = {}
        for batch in batches:
            d = batch.to_pydict()
            for i in range(batch.num_rows):
                col = d["column"][i]
                if col not in want:
                    continue
                key = (d["partition_id"][i], d["stripe_idx"][i])
                grp = pending.setdefault(key, {})
                grp[col] = (d["data"][i], d["checksum"][i])
                if len(grp) == n_cols:
                    decoded = {
                        c: _decode_one(c, *grp[c])
                        for c in cols
                        if c not in missing
                    }
                    n = len(next(iter(decoded.values())))
                    arrays = [
                        decoded[c]
                        if c not in missing
                        else pa.nulls(n, type=arrow_types[c])
                        for c in cols
                    ]
                    yield pa.RecordBatch.from_arrays(arrays, names=cols)
                    del pending[key]
        if pending:
            raise RuntimeError(
                f"incomplete stripe groups (missing columns): {sorted(pending)[:4]}"
            )

    if not colocated:
        stripes = stripes.repartition(F.col("partition_id"), F.col("stripe_idx"))
    return stripes.mapInArrow(fn, result_schema)
