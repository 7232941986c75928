"""Z-order (Morton-interleaved) clustering keys for multi-column
zone-map pruning.

Single-column `cluster_by` makes stripes range-local in ONE dimension,
so a predicate on any other column prunes nothing. Z-ordering
interleaves the bits of several columns' range buckets into one sort
key: stripes become LOCAL IN EVERY PARTICIPATING DIMENSION at once, so
a box predicate (a BETWEEN on each column) prunes on all of them.
Public technique (Morton 1966; the layout strategy behind Delta Lake /
Iceberg Z-order clustering); implementation here is pure Spark column
algebra — no UDF, whole-stage-codegen friendly.

Scale notes (100 TB):
- The key is a chain of shiftleft/shiftright/AND/OR expressions —
  JVM-side, vectorized, zero Python.
- Bounds for bucketing come from ONE min/max aggregate (a metadata-
  cheap map-side-combined pass) — or pass ``bounds`` explicitly
  (e.g. from a previous run's zone stats) to skip the pass entirely;
  at 100 TB you always know your domain bounds ahead of time.
- The sort itself rides the encode exchange's output
  (`sortWithinPartitions`) — NO extra shuffle, same contract as
  `cluster_by`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float",
            "decimal", "date", "timestamp", "timestamp_ntz")


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple]:
    """One aggregate pass for per-column (min, max) — the bucketing
    domain. Collects exactly one row (2·len(cols) scalars)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(_as_num(df, c)).alias(f"lo_{c}"))
        aggs.append(F.max(_as_num(df, c)).alias(f"hi_{c}"))
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
        if lo is None or hi is None:
            raise ValueError(f"zorder column {c!r} is all-null")
        out[c] = (float(lo), float(hi))
    return out


def _as_num(df: DataFrame, col: str) -> Column:
    """Numeric view of a column for bucketing (timestamps → epoch
    microseconds, tz-independent). Strings are not z-orderable here —
    bucket their hash upstream if needed."""
    dt = dict(df.dtypes).get(col, "")
    if dt.startswith("timestamp"):
        epoch = F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))
        return F.timestamp_diff(
            "MICROSECOND", epoch, F.col(col).cast("timestamp_ntz")
        ).cast("double")
    if dt == "date":
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    if not any(dt.startswith(p) for p in _NUMERIC):
        raise ValueError(
            f"zorder supports numeric/temporal columns; {col!r} is {dt}"
        )
    return F.col(col).cast("double")


def _bucket(num: Column, lo: float, hi: float, bits: int) -> Column:
    """Clamped linear range bucket in [0, 2^bits). Nulls land in
    bucket 0 (they sort together at the front — harmless: null rows
    carry no zone-map range anyway)."""
    top = float((1 << bits) - 1)
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (num - F.lit(lo)) / F.lit(hi - lo) * F.lit(top)
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(top))
    return F.coalesce(clamped.cast("long"), F.lit(0))


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bounds: dict[str, tuple] | None = None,
    bits: int = DEFAULT_BITS,
) -> Column:
    """Morton-interleaved sort key over ``cols``.

    Bit layout: output bit ``i·n + j`` is bucket bit ``i`` of column
    ``j`` — round-robin interleave, so every column contributes equally
    at every scale of the key. ``bits·len(cols)`` must fit a long
    (≤ 63); 16 bits × up to 3 columns covers the practical range.
    """
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} columns exceeds int64")
    if bounds is None:
        bounds = column_bounds(df, cols)
    buckets = [
        _bucket(_as_num(df, c), *bounds[c], bits=bits) for c in cols
    ]
    n = len(cols)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key
