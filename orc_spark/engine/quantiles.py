"""Per-stripe order-statistic sketches: metadata-only approximate
percentiles with a PROVABLE rank-error bound — the footer-stat
completion of zone min/max (which are themselves the q=0 and q=1
order statistics).

Each numeric stripe records K=64 exact order statistics of its
non-null values (positions j·(n−1)/(K−1), so min and max are always
included). Merging is exact bookkeeping, not estimation: every
recorded point carries the exact count of stripe rows in the rank gap
it closes, so a value's reconstructed rank is never UNDER-counted and
over-counts by at most one gap per stripe — total rank error
≤ Σ_i ceil(n_i/(K−1)) ≈ N/(K−1) (~1.6% of rows at K=64), regardless
of the value distribution. That is a worst-case guarantee, not a
distributional assumption (contrast HLL's probabilistic SE).

Domains mirror the zone-stat families: int-family columns (ints,
timestamps→epoch-us, dates→epoch-days) store exact int64 points —
no 2^53 double rounding; floats store float64 and decline when
NaN-poisoned (like stripe_zone_stats, and for the same reason:
NaN has no rank). Strings/decimals/bools have no sketch; the
percentile call raises loudly instead of guessing.

Layout: 1 version byte + 1 domain byte (1=int64, 2=float64) +
uint32 point count + count×8 bytes little-endian values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

QSK_K = 64
_QSK_VERSION = 1
_DOMAIN_INT = 1
_DOMAIN_NUM = 2


def stripe_qsketch(arr: pa.Array) -> bytes | None:
    """K exact order statistics of one stripe's non-null values, or
    None for unsketchable stripes (non-numeric type, NaN-poisoned
    floats). All-null stripes return a valid empty sketch."""
    t = arr.type
    if (
        pa.types.is_integer(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_date32(t)
    ):
        domain = _DOMAIN_INT
        view = arr
        if pa.types.is_timestamp(t):
            view = arr.cast(pa.timestamp("us")).cast(pa.int64())
        elif pa.types.is_date32(t):
            view = arr.cast(pa.int32())
        vals = view.drop_null().to_numpy(zero_copy_only=False).astype(
            np.int64
        )
    elif pa.types.is_floating(t):
        import pyarrow.compute as pc

        if arr.null_count < len(arr) and pc.any(pc.is_nan(arr)).as_py():
            return None  # NaN has no rank; decline like zone stats
        domain = _DOMAIN_NUM
        vals = arr.drop_null().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
    else:
        return None
    n = len(vals)
    head = bytes([_QSK_VERSION, domain])
    if n == 0:
        return head + np.uint32(0).tobytes()
    vals = np.sort(vals)
    if n <= QSK_K:
        pts = vals
    else:
        idx = (np.arange(QSK_K, dtype=np.int64) * (n - 1)) // (QSK_K - 1)
        pts = vals[idx]
    return head + np.uint32(len(pts)).tobytes() + pts.tobytes()


def unpack_points(blob: bytes, n_nonnull: int):
    """(values ndarray, weights int64 ndarray) — point j carries the
    exact count of stripe rows in the rank gap it closes, so summed
    weights reconstruct n_nonnull exactly and the cumulative weight at
    any value v never OVER-counts the true #rows ≤ v (it under-counts
    by at most one rank gap per stripe — the N/(K−1) bound). Raises on
    unknown
    versions (estimating from half-understood points would be
    silently wrong)."""
    if len(blob) < 6 or blob[0] != _QSK_VERSION:
        raise ValueError("unknown quantile-sketch version")
    domain = blob[1]
    m = int(np.frombuffer(blob, np.uint32, count=1, offset=2)[0])
    dtype = np.int64 if domain == _DOMAIN_INT else np.float64
    vals = np.frombuffer(blob, dtype, count=m, offset=6)
    if m == 0:
        return vals, np.zeros(0, np.int64)
    if m == 1:
        return vals, np.array([n_nonnull], np.int64)
    # point j sits at exact rank floor(j*(n-1)/(m-1)); its weight is
    # the gap it closes from the previous point
    ranks = (np.arange(m, dtype=np.int64) * (n_nonnull - 1)) // (m - 1)
    w = np.diff(ranks, prepend=np.int64(-1))
    return vals, w


def column_batch_points(df, int_domain: bool):
    """(value, weight) point rows from a one-column DataFrame — the
    decode half of a predicated percentile. Each Arrow batch yields at
    most K exact order statistics with exact gap weights, so the batch
    adds at most one rank gap of error (same budget unit as a
    metadata stripe) and task memory stays flat. NaN-bearing batches
    raise loudly: NaN has no rank, and engines disagree on its sort
    position."""
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("_v", LongType() if int_domain else DoubleType(),
                        False),
            StructField("_w", LongType(), False),
        ]
    )

    def _pts(batches):
        for b in batches:
            arr = b.column(0)
            nn = len(arr) - arr.null_count
            if nn == 0:
                continue
            blob = stripe_qsketch(arr)
            if blob is None:
                raise ValueError(
                    "percentile: decoded batch is unsketchable "
                    f"(type {arr.type}; NaN values have no rank) — "
                    "decode and aggregate exactly instead"
                )
            v, w = unpack_points(blob, nn)
            yield pa.RecordBatch.from_arrays(
                [pa.array(v), pa.array(w)], ["_v", "_w"]
            )

    return df.mapInArrow(_pts, schema)


def grouped_batch_points(df, int_domain: bool):
    """(group, value, weight) point rows from a two-column
    (group, value) DataFrame — the decode half of a grouped
    percentile. Per Arrow batch, each distinct group's values sketch
    to ≤K exact order statistics with exact gap weights (≤ one rank
    gap of error per group per batch); NaN-bearing slices raise
    loudly like column_batch_points."""
    import pyarrow.compute as pc

    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    gfield = df.schema[0]
    schema = StructType(
        [
            StructField("_gkey", gfield.dataType, True),
            StructField("_v", LongType() if int_domain else DoubleType(),
                        False),
            StructField("_w", LongType(), False),
        ]
    )

    def _pts(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            gb = b.column(0)
            vals = b.column(1)
            for g in pc.unique(gb).to_pylist():
                if g is None:
                    mask = pc.is_null(gb)
                else:
                    mask = pc.equal(gb, pa.scalar(g, type=gb.type))
                sl = vals.filter(mask)
                nn = len(sl) - sl.null_count
                if nn == 0:
                    continue
                blob = stripe_qsketch(sl)
                if blob is None:
                    raise ValueError(
                        "grouped percentile: decoded batch slice is "
                        f"unsketchable (type {sl.type}; NaN has no "
                        "rank) — decode and aggregate exactly instead"
                    )
                v, w = unpack_points(blob, nn)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([g] * len(v), type=gb.type),
                        pa.array(v),
                        pa.array(w),
                    ],
                    ["_gkey", "_v", "_w"],
                )

    return df.mapInArrow(_pts, schema)
