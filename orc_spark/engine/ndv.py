"""Per-stripe HyperLogLog NDV sketches: metadata-only approximate
COUNT(DISTINCT) — the Iceberg `ndv` column-stats / Theta-sketch
analogue (public HLL algorithm, Flajolet et al. 2007; implementation
ours, fully vectorized numpy over the same splitmix64/rolling-hash
streams the bloom index uses — zonemap._hash_pairs, so int/string/
binary/bool/timestamp/date columns sketch and floats honestly don't).

Layout: 1 version byte + 2^P uint8 registers (P=12 → 4 KB, ~1.6%
standard error). Sketches merge by register-wise max, so the table's
NDV folds associatively from per-stripe sketches: at 100 TB the merge
runs as a two-level applyInPandas (salted partial merge → final merge
per column) — no driver collect, no data bytes read, ever.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_P = 12
HLL_M = 1 << HLL_P
_HLL_VERSION = b"\x01"
# Flajolet bias constant for m >= 128
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """floor(log2(v)) + 1 per element (v > 0), exact: the float log2
    estimate is corrected both directions with integer shifts."""
    b = np.log2(v.astype(np.float64)).astype(np.int64)
    b = np.clip(b, 0, 63)
    # too big: 2^b > v -> b-1;  too small: 2^(b+1) <= v -> b+1
    pow_b = np.uint64(1) << b.astype(np.uint64)
    b = np.where(pow_b > v, b - 1, b)
    bp1 = np.clip(b + 1, 0, 63)
    pow_bp1 = np.uint64(1) << bp1.astype(np.uint64)
    b = np.where((pow_bp1 <= v) & (b + 1 <= 63), b + 1, b)
    return b + 1


def stripe_hll(arr: pa.Array) -> bytes | None:
    """Sketch one column stripe, or None for unsketchable types
    (floats/decimals — their equality semantics make hashed NDV
    misleading, and zonemap._hash_pairs declines them). Long-form
    text/binary columns (avg > BLOOM_MAX_AVG_LEN, same policy as the
    bloom index) also decline: hashing megabytes per stripe costs more
    than the encode itself (measured 12×), and document-level distinct
    counting is the dedup family's job, not a footer stat —
    metadata_ndv raises loudly for such columns."""
    from .zonemap import BLOOM_MAX_AVG_LEN, _hash_pairs

    t = arr.type
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        n_valid = len(arr) - arr.null_count
        if n_valid and arr.nbytes / n_valid > BLOOM_MAX_AVG_LEN:
            return None
    try:
        pair = _hash_pairs(arr)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return None
    if pair is None:
        return None
    h1, _ = pair
    if len(h1) == 0:
        # empty (all-null) stripe: a valid sketch of zero values
        return _HLL_VERSION + bytes(HLL_M)
    idx = (h1 >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = h1 << np.uint64(HLL_P)
    # rank = leading zeros of the remaining 64-P bit stream + 1
    # maximum(rest, 1): zeros are overridden by the where() but must
    # not reach log2 (divide-by-zero warning churn)
    lz = np.where(
        rest > 0,
        np.uint64(64) - _bit_length_u64(np.maximum(rest, np.uint64(1))),
        64,
    )
    rank = np.minimum(lz.astype(np.int64) + 1, 64 - HLL_P + 1)
    regs = np.zeros(HLL_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return _HLL_VERSION + regs.tobytes()


def merge_sketches(blobs) -> bytes | None:
    """Register-wise max across sketches; unknown versions poison the
    merge to None (estimating from half-understood registers would be
    silently wrong)."""
    merged = None
    for b in blobs:
        if b is None:
            return None  # an unsketched stripe -> NDV unknowable
        if b[:1] != _HLL_VERSION or len(b) != 1 + HLL_M:
            return None
        regs = np.frombuffer(b, dtype=np.uint8, offset=1)
        merged = regs.copy() if merged is None else np.maximum(merged, regs)
    if merged is None:
        return None
    return _HLL_VERSION + merged.tobytes()


def estimate(blob: bytes) -> float:
    """Standard HLL estimate with the small-range (linear counting)
    correction; no large-range correction needed at 64-bit hashes."""
    regs = np.frombuffer(blob, dtype=np.uint8, offset=1).astype(np.float64)
    raw = _ALPHA * HLL_M * HLL_M / np.sum(np.exp2(-regs))
    zeros = int(np.count_nonzero(regs == 0))
    if raw <= 2.5 * HLL_M and zeros:
        return float(HLL_M * np.log(HLL_M / zeros))
    return float(raw)


def merged_ndv(stripes_meta: DataFrame) -> DataFrame:
    """(column, ndv_sketch) — one merged sketch per column, computed
    distributed: a salted partial merge bounds every pandas group to
    ~(stripes/256) sketches, then 256 partials fold per column. Zero
    data bytes; only the blob-free metadata scan feeds it."""
    import pandas as pd

    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType,
    )

    out_schema = StructType(
        [
            StructField("column", StringType(), False),
            StructField("ndv_sketch", BinaryType(), True),
        ]
    )

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = merge_sketches(list(pdf["ndv_sketch"]))
        return pd.DataFrame(
            [{"column": pdf["column"].iloc[0], "ndv_sketch": blob}]
        )

    partial = (
        stripes_meta.select(
            "column",
            F.col("ndv").alias("ndv_sketch"),
            F.pmod(F.xxhash64("partition_id", "stripe_idx"), F.lit(256)).alias(
                "_salt"
            ),
        )
        .groupBy("column", "_salt")
        .applyInPandas(
            lambda pdf: _merge(pdf), out_schema
        )
    )
    return partial.groupBy("column").applyInPandas(_merge, out_schema)


def grouped_batch_sketches(df: DataFrame, gkey: str = "_gkey",
                           val: str = "_val") -> DataFrame:
    """Per-(Arrow batch, group) HLL sketches of ``val`` — the decode
    half of grouped NDV. One 4 KB sketch per distinct group per batch
    keeps task memory flat no matter how large a group is (the
    associative register-max merge downstream collapses them); the
    per-batch group scan is O(groups_in_batch × batch), the right
    trade for the low-cardinality keys GROUP BY NDV targets.

    Loud contract: a batch whose values can't be hashed (float /
    unsupported types — zonemap._hash_pairs declines them) raises
    inside the task instead of under-counting.
    """
    import pyarrow.compute as pc

    from pyspark.sql.types import BinaryType, StructField, StructType

    gfield = df.schema[gkey]
    out_schema = StructType(
        [
            StructField(gkey, gfield.dataType, True),
            StructField("ndv_sketch", BinaryType(), True),
        ]
    )

    def _sketch(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            gb = b.column(0)  # RecordBatch columns are plain Arrays
            vals = b.column(1)
            uniq = pc.unique(gb)
            keys, blobs = [], []
            for g in uniq.to_pylist():
                if g is None:
                    mask = pc.is_null(gb)
                else:
                    mask = pc.equal(gb, pa.scalar(g, type=gb.type))
                sl = vals.filter(mask)  # null mask entries drop
                blob = stripe_hll(sl)
                if blob is None and len(sl) - sl.null_count > 0:
                    raise ValueError(
                        "grouped NDV: unsketchable value batch "
                        f"(type {vals.type}) — float/decimal columns "
                        "have no hashed-NDV semantics; COUNT(DISTINCT) "
                        "them exactly instead"
                    )
                keys.append(g)
                blobs.append(blob)
            yield pa.RecordBatch.from_arrays(
                [pa.array(keys, type=gb.type), pa.array(blobs, pa.binary())],
                [gkey, "ndv_sketch"],
            )

    return df.mapInArrow(_sketch, out_schema)


def merged_ndv_by(df: DataFrame, key: str = "_gkey") -> DataFrame:
    """(key, ndv_estimate double) — fold (key, ndv_sketch) rows with
    the same two-level distributed merge as merged_ndv, keyed by an
    arbitrary (possibly null) group key instead of the column name;
    the final fold emits the HLL estimate directly. A None sketch
    anywhere in a group poisons that group's merge and raises loudly
    in the task (an unsketched contribution would silently
    under-count)."""
    import pandas as pd

    from pyspark.sql.types import (
        BinaryType, DoubleType, StructField, StructType,
    )

    kfield = df.schema[key]
    mid_schema = StructType(
        [
            StructField(key, kfield.dataType, True),
            StructField("ndv_sketch", BinaryType(), True),
        ]
    )
    out_schema = StructType(
        [
            StructField(key, kfield.dataType, True),
            StructField("ndv_estimate", DoubleType(), True),
        ]
    )

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = merge_sketches(list(pdf["ndv_sketch"]))
        if blob is None:
            raise ValueError(
                "grouped NDV: a group received an unsketched or "
                "unknown-version contribution — refusing to estimate"
            )
        return pd.DataFrame(
            [{key: pdf[key].iloc[0], "ndv_sketch": blob}]
        )

    def _final(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = merge_sketches(list(pdf["ndv_sketch"]))
        if blob is None:
            raise ValueError(
                "grouped NDV: a group received an unsketched or "
                "unknown-version contribution — refusing to estimate"
            )
        return pd.DataFrame(
            [{key: pdf[key].iloc[0], "ndv_estimate": estimate(blob)}]
        )

    partial = (
        df.withColumn(
            "_salt", F.pmod(F.xxhash64("ndv_sketch"), F.lit(256))
        )
        .groupBy(key, "_salt")
        .applyInPandas(lambda pdf: _merge(pdf), mid_schema)
    )
    return partial.groupBy(key).applyInPandas(_final, out_schema)
