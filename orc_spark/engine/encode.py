"""mapInArrow encode stage: DataFrame -> stripes DataFrame.

One *stripe* per (partition, arrow batch, column). Partition identity
is deterministic data-derived: callers repartition by a key expression
and the same ``pmod(hash(key), n)`` is recomputable as a column for
resume pruning (see lineage.partition_id_col).

All per-row work is Arrow/numpy inside mapInArrow — no per-row Python
(BASELINE.json input_hint mandate).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..codecs import column_checksum, encode_frame
from . import ndv as ndv_mod
from . import vcounts as vcounts_mod
from . import quantiles as quantiles_mod
from . import selector, zonemap

STRIPE_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("stripe_idx", IntegerType(), False),
        StructField("column", StringType(), False),
        StructField("codec", StringType(), False),
        StructField("n_rows", LongType(), False),
        StructField("bytes_in", LongType(), False),
        StructField("bytes_out", LongType(), False),
        StructField("checksum", StringType(), False),
        StructField("encode_ms", DoubleType(), False),
        StructField("attempts", IntegerType(), False),
        StructField("status", StringType(), False),
        StructField("failure_category", StringType(), True),
        StructField("epoch", LongType(), False),
        # zone map (zonemap.stripe_zone_stats): typed min/max + null
        # count; all-null = "no stats, never prune"
        StructField("min_int", LongType(), True),
        StructField("max_int", LongType(), True),
        StructField("min_num", DoubleType(), True),
        StructField("max_num", DoubleType(), True),
        StructField("min_str", StringType(), True),
        StructField("max_str", StringType(), True),
        StructField("null_count", LongType(), True),
        # False when the recorded bounds are conservatively WIDENED
        # rather than exact (decimal128 -> one-ulp-padded doubles):
        # pruning may use them, metadata-only aggregates must NOT.
        # Null (incl. pre-upgrade rows, which never widened) = exact.
        StructField("stat_exact", BooleanType(), True),
        # per-stripe SUM of non-null values (ORC IntegerStatistics.sum
        # / DoubleStatistics.sum analogue) — powers metadata-only
        # SUM/AVG (pipeline.metadata_sum). sum_int is exact (guarded
        # against int64 overflow via n·max|bound|); sum_num only when
        # finite; null = unsummable / pre-upgrade rows (decode instead)
        StructField("sum_int", LongType(), True),
        StructField("sum_num", DoubleType(), True),
        # second central moment Σ(x-mean)² per stripe (zonemap
        # _stripe_m2) — metadata-only VAR/STDDEV via Chan's parallel
        # merge (pipeline.metadata_stddev); null = non-numeric /
        # NaN-poisoned / pre-upgrade rows
        StructField("m2", DoubleType(), True),
        # per-stripe bloom bitset for equality pruning (ORC bloom
        # filter index semantics); null = unsupported type / failed
        StructField("bloom", BinaryType(), True),
        # per-stripe HyperLogLog registers (engine/ndv.py) — NDV folds
        # from these with zero data reads; null = unsketchable type
        # (floats/decimals) / pre-upgrade rows
        StructField("ndv", BinaryType(), True),
        # per-stripe order-statistic quantile sketch (engine/
        # quantiles.py) — metadata-only percentiles with a provable
        # N/(K-1) rank-error bound; null = non-numeric / NaN-poisoned
        # / pre-upgrade rows
        StructField("qsk", BinaryType(), True),
        # per-stripe EXACT value-count histogram (engine/vcounts.py)
        # — metadata-only GROUP BY COUNT(*) over unclustered
        # low-cardinality columns; null = declined (> VCS_CAP
        # distinct, long-form text, floats) / pre-upgrade rows
        StructField("vcs", BinaryType(), True),
        StructField("data", BinaryType(), False),
    ]
)

_STRIPE_PA_SCHEMA = pa.schema(
    [
        ("run_id", pa.string()),
        ("partition_id", pa.int32()),
        ("stripe_idx", pa.int32()),
        ("column", pa.string()),
        ("codec", pa.string()),
        ("n_rows", pa.int64()),
        ("bytes_in", pa.int64()),
        ("bytes_out", pa.int64()),
        ("checksum", pa.string()),
        ("encode_ms", pa.float64()),
        ("attempts", pa.int32()),
        ("status", pa.string()),
        ("failure_category", pa.string()),
        ("epoch", pa.int64()),
        ("min_int", pa.int64()),
        ("max_int", pa.int64()),
        ("min_num", pa.float64()),
        ("max_num", pa.float64()),
        ("min_str", pa.string()),
        ("max_str", pa.string()),
        ("null_count", pa.int64()),
        ("stat_exact", pa.bool_()),
        ("sum_int", pa.int64()),
        ("sum_num", pa.float64()),
        ("m2", pa.float64()),
        ("bloom", pa.binary()),
        ("ndv", pa.binary()),
        ("qsk", pa.binary()),
        ("vcs", pa.binary()),
        ("data", pa.binary()),
    ]
)


class InjectedFault(RuntimeError):
    """Deliberate per-(partition, column) failure for resilience tests
    (≙ the reference's mock-`claude` fault scripts, e2e/mocks/)."""


def classify_failure(exc: BaseException) -> str:
    """Map an encode exception onto the failure taxonomy — mirrors the
    reference's 11-value failure_category enum
    (/root/reference/internal/state/state.go:29-41), restricted to the
    categories an encode engine can actually hit."""
    if isinstance(exc, InjectedFault):
        return "injected_fault"
    # ArrowInvalid subclasses ValueError — it must be checked first or
    # every Arrow validation failure would be ledgered as codec_error.
    if isinstance(exc, pa.ArrowInvalid):
        return "validation_error"
    if isinstance(exc, (KeyError, ValueError)):
        return "codec_error"
    if isinstance(exc, MemoryError):
        return "resource_exhausted"
    return "unknown_error"


DEFAULT_SIZE_BUDGET = 0.95  # a codec must save >=5% vs input or we take raw


def encode_with_fallback(
    arr: pa.Array,
    chain: list[str],
    size_budget_ratio: float = DEFAULT_SIZE_BUDGET,
    state: dict | None = None,
    compression: str | None = None,
    compression_level: int = 1,
) -> tuple[str, bytes, int]:
    """Walk the stripe's codec chain until the size budget is met.

    Reference semantics: bounded ``loop`` with ``on-exhaust`` recovery
    (/root/reference/internal/runner/runner.go:803-898) — a codec that
    misses the budget (bytes_out > ratio * bytes_in) falls through to
    the next; ``raw`` terminates the chain unconditionally (a sub-5%
    saving isn't worth a non-trivial decode path).

    ``compression`` layers the frame-level block compressor (ORC
    CompressionKind semantics) over every attempt, so the budget walk
    judges each codec by the bytes that actually land on disk.
    """
    order = selector.choose_codec(arr, chain)
    budget = max(64, int(arr.nbytes * size_budget_ratio))
    attempts = 0
    blob = b""
    codec = "raw"
    # The adaptive zlib miss counter must advance once per STRIPE, not
    # once per codec attempt (ADVICE r3: a 2-codec chain with <5% gain
    # hit the skip threshold in a single stripe) — restore the counter
    # keys before each attempt so only the final attempt's step sticks.
    zsnap = (
        {k: state.get(k) for k in ("zlib_skip", "zlib_probe")}
        if state is not None
        else None
    )

    def _restore_zlib_state():
        if zsnap is None:
            return
        for k, v in zsnap.items():
            if v is None:
                state.pop(k, None)
            else:
                state[k] = v

    for codec in order:
        attempts += 1
        _restore_zlib_state()
        blob = encode_frame(
            arr, codec, state=state,
            compression=compression, compression_level=compression_level,
        )
        if len(blob) <= budget or codec == "raw":
            break
    else:  # chain exhausted without raw (custom override chains)
        attempts += 1
        codec = "raw"
        _restore_zlib_state()
        blob = encode_frame(
            arr, "raw", state=state,
            compression=compression, compression_level=compression_level,
        )
    return codec, blob, attempts


def encode_stage(
    df: DataFrame,
    plans: dict[str, selector.ColumnPlan],
    run_id: str,
    size_budget_ratio: float = 1.0,
    epoch: int = 0,
    fault_spec: dict | None = None,
    compression: str | None = None,
    compression_level: int = 1,
    stripe_rows: int | None = None,
    stripe_bytes: int | None = None,
    bloom_index: bool = True,
    token_bloom_columns: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Encode every planned column of every arrow batch into stripes.

    A stripe whose encode raises is recorded as ``status='failed'`` with
    a taxonomy category instead of failing the whole wave — the ledger
    keeps the trace and resume re-encodes the partition at the next
    epoch (≙ the reference persisting failure_category in state.json,
    /root/reference/internal/state/state.go:29-41).

    ``fault_spec`` = {"columns": [...], "partitions": [...]} injects a
    deliberate failure for those stripes (resilience tests / the
    failure_categories oracle query).

    ``stripe_rows`` re-chunks incoming Arrow batches to a fixed row
    count before encoding, making stripe size a property of the JOB
    rather than of `spark.sql.execution.arrow.maxRecordsPerBatch` —
    at cluster scale this bounds per-stripe executor memory and sets
    zone-map granularity deterministically.

    ``stripe_bytes`` instead targets a fixed UNCOMPRESSED BYTE volume
    per stripe — the public ORC writer's actual contract
    (orc.stripe.size is bytes, not rows): the row target is derived
    per partition from the first batch's measured bytes/row and
    clamped to [64, 2^20] rows, so wide text partitions get few fat
    rows per stripe and narrow int partitions get many — per-stripe
    executor memory stays flat across heterogeneous row widths, which
    fixed rows cannot do. Mutually exclusive with ``stripe_rows``.
    """
    if stripe_rows is not None and stripe_bytes is not None:
        raise ValueError("pass stripe_rows OR stripe_bytes, not both")
    columns = sorted(plans)
    chains = {c: plans[c].chain for c in columns}
    fault_cols = set((fault_spec or {}).get("columns", ()))
    fault_pids = set((fault_spec or {}).get("partitions", ()))
    # full-text token blooms are OPT-IN per column: tokenizing every
    # stripe costs real encode CPU, so only columns a user intends to
    # search pay it (``contains_token`` probes these bitsets)
    token_cols = set(token_bloom_columns or ())

    def _rechunk(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        if stripe_rows is None and stripe_bytes is None:
            yield from batches
            return
        # Accumulate-and-slice to exactly the row target per stripe
        # (the final partial stripe keeps the remainder). Slices are
        # zero-copy views; only the cross-batch seam concatenates.
        # In stripe_bytes mode the row target is derived once per
        # partition from the first batch's measured bytes/row.
        target = stripe_rows
        pending: list[pa.RecordBatch] = []
        have = 0
        for b in batches:
            if target is None:  # stripe_bytes mode, first batch seen
                bpr = max(1, b.nbytes // max(1, b.num_rows))
                target = max(64, min(1 << 20, int(stripe_bytes // bpr)))
            pending.append(b)
            have += b.num_rows
            while have >= target:
                tbl = pa.Table.from_batches(pending)
                head = tbl.slice(0, target).combine_chunks()
                rest = tbl.slice(target)
                yield from head.to_batches(max_chunksize=target)
                pending = rest.to_batches()
                have = rest.num_rows
        if have:
            yield from (
                pa.Table.from_batches(pending)
                .combine_chunks()
                .to_batches(max_chunksize=target)
            )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        col_state: dict[str, dict] = {c: {} for c in columns}
        for sidx, batch in enumerate(_rechunk(batches)):
            rows = {k: [] for k in _STRIPE_PA_SCHEMA.names}
            for col in columns:
                arr = batch.column(col)
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                t0 = time.perf_counter()
                try:
                    if col in fault_cols and pid in fault_pids:
                        raise InjectedFault(f"injected fault p{pid}/{col}")
                    codec, blob, attempts = encode_with_fallback(
                        arr, chains[col], size_budget_ratio,
                        state=col_state[col], compression=compression,
                        compression_level=compression_level,
                    )
                    status, category, checksum = "completed", None, column_checksum(arr)
                    zstats = zonemap.stripe_zone_stats(arr)
                    bloom = (
                        zonemap.stripe_bloom(
                            arr, token_mode=col in token_cols
                        )
                        if bloom_index
                        else None
                    )
                except Exception as exc:  # noqa: BLE001 — ledgered, not swallowed
                    codec, blob, attempts = "error", b"", 0
                    status, category, checksum = "failed", classify_failure(exc), ""
                    zstats = dict.fromkeys(
                        ("min_int", "max_int", "min_num", "max_num",
                         "min_str", "max_str", "null_count", "stat_exact",
                         "sum_int", "sum_num", "m2")
                    )
                    bloom = None
                ms = (time.perf_counter() - t0) * 1000.0
                rows["run_id"].append(run_id)
                rows["partition_id"].append(pid)
                rows["stripe_idx"].append(sidx)
                rows["column"].append(col)
                rows["codec"].append(codec)
                rows["n_rows"].append(len(arr))
                rows["bytes_in"].append(int(arr.nbytes))
                rows["bytes_out"].append(len(blob))
                rows["checksum"].append(checksum)
                rows["encode_ms"].append(ms)
                rows["attempts"].append(attempts)
                rows["status"].append(status)
                rows["failure_category"].append(category)
                rows["epoch"].append(epoch)
                for k, v in zstats.items():
                    rows[k].append(v)
                rows["bloom"].append(bloom)
                rows["ndv"].append(
                    ndv_mod.stripe_hll(arr)
                    if status == "completed"
                    else None
                )
                rows["qsk"].append(
                    quantiles_mod.stripe_qsketch(arr)
                    if status == "completed"
                    else None
                )
                rows["vcs"].append(
                    vcounts_mod.stripe_value_counts(arr)
                    if status == "completed"
                    else None
                )
                rows["data"].append(blob)
                if status == "completed":
                    # ORC nested-column statistics: one metadata-only
                    # row per scalar struct descendant ("meta.status")
                    # so predicates on nested fields prune stripe
                    # groups and probe blooms exactly like top-level
                    # columns; codec "stats" marks the row blob-free
                    # (decode never requests it, metrics exclude it)
                    for cname, child in zonemap.nested_stat_children(
                        arr, prefix=f"{col}."
                    ):
                        czs = zonemap.stripe_zone_stats(child)
                        rows["run_id"].append(run_id)
                        rows["partition_id"].append(pid)
                        rows["stripe_idx"].append(sidx)
                        rows["column"].append(cname)
                        rows["codec"].append("stats")
                        rows["n_rows"].append(len(child))
                        rows["bytes_in"].append(0)
                        rows["bytes_out"].append(0)
                        rows["checksum"].append("")
                        rows["encode_ms"].append(0.0)
                        rows["attempts"].append(0)
                        rows["status"].append("completed")
                        rows["failure_category"].append(None)
                        rows["epoch"].append(epoch)
                        for k, v in czs.items():
                            rows[k].append(v)
                        rows["bloom"].append(
                            zonemap.stripe_bloom(child) if bloom_index else None
                        )
                        rows["ndv"].append(ndv_mod.stripe_hll(child))
                        rows["qsk"].append(
                            quantiles_mod.stripe_qsketch(child)
                        )
                        rows["vcs"].append(
                            vcounts_mod.stripe_value_counts(child)
                        )
                        rows["data"].append(b"")
            yield pa.RecordBatch.from_pydict(rows, schema=_STRIPE_PA_SCHEMA)

    return df.select(columns).mapInArrow(fn, STRIPE_SCHEMA)
