"""Codec auto-selection — the engine's 'optimizer'.

Mirrors the reference's ``branch`` dispatch (run a check, route on its
output — /root/reference/internal/runner/runner.go:1288-1311) and its
bounded retry ``loop`` with on-exhaust recovery
(/root/reference/internal/runner/runner.go:803-898): each column gets
a *fallback chain* of codecs; per stripe, the first codec whose quick
predicate passes is tried, and if the encoded size misses the budget
the next codec in the chain is tried, ending at ``raw`` (which never
loses).

Heuristics follow the public ORC v1 writer: dictionary encoding when
distinct/n <= threshold; delta/direct picked inside ``rle_auto`` from
exact size formulas; FSST for high-cardinality repetitive strings.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

DICT_RATIO_THRESHOLD = 0.5  # ORC spec default is 0.8; strings benefit earlier
FSST_MIN_BYTES = 1 << 12  # below this, symbol-table overhead dominates
# front coding engages when the sampled consecutive-common-prefix bytes
# are at least this fraction of the sampled string bytes (url-clustered
# URL columns measure 0.7+; crawl-order body text ~0.0). Below it the
# two extra int streams can't pay for themselves and FSST wins.
PREFIX_RATIO_THRESHOLD = 0.25


@dataclass
class ColumnPlan:
    column: str
    chain: list[str] = field(default_factory=lambda: ["raw"])


def plan_for_schema(schema: pa.Schema, overrides: dict[str, list[str]] | None = None) -> dict[str, ColumnPlan]:
    """Static per-type chains; per-stripe dynamics happen in choose_codec."""
    plans: dict[str, ColumnPlan] = {}
    for f in schema:
        t = f.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            # prefix (front coding) sits between dict and fsst: it only
            # survives choose_codec's pruning when the sampled
            # consecutive-prefix overlap clears PREFIX_RATIO_THRESHOLD
            # (url-clustered URL columns), so low-cardinality columns
            # still take dict and body text still takes fsst.
            chain = ["dict", "prefix", "fsst", "raw"]
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            chain = ["prefix", "fsst", "raw"]
        elif (
            pa.types.is_integer(t)
            or pa.types.is_timestamp(t)
            or pa.types.is_date32(t)
        ):
            chain = ["rle_auto", "raw"]
        elif pa.types.is_float64(t):
            # ALP-style decimal scaling (framing._encode_float_alp):
            # real-world doubles (prices, quantities, sensor decimals)
            # scale exactly to small ints; choose_codec prunes it for
            # genuinely-real-valued columns via a sampled viability
            # check, and the size budget still guards the residue.
            # xorf (Gorilla XOR + byte-plane split) backs it up for
            # non-decimal floats with dead mantissa/exponent bytes
            # (float32-precision doubles, slowly-varying series).
            chain = ["alp", "xorf", "raw"]
        elif pa.types.is_floating(t):
            chain = ["xorf", "raw"]
        elif pa.types.is_boolean(t) or pa.types.is_decimal128(t):
            # bools RLE beautifully; decimals <= precision 18 ride the
            # int64 path (framing falls back to 16-byte raw above it)
            chain = ["rle_auto", "raw"]
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            # ORC LIST: length stream via the int auto-selector +
            # recursively-framed child; "list" IS the structural floor
            # (framing aliases raw to it), so the chain is terminal
            chain = ["list"]
        elif pa.types.is_struct(t):
            # ORC STRUCT: per-field recursively-framed children; the
            # structural framing is the floor, chain is terminal
            chain = ["struct"]
        elif pa.types.is_map(t):
            # ORC MAP: length stream + key/value child frames
            chain = ["map"]
        else:
            chain = ["raw"]
        plans[f.name] = ColumnPlan(f.name, chain)
    if overrides:
        for c, chain in overrides.items():
            plans[c] = ColumnPlan(c, list(chain))
    return plans


def stripe_stats(arr: pa.Array) -> dict:
    """Cheap per-stripe column stats — the selector's 'check' output
    (≙ the reference's branch.check stdout routing key)."""
    n = len(arr)
    out = {"n": n, "null_frac": (arr.null_count / n) if n else 0.0}
    if n == 0:
        return out
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_binary(t) or pa.types.is_large_string(t):
        sample = arr.slice(0, min(n, 2048)).drop_null()
        if len(sample):
            out["distinct_ratio"] = len(sample.unique()) / len(sample)
            out["avg_len"] = float(
                pa.compute.mean(pa.compute.binary_length(sample)).as_py() or 0
            )
            # sampled front-coding savings: consecutive common-prefix
            # bytes / sampled bytes, via the SAME helper the codec
            # uses, so the estimate and the encoder agree exactly
            from ..codecs import framing

            lens, data = framing._string_parts(sample)
            tot = int(lens.sum())
            out["prefix_ratio"] = (
                float(framing.consecutive_prefix_lengths(lens, data).sum()) / tot
                if tot
                else 0.0
            )
        else:
            out["distinct_ratio"] = 1.0
            out["avg_len"] = 0.0
            out["prefix_ratio"] = 0.0
        out["total_bytes"] = int(arr.nbytes)
    elif pa.types.is_integer(t) or pa.types.is_timestamp(t) or pa.types.is_date32(t):
        from ..codecs.framing import _int64_values

        v = _int64_values(arr.drop_null())
        if len(v):
            out["min"] = int(v.min())
            out["max"] = int(v.max())
            d = np.diff(v) if len(v) > 1 else np.zeros(0, dtype=np.int64)
            out["run_frac"] = float((d == 0).mean()) if len(d) else 0.0
            out["sorted_frac"] = float((d >= 0).mean()) if len(d) else 1.0
    elif pa.types.is_floating(t):
        from ..codecs import framing

        sample = (
            arr.slice(0, min(n, 4096)).drop_null().to_numpy(zero_copy_only=False)
        )
        if pa.types.is_float64(t):
            out["alp_viable"] = bool(framing.alp_viable(sample))
        # sampled all-zero XOR byte planes — xorf's viability stat,
        # computed with the codec's own helper so they agree exactly
        out["xorf_zero_planes"] = (
            framing.xorf_zero_planes(sample) if len(sample) else 0
        )
    return out


def codec_selection_sql(
    table: str,
    int_cols: list[str],
    str_cols: list[str],
    n_partitions: int,
) -> str:
    """DuckDB twin of the auto-selector's per-column decision.

    Recomputes the same ORC-writer heuristic from column statistics in
    SQL: integers/timestamps take the RLE chain; strings take dict when
    distinct/n <= DICT_RATIO_THRESHOLD, else FSST when the per-stripe
    byte volume clears FSST_MIN_BYTES, else raw. Emits one row per
    column with the configured stripe count — parity fails if either
    side's heuristic (or the encode stage's size-budget walk, which can
    override it) drifts.
    """
    parts = [
        f"SELECT '{c}' AS col, 'rle_auto' AS codec FROM (SELECT 1)"
        for c in int_cols
    ]
    for c in str_cols:
        parts.append(
            f"SELECT '{c}' AS col, CASE "
            f"WHEN count(DISTINCT {c}) * 1.0 / count(*) <= {DICT_RATIO_THRESHOLD} "
            f"THEN 'dict' "
            f"WHEN sum(octet_length(ENCODE({c}))) / {n_partitions} >= {FSST_MIN_BYTES} "
            f"THEN 'fsst' ELSE 'raw' END AS codec FROM {table}"
        )
        parts.append("")
    union = " UNION ALL ".join(p for p in parts if p)
    return (
        f'SELECT col AS "column", codec, CAST({n_partitions} AS BIGINT) AS n_stripes '
        f"FROM ({union}) ORDER BY col, codec"
    )


def choose_codec(arr: pa.Array, chain: list[str]) -> list[str]:
    """Order the chain for this stripe using quick stats.

    Returns the (possibly re-ordered / pruned) codec attempt order; the
    encode stage walks it with the size-budget check.
    """
    stats = stripe_stats(arr)
    order = list(chain)
    if "dict" in order:
        dr = stats.get("distinct_ratio", 1.0)
        if dr > DICT_RATIO_THRESHOLD:
            order.remove("dict")  # dictionary would not pay for itself
    if "prefix" in order and (
        stats.get("prefix_ratio", 0.0) < PREFIX_RATIO_THRESHOLD
        or stats.get("total_bytes", 1 << 30) < FSST_MIN_BYTES
    ):
        order.remove("prefix")  # adjacent values don't share prefixes
    if "fsst" in order and stats.get("total_bytes", 1 << 30) < FSST_MIN_BYTES:
        order.remove("fsst")
    if "alp" in order and not stats.get("alp_viable", True):
        order.remove("alp")  # real-valued doubles: scaling can't win
    if "xorf" in order and stats.get("xorf_zero_planes", 1) < 1:
        order.remove("xorf")  # no dead byte plane in the sample: the
        # 1-byte mask can't pay for itself, skip straight to raw
    if "raw" not in order:
        order.append("raw")
    return order
