"""Per-stripe EXACT value-count histograms: metadata-only
``GROUP BY col, COUNT(*)`` over UNCLUSTERED low-cardinality columns.

metadata_group_aggregate answers grouped counts from zone stats only
where stripes are PURE in the key (a clustered layout); a categorical
column on a url-keyed crawl (lang, content_type, http status) is
impure in every stripe, so each stripe footer stores its full exact
(value → count) map instead — the ORC writer's dictionary already
knows it, and ≤ VCS_CAP distinct values cost ≤ ~4 KB of footer. The
table-level GROUP BY then folds per-stripe maps associatively with
zero data bytes read; stripes past the cap decline honestly (null)
and route to the restricted decode path (reference parity: stats.go's
count-by-category aggregations, re-expressed as a storage-level
pushdown; the histogram idea is the public ORC/Parquet
dictionary-page statistics trick).

Cost control at encode: a 1024-value prefix sample is counted first —
a stripe with ≤ CAP distinct values overall has ≤ CAP distinct in any
prefix, so a busted sample proves the full count would bust and the
stripe declines after O(sample) work (the doc_id/url case never pays
a 64k-entry hash table). Long-form text columns decline by the bloom
index's avg-length policy (hashing megabytes of footer text is the
dedup family's job, not a stat).

Serialization: 1 version byte + JSON ``{"t": kind, "p": [[v, c]...]}``
with kind ∈ {s, i, b, ts, d} (string verbatim; int/bool/timestamp-µs/
date-days as int64) — values rebuild to the column's leaf type plan-
side, so metadata rows and decoded rows merge in one final groupBy.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

VCS_CAP = 256
_SAMPLE = 1024
_VERSION = b"\x01"


def _kind(t: pa.DataType) -> str | None:
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "s"
    if pa.types.is_integer(t):
        return "i"
    if pa.types.is_boolean(t):
        return "b"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "d"
    return None  # floats/decimals/nested: equality semantics / size


def stripe_value_counts(arr: pa.Array) -> bytes | None:
    """Exact (value → count) histogram of one stripe, or None when the
    column declines (type, long-form text, > VCS_CAP distinct)."""
    from .zonemap import BLOOM_MAX_AVG_LEN

    t = arr.type
    kind = _kind(t)
    if kind is None or len(arr) == 0:
        return None
    if kind == "s":
        navg = arr.nbytes / max(1, len(arr))
        if navg > BLOOM_MAX_AVG_LEN:
            return None
    # prefix-sample guard: > CAP distinct in ANY prefix proves > CAP
    # distinct overall — decline after O(sample) work
    if len(arr) > _SAMPLE:
        head = arr.slice(0, _SAMPLE)
        if len(pc.unique(head)) > VCS_CAP:
            return None
    try:
        vc = pc.value_counts(arr)
    except pa.ArrowNotImplementedError:
        return None
    if len(vc) > VCS_CAP + 1:  # +1: a possible null entry
        return None
    pairs = []
    vals = vc.field("values")
    counts = vc.field("counts")
    for i in range(len(vc)):
        v = vals[i]
        if not v.is_valid:
            continue  # nulls ride the footer's null_count instead
        if kind == "ts":
            # canonical µs regardless of the column's storage unit
            raw = vals[i].cast(pa.int64()).as_py()
            scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1}[t.unit]
            v = raw // 1000 if t.unit == "ns" else raw * scale
        elif kind == "d":
            v = vals[i].cast(pa.int32()).as_py()
        elif kind == "b":
            v = int(v.as_py())
        else:
            v = v.as_py()
        pairs.append([v, counts[i].as_py()])
    if len(pairs) > VCS_CAP:
        return None
    pairs.sort(key=lambda p: p[0])
    return _VERSION + json.dumps(
        {"t": kind, "p": pairs}, separators=(",", ":"), ensure_ascii=False
    ).encode()


def parse_vcs(blob: bytes) -> tuple[str, list[tuple]]:
    """(kind, [(value, count), ...]) of one serialized histogram."""
    if not blob or blob[:1] != _VERSION:
        raise ValueError("unknown vcs version")
    d = json.loads(blob[1:].decode())
    return d["t"], [tuple(p) for p in d["p"]]
