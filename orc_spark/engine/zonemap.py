"""Stripe zone maps: per-stripe min/max/null-count statistics and
metadata-only predicate pushdown for the decode path.

Classic columnar-engine machinery (ORC row-group indexes, parquet
column statistics — public formats; semantics only, not a port): the
encode stage records each stripe's value range in the stripes table's
metadata columns, and `prune_stripes` drops whole stripe groups whose
range provably cannot satisfy a conjunctive predicate BEFORE any blob
is read or decoded. Pruning is conservative — a stripe with no stats
(failed, decimal, NaN-poisoned float) is always kept — so
``decode(prune(P)) + residual filter(P)`` equals ``decode() +
filter(P)`` by construction.

At 100 TB the wins compound: the pruning decision runs on the
blob-free metadata scan (parquet column pruning keeps `data` out of
the read), so a selective predicate over a clustered column
(EncodeJobConfig.cluster_by sorts within partitions at encode time —
no extra shuffle) turns a full-table decode into a handful of stripe
groups.
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A predicate is a list of conjuncts: (column, op, value) with op in
# {'==', '=', '>', '>=', '<', '<=', 'between', 'in'}; 'between' takes
# a (lo, hi) inclusive pair; 'in' takes an iterable of values (IN-list
# point lookups — zone-map ranges OR-combined, blooms OR-combined).
Conjunct = tuple  # (str, str, object)

_OPS = {"==", "=", ">", ">=", "<", "<=", "between", "in"}


# ------------------------------------------------------- encode side

def stripe_zone_stats(arr: pa.Array) -> dict:
    """Zone-map entry for one stripe: typed min/max + null count.

    Int-family values (ints, bools, timestamps, dates) land in
    min_int/max_int as int64; floats in min_num/max_num; strings in
    min_str/max_str. Anything else — or a float stripe containing NaN
    (Spark orders NaN above every number, so a finite max would
    wrongly prune `c > huge`) — records nulls only, which pruning
    treats as "always keep".
    """
    out = {
        "min_int": None, "max_int": None,
        "min_num": None, "max_num": None,
        "min_str": None, "max_str": None,
        "null_count": int(arr.null_count),
    }
    if len(arr) - arr.null_count == 0:
        return out
    t = arr.type
    try:
        if (
            pa.types.is_integer(t)
            or pa.types.is_boolean(t)
            or pa.types.is_timestamp(t)
            or pa.types.is_date32(t)
        ):
            view = arr
            if pa.types.is_timestamp(t):
                # normalize to epoch-us, the unit _as_scalar produces
                view = arr.cast(pa.timestamp("us")).cast(pa.int64())
            elif pa.types.is_date32(t):
                view = arr.cast(pa.int32())  # epoch-days
            elif pa.types.is_boolean(t):
                view = arr.cast(pa.int64())
            mm = pc.min_max(view)
            out["min_int"] = int(mm["min"].as_py())
            out["max_int"] = int(mm["max"].as_py())
        elif pa.types.is_floating(t):
            if pc.any(pc.is_nan(arr)).as_py():
                return out  # NaN-poisoned: no numeric bounds are safe
            mm = pc.min_max(arr)
            out["min_num"] = float(mm["min"].as_py())
            out["max_num"] = float(mm["max"].as_py())
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            mm = pc.min_max(arr)
            out["min_str"] = mm["min"].as_py()
            out["max_str"] = mm["max"].as_py()
    except pa.ArrowNotImplementedError:
        pass
    return out


# ------------------------------------------------------- decode side

def _as_scalar(v):
    """Normalize a predicate value onto the stat columns' domains:
    (int_values, num_value, str_value) — exactly one is non-None.
    int_values is a LIST: temporal values carry both their epoch-us
    and epoch-days encodings, because the predicate's author may not
    know whether the column is timestamp (us stats) or date32 (days
    stats) — checking both, OR-combined, keeps pruning conservative
    under the mismatch instead of silently dropping rows."""
    if isinstance(v, bool):
        return [int(v)], None, None
    if isinstance(v, int):
        return [v], None, None
    if isinstance(v, float):
        return None, v, None
    if isinstance(v, str):
        return None, None, v
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        epoch = datetime.datetime(1970, 1, 1)
        us = int((v - epoch) / datetime.timedelta(microseconds=1))
        return [us, (v.date() - epoch.date()).days], None, None
    if isinstance(v, datetime.date):
        days = (v - datetime.date(1970, 1, 1)).days
        return [days * 86_400_000_000, days], None, None
    raise TypeError(f"unsupported predicate value type: {type(v).__name__}")


def _range_overlap(lo, hi) -> Column:
    """Keep-condition: the stripe's [min, max] intersects [lo, hi]
    (either bound None = unbounded). Evaluated per stat family; a
    family's stats being null means it can't veto."""
    ilo, nlo, slo = _as_scalar(lo) if lo is not None else (None, None, None)
    ihi, nhi, shi = _as_scalar(hi) if hi is not None else (None, None, None)

    def fam(minc: str, maxc: str, flo, fhi) -> Column:
        cond = F.col(minc).isNotNull()
        if fhi is not None:
            cond = cond & (F.col(minc) <= F.lit(fhi))
        if flo is not None:
            cond = cond & (F.col(maxc) >= F.lit(flo))
        return cond

    if slo is not None or shi is not None:
        checked = fam("min_str", "max_str", slo, shi)
        stats_present = F.col("min_str").isNotNull()
    else:
        # int candidates pair by index (us with us, days with days);
        # a bare int has one candidate
        n_cand = max(len(ilo or ()), len(ihi or ()))
        int_checks = [
            fam(
                "min_int", "max_int",
                ilo[i] if ilo is not None and i < len(ilo) else None,
                ihi[i] if ihi is not None and i < len(ihi) else None,
            )
            for i in range(n_cand)
        ]
        # numeric predicates also check the float family (an int
        # predicate on a float column compares via min_num)
        first_ilo = ilo[0] if ilo else None
        first_ihi = ihi[0] if ihi else None
        checked = fam(
            "min_num", "max_num",
            float(first_ilo) if first_ilo is not None else nlo,
            float(first_ihi) if first_ihi is not None else nhi,
        )
        for c in int_checks:
            checked = checked | c
        stats_present = F.col("min_int").isNotNull() | F.col("min_num").isNotNull()
    return checked | ~stats_present  # no stats -> never prune


def _conjunct_keep(op: str, value) -> Column:
    if op not in _OPS:
        raise ValueError(f"unsupported predicate op: {op!r}")
    if op == "between":
        lo, hi = value
        return _range_overlap(lo, hi)
    if op == "in":
        vals = list(value)
        if not vals:
            return F.lit(False)  # empty IN-list matches nothing
        keep = _range_overlap(vals[0], vals[0])
        for v in vals[1:]:
            keep = keep | _range_overlap(v, v)
        return keep
    if op in ("==", "="):
        return _range_overlap(value, value)
    if op == ">=":
        return _range_overlap(value, None)
    if op == ">":
        # strict: a stripe whose max == value still can't satisfy, but
        # only when max is exact; inclusive overlap stays conservative
        return _range_overlap(value, None)
    if op == "<=":
        return _range_overlap(None, value)
    return _range_overlap(None, value)  # '<'


def prune_stripes(stripes: DataFrame, predicate: list[Conjunct]) -> DataFrame:
    """Drop stripe groups that provably cannot satisfy ``predicate``.

    Metadata-only: the keep-set is computed on the blob-free columns
    (`data` is never materialized for pruned groups — parquet column
    pruning keeps it out of the scan). When the keep-set is small
    (selective predicates — the point-lookup case) it is collected and
    applied as LITERAL filters: `partition_id isin(...)` reaches the
    parquet scan as a pushed filter, so whole blob files/row groups
    are skipped, not just their decode (encode tasks write one file
    per partition, so file-level statistics make this pruning exact at
    the IO layer). Large keep-sets fall back to a left-semi join on
    (partition_id, epoch, stripe_idx).
    """
    if not predicate:
        return stripes
    keep = None
    meta = stripes.drop("data")
    has_bloom = "bloom" in stripes.columns  # pre-r3 tables: stats only
    for col, op, value in predicate:
        cond = _conjunct_keep(op, value)
        rows = meta.filter(F.col("column") == col).filter(cond)
        if has_bloom and op in ("==", "=", "in"):
            vals = list(value) if op == "in" else [value]
            bks = [b for b in map(bloom_keep_expr, vals) if b is not None]
            if bks and len(bks) == len(vals):
                keep_b = bks[0]  # OR: any member may be present
                for b in bks[1:]:
                    keep_b = keep_b | b
                rows = rows.filter(keep_b)
        rows = rows.select("partition_id", "epoch", "stripe_idx")
        keep = rows if keep is None else keep.join(
            rows, ["partition_id", "epoch", "stripe_idx"], "left_semi"
        )
    keep = keep.distinct()
    keys = keep.limit(_PUSHDOWN_MAX_GROUPS + 1).collect()
    if len(keys) <= _PUSHDOWN_MAX_GROUPS:
        if not keys:
            return stripes.filter(F.lit(False))
        pids = sorted({int(r.partition_id) for r in keys})
        group_keys = [
            f"{int(r.partition_id)}:{int(r.epoch)}:{int(r.stripe_idx)}"
            for r in keys
        ]
        return stripes.filter(
            F.col("partition_id").isin(pids)  # pushed to the parquet scan
            & F.concat_ws(
                ":", "partition_id", "epoch", "stripe_idx"
            ).isin(group_keys)  # exact group keep, post-scan
        )
    return stripes.join(
        keep, ["partition_id", "epoch", "stripe_idx"], "left_semi"
    )


# Above this many surviving stripe groups the keep-set is no longer a
# "lookup" — skip the driver collect and use the distributed semi join.
_PUSHDOWN_MAX_GROUPS = 2048


def predicate_expr(predicate: list[Conjunct]) -> Column:
    """The residual row filter equivalent to ``predicate`` (zone maps
    are conservative; callers apply this after decode)."""
    cond = F.lit(True)
    for col, op, value in predicate:
        c = F.col(col)
        if op == "in":
            cond = cond & c.isin(list(value))
        elif op == "between":
            cond = cond & c.between(F.lit(value[0]), F.lit(value[1]))
        elif op in ("==", "="):
            cond = cond & (c == F.lit(value))
        elif op == ">":
            cond = cond & (c > F.lit(value))
        elif op == ">=":
            cond = cond & (c >= F.lit(value))
        elif op == "<":
            cond = cond & (c < F.lit(value))
        elif op == "<=":
            cond = cond & (c <= F.lit(value))
        else:
            raise ValueError(f"unsupported predicate op: {op!r}")
    return cond


# ------------------------------------------------------ bloom filters

# ORC spec bloom-filter index semantics (per-stripe bitset per column,
# k split hashes; public format, bytes layout ours): ~8 bits/value,
# k=4 gives ~2.4% false-positive rate; capped so a 64k-row stripe's
# index stays 64 KB.
BLOOM_BITS_PER_VALUE = 8
BLOOM_K = 4
BLOOM_MIN_BITS = 1 << 10
BLOOM_MAX_BITS = 1 << 19
# bump when the hash chain changes: v2 = polynomial rolling hash
_BLOOM_VERSION = b"\x02"


def _bloom_m(n_values: int) -> int:
    m = BLOOM_MIN_BITS
    while m < n_values * BLOOM_BITS_PER_VALUE and m < BLOOM_MAX_BITS:
        m <<= 1
    return m


_MIX_MUL1 = np.uint64(0xBF58476D1CE4E5B9)  # splitmix64 finalizer
_MIX_MUL2 = np.uint64(0x94D049BB133111EB)


def _mix64(x):
    """Vectorized splitmix64 finalizer (public-domain constants):
    int64 values -> two well-dispersed uint64 hash streams."""
    x = x.astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _MIX_MUL1
    x ^= x >> np.uint64(27)
    x *= _MIX_MUL2
    x ^= x >> np.uint64(31)
    h1 = x
    h2 = (x >> np.uint64(32)) | (x << np.uint64(32))
    return h1, (h2 | np.uint64(1))  # odd h2: full-period double hashing


def _hash_pairs(arr: pa.Array):
    """(h1, h2) uint64 streams for the dense values of an int-family,
    string, or binary column; None for unsupported types. Fully
    vectorized both ways: splitmix64 over int64 views; a position-
    weighted byte sum over the Arrow value buffer for strings/bytes
    (no per-row Python anywhere)."""
    t = arr.type
    dense = arr.drop_null()
    if pa.types.is_string(t) or pa.types.is_large_string(t) or \
            pa.types.is_binary(t) or pa.types.is_large_binary(t):
        # set-membership only needs DISTINCT values: a low-cardinality
        # column's bloom shrinks to its dictionary (and the python-list
        # conversion below stops scaling with row count)
        dense = dense.unique()
    if (
        pa.types.is_integer(t)
        or pa.types.is_boolean(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_date32(t)
    ):
        from ..codecs.framing import _int64_values

        if pa.types.is_boolean(t):
            dense = dense.cast(pa.int64())
        elif pa.types.is_timestamp(t):
            dense = dense.cast(pa.timestamp("us")).cast(pa.int64())
        v = _int64_values(dense)
        return _mix64(v)
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        from ..codecs.framing import _string_parts

        lengths, data = _string_parts(dense)
        return _mix64(_string_prehash(lengths, np.frombuffer(data, np.uint8)))
    return None


_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _string_prehash(lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Vectorized polynomial rolling hash per string (mod 2^64) — no
    per-row Python: h = Σ b[pos]·GOLD^(pos+1), segment-summed with one
    cumsum. Geometric weights make the map position-sensitive and
    non-linear in the byte values (a linear Σ b·(pos+1) collapses
    same-length near-identical strings — e.g. URLs differing in a few
    digits — into a tiny value range and saturates the bloom with
    false positives); _mix64 then gives full avalanche. False
    negatives are impossible: the predicate side runs the identical
    function."""
    n = len(lengths)
    lengths = lengths.astype(np.int64, copy=False)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    b = data.astype(np.uint64)
    pos = (
        np.arange(len(b), dtype=np.uint64)
        - np.repeat(starts.astype(np.uint64), lengths)
    ).astype(np.int64)
    max_len = int(lengths.max()) if n else 0
    # GOLD^(j+1) via cumprod (array uint64 ops wrap silently, O(max
    # string length) not rows)
    powers = np.cumprod(np.full(max_len + 1, _GOLD, dtype=np.uint64))
    weighted = b * powers[pos]
    c = np.concatenate([np.zeros(1, np.uint64), np.cumsum(weighted)])
    s1 = c[ends] - c[starts]  # wrap-safe: uint64 arithmetic is mod 2^64
    return s1 ^ (lengths.astype(np.uint64) << np.uint64(40))


# strings/bytes longer than this on average skip the bloom: equality
# lookups target keys/urls/tags, never whole documents, and hashing
# megabytes of text would tax encode for an index nobody can use
BLOOM_MAX_AVG_LEN = 128


def stripe_bloom(arr: pa.Array) -> bytes | None:
    """Per-stripe bloom bitset for equality pruning, or None when the
    type is unsupported / the stripe is empty / the values are
    long-form text (see BLOOM_MAX_AVG_LEN)."""
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
        return None  # e.g. exotic timestamp casts: index is optional,
        # a failed bloom must never fail the stripe itself
    if pair is None:
        return None
    h1, h2 = pair
    n = len(h1)
    if n == 0:
        return None
    m = _bloom_m(n)
    # boolean scatter + packbits beats bitwise_or.at (unbuffered ufunc)
    # by ~10x; little bitorder matches the reader's (idx>>3, idx&7)
    bb = np.zeros(m, dtype=bool)
    for i in range(BLOOM_K):
        bb[((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)] = True
    # version prefix: a reader probing with a DIFFERENT hash chain than
    # the writer would produce false negatives (wrong pruning); any
    # unrecognized version is treated as "always keep"
    return _BLOOM_VERSION + np.packbits(bb, bitorder="little").tobytes()


def _value_hash_pair(value) -> tuple[int, int] | None:
    """The scalar twin of _hash_pairs for a predicate literal — MUST
    run the identical hash chain or membership breaks."""
    if isinstance(value, bool):
        v = np.array([int(value)], dtype=np.int64)
    elif isinstance(value, int):
        v = np.array([value], dtype=np.int64)
    elif isinstance(value, (str, bytes)):
        raw = value.encode() if isinstance(value, str) else value
        pre = _string_prehash(
            np.array([len(raw)], dtype=np.int64),
            np.frombuffer(raw, np.uint8),
        )
        return _mix64(pre)
    elif isinstance(value, datetime.datetime):
        iv, _, _ = _as_scalar(value)
        v = np.array([iv[0]], dtype=np.int64)  # epoch-us stream
    elif isinstance(value, datetime.date):
        iv, _, _ = _as_scalar(value)
        v = np.array(iv, dtype=np.int64)  # both encodings checked
    else:
        return None
    h1, h2 = _mix64(v)
    return h1, h2


def bloom_keep_expr(value) -> "Column | None":
    """Keep-condition over the stripes' `bloom` column for an equality
    predicate: False only when the bitset PROVABLY excludes the value
    (all-null / absent blooms always keep). Arrow-vectorized pandas UDF
    over metadata rows only — never data blobs."""
    pair = _value_hash_pair(value)
    if pair is None:
        return None
    h1s, h2s = int(pair[0][0]), int(pair[1][0])
    n_enc = len(pair[0])
    h1o = int(pair[0][-1])
    h2o = int(pair[1][-1])

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def maybe_contains(blooms):
        import pandas as pd

        pairs = [(h1s, h2s)] if n_enc == 1 else [(h1s, h2s), (h1o, h2o)]
        out = []
        for blob in blooms:
            if (
                blob is None
                or len(blob) < 2
                or blob[:1] != _BLOOM_VERSION  # unknown writer: never veto
            ):
                out.append(True)
                continue
            bits = np.frombuffer(blob, dtype=np.uint8, offset=1)
            m = len(bits) << 3
            keep = False
            for h1, h2 in pairs:  # plain-int mod-2^64 double hashing
                ok = True
                for i in range(BLOOM_K):
                    idx = ((h1 + i * h2) & 0xFFFFFFFFFFFFFFFF) % m
                    if not (bits[idx >> 3] >> (idx & 7)) & 1:
                        ok = False
                        break
                keep = keep or ok
            out.append(keep)
        return pd.Series(out)

    return maybe_contains(F.col("bloom"))
