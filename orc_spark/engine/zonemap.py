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

import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A predicate is a list of conjuncts: (column, op, value) with op in
# {'==', '=', '>', '>=', '<', '<=', 'between'}; 'between' takes a
# (lo, hi) inclusive pair.
Conjunct = tuple  # (str, str, object)

_OPS = {"==", "=", ">", ">=", "<", "<=", "between"}


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
    pruning keeps it out of the scan), then applied as a left-semi
    join on (partition_id, epoch, stripe_idx) so groups stay complete
    for decode_stage's reassembly invariant.
    """
    if not predicate:
        return stripes
    keep = None
    meta = stripes.drop("data")
    for col, op, value in predicate:
        rows = meta.filter(F.col("column") == col).filter(
            _conjunct_keep(op, value)
        ).select("partition_id", "epoch", "stripe_idx")
        keep = rows if keep is None else keep.join(
            rows, ["partition_id", "epoch", "stripe_idx"], "left_semi"
        )
    return stripes.join(
        keep.distinct(), ["partition_id", "epoch", "stripe_idx"], "left_semi"
    )


def predicate_expr(predicate: list[Conjunct]) -> Column:
    """The residual row filter equivalent to ``predicate`` (zone maps
    are conservative; callers apply this after decode)."""
    cond = F.lit(True)
    for col, op, value in predicate:
        c = F.col(col)
        if op == "between":
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
