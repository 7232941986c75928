"""Temporal operators over the events stream: gap-based sessionization
and as-of (most-recent-prior) joins.

Control-plane provenance: the reference aggregates its run ledger by
time bucket and chains steps on "the latest prior state" (reference
internal/stats/stats.go:233-480 weekly/percentile rollups;
internal/state/state.go resume picks the newest prior run record) —
semantics only, not a port; the implementations here are Spark window
algebra over an event table.

Both operators are SQL-expressible, so each ships with a DuckDB twin
(`*_sql`) for the driver's oracle gate.

Scale notes (100 TB):
- ``sessionize`` costs exactly ONE shuffle, on the user key: the
  session-boundary window partitions by user, and the follow-up
  groupBy(user, session_id) is satisfied by the same hash
  partitioning (user is a prefix of the grouping key), so Catalyst
  inserts no second Exchange. Running-sum frames are evaluated
  incrementally (O(1) per row), never O(frame).
- ``asof_join`` is the union trick: tag both sides, ONE shuffle on the
  join key, one ordered window with a last(ignorenulls) carry-forward.
  No range-explode, no per-row subquery, no skew beyond what the key
  itself carries (salt upstream if one user owns a shard's worth of
  events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _micros(col):
    """Integer microseconds since the NAIVE epoch: timestamp_diff on
    two TIMESTAMP_NTZ values is pure wall-clock arithmetic — no
    session timezone, no DST — so it equals DuckDB's ``epoch_us(ts)``
    exactly (testdata timestamps are NTZ). Built lazily: Column
    construction needs an active SparkContext."""
    epoch = F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))
    return F.timestamp_diff("MICROSECOND", epoch, col)


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
) -> DataFrame:
    """Split each user's event stream into sessions separated by
    inactivity gaps > ``gap_minutes``; return one row per session.

    A session boundary is an event whose predecessor (same user, time
    order) is more than the gap away — the standard web-analytics
    definition. Gap arithmetic is in exact integer MICROSECONDS
    (naive-epoch ``timestamp_diff`` here, ``epoch_us`` in the DuckDB
    twin) so both
    engines agree bit-for-bit; float epoch seconds would not.

    Output: user_id, session_id (0-based per user, time order),
    n_events, t_start, t_end, duration_sec, total_value_r.
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    us = _micros(F.col(ts_col))
    prev_us = F.lag(us).over(w)
    is_new = F.when(
        prev_us.isNull() | ((us - prev_us) > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (F.sum(is_new).over(run) - F.lit(1)).alias("session_id")
    return (
        df.select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).alias("value"),
            sess,
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("t_start"),
            F.max("ts").alias("t_end"),
            F.round(
                (_micros(F.max("ts")) - _micros(F.min("ts")))
                / F.lit(1_000_000.0),
                6,
            ).alias("duration_sec"),
            F.round(F.sum("value"), 6).alias("total_value_r"),
        )
        .orderBy("user_id", "session_id")
    )


def sessionize_sql(
    table: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
) -> str:
    """DuckDB twin of :func:`sessionize` — identical window algebra,
    identical integer-microsecond gap test."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    return (
        "WITH b AS (SELECT "
        f"{user_col} AS user_id, {ts_col} AS ts, {value_col} AS value, "
        "CASE WHEN epoch_us("
        f"LAG({ts_col}) OVER (PARTITION BY {user_col} "
        f"ORDER BY {ts_col}, event_id)) IS NULL "
        f"OR epoch_us({ts_col}) - epoch_us(LAG({ts_col}) OVER ("
        f"PARTITION BY {user_col} ORDER BY {ts_col}, event_id)) > {gap_us} "
        "THEN 1 ELSE 0 END AS is_new "
        f"FROM {table}), "
        "s AS (SELECT user_id, ts, value, "
        "CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id FROM b) "
        "SELECT user_id, session_id, COUNT(*) AS n_events, "
        "MIN(ts) AS t_start, MAX(ts) AS t_end, "
        "ROUND((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0, 6) "
        "AS duration_sec, "
        "ROUND(SUM(value), 6) AS total_value_r "
        "FROM s GROUP BY user_id, session_id "
        "ORDER BY user_id, session_id"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    right_id_col: str = "event_id",
    right_carry: tuple[str, ...] = ("value",),
    tolerance_sec: float | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row with the
    same key and ``right.ts <= left.ts`` (LEFT semantics: unmatched
    left rows keep NULL right columns).

    Implemented as the scale-safe UNION trick, not a range join:
    tag both sides, shuffle ONCE on the key, order by
    (ts, right-first, right_id), and carry the latest right row
    forward with ``last(..., ignorenulls=True)``. A right and left row
    at the SAME timestamp match (<= semantics), which is why right
    rows sort before left rows at ts ties; among right ties the
    largest ``right_id_col`` wins — a deterministic total order, so
    the DuckDB ``ASOF LEFT JOIN`` twin agrees exactly.

    Output: left columns prefixed ``l_`` (id/ts), matched right id/ts
    prefixed ``r_``, carried right columns prefixed ``r_``, and
    ``lag_sec`` (left.ts - right.ts, exact microseconds / 1e6).

    ``tolerance_sec`` (pandas merge_asof semantics): a match older
    than the tolerance is DISCARDED — the left row keeps nulls, as if
    no right row existed. The carry itself is unchanged; staleness is
    applied to the matched pair, exactly reproducible relationally.
    """
    lcols = [
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("ts"),
        F.lit(0).alias("is_right"),
        F.col("event_id").alias("l_id"),
        F.lit(None).cast("long").alias("r_id"),
        F.lit(None).cast("timestamp_ntz").alias("r_ts"),
    ] + [F.lit(None).cast("double").alias(f"r_{c}") for c in right_carry]
    rcols = [
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("ts"),
        F.lit(1).alias("is_right"),
        F.lit(None).cast("long").alias("l_id"),
        F.col(right_id_col).alias("r_id"),
        F.col(ts_col).alias("r_ts"),
    ] + [F.col(c).alias(f"r_{c}") for c in right_carry]
    both = left.select(lcols).unionByName(right.select(rcols))
    # right rows first at ts ties (<= matches equality), newest right
    # id last so last() picks it; l_id breaks left ties (no effect on
    # the carried value, keeps the order total)
    w = (
        Window.partitionBy("k")
        .orderBy("ts", F.desc("is_right"), "r_id", "l_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last("r_id", ignorenulls=True).over(w).alias("m_id"),
        F.last("r_ts", ignorenulls=True).over(w).alias("m_ts"),
    ] + [
        F.last(f"r_{c}", ignorenulls=True).over(w).alias(f"m_{c}")
        for c in right_carry
    ]
    out = both.select("k", "ts", "is_right", "l_id", *carried).where(
        F.col("is_right") == 0
    )
    lag_us = _micros(F.col("ts")) - _micros(F.col("m_ts"))
    if tolerance_sec is not None:
        # stale match -> no match (exact integer-microsecond test)
        fresh = lag_us <= F.lit(int(tolerance_sec * 1_000_000))
        out = out.select(
            "k", "ts", "is_right", "l_id",
            F.when(fresh, F.col("m_id")).alias("m_id"),
            F.when(fresh, F.col("m_ts")).alias("m_ts"),
            *[
                F.when(fresh, F.col(f"m_{c}")).alias(f"m_{c}")
                for c in right_carry
            ],
        )
        lag_us = _micros(F.col("ts")) - _micros(F.col("m_ts"))
    return out.select(
        F.col("l_id"),
        F.col("k").alias("key"),
        F.col("ts").alias("l_ts"),
        F.col("m_id").alias("r_id"),
        F.col("m_ts").alias("r_ts"),
        F.round(lag_us / F.lit(1_000_000.0), 6).alias("lag_sec"),
        *[F.col(f"m_{c}").alias(f"r_{c}") for c in right_carry],
    ).orderBy("l_id")


def asof_join_events_sql(
    table: str,
    left_type: str = "error",
    right_type: str = "click",
) -> str:
    """DuckDB twin for the events-table as-of query (native
    ``ASOF LEFT JOIN``): for each *left_type* event, the most recent
    prior-or-simultaneous *right_type* event by the same user."""
    return (
        f"WITH l AS (SELECT * FROM {table} WHERE event_type = '{left_type}'), "
        f"r AS (SELECT * FROM {table} WHERE event_type = '{right_type}') "
        "SELECT l.event_id AS l_id, l.user_id AS key, l.ts AS l_ts, "
        "r.event_id AS r_id, r.ts AS r_ts, "
        "ROUND((epoch_us(l.ts) - epoch_us(r.ts)) / 1000000.0, 6) AS lag_sec, "
        "r.value AS r_value "
        "FROM l ASOF LEFT JOIN r "
        "ON l.user_id = r.user_id AND l.ts >= r.ts "
        "ORDER BY l_id"
    )


def latest_snapshot(
    df: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Keep-newest-snapshot-per-key — the crawl revisit policy: a URL
    recrawled across dumps keeps only its most recent capture
    (re-expressed over the events table: newest event per
    (user, event_type)).

    One key shuffle; the rank<=1 predicate compiles to Spark's
    WindowGroupLimit, which pre-filters to each partition's per-key
    newest row BELOW the exchange — the shuffle carries ~one row per
    (key, input-partition), not the full history. Deterministic
    tie-break on ``tiebreak_col`` descending."""
    from pyspark.sql import Window

    keys = key_cols or ["user_id", "event_type"]
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def latest_snapshot_events_sql(table: str) -> str:
    """DuckDB twin of :func:`latest_snapshot` over the events table."""
    return (
        f"WITH r AS (SELECT *, row_number() OVER ("
        "PARTITION BY user_id, event_type "
        f"ORDER BY ts DESC, event_id DESC) AS rn FROM {table}) "
        "SELECT event_id, ts, user_id, event_type, value, props "
        "FROM r WHERE rn = 1 ORDER BY event_id"
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-sequence funnel (the product-analytics primitive):
    how many users completed step 1, then step 2 STRICTLY AFTER their
    first qualifying step-1 event, and so on — each user advances by
    the EARLIEST event that continues their sequence (the standard
    first-touch funnel; no within-window variant keeps the semantics
    exactly relational).

    Scale plan: step k is one filter + one user-keyed join against
    the step-(k-1) reach set + one min-aggregate — K-1 key-local
    shuffles total, each carrying one row per surviving user, never
    events. Monotone: reach sets only shrink, so later steps join
    ever-smaller sides (AQE broadcasts them when small enough).

    Returns (step_idx, step, n_users) — users whose sequence reached
    each step; order by step_idx.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    reach = None
    counts = []
    for i, step in enumerate(steps):
        ev = df.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
        )
        if reach is None:
            cur = ev.groupBy("_u").agg(F.min("_ts").alias("_t"))
        else:
            cur = (
                ev.join(reach, "_u")
                .where(F.col("_ts") > F.col("_t"))
                .groupBy("_u")
                .agg(F.min("_ts").alias("_t"))
            )
        reach = cur
        counts.append((i, step, reach))
    spark = df.sparkSession
    out = None
    for i, step, r in counts:
        row = r.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(i).alias("step_idx"),
            F.lit(step).alias("step"),
            F.col("n").cast("long").alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("step_idx")


def funnel_sql(
    table: str,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`funnel` — the identical earliest-
    continuation CTE chain."""
    ctes = []
    for i, step in enumerate(steps):
        esc = step.replace("'", "''")
        if i == 0:
            ctes.append(
                f"s0 AS (SELECT {user_col} AS u, MIN({ts_col}) AS t "
                f"FROM {table} WHERE {type_col} = '{esc}' GROUP BY 1)"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT e.{user_col} AS u, MIN(e.{ts_col}) AS t "
                f"FROM {table} e JOIN s{i-1} p ON e.{user_col} = p.u "
                f"WHERE e.{type_col} = '{esc}' AND e.{ts_col} > p.t "
                "GROUP BY 1)"
            )
    selects = " UNION ALL ".join(
        f"SELECT {i} AS step_idx, '{s.replace(chr(39), chr(39)*2)}' AS step, "
        f"(SELECT COUNT(*) FROM s{i}) AS n_users"
        for i, s in enumerate(steps)
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n" + selects + " ORDER BY step_idx"
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_weeks: int = 8,
) -> DataFrame:
    """Weekly cohort retention (the product-analytics companion of
    :func:`funnel`): users are cohorted by the Monday-truncated week
    of their FIRST event; cell (cohort, k) counts distinct cohort
    members active in cohort-week + k. Standard triangle layout,
    bounded at ``max_weeks`` offsets.

    Scale plan: one user-keyed min-aggregate for cohort assignment,
    one broadcast-scale join back (one row per user), one
    (cohort, offset)-keyed distinct-count — shuffles carry user rows,
    never raw events twice. Offsets beyond ``max_weeks`` are dropped,
    bounding output at weeks x max_weeks cells.

    Returns (cohort_week, week_offset, n_users); order by both.
    """
    wk = F.date_trunc("week", F.col(ts_col))
    firsts = (
        df.select(F.col(user_col).alias("_u"), wk.alias("_w"))
        .groupBy("_u")
        .agg(F.min("_w").alias("_cohort"))
    )
    acts = df.select(F.col(user_col).alias("_u"), wk.alias("_w")).join(
        firsts, "_u"
    )
    off = (
        F.datediff(F.col("_w"), F.col("_cohort")) / 7
    ).cast("long")
    return (
        acts.select("_u", "_cohort", off.alias("week_offset"))
        .where(F.col("week_offset") <= max_weeks)
        .groupBy(
            F.to_date("_cohort").alias("cohort_week"), "week_offset"
        )
        .agg(F.count_distinct("_u").cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def cohort_retention_sql(
    table: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_weeks: int = 8,
) -> str:
    """DuckDB twin of :func:`cohort_retention` — identical Monday
    truncation, integer-day offset arithmetic, and cap."""
    return f"""
WITH firsts AS (
  SELECT {user_col} AS u, MIN(date_trunc('week', {ts_col})) AS cohort
  FROM {table} GROUP BY 1
),
acts AS (
  SELECT e.{user_col} AS u, f.cohort,
         (date_diff('day', f.cohort, date_trunc('week', e.{ts_col})) // 7)
           AS week_offset
  FROM {table} e JOIN firsts f ON e.{user_col} = f.u
)
SELECT CAST(cohort AS DATE) AS cohort_week, week_offset,
       COUNT(DISTINCT u) AS n_users
FROM acts WHERE week_offset <= {max_weeks}
GROUP BY 1, 2 ORDER BY 1, 2
"""


def gap_fill_daily(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Regular-grid resample with forward fill — the time-series
    completion primitive (metrics dashboards, feature matrices):
    every (user, day) cell of the GLOBAL date span gets the value of
    that user's latest event that day, else the last known earlier
    value, else null (days before the user's first event). The
    day-level representative is deterministic: latest ts, event id as
    tiebreak.

    Scale plan: the grid is users x days built from ONE tiny min/max
    aggregate + sequence/explode (no driver loop); the day
    representative is a user-day window rank; the fill is
    last(ignorenulls) over the user's date-ordered window — three
    user-keyed shuffles, rows bounded by users x days, events scanned
    once.

    Returns (user_id, day, value, filled) where filled marks
    carried-forward cells; order by user, day.
    """
    from pyspark.sql import Window

    day = F.to_date(F.col(ts_col))
    span = df.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    users = df.select(F.col(user_col).alias("u")).distinct()
    grid = users.crossJoin(span).select(
        "u", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    daily = (
        df.withColumn("_rn", F.row_number().over(
            Window.partitionBy(F.col(user_col), day).orderBy(
                F.desc(ts_col), F.desc(id_col)
            )
        ))
        .where(F.col("_rn") == 1)
        .select(
            F.col(user_col).alias("u"),
            day.alias("day"),
            F.col(value_col).alias("_v"),
        )
    )
    w_fill = (
        Window.partitionBy("u")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["u", "day"], "left")
        .select(
            F.col("u").alias(user_col),
            "day",
            F.last("_v", ignorenulls=True).over(w_fill).alias("value"),
            F.col("_v").isNull().alias("filled"),
        )
        .orderBy(user_col, "day")
    )


def gap_fill_daily_sql(
    table: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`gap_fill_daily` — same global span grid,
    same deterministic day representative, same IGNORE NULLS fill."""
    return f"""
WITH span AS (
  SELECT CAST(MIN({ts_col}) AS DATE) AS d0,
         CAST(MAX({ts_col}) AS DATE) AS d1 FROM {table}
),
users AS (SELECT DISTINCT {user_col} AS u FROM {table}),
grid AS (
  SELECT u, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
           AS day
  FROM users, span
),
daily AS (
  SELECT u, day, v FROM (
    SELECT {user_col} AS u, CAST({ts_col} AS DATE) AS day,
           {value_col} AS v,
           row_number() OVER (
             PARTITION BY {user_col}, CAST({ts_col} AS DATE)
             ORDER BY {ts_col} DESC, {id_col} DESC) AS rn
    FROM {table}
  ) WHERE rn = 1
)
SELECT g.u AS {user_col}, g.day,
       last_value(d.v IGNORE NULLS) OVER (
         PARTITION BY g.u ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       d.v IS NULL AS filled
FROM grid g LEFT JOIN daily d ON g.u = d.u AND g.day = d.day
ORDER BY {user_col}, g.day
"""


def asof_join_tolerance_sql(
    table: str,
    left_type: str = "error",
    right_type: str = "click",
    tolerance_sec: int = 3600,
) -> str:
    """DuckDB twin of the tolerance variant: native ASOF LEFT JOIN,
    then matches staler than the tolerance null out (exact integer
    microseconds, same test as the Spark side)."""
    tol_us = int(tolerance_sec) * 1_000_000
    return f"""
WITH l AS (SELECT * FROM {table} WHERE event_type = '{left_type}'),
r AS (SELECT * FROM {table} WHERE event_type = '{right_type}'),
j AS (
  SELECT l.event_id AS l_id, l.user_id AS key, l.ts AS l_ts,
         r.event_id AS rid, r.ts AS rts, r.value AS rvalue,
         epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
  FROM l ASOF LEFT JOIN r
    ON l.user_id = r.user_id AND l.ts >= r.ts
)
SELECT l_id, key, l_ts,
       CASE WHEN lag_us <= {tol_us} THEN rid END AS r_id,
       CASE WHEN lag_us <= {tol_us} THEN rts END AS r_ts,
       CASE WHEN lag_us <= {tol_us}
            THEN ROUND(lag_us / 1000000.0, 6) END AS lag_sec,
       CASE WHEN lag_us <= {tol_us} THEN rvalue END AS r_value
FROM j ORDER BY l_id
"""


def ohlc_bars(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    unit: str = "week",
) -> DataFrame:
    """OHLC bar aggregation — the classic time-series rollup: per
    (time bucket, key) the Opening value (earliest row), High, Low,
    and Closing value (latest row) plus the row count.

    Scale shape: ONE map-side-combined groupBy on (bucket, key) —
    open/close ride min/max over a (ts, value) struct (earliest /
    latest row, ties broken by value for a deterministic total
    order), so there is NO per-group window sort and partial
    aggregation keeps the shuffle bounded by groups, not rows.
    """
    b = F.date_trunc(unit, F.col(ts_col))
    first = F.min(F.struct(F.col(ts_col), F.col(value_col)))
    last = F.max(F.struct(F.col(ts_col), F.col(value_col)))
    return (
        df.groupBy(
            b.alias("bucket"), F.col(key_col)
        )
        .agg(
            first.alias("_o"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            last.alias("_c"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "bucket", key_col,
            F.col(f"_o.{value_col}").alias("open"),
            "high", "low",
            F.col(f"_c.{value_col}").alias("close"),
            "n_events",
        )
        .orderBy("bucket", key_col)
    )


def ohlc_bars_events_sql(table: str, unit: str = "week") -> str:
    """DuckDB twin of :func:`ohlc_bars` over the events table: the
    same (ts, value) total order expressed as ROW_NUMBER windows."""
    return (
        f"WITH b AS (SELECT CAST(date_trunc('{unit}', ts) AS TIMESTAMP) AS bucket, "
        f"event_type, ts, value FROM {table}), "
        "r AS (SELECT *, "
        "ROW_NUMBER() OVER (PARTITION BY bucket, event_type "
        "ORDER BY ts, value) AS rn_a, "
        "ROW_NUMBER() OVER (PARTITION BY bucket, event_type "
        "ORDER BY ts DESC, value DESC) AS rn_d FROM b), "
        "agg AS (SELECT bucket, event_type, MAX(value) AS high, "
        "MIN(value) AS low, COUNT(*) AS n_events FROM b GROUP BY 1, 2) "
        "SELECT agg.bucket, agg.event_type, o.value AS open, "
        "agg.high, agg.low, c.value AS close, agg.n_events "
        "FROM agg "
        "JOIN r o ON o.bucket = agg.bucket "
        "AND o.event_type = agg.event_type AND o.rn_a = 1 "
        "JOIN r c ON c.bucket = agg.bucket "
        "AND c.event_type = agg.event_type AND c.rn_d = 1 "
        "ORDER BY agg.bucket, agg.event_type"
    )


def rolling_stats(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    days: int = 7,
) -> DataFrame:
    """Trailing time-window aggregates per row — for every event, the
    COUNT and SUM of the same key's events in the preceding ``days``
    (inclusive of the current row): the feature-engineering shape
    behind burst detection and rate features.

    Scale shape: ONE shuffle keyed by ``key_col``; the RANGE frame is
    evaluated over integer microseconds (tz-independent, exact), and
    Spark's incremental window evaluation keeps it O(rows) per key —
    no self-join, no explode. Count is exact; the double SUM is
    order-defined within the frame.
    """
    us = _micros(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(us)
        .rangeBetween(-days * 86_400_000_000, 0)
    )
    return df.select(
        F.col(id_col),
        F.col(key_col),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.round(F.sum(value_col).over(w), 6).alias("sum_trailing"),
    )


def rolling_stats_events_sql(table: str, days: int = 7) -> str:
    """DuckDB twin of :func:`rolling_stats` — the identical integer-
    microsecond RANGE frame."""
    us = days * 86_400_000_000
    return (
        f"SELECT event_id, user_id, "
        "COUNT(*) OVER w AS n_trailing, "
        "ROUND(SUM(value) OVER w, 6) AS sum_trailing "
        f"FROM {table} "
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) "
        f"RANGE BETWEEN {us} PRECEDING AND CURRENT ROW) "
        "ORDER BY event_id"
    )
