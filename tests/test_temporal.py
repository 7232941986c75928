"""Unit semantics for the temporal operators (sessionize, asof_join)
and the packing/mixing ops — hand-built micro-frames with known
answers, complementing the DuckDB parity gate in test_oracle_parity.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from orc_spark.textops import analysis, temporal


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 12, minute, second, micro)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double"
    )


class TestSessionize:
    def test_gap_boundary_splits_sessions(self, spark):
        # user 1: events at 12:00, 12:10, then 12:50 (40-min gap) — two
        # sessions; user 2: single event — one session.
        df = _events(spark, [
            (1, _ts(0), 1, "view", 1.0),
            (2, _ts(10), 1, "view", 2.0),
            (3, _ts(50), 1, "view", 4.0),
            (4, _ts(5), 2, "click", 8.0),
        ])
        out = temporal.sessionize(df, gap_minutes=30).collect()
        got = {(r.user_id, r.session_id): r for r in out}
        assert set(got) == {(1, 0), (1, 1), (2, 0)}
        assert got[(1, 0)].n_events == 2
        assert got[(1, 0)].total_value_r == 3.0
        assert got[(1, 0)].duration_sec == 600.0
        assert got[(1, 1)].n_events == 1
        assert got[(1, 1)].duration_sec == 0.0
        assert got[(2, 0)].n_events == 1

    def test_gap_is_strict(self, spark):
        # exactly 30:00.000000 apart: NOT a new session (> gap, not >=)
        df = _events(spark, [
            (1, _ts(0), 1, "view", 1.0),
            (2, _ts(30), 1, "view", 1.0),
            (3, _ts(30, 0, 1), 2, "view", 1.0),  # other user
            (4, _ts(0), 2, "view", 1.0),
        ])
        out = temporal.sessionize(df, gap_minutes=30).collect()
        by_user = {}
        for r in out:
            by_user.setdefault(r.user_id, []).append(r)
        assert len(by_user[1]) == 1  # exactly-at-gap stays one session
        assert len(by_user[2]) == 2  # one microsecond past gap splits

    def test_one_shuffle_plan(self, spark):
        # the session window and the per-session groupBy share the
        # user_id hash partitioning — exactly ONE Exchange in the plan
        df = _events(spark, [(1, _ts(0), 1, "view", 1.0)])
        plan = temporal.sessionize(df)._jdf.queryExecution().executedPlan().toString()
        # final orderBy adds a range Exchange; ignore it (presentation
        # only, dropped in production use) and count hash exchanges
        n_hash = plan.count("Exchange hashpartitioning")
        assert n_hash == 1, plan


class TestAsofJoin:
    def test_matches_latest_prior_and_null_when_none(self, spark):
        left = _events(spark, [
            (10, _ts(5), 1, "error", 0.0),   # after clicks 1,2 -> id 2
            (11, _ts(1), 1, "error", 0.0),   # after click 1 only
            (12, _ts(0, 30), 2, "error", 0.0),  # user 2 has no clicks
        ])
        right = _events(spark, [
            (1, _ts(0), 1, "click", 5.0),
            (2, _ts(3), 1, "click", 7.0),
            (3, _ts(9), 1, "click", 9.0),  # later than every error
        ])
        out = {r.l_id: r for r in temporal.asof_join(left, right).collect()}
        assert out[10].r_id == 2 and out[10].r_value == 7.0
        assert out[10].lag_sec == 120.0
        assert out[11].r_id == 1 and out[11].r_value == 5.0
        assert out[12].r_id is None and out[12].r_ts is None
        assert out[12].lag_sec is None

    def test_simultaneous_right_matches(self, spark):
        # <= semantics: a right row at the exact left timestamp matches
        left = _events(spark, [(10, _ts(5), 1, "error", 0.0)])
        right = _events(spark, [(1, _ts(5), 1, "click", 5.0)])
        (row,) = temporal.asof_join(left, right).collect()
        assert row.r_id == 1 and row.lag_sec == 0.0


class TestSequencePack:
    def test_slot_arithmetic(self, spark):
        # one shard (shards=1) so the cumsum order is doc-id order
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "d e"), (3, "f g h i")],
            "doc_id long, text string",
        )
        out = {r.id: r for r in
               analysis.sequence_pack(df, budget=4, shards=1).collect()}
        assert (out[1].seq_id, out[1].seq_off, out[1].tokens) == (0, 0, 3)
        # doc 2 starts at token 3, spans the seq 0/1 boundary
        assert (out[2].seq_id, out[2].seq_off) == (0, 3)
        # doc 3 starts at cumsum 5 -> seq 1 offset 1
        assert (out[3].seq_id, out[3].seq_off) == (1, 1)

    def test_shard_assignment_stable(self, spark):
        df = spark.createDataFrame(
            [(i, "w " * (i % 7 + 1)) for i in range(100)],
            "doc_id long, text string",
        )
        a = {r.id: (r.shard, r.seq_id, r.seq_off)
             for r in analysis.sequence_pack(df).collect()}
        b = {r.id: (r.shard, r.seq_id, r.seq_off)
             for r in analysis.sequence_pack(df).collect()}
        assert a == b
        assert len({v[0] for v in a.values()}) > 1  # actually sharded


class TestDomainMix:
    def test_uniform_weight_identity(self, spark):
        df = spark.createDataFrame(
            [(1, "a b", "s1"), (2, "c d", "s2"), (3, "e f", "s2"),
             (4, "g h", "s1")],
            "doc_id long, text string, source string",
        )
        out = {r.source: r for r in analysis.domain_mix(df).collect()}
        # equal token mass -> both shares 0.5, both weights 1.0
        assert out["s1"].share_r == 0.5 and out["s2"].share_r == 0.5
        assert out["s1"].weight_r == 1.0 and out["s2"].weight_r == 1.0
        assert out["s1"].n_docs == 2 and out["s1"].tokens == 4

    def test_upsample_downsample_direction(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e f", "big"), (2, "x y", "small")],
            "doc_id long, text string, source string",
        )
        out = {r.source: r for r in analysis.domain_mix(df).collect()}
        assert out["big"].weight_r < 1.0 < out["small"].weight_r
        assert abs(out["big"].share_r + out["small"].share_r - 1.0) < 1e-9


class TestLatestSnapshot:
    def test_keeps_newest_per_key(self, spark):
        import datetime as dt

        from orc_spark.textops import temporal

        rows = [
            (1, dt.datetime(2024, 1, 1), 1, "view", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 3), 1, "view", 2.0, "{}"),
            (3, dt.datetime(2024, 1, 2), 1, "view", 3.0, "{}"),
            (4, dt.datetime(2024, 1, 1), 2, "view", 4.0, "{}"),
            # tie on ts: higher event_id wins
            (5, dt.datetime(2024, 1, 5), 2, "click", 5.0, "{}"),
            (6, dt.datetime(2024, 1, 5), 2, "click", 6.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        got = {r.event_id for r in temporal.latest_snapshot(df).collect()}
        assert got == {2, 4, 6}

    def test_window_group_limit_in_plan(self, spark):
        from orc_spark.textops import temporal
        from tests.conftest import SF_DIR

        events = spark.read.parquet(f"{SF_DIR}/events.parquet")
        plan = temporal.latest_snapshot(events)._jdf.queryExecution() \
            .executedPlan().toString()
        # rank<=1 must pre-filter below the exchange at scale
        assert "WindowGroupLimit" in plan


def test_funnel_strict_order_and_earliest_continuation(spark):
    import datetime

    from orc_spark.textops import temporal

    def t(m):
        return datetime.datetime(2024, 1, 1, 0, m)

    rows = [
        # u1 completes a->b->c in order
        (1, t(0), "a"), (1, t(5), "b"), (1, t(9), "c"),
        # u2 has b BEFORE a, then no b after -> stops at a
        (2, t(0), "b"), (2, t(3), "a"),
        # u3: a, then c before b -> c must NOT count; later c does
        (3, t(0), "a"), (3, t(1), "c"), (3, t(2), "b"), (3, t(4), "c"),
        # u4: only b -> contributes nothing (never did a)
        (4, t(0), "b"),
        # u5: two a's; earliest anchors; b between them still counts
        (5, t(0), "a"), (5, t(1), "b"), (5, t(2), "a"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.step: r.n_users
        for r in temporal.funnel(df, ["a", "b", "c"]).collect()
    }
    # a: u1,u2,u3,u5; b-after-a: u1,u3,u5; c-after-b: u1,u3
    assert got == {"a": 4, "b": 3, "c": 2}, got


def test_cohort_retention_triangle(spark):
    import datetime

    from orc_spark.textops import temporal

    def d(day, h=12):
        return datetime.datetime(2024, 1, day, h)

    rows = [
        (1, d(1)), (1, d(8)), (1, d(16)),   # w0 cohort, active w0,1,2
        (2, d(2)), (2, d(9)),               # w0 cohort, active w0,1
        (3, d(8)),                          # w1 cohort, active w0 only
        (1, d(3)),                          # extra same-week event: no dup
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_week.isoformat(), r.week_offset): r.n_users
        for r in temporal.cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }, got


def test_gap_fill_daily_semantics(spark):
    import datetime

    from orc_spark.textops import temporal

    def t(day, h):
        return datetime.datetime(2024, 1, day, h)

    rows = [
        # u1: two events day1 (latest wins), none day2, one day3
        (1, t(1, 9), 1, 10.0), (2, t(1, 18), 1, 20.0), (3, t(3, 1), 1, 30.0),
        # u2: first event day2 -> day1 is null (nothing to carry)
        (4, t(2, 5), 2, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {
        (r.user_id, r.day.isoformat()): (r.value, r.filled)
        for r in temporal.gap_fill_daily(df).collect()
    }
    assert got == {
        (1, "2024-01-01"): (20.0, False),   # latest same-day event
        (1, "2024-01-02"): (20.0, True),    # carried forward
        (1, "2024-01-03"): (30.0, False),
        (2, "2024-01-01"): (None, True),    # before first event
        (2, "2024-01-02"): (5.0, False),
        (2, "2024-01-03"): (5.0, True),
    }, got


def test_asof_tolerance_discards_stale_matches(spark):
    import datetime

    from orc_spark.textops import temporal

    def t(h, m=0):
        return datetime.datetime(2024, 1, 1, h, m)

    left = spark.createDataFrame(
        [(10, t(5), 1), (11, t(12), 1)],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [(20, t(4, 30), 1, 7.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    # without tolerance both lefts match the 04:30 click
    base = {r.l_id: r.r_id for r in temporal.asof_join(left, right).collect()}
    assert base == {10: 20, 11: 20}
    # 1h tolerance: the 12:00 error's match (7.5h stale) is discarded
    tol = {
        r.l_id: (r.r_id, r.lag_sec, r.r_value)
        for r in temporal.asof_join(
            left, right, tolerance_sec=3600
        ).collect()
    }
    assert tol[10] == (20, 1800.0, 7.0)
    assert tol[11] == (None, None, None)


def test_ohlc_bars_open_close_ordering(spark):
    """Open = earliest (ts, value), close = latest, ties broken by
    value; high/low independent of order."""
    from orc_spark.textops import temporal

    df = spark.createDataFrame(
        [
            # one bucket (same week), one key
            ("2024-01-02 10:00:00", "k", 5.0),
            ("2024-01-02 10:00:00", "k", 3.0),   # tie on ts: open=3.0
            ("2024-01-03 09:00:00", "k", 99.0),  # high
            ("2024-01-04 12:00:00", "k", 1.0),   # low
            ("2024-01-05 23:00:00", "k", 7.0),
            ("2024-01-05 23:00:00", "k", 8.0),   # tie on ts: close=8.0
            # second week
            ("2024-01-09 00:00:00", "k", 42.0),
        ],
        "ts string, event_type string, value double",
    ).selectExpr(
        "CAST(ts AS TIMESTAMP_NTZ) AS ts", "event_type", "value"
    )
    rows = temporal.ohlc_bars(df).collect()
    assert len(rows) == 2
    w1, w2 = rows
    assert (w1.open, w1.high, w1.low, w1.close, w1.n_events) == (
        3.0, 99.0, 1.0, 8.0, 6
    )
    assert (w2.open, w2.close, w2.n_events) == (42.0, 42.0, 1)
