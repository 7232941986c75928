"""metadata_stddev: exact VAR/STDDEV from per-stripe central moments
(zonemap._stripe_m2 + Chan's parallel-variance merge)."""

from __future__ import annotations

import math
import tempfile
import uuid

import pyarrow as pa
import pytest

from orc_spark.engine import pipeline, zonemap


def _cfg(prefix, **kw):
    out = tempfile.mkdtemp(prefix=prefix)
    base = dict(
        out_dir=out,
        run_id=f"{prefix}{uuid.uuid4().hex[:8]}",
        n_partitions=2,
        stripe_rows=64,
    )
    base.update(kw)
    return pipeline.EncodeJobConfig(**base)


# ------------------------------------------------- stripe-level moment


def test_stripe_m2_ints_and_floats():
    s = zonemap.stripe_zone_stats(pa.array([1, 2, 3, 4, None]))
    # mean 2.5, m2 = 2.25+0.25+0.25+2.25 = 5.0
    assert s["m2"] == pytest.approx(5.0)
    f = zonemap.stripe_zone_stats(pa.array([1.0, 3.0]))
    assert f["m2"] == pytest.approx(2.0)
    single = zonemap.stripe_zone_stats(pa.array([7.5]))
    assert single["m2"] == pytest.approx(0.0)


def test_stripe_m2_declines():
    # NaN-poisoned floats record no moments
    nan = zonemap.stripe_zone_stats(pa.array([1.0, float("nan")]))
    assert nan["m2"] is None
    # inf makes the moment non-finite
    inf = zonemap.stripe_zone_stats(pa.array([1.0, float("inf")]))
    assert inf["m2"] is None
    # all-null records nothing
    an = zonemap.stripe_zone_stats(pa.array([None, None], type=pa.int64()))
    assert an["m2"] is None
    # temporal/bool int-family columns carry no variance stat
    import datetime

    ts = zonemap.stripe_zone_stats(
        pa.array([datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 2)])
    )
    assert ts["m2"] is None
    b = zonemap.stripe_zone_stats(pa.array([True, False]))
    assert b["m2"] is None
    # strings never
    st = zonemap.stripe_zone_stats(pa.array(["a", "b"]))
    assert st["m2"] is None


# ------------------------------------------------------- end-to-end


def _truth(df, col, pred=None):
    from pyspark.sql import functions as F

    q = df
    if pred:
        q = q.filter(zonemap.predicate_expr(pred))
    r = q.agg(
        F.count(col).alias("c"),
        F.avg(col).alias("a"),
        F.var_pop(col).alias("vp"),
        F.var_samp(col).alias("vs"),
    ).first()
    return r


def _close(a, b, tol=1e-9):
    if a is None or b is None:
        return a is None and b is None
    return abs(a - float(b)) <= tol * max(1.0, abs(float(b)))


@pytest.fixture(scope="module")
def encoded(spark):
    import random

    rnd = random.Random(7)
    rows = [
        (
            i,
            rnd.uniform(-50.0, 150.0) if i % 11 else None,  # nulls
            rnd.randrange(0, 1_000_000),
            ["click", "view", "buy"][i % 3],
        )
        for i in range(1500)
    ]
    df = spark.createDataFrame(
        rows, "id bigint, value double, amount bigint, kind string"
    )
    cfg = _cfg(
        "orcspark_sd_",
        key="id",
        columns=["id", "value", "amount", "kind"],
        cluster_by="id",
    )
    pipeline.run_encode_job(spark, df, cfg)
    return df, cfg


@pytest.mark.parametrize(
    "pred",
    [
        None,
        [("id", ">=", 300), ("id", "<", 1200)],
        [("kind", "==", "click")],
        [("id", ">=", 99999)],  # empty
    ],
    ids=["all", "range", "uneq", "empty"],
)
@pytest.mark.parametrize("col", ["value", "amount"])
def test_metadata_stddev_matches_rowlevel(spark, encoded, col, pred):
    df, cfg = encoded
    md = pipeline.metadata_stddev(
        spark, cfg.out_dir, cfg.run_id, df.schema, col, pred
    )
    t = _truth(df, col, pred)
    assert md["count"] == int(t.c)
    assert _close(md["avg"], t.a)
    assert _close(md["var_pop"], t.vp)
    assert _close(md["var_samp"], t.vs)
    if md["var_pop"] is not None:
        assert md["stddev_pop"] == pytest.approx(math.sqrt(md["var_pop"]))


def test_metadata_path_engages_on_clustered_range(spark, encoded):
    df, cfg = encoded
    md = pipeline.metadata_stddev(
        spark, cfg.out_dir, cfg.run_id, df.schema, "value",
        [("id", ">=", 300), ("id", "<", 1200)],
    )
    # interior stripes must be PROVEN from footers, not decoded
    assert md["detail"]["n_all"] > 0
    assert md["detail"]["n_mixed"] <= md["detail"]["n_all"]


def test_declined_moments_route_to_decode(spark):
    # values near 2^61 bust the int64 sum guard -> stripes decline the
    # sum, so every stripe decodes; result must still be exact-ish
    base = 1 << 61
    rows = [(i, base + (i % 5)) for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, big bigint")
    cfg = _cfg("orcspark_sdbig_", key="id", columns=["id", "big"])
    pipeline.run_encode_job(spark, df, cfg)
    md = pipeline.metadata_stddev(
        spark, cfg.out_dir, cfg.run_id, df.schema, "big", None
    )
    t = _truth(df, "big")
    assert md["count"] == int(t.c)
    # huge offset: variance is tiny vs mean² — allow double noise
    assert md["var_pop"] == pytest.approx(float(t.vp), rel=1e-6, abs=1e-3)
    assert md["detail"]["n_mixed"] > 0  # the decode path actually ran


def test_nan_poisoned_stripes_decline_and_decode(spark):
    rows = [(i, float("nan") if i == 37 else float(i % 13)) for i in range(256)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    cfg = _cfg("orcspark_sdnan_", key="id", columns=["id", "v"])
    pipeline.run_encode_job(spark, df, cfg)
    md = pipeline.metadata_stddev(
        spark, cfg.out_dir, cfg.run_id, df.schema, "v", None
    )
    # SQL: any NaN in the aggregated set makes the result NaN — both
    # halves must agree the answer comes from the decode path
    assert md["count"] == 256
    assert math.isnan(md["var_pop"])


def test_non_numeric_column_raises(spark, encoded):
    df, cfg = encoded
    with pytest.raises(ValueError, match="numeric"):
        pipeline.metadata_stddev(
            spark, cfg.out_dir, cfg.run_id, df.schema, "kind", None
        )


def test_missing_predicate_column_raises(spark, encoded):
    df, cfg = encoded
    with pytest.raises(ValueError, match="no stats rows"):
        pipeline.metadata_stddev(
            spark, cfg.out_dir, cfg.run_id, df.schema, "value",
            [("nope_col", ">=", 1)],
        )


class TestGroupStddev:
    def _mk(self, spark, tmp_path, cluster, rows=None, name="g1"):
        from pyspark.sql import functions as F  # noqa: F401

        if rows is None:
            rows = [
                (i, ["a", "b", "c"][i % 3 if i < 900 else 0],
                 float((i * 37) % 101)) for i in range(1200)
            ]
        df = spark.createDataFrame(
            rows, "event_id long, kind string, value double"
        )
        cfg = pipeline.EncodeJobConfig(
            out_dir=str(tmp_path / name), run_id=name, key="event_id",
            n_partitions=2, stripe_rows=128,
            cluster_by="kind" if cluster else None,
        )
        pipeline.run_encode_job(spark, df, cfg)
        return df, cfg

    def _want(self, df, pred=None):
        from pyspark.sql import functions as F

        d = df
        if pred is not None:
            d = d.filter(pred)
        rows = (
            d.groupBy("kind")
            .agg(
                F.count("value").alias("n"),
                F.avg("value").alias("avg"),
                F.var_pop("value").alias("vp"),
                F.var_samp("value").alias("vs"),
            )
            .filter(F.col("n") > 0)
            .collect()
        )
        return {
            r.kind: (r.n, round(r.avg, 9), round(r.vp, 6),
                     None if r.vs is None else round(r.vs, 6))
            for r in rows
        }

    def _got(self, spark, df, cfg, pred=None):
        out = pipeline.metadata_group_stddev(
            spark, cfg.out_dir, cfg.run_id, df.schema, "kind", "value",
            pred,
        )
        return {
            r.kind: (r.n_vals, round(r.avg, 9), round(r.var_pop, 6),
                     None if r.var_samp is None else round(r.var_samp, 6))
            for r in out.collect()
        }

    def test_clustered_matches_and_pushes_down(
        self, spark, tmp_path, monkeypatch
    ):
        df, cfg = self._mk(spark, tmp_path, cluster=True)
        decoded: list = []
        orig = pipeline._restricted_decode

        def spy(spark_, out_dir, run_id, schema, cols, pred, only):
            decoded.append(
                only if isinstance(only, list) else "df"
            )
            return orig(spark_, out_dir, run_id, schema, cols, pred, only)

        monkeypatch.setattr(pipeline, "_restricted_decode", spy)
        assert self._got(spark, df, cfg) == self._want(df)
        total = pipeline.read_stripes(
            spark, cfg.out_dir, cfg.run_id
        ).select("partition_id", "stripe_idx").distinct().count()
        # boundary stripes only: far fewer decodes than stripes exist
        n_dec = sum(len(x) for x in decoded if isinstance(x, list))
        assert decoded == [] or n_dec < total / 2, (n_dec, total)

    def test_unclustered_still_exact(self, spark, tmp_path):
        df, cfg = self._mk(spark, tmp_path, cluster=False, name="g2")
        assert self._got(spark, df, cfg) == self._want(df)

    def test_predicate_and_null_groups(self, spark, tmp_path):
        from pyspark.sql import functions as F

        rows = [
            (i, None if i % 5 == 0 else ["x", "y"][i % 2],
             None if i % 7 == 0 else float(i % 50))
            for i in range(600)
        ]
        df, cfg = self._mk(
            spark, tmp_path, cluster=True, rows=rows, name="g3"
        )
        pred = [("event_id", ">=", 150)]
        got = self._got(spark, df, cfg, pred)
        want = self._want(df, F.col("event_id") >= 150)
        assert got == want
        assert None in got  # SQL NULL group present

    def test_all_null_group_omitted(self, spark, tmp_path):
        rows = [(i, "dead", None) for i in range(200)] + [
            (1000 + i, "live", float(i)) for i in range(200)
        ]
        df, cfg = self._mk(
            spark, tmp_path, cluster=True, rows=rows, name="g4"
        )
        got = self._got(spark, df, cfg)
        assert set(got) == {"live"}
