"""Skew handling: host extraction, skew report, salted repartition.

Common-Crawl-style inputs arrive clustered by host (crawlers fetch a
domain at a time); a handful of giant hosts would otherwise pin a few
partitions while the rest idle. ``salted_repartition`` shuffles on
``xxhash64(key, salt)`` so heavy domains spread uniformly — the one
explicit shuffle in the encode pipeline (SURVEY.md §4).

Partition identity for checkpoint/resume is the *physical* partition
id, which for ``repartition(n, expr)`` Spark computes as
``pmod(murmur3(expr), n)`` — exactly ``F.pmod(F.hash(expr), n)``, a
pure function of the row key. :func:`partition_id_expr` recomputes it
as a column; tests assert it equals ``spark_partition_id()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def host_of(url_col):
    """Host component of a URL column (JVM-side regex, no UDF)."""
    return F.regexp_extract(url_col, r"^[a-z]+://([^/]+)", 1)


def skew_report(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Rows per host with share-of-total — the skew detector."""
    by_host = df.groupBy(host_of(F.col(url_col)).alias("host")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = F.sum("n_rows").over(Window.partitionBy())
    return by_host.withColumn("share", F.col("n_rows") / total).orderBy(
        F.desc("n_rows"), "host"
    )


def partition_skew(df: DataFrame) -> DataFrame:
    """Rows per physical partition — max/median proves the salt works."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("partition_id")
    )


def salt_expr(key: str = "url", salt: int = 42):
    return F.xxhash64(F.col(key), F.lit(salt))


def portable_bucket_expr(key: str, n_buckets: int, salt: int | None = 42):
    """Salted bucket id from the top-32 bits of md5 — engine-portable:
    the identical value is computable in ANSI-ish SQL (DuckDB:
    ('0x' || substr(md5(k || ':' || salt), 1, 8))::BIGINT % n), which
    makes bucket-balance reports oracle-checkable. The production
    repartition path stays on xxhash64 (one JVM hash, no hex round
    trip); this expression exists for verifiable skew REPORTING."""
    s = F.col(key).cast("string")
    if salt is not None:
        s = F.concat_ws(":", s, F.lit(str(salt)))
    h = F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def portable_bucket_sql(key: str, n_buckets: int, salt: int | None = 42) -> str:
    """DuckDB twin of :func:`portable_bucket_expr`."""
    s = f"CAST({key} AS VARCHAR)"
    if salt is not None:
        s = f"({s} || ':{salt}')"
    return f"(('0x' || substr(md5({s}), 1, 8))::BIGINT % {n_buckets})"


def bucket_balance_report(
    df: DataFrame, key: str, n_buckets: int, salt: int | None = 42, strategy: str = "salted_hash"
) -> DataFrame:
    """One summary row: per-bucket row-count spread under the given
    bucketing — max/min/avg prove (or disprove) balance. Computed with
    the portable hash so a SQL oracle can recompute it exactly."""
    per = df.groupBy(
        portable_bucket_expr(key, n_buckets, salt).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    return per.agg(
        F.lit(strategy).alias("strategy"),
        F.lit(n_buckets).cast("int").alias("n_buckets"),
        F.count(F.lit(1)).alias("buckets_hit"),
        F.max("n").alias("max_rows"),
        F.min("n").alias("min_rows"),
        F.sum("n").alias("total_rows"),
    )


def partition_id_expr(n_partitions: int, key: str = "url", salt: int = 42):
    """pmod(murmur3(xxhash64(key, salt)), n) — the physical partition id
    a row lands in under :func:`salted_repartition`, recomputable from
    data alone (resume anti-joins on this)."""
    return F.pmod(F.hash(salt_expr(key, salt)), F.lit(n_partitions)).cast("int")


def salted_repartition(
    df: DataFrame, n_partitions: int, key: str = "url", salt: int = 42
) -> DataFrame:
    """Repartition on xxhash64(key, salt) — breaks host clustering."""
    return df.repartition(n_partitions, salt_expr(key, salt))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_on=None,
) -> DataFrame:
    """Skew-defused equi-join — the manual salting technique for when
    a handful of hot keys would pin single tasks (AQE's skew-join
    split handles post-shuffle partitions; salting also spreads ONE
    key's rows across ``n_salts`` tasks, which AQE cannot).

    The BIG (skewed) left side gets a deterministic salt
    ``pmod(xxhash64(salt_on or monotonically-unique cols), n)`` — we
    use md5 of the row's key+shuffle-grain column so reruns are
    stable; the SMALL right side explodes each row into all
    ``n_salts`` replicas; the join key becomes (key, salt). Result is
    EXACTLY the plain join (every left row meets every right match in
    precisely one salt bucket).

    Cost model at 100 TB: right side inflates n_salts×, which is the
    price of spreading the hot key — keep the replicated side the
    small one. Semantics: inner or left ('right'/'full' would need
    anti-salt bookkeeping; refused loudly).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join supports inner/left — replicate the other "
            "side for right-joins"
        )
    grain = salt_on if salt_on is not None else F.monotonically_increasing_id()
    # monotonically_increasing_id is NOT rerun-stable; default to it
    # only for ephemeral plans and document salt_on for determinism
    salt = F.pmod(F.xxhash64(grain), F.lit(n_salts)).cast("int")
    l_s = left.withColumn("_salt", salt)
    r_s = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = l_s.join(r_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")
