"""Host-graph analytics over the crawl link graph.

PageRank here is the fixed-iteration power method over the weighted
host graph that :func:`orc_spark.textops.extraction.link_graph`
produces — the spam/authority signal a Common-Crawl curation pipeline
derives once per crawl and joins back onto documents as a quality
feature.

Scale notes: each iteration is one join (edges × ranks on src_host)
plus one aggregation (sum of contributions by dst_host) — the same
two shuffles any distributed PageRank pays. The rank table is tiny
relative to edges (one row per host), so AQE will broadcast it into
the join at real scale; iterations are a fixed small count (a crawl
signal, not a convergence study), keeping the lineage short enough
that no checkpointing is needed. Dangling mass is NOT redistributed
(the "no-sink-redistribution" variant) — documented so the DuckDB
twin is exactly expressible; the variant only rescales ranks, it does
not reorder them for graphs whose dangling set is rank-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_hosts(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank over ``edges`` (src_host, dst_host, n_links).

    r_0 = 1/N for every host; each step
    ``r' = (1-d)/N + d * sum_in(r_src * w_edge / w_out(src))``.
    Returns (host, rank) ordered by host — a string total order, so
    row order never depends on float comparison.
    """
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    n_nodes = nodes.count()  # driver scalar: one row per HOST, tiny
    outw = edges.groupBy("src_host").agg(F.sum("n_links").alias("w_out"))
    w_edges = edges.join(outw, "src_host").select(
        "src_host", "dst_host", (F.col("n_links") / F.col("w_out")).alias("w")
    )
    ranks = nodes.select("host", F.lit(1.0 / n_nodes).alias("rank"))
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contrib = (
            w_edges.join(ranks, w_edges.src_host == ranks.host)
            .select(
                F.col("dst_host").alias("host"),
                (F.col("rank") * F.col("w")).alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "host", "left")
            .select(
                "host",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.orderBy("host")


def pagerank_hosts_sql(
    edges_cte: str,
    iterations: int = 3,
    damping: float = 0.85,
) -> str:
    """DuckDB twin of :func:`pagerank_hosts`: the same fixed number of
    power-method steps unrolled as chained CTEs over ``edges_cte`` (a
    SQL query producing (src_host, dst_host, n_links)). Float parity:
    both engines sum the same per-edge doubles; the driver's 9
    significant-digit canonicalization absorbs accumulation-order ulp.
    """
    d = repr(float(damping))
    parts = [
        f"WITH edges AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT host FROM (SELECT src_host AS host"
        " FROM edges UNION ALL SELECT dst_host FROM edges))",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "outw AS (SELECT src_host, sum(n_links) AS w_out FROM edges"
        " GROUP BY src_host)",
        "we AS (SELECT e.src_host, e.dst_host,"
        " e.n_links * 1.0 / o.w_out AS w"
        " FROM edges e JOIN outw o USING (src_host))",
        "r0 AS (SELECT host, 1.0 / nn.n AS rank FROM nodes, nn)",
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"c{i} AS (SELECT we.dst_host AS host,"
            f" sum({prev}.rank * we.w) AS inflow"
            f" FROM we JOIN {prev} ON we.src_host = {prev}.host"
            f" GROUP BY we.dst_host)"
        )
        parts.append(
            f"r{i} AS (SELECT nodes.host,"
            f" (1.0 - {d}) / nn.n + {d} * coalesce(c{i}.inflow, 0.0) AS rank"
            f" FROM nodes LEFT JOIN c{i} USING (host), nn)"
        )
        prev = f"r{i}"
    return (
        ",\n".join(parts)
        + f"\nSELECT host, rank FROM {prev} ORDER BY host"
    )
