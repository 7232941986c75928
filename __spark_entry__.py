"""Driver contract for the spark-graft builder (PySpark target).

Queries map SURVEY.md §2.2's operator inventory to verifiable results:

- ``roundtrip_*`` run the full engine (salted repartition -> codec
  auto-select -> mapInArrow encode -> stripes -> mapInArrow decode)
  and return the decoded columns; since decode must be bit-identical,
  the DuckDB oracle is simply ``SELECT <cols> FROM <table>`` — the
  strongest possible correctness gate for each codec.
- analytics queries (stats_sample, skew report, weekly windows,
  percentiles) have literal SQL twins.
- engine-internal reports (codec selection, compression metrics,
  partition skew) are rows-only checks (non-SQL-expressible: they
  depend on codec internals / hash partitioning).
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Callable

# Allocator tunables against slow first-touch page faults on this host
# (no-ops if the session JVM already started; see bench.py for details).
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _roundtrip(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    columns: list[str],
    overrides: dict[str, list[str]] | None = None,
    n_partitions: int = 8,
) -> DataFrame:
    """Encode selected columns through the engine, decode, return."""
    from orc_spark.engine import pipeline

    df = _load(spark, sf_dir, table).select(columns)
    out = tempfile.mkdtemp(prefix="orcspark_entry_")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out,
        run_id=f"entry-{uuid.uuid4().hex[:8]}",
        key=key,
        columns=columns,
        n_partitions=n_partitions,
        overrides=overrides,
    )
    pipeline.run_encode_job(spark, df, cfg)
    return pipeline.decode_job(spark, out, cfg.run_id, df.schema, columns)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full encode of sf0.001 documents -> compression report."""
    from orc_spark.engine import lineage, metrics, pipeline

    sf_dir = "/root/testdata/sf0.001"
    df = _load(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="orcspark_flagship_")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id="flagship", key="doc_id", n_partitions=8
    )
    pipeline.run_encode_job(spark, df, cfg)
    lin = lineage.read_lineage(spark, out)
    return metrics.compression_by_column(lin)


# --------------------------------------------------------------- queries

def _q_roundtrip_fsst_text(spark, sf_dir):
    return _roundtrip(
        spark, sf_dir, "documents", "doc_id", ["doc_id", "text"],
        overrides={"text": ["fsst", "raw"]},
    )


def _q_roundtrip_dict_lang(spark, sf_dir):
    return _roundtrip(
        spark, sf_dir, "documents", "doc_id", ["doc_id", "lang", "source"],
        overrides={"lang": ["dict", "raw"], "source": ["dict", "raw"]},
    )


def _q_roundtrip_rle_ints(spark, sf_dir):
    return _roundtrip(spark, sf_dir, "documents", "doc_id", ["doc_id", "n_chars"])


def _q_roundtrip_for_ts(spark, sf_dir):
    return _roundtrip(
        spark, sf_dir, "events", "event_id", ["event_id", "ts"],
        overrides={"ts": ["for_ts", "raw"]},
    )


def _q_roundtrip_raw_float(spark, sf_dir):
    return _roundtrip(spark, sf_dir, "events", "event_id", ["event_id", "value"])


def _q_roundtrip_documents_auto(spark, sf_dir):
    return _roundtrip(
        spark, sf_dir, "documents", "doc_id",
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


def _q_stats_sample_documents(spark, sf_dir):
    from orc_spark.engine import stats

    return stats.stats_sample(
        _load(spark, sf_dir, "documents"), ["doc_id", "lang", "source", "n_chars"]
    )


def _q_skew_report_documents(spark, sf_dir):
    """Share of rows per source — the host-skew detector shape
    (skew.skew_report with documents.source standing in for host)."""
    df = _load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    by = df.groupBy(F.col("source").alias("host")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = F.sum("n_rows").over(Window.partitionBy())
    return (
        by.withColumn("share", F.col("n_rows") / total)
        .orderBy(F.desc("n_rows"), "host")
    )


def _q_lang_distribution(spark, sf_dir):
    return (
        _load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.avg("n_chars").alias("avg_chars"))
        .orderBy("lang")
    )


def _q_weekly_events(spark, sf_dir):
    """Weekly trend buckets — reference stats.go:439-477 semantics
    (Monday-truncated weeks, last 5 by recency)."""
    df = _load(spark, sf_dir, "events")
    return (
        df.groupBy(F.date_trunc("week", F.col("ts")).alias("week"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .orderBy(F.desc("week"))
        .limit(5)
    )


def _q_event_type_percentiles(spark, sf_dir):
    """Per-group avg + exact P95 — reference stats.go:284-329 semantics."""
    df = _load(spark, sf_dir, "events")
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("avg_value"),
            F.expr("percentile(value, 0.95)").alias("p95_value"),
        )
        .orderBy("event_type")
    )


def _q_metrics_report(spark, sf_dir):
    """Rows-only: compression ratio by column for a live encode run."""
    from orc_spark.engine import lineage, metrics, pipeline

    df = _load(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="orcspark_metrics_")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id="metrics", key="doc_id", n_partitions=8
    )
    pipeline.run_encode_job(spark, df, cfg)
    return metrics.compression_by_column(lineage.read_lineage(spark, out)).select(
        "column", "bytes_in", "bytes_out", "n_rows", "ratio"
    )


def _q_codec_selection(spark, sf_dir):
    """Rows-only: which codec the auto-selector chose per column."""
    from orc_spark.engine import lineage, pipeline

    df = _load(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="orcspark_codecsel_")
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id="sel", key="doc_id", n_partitions=4
    )
    pipeline.run_encode_job(spark, df, cfg)
    return (
        lineage.read_lineage(spark, out)
        .groupBy("column", "codec")
        .agg(F.count(F.lit(1)).alias("n_stripes"))
        .orderBy("column", "codec")
    )


def _q_partition_skew(spark, sf_dir):
    """Rows-only: row balance after salted repartition (max/med < 2)."""
    from orc_spark.engine import skew

    df = _load(spark, sf_dir, "documents")
    rep = skew.salted_repartition(df, 8, "doc_id", 42)
    return skew.partition_skew(rep)


def _q_checkpoint_resume(spark, sf_dir):
    """Rows-only: resume skips completed partitions (F5 semantics).

    Returns one row with the three phase results; correctness asserted
    structurally (encoded+skipped counts)."""
    from orc_spark.engine import pipeline, skew

    df = _load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = tempfile.mkdtemp(prefix="orcspark_resume_")
    n = 8
    pid = skew.partition_id_expr(n, "doc_id", 42)
    cfg = pipeline.EncodeJobConfig(
        out_dir=out, run_id="resume", key="doc_id",
        columns=["doc_id", "lang", "n_chars"], n_partitions=n,
    )
    r1 = pipeline.run_encode_job(spark, df.filter(pid < 4), cfg)
    r2 = pipeline.run_encode_job(spark, df, cfg)
    r3 = pipeline.run_encode_job(spark, df, cfg)
    return spark.createDataFrame(
        [
            (
                int(r1.partitions_encoded),
                int(r2.partitions_skipped),
                int(r2.partitions_encoded),
                int(r3.partitions_encoded),
            )
        ],
        "first_encoded int, resumed_skipped int, resumed_encoded int, idempotent_encoded int",
    )


def _q_media_metadata(spark, sf_dir):
    """Multimodal plumbing over a synthesized binary column (documents
    text bytes standing in for opaque media payloads): typed metadata
    via pure JVM expressions — SQL twin on octet_length/sha256."""
    from orc_spark.textops import multimodal

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return multimodal.media_metadata(docs, "doc_id", "payload", "image").orderBy(
        "media_id"
    )


def _q_extract_text(spark, sf_dir):
    """The input_hint per-row invariant: extract_text(wrap_html(text))
    must reproduce text byte-identically per row — so the DuckDB
    oracle is simply SELECT doc_id, text."""
    from orc_spark.textops import extraction

    docs = _load(spark, sf_dir, "documents")
    wrapped = docs.select(
        "doc_id",
        extraction.wrap_html_expr(
            F.concat(F.lit("doc "), F.col("doc_id").cast("string")),
            F.col("text"),
        ).alias("html"),
    )
    return (
        extraction.extract_text(wrapped)
        .select("doc_id", F.col("extracted").alias("text"))
        .orderBy("doc_id")
    )


def _q_dedup_exact(spark, sf_dir):
    from orc_spark.textops import dedup

    return dedup.exact_dedup(_load(spark, sf_dir, "documents")).select(
        "content_sha", "keeper_id", "n_copies"
    )


def _q_token_stats(spark, sf_dir):
    from orc_spark.textops import analysis

    return analysis.token_stats(_load(spark, sf_dir, "documents"))


def _q_fingerprint(spark, sf_dir):
    from orc_spark.textops import analysis

    return analysis.fingerprint(_load(spark, sf_dir, "documents"))


def _q_quality_score(spark, sf_dir):
    from orc_spark.textops import analysis

    return analysis.quality_score(_load(spark, sf_dir, "documents"))


def _q_language_id(spark, sf_dir):
    from orc_spark.textops import analysis

    return analysis.language_id(_load(spark, sf_dir, "documents"))


def _q_minhash_dedup(spark, sf_dir):
    """Rows-only: near-dup candidate pairs via MinHash-LSH."""
    from orc_spark.textops import dedup

    return dedup.minhash_lsh_pairs(
        _load(spark, sf_dir, "documents"), jaccard_threshold=0.5
    )


def _q_ngram_jaccard_dedup(spark, sf_dir):
    """Exact n-gram Jaccard near-dups via inverted-index candidate join
    (the exact counterpart to minhash; oracle-backed)."""
    from orc_spark.textops import dedup

    return dedup.ngram_jaccard_pairs(
        _load(spark, sf_dir, "documents"), shingle_k=3, threshold=0.5
    )


def _q_near_dup_purge(spark, sf_dir):
    """Training-corpus purge list: lower-quality member of each
    near-dup pair (oracle-backed composition of Jaccard x quality)."""
    from orc_spark.textops import dedup

    return dedup.near_dup_purge(_load(spark, sf_dir, "documents"))


def _q_simhash_dedup(spark, sf_dir):
    """Rows-only: near-pair count per Hamming distance (the pair list
    itself is large on Zipf corpora where common tokens dominate the
    bit votes)."""
    from orc_spark.textops import dedup

    pairs = dedup.simhash_near_pairs(_load(spark, sf_dir, "documents"), max_hamming=3)
    return (
        pairs.groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming")
    )


def _q_ann_brute_force(spark, sf_dir):
    from orc_spark.textops import similarity

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first().embedding
    out = similarity.brute_force_topk(emb, [float(x) for x in q], k=10)
    return out.select("id", F.round("cosine", 6).alias("cosine_r"))


def _q_embedding_near_dup(spark, sf_dir):
    """Exact embedding-cosine near-dup pairs (cross-join verifier).

    Threshold 0.4 fits the synthetic embeddings (random-ish vectors,
    max pair cosine ~0.51); real near-dup corpora use >=0.9."""
    from orc_spark.textops import similarity

    emb = _load(spark, sf_dir, "embeddings")
    out = similarity.embedding_near_dup_pairs(emb, threshold=0.4, method="exact")
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine_r"))


def _q_embedding_near_dup_lsh(spark, sf_dir):
    """Rows-only: LSH-pruned near-dup pairs (approximate by design;
    pytest asserts lsh-pairs ⊆ exact-pairs and recall)."""
    from orc_spark.textops import similarity

    emb = _load(spark, sf_dir, "embeddings")
    out = similarity.embedding_near_dup_pairs(emb, threshold=0.4, method="lsh")
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine_r"))


def _q_ann_ivf(spark, sf_dir):
    """Rows-only: IVF ANN (sample-trained k-means quantizer, nprobe
    partition-pruned probe; approximate by design)."""
    from orc_spark.textops import similarity

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first().embedding
    cent = similarity.kmeans_centroids(emb, n_centroids=8)
    out = similarity.ivf_topk(emb, [float(x) for x in q], cent, k=10, nprobe=3)
    return out.select("id", F.round("cosine", 6).alias("cosine_r"))


def _q_ann_lsh(spark, sf_dir):
    """Rows-only: LSH-bucketed ANN (approximate by design)."""
    from orc_spark.textops import similarity

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first().embedding
    return similarity.lsh_topk(emb, [float(x) for x in q], k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_text": _q_extract_text,
        "media_metadata": _q_media_metadata,
        "dedup_exact": _q_dedup_exact,
        "token_stats": _q_token_stats,
        "fingerprint": _q_fingerprint,
        "quality_score": _q_quality_score,
        "language_id": _q_language_id,
        "minhash_dedup": _q_minhash_dedup,
        "ngram_jaccard_dedup": _q_ngram_jaccard_dedup,
        "near_dup_purge": _q_near_dup_purge,
        "simhash_dedup": _q_simhash_dedup,
        "ann_brute_force": _q_ann_brute_force,
        "ann_lsh": _q_ann_lsh,
        "ann_ivf": _q_ann_ivf,
        "embedding_near_dup": _q_embedding_near_dup,
        "embedding_near_dup_lsh": _q_embedding_near_dup_lsh,
        "roundtrip_fsst_text": _q_roundtrip_fsst_text,
        "roundtrip_dict_lang": _q_roundtrip_dict_lang,
        "roundtrip_rle_ints": _q_roundtrip_rle_ints,
        "roundtrip_for_ts": _q_roundtrip_for_ts,
        "roundtrip_raw_float": _q_roundtrip_raw_float,
        "roundtrip_documents_auto": _q_roundtrip_documents_auto,
        "stats_sample_documents": _q_stats_sample_documents,
        "skew_report_documents": _q_skew_report_documents,
        "lang_distribution": _q_lang_distribution,
        "weekly_events": _q_weekly_events,
        "event_type_percentiles": _q_event_type_percentiles,
        "metrics_report": _q_metrics_report,
        "codec_selection": _q_codec_selection,
        "partition_skew": _q_partition_skew,
        "checkpoint_resume": _q_checkpoint_resume,
    }


def oracle_sql() -> dict[str, str]:
    from orc_spark.engine import selector, stats
    from orc_spark.textops import analysis, dedup

    return {
        "codec_selection": selector.codec_selection_sql(
            "documents",
            int_cols=["doc_id", "n_chars"],
            str_cols=["lang", "source", "text"],
            n_partitions=4,
        ),
        "ngram_jaccard_dedup": dedup.ngram_jaccard_sql(
            "documents", shingle_k=3, threshold=0.5
        ),
        "near_dup_purge": dedup.near_dup_purge_sql("documents"),
        "extract_text": (
            "SELECT doc_id, text FROM documents ORDER BY doc_id"
        ),
        "media_metadata": (
            "SELECT doc_id AS media_id, 'image' AS kind, "
            "CAST(octet_length(ENCODE(text)) AS BIGINT) AS n_bytes, "
            "sha256(text) AS sha, "
            "CAST(NULL AS INTEGER) AS width, CAST(NULL AS INTEGER) AS height, "
            "CAST(NULL AS INTEGER) AS duration_ms "
            "FROM documents ORDER BY media_id"
        ),
        "language_id": analysis.language_id_sql("documents"),
        "quality_score": analysis.quality_score_sql("documents"),
        "dedup_exact": analysis.EXACT_DEDUP_SQL.format(table="documents"),
        "token_stats": analysis.TOKEN_STATS_SQL.format(table="documents"),
        "fingerprint": analysis.FINGERPRINT_SQL.format(table="documents"),
        "ann_brute_force": (
            "SELECT vec_id AS id, ROUND(list_cosine_similarity("
            "CAST(embedding AS DOUBLE[]), "
            "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"
            "), 6) AS cosine_r FROM embeddings "
            "ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
            "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"
            ") DESC, vec_id LIMIT 10"
        ),
        "embedding_near_dup": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) AS cosine_r "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.4 "
            "ORDER BY id_a, id_b"
        ),
        "roundtrip_fsst_text": "SELECT doc_id, text FROM documents",
        "roundtrip_dict_lang": "SELECT doc_id, lang, source FROM documents",
        "roundtrip_rle_ints": "SELECT doc_id, n_chars FROM documents",
        "roundtrip_for_ts": "SELECT event_id, ts FROM events",
        "roundtrip_raw_float": "SELECT event_id, value FROM events",
        "roundtrip_documents_auto": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
        ),
        "stats_sample_documents": stats.stats_sample_sql(
            "documents", ["doc_id", "lang", "source", "n_chars"], {"lang", "source"}
        ),
        "skew_report_documents": (
            "SELECT source AS host, COUNT(*) AS n_rows, "
            "COUNT(*) * 1.0 / SUM(COUNT(*)) OVER () AS share "
            "FROM documents GROUP BY source ORDER BY n_rows DESC, host"
        ),
        "lang_distribution": (
            "SELECT lang, COUNT(*) AS n_docs, AVG(n_chars) AS avg_chars "
            "FROM documents GROUP BY lang ORDER BY lang"
        ),
        "weekly_events": (
            "SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week, "
            "COUNT(*) AS n_events, "
            "SUM(value) AS total_value FROM events "
            "GROUP BY 1 ORDER BY week DESC LIMIT 5"
        ),
        "event_type_percentiles": (
            "SELECT event_type, COUNT(*) AS n, AVG(value) AS avg_value, "
            "quantile_cont(value, 0.95) AS p95_value "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
    }
