"""Round-2 operator additions: shingle DF cap, JVM simhash (+ DuckDB
parity), minhash exact-verify, portable bucket skew report, and real
image-header probes."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from orc_spark.engine import skew
from orc_spark.textops import dedup, multimodal


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "the quick brown fox jumps over the lazy dog again and once"),
        (4, "a completely different document about database compression"),
        (5, "another unrelated text concerning spark query planning"),
        (6, "a completely different document about database compression"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def stop_shingle_docs(spark):
    """Every doc shares one stop-shingle; only 1&2 are near-dups."""
    stop = "lorem ipsum dolor"
    rows = [
        (1, f"{stop} alpha beta gamma delta epsilon zeta"),
        (2, f"{stop} alpha beta gamma delta epsilon eta"),
    ] + [(i, f"{stop} unique{i} text{i} words{i} here{i}") for i in range(3, 23)]
    return spark.createDataFrame(rows, "doc_id long, text string")


# --------------------------------------------------------- shingle DF cap

def test_df_cap_bounds_candidates_keeps_exactness(spark, stop_shingle_docs):
    """With the cap, the stop-shingle is dropped from the candidate
    index (22 docs > cap 10), bounding the self-join; true near-dups
    still pair via their rare shingles, with EXACT Jaccard values."""
    capped = dedup.ngram_jaccard_pairs(
        stop_shingle_docs, threshold=0.3, df_cap=10
    ).collect()
    uncapped = dedup.ngram_jaccard_pairs(
        stop_shingle_docs, threshold=0.3, df_cap=None
    ).collect()
    as_map = lambda rows: {(r.id_a, r.id_b): round(r.jaccard, 9) for r in rows}
    assert as_map(capped) == as_map(uncapped)  # cap costs no recall here
    assert (1, 2) in as_map(capped)


def test_df_cap_prunes_inverted_index(spark, stop_shingle_docs):
    """Structural check: the capped index itself drops the stop-shingle
    (the quadratic-join hazard), while rare shingles survive."""
    base = stop_shingle_docs.select(
        F.col("doc_id").alias("id"),
        F.array_distinct(dedup.shingles("text", 3)).alias("sh"),
    )
    inv = base.select("id", F.explode("sh").alias("s"))
    dfreq = inv.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    assert dfreq.filter(F.col("df") > 10).count() >= 1  # hazard exists
    rare = dfreq.filter(F.col("df") <= 10)
    assert rare.filter(F.col("s").startswith("lorem ipsum")).count() == 0


def test_ngram_sql_twin_applies_same_cap(spark, stop_shingle_docs):
    pdf = stop_shingle_docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    got = con.execute(
        dedup.ngram_jaccard_sql("documents", threshold=0.3, df_cap=10)
    ).fetchall()
    spark_rows = dedup.ngram_jaccard_pairs(
        stop_shingle_docs, threshold=0.3, df_cap=10
    ).collect()
    assert [(r.id_a, r.id_b, round(r.jaccard, 9)) for r in spark_rows] == [
        (a, b, round(j, 9)) for a, b, j in got
    ]


# ----------------------------------------------------------- simhash (JVM)

def test_simhash_md5_duckdb_parity(spark, dup_docs):
    pdf = dup_docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = con.execute(dedup.simhash_pairs_sql("documents", max_hamming=3)).fetchall()
    got = dedup.simhash_near_pairs(dup_docs, max_hamming=3, hash_fn="md5").collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in got] == [tuple(t) for t in oracle]
    pairs = {(a, b) for a, b, _ in oracle}
    assert {(1, 2), (4, 6)} <= pairs  # identical docs at distance 0


def test_simhash_identical_docs_distance_zero(spark, dup_docs):
    for hash_fn in ("xxhash64", "md5"):
        sigs = {r.id: (r.simhash_hi, r.simhash_lo)
                for r in dedup.simhash64(dup_docs, hash_fn=hash_fn).collect()}
        assert sigs[1] == sigs[2]
        assert sigs[4] == sigs[6]
        assert sigs[1] != sigs[4]
        assert len(sigs) == 6  # one row per doc, empty-safe


# ------------------------------------------------- minhash exact-verify

def test_minhash_exact_verify_matches_ngram(spark, dup_docs):
    mh = dedup.minhash_lsh_pairs(
        dup_docs, num_hashes=64, bands=32, jaccard_threshold=0.4, exact_verify=True
    ).collect()
    ng = dedup.ngram_jaccard_pairs(dup_docs, threshold=0.4).collect()
    key = lambda rows: {(r.id_a, r.id_b): round(r.jaccard, 9) for r in rows}
    assert key(mh) == key(ng)


# -------------------------------------------- portable bucket skew report

def test_portable_bucket_matches_duckdb(spark, dup_docs):
    got = {
        (r.strategy, r.n_buckets): (r.buckets_hit, r.max_rows, r.min_rows, r.total_rows)
        for r in skew.bucket_balance_report(dup_docs, "doc_id", 4, salt=42).collect()
    }
    con = duckdb.connect()
    con.register("documents", dup_docs.toPandas())
    b = skew.portable_bucket_sql("doc_id", 4, salt=42)
    (hit, mx, mn, tot) = con.execute(
        f"SELECT COUNT(*), MAX(n), MIN(n), SUM(n) FROM "
        f"(SELECT {b} AS bucket, COUNT(*) AS n FROM documents GROUP BY 1)"
    ).fetchone()
    assert got[("salted_hash", 4)] == (hit, mx, mn, tot)


# --------------------------------------------------- image header probes

def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x06\x00\x00\x00")


def _gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\xf7\x00\x00"


def _jpeg(w, h):
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x02\x00\x00H\x00H\x00\x00"
    sof0 = b"\xff\xc0\x00\x11\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03"
    return b"\xff\xd8" + app0 + sof0


def test_parse_image_header_vectors():
    assert multimodal.parse_image_header(_png(640, 480)) == ("png", 640, 480)
    assert multimodal.parse_image_header(_gif(320, 200)) == ("gif", 320, 200)
    assert multimodal.parse_image_header(_jpeg(1920, 1080)) == ("jpeg", 1920, 1080)
    assert multimodal.parse_image_header(b"") == (None, None, None)
    assert multimodal.parse_image_header(b"not an image at all") == (None, None, None)
    assert multimodal.parse_image_header(_png(1, 1)[:10]) == (None, None, None)
    # jpeg with SOI but truncated before SOF: format known, dims unknown
    assert multimodal.parse_image_header(b"\xff\xd8\xff\xe0\x00\x04\x00\x00") == (
        "jpeg", None, None)


def test_synth_expr_roundtrips_through_probe(spark):
    rows = [(1, "png", 640, 480), (2, "gif", 320, 200), (3, "jpeg", 33, 77)]
    df = spark.createDataFrame(rows, "id long, fmt string, w int, h int")
    synth = df.select(
        "id",
        multimodal.synth_image_expr(F.col("fmt"), F.col("w"), F.col("h")).alias("payload"),
    )
    got = {r.media_id: (r.format, r.width, r.height)
           for r in multimodal.probe_media_headers(synth, "id", "payload").collect()}
    assert got == {1: ("png", 640, 480), 2: ("gif", 320, 200), 3: ("jpeg", 33, 77)}
    # cross-check synthesized bytes against the hand-built vectors
    raw = {r.id: bytes(r.payload) for r in synth.collect()}
    assert raw[1] == _png(640, 480)
    assert raw[2] == _gif(320, 200)
    assert raw[3] == _jpeg(33, 77)


# ---------------------------------------- extraction bytes-sniff (ADVICE)

def test_extract_text_null_first_bytes_batch(spark):
    """A batch whose FIRST html value is NULL but holds bytes rows must
    still decode (r1 sniffed dtype from element 0 and crashed here)."""
    from orc_spark.textops import extraction

    rows = [(1, None), (2, b"<html><body><p>hello &amp; bye</p></body></html>")]
    df = spark.createDataFrame(rows, "doc_id long, html binary").coalesce(1)
    got = {r.doc_id: r.extracted for r in extraction.extract_text(df).collect()}
    assert got[2] == "hello & bye"
    assert got[1] is None


# -------------------------------------------------- PII scrub + norm dedup

def test_pii_scrub_patterns(spark):
    rows = [
        (1, "mail me at bob.smith+x@corp.example.com today"),
        (2, "server at 192.168.1.200 port 80"),
        (3, "call +1-555-214-0042 now"),
        (4, "clean text with no pii at all"),
        (5, None),
    ]
    from orc_spark.textops import analysis

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: (r.scrubbed, r.n_redactions) for r in analysis.pii_scrub(df).collect()}
    assert got[1] == ("mail me at <EMAIL> today", 1)
    assert got[2] == ("server at <IP> port 80", 1)
    assert got[3] == ("call <PHONE> now", 1)
    assert got[4] == ("clean text with no pii at all", 0)
    assert got[5] == ("", 0)


def test_pii_scrub_duckdb_parity(spark):
    rows = [
        (1, "x a@b.io y 10.0.0.1 z +44-123-456-7890"),
        (2, "nothing here"),
    ]
    from orc_spark.textops import analysis

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.id, r.scrubbed, r.n_redactions)
           for r in analysis.pii_scrub(df).orderBy("id").collect()]
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    exp = con.execute(analysis.pii_scrub_sql("documents")).fetchall()
    assert got == [tuple(t) for t in exp]


def test_normalized_dedup_catches_reformatted(spark):
    rows = [
        (1, "The Quick   Brown Fox"),
        (2, "the quick brown fox"),      # same after normalization
        (3, "  THE QUICK\tBROWN FOX "),  # same after normalization
        (4, "a different document"),
    ]
    from orc_spark.textops import analysis

    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = {r.keeper_id: r.n_copies for r in analysis.normalized_dedup(df).collect()}
    assert groups == {1: 3, 4: 1}


# ------------------------------------- vectorized LSH signature parity

def test_signature_col_vectorized_matches_jvm(spark):
    from orc_spark.textops import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    planes = similarity._hyperplanes(dim, 32, seed=7)
    jvm = emb.select(
        F.col("vec_id"), similarity.signature_col("embedding", planes, 4).alias("s")
    ).collect()
    pd_ = emb.select(
        F.col("vec_id"),
        similarity.signature_col_vectorized("embedding", planes, 4).alias("s"),
    ).collect()
    assert {r.vec_id: list(r.s) for r in jvm} == {r.vec_id: list(r.s) for r in pd_}


def test_lsh_pairs_same_under_both_impls(spark):
    from orc_spark.textops import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = similarity.embedding_near_dup_pairs(
        emb, threshold=0.4, method="lsh", band_bits=2, sig_impl="jvm"
    ).collect()
    b = similarity.embedding_near_dup_pairs(
        emb, threshold=0.4, method="lsh", band_bits=2, sig_impl="pandas"
    ).collect()
    assert [(r.id_a, r.id_b) for r in a] == [(r.id_a, r.id_b) for r in b]


def test_exact_dedup_sort_optional(spark):
    from orc_spark.textops import dedup

    df = spark.createDataFrame(
        [(1, "aa"), (2, "aa"), (3, "bb")], "doc_id long, text string"
    )
    sorted_rows = dedup.exact_dedup(df).collect()
    unsorted = {(r.content_sha, r.keeper_id, r.n_copies)
                for r in dedup.exact_dedup(df, sort=False).collect()}
    assert {(r.content_sha, r.keeper_id, r.n_copies) for r in sorted_rows} == unsorted
    plan = (
        dedup.exact_dedup(df, sort=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Sort" not in plan  # sort=False must elide the global order
