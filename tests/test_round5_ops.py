"""Round-5 operators: int8 embedding quantization, inverted index,
host-level link graph. Oracle parity runs in test_oracle_parity; these
check the operator-level invariants the SQL twin can't express."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from orc_spark.textops import analysis, extraction, similarity
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


class TestQuantizeInt8:
    def test_codes_in_range_and_dequant_error_bounded(self, spark, embeddings):
        q = similarity.quantize_int8(embeddings)
        joined = q.join(embeddings, "vec_id").select(
            "vec_id", "qvec", "scale", "embedding"
        )
        rows = joined.collect()
        assert rows
        for r in rows:
            qv = np.array(r.qvec, dtype=np.int64)
            assert qv.min() >= -127 and qv.max() <= 127
            x = np.array(r.embedding, dtype=np.float64)
            err = np.abs(qv * r.scale - x)
            # symmetric SQ8: |dequant - x| <= scale/2 per element
            assert err.max() <= r.scale / 2 + 1e-12

    def test_zero_vector_quantizes_to_zero(self, spark):
        df = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
        )
        r = similarity.quantize_int8(df).collect()[0]
        assert list(r.qvec) == [0, 0, 0] and r.scale == 0.0

    def test_max_abs_element_maps_to_127(self, spark):
        df = spark.createDataFrame(
            [(1, [0.5, -2.0, 1.0])], "vec_id long, embedding array<float>"
        )
        r = similarity.quantize_int8(df).collect()[0]
        assert r.qvec[1] == -127  # the max-|x| element hits the rail


class TestInvertedIndex:
    def test_cap_filters_terms_never_truncates_postings(self, spark):
        # controlled dfs: term "t<k>" appears in docs 0..k-1
        rows = [
            (d, " ".join(f"term{k}" for k in range(1, 13) if d < k))
            for d in range(12)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        idx = analysis.inverted_index(df, min_df=2, df_cap=8).collect()
        assert idx
        got = {r.term: r for r in idx}
        assert set(got) == {f"term{k}" for k in range(2, 9)}  # 2<=df<=8
        for r in idx:
            assert 2 <= r.df <= 8
            # complete lists: length equals df, sorted ascending
            assert len(r.postings) == r.df
            assert list(r.postings) == sorted(r.postings)

    def test_real_corpus_nonempty(self, documents):
        idx = analysis.inverted_index(documents, df_cap=400).collect()
        assert idx
        assert all(len(r.postings) == r.df for r in idx)

    def test_df_counts_documents_not_occurrences(self, spark):
        df = spark.createDataFrame(
            [(1, "apple apple apple"), (2, "apple pie")],
            "doc_id long, text string",
        )
        idx = {r.term: r for r in analysis.inverted_index(
            df, min_df=1, df_cap=100
        ).collect()}
        assert idx["apple"].df == 2  # per-doc distinct caps the vote
        assert list(idx["apple"].postings) == [1, 2]


class TestLinkGraph:
    def test_extracts_hosts_and_counts_edges(self, spark):
        df = spark.createDataFrame(
            [
                (
                    "https://src.one/page",
                    '<a href="https://DST.two/a">x</a>'
                    '<a href="https://dst.two/b">y</a>'
                    '<a href="relative/no-scheme">z</a>',
                ),
                ("no-scheme-url", '<a href="https://dst.two/c">w</a>'),
            ],
            "url string, html string",
        )
        edges = {
            (r.src_host, r.dst_host): r.n_links
            for r in extraction.link_graph(df).collect()
        }
        # host lowercased, both same-page links folded into one edge;
        # schemeless hrefs and schemeless source urls drop out
        assert edges == {("src.one", "dst.two"): 2}

    def test_binary_html_decodes(self, spark):
        df = spark.createDataFrame(
            [("https://s.a/", '<a href="https://d.b/">x</a>'.encode())],
            "url string, html binary",
        )
        rows = extraction.link_graph(df).collect()
        assert [(r.src_host, r.dst_host, r.n_links) for r in rows] == [
            ("s.a", "d.b", 1)
        ]


class TestParagraphDedup:
    def test_global_first_occurrence(self, spark):
        from orc_spark.textops import dedup

        df = spark.createDataFrame(
            [
                (1, "nav <p> alpha <p> footer"),
                (2, "nav <p> beta <p> footer"),
                (3, "nav <p> footer"),
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.text for r in dedup.paragraph_dedup(df).collect()}
        # doc 1 keeps everything (first occurrence of nav+footer);
        # doc 2 keeps only its unique paragraph; doc 3 vanishes
        assert got == {1: "nav <p> alpha <p> footer", 2: "beta"}

    def test_order_preserved_within_doc(self, spark):
        from orc_spark.textops import dedup

        df = spark.createDataFrame(
            [(1, "z <p> a <p> m")], "doc_id long, text string"
        )
        got = dedup.paragraph_dedup(df).collect()[0].text
        assert got == "z <p> a <p> m"  # original order, not sorted


class TestBoilerplateLines:
    def test_host_scoped_removal(self, spark):
        from orc_spark.textops import dedup

        # "nav" appears in 2 distinct docs on host a (boilerplate at
        # min_df=2) and in only 1 doc on host b (kept there); "promo"
        # appears once per host (globally common, host-locally rare).
        df = spark.createDataFrame(
            [
                (1, "a", "nav <p> alpha <p> promo"),
                (2, "a", "nav <p> beta"),
                (3, "b", "nav <p> gamma <p> promo"),
            ],
            "doc_id long, host string, text string",
        )
        got = {
            r.doc_id: r.text
            for r in dedup.boilerplate_lines(df, min_df=2).collect()
        }
        assert got == {
            1: "alpha <p> promo",
            2: "beta",
            3: "nav <p> gamma <p> promo",
        }

    def test_all_occurrences_dropped_and_doc_vanishes(self, spark):
        from orc_spark.textops import dedup

        df = spark.createDataFrame(
            [(1, "h", "nav"), (2, "h", "nav"), (3, "h", "nav <p> body")],
            "doc_id long, host string, text string",
        )
        got = {
            r.doc_id: r.text
            for r in dedup.boilerplate_lines(df, min_df=2).collect()
        }
        # unlike paragraph_dedup, even the FIRST occurrence is dropped
        assert got == {3: "body"}

    def test_repeat_within_one_doc_counts_once(self, spark):
        from orc_spark.textops import dedup

        df = spark.createDataFrame(
            [(1, "h", "x <p> x <p> x"), (2, "h", "y")],
            "doc_id long, host string, text string",
        )
        got = {
            r.doc_id: r.text
            for r in dedup.boilerplate_lines(df, min_df=2).collect()
        }
        # df("x") = 1 distinct doc, so it survives despite 3 copies
        assert got == {1: "x <p> x <p> x", 2: "y"}


class TestDupWindowStats:
    def test_hand_computed_counts(self, spark):
        from orc_spark.textops import dedup

        df = spark.createDataFrame(
            [
                (1, "a b c d"),   # windows: abc, bcd
                (2, "a b c"),     # windows: abc
                (3, "x y z"),     # windows: xyz
            ],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_windows, r.n_dup_windows)
            for r in dedup.dup_window_stats(df, k=3).collect()
        }
        assert got == {1: (2, 1), 2: (1, 1), 3: (1, 0)}

    def test_short_doc_whole_text_window(self, spark):
        from orc_spark.textops import dedup

        df = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "c")], "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.n_windows, r.n_dup_windows)
            for r in dedup.dup_window_stats(df, k=3).collect()
        }
        assert got == {1: (1, 1), 2: (1, 1), 3: (1, 0)}


class TestPurgeDupWindows:
    def test_keeper_survives_others_purged(self, spark):
        """Global first occurrence of a duplicated window keeps its
        tokens; later occurrences lose theirs; unique text survives."""
        from orc_spark.textops import dedup

        df = spark.createDataFrame(
            [
                (1, "a b c d"),     # keeper of "a b c"; "b c d" unique
                (2, "a b c"),       # whole doc is the dup window
                (3, "x y a b c"),   # dup at pos 3..5; "x y" unique-ish
            ],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
            for r in dedup.purge_dup_windows(df, k=3).collect()
        }
        # doc 1 keeps everything (it owns the keeper occurrence);
        # doc 2 empties; doc 3 loses its tail copy
        assert got[1] == (4, 0, "a b c d")
        assert got[2] == (3, 3, "")
        assert got[3] == (5, 3, "x y")

    def test_overlapping_removals_count_tokens_once(self, spark):
        """Two overlapping duplicated windows in one doc remove the
        union of their spans, not the sum."""
        from orc_spark.textops import dedup

        df = spark.createDataFrame(
            [
                (1, "a b c d"),    # keeper of both "a b c" and "b c d"
                (2, "a b c d e"),  # both windows dup at pos 1 and 2
            ],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_removed, r.clean_text)
            for r in dedup.purge_dup_windows(df, k=3).collect()
        }
        assert got[1] == (0, "a b c d")
        assert got[2] == (4, "e")  # union of spans 1-3 and 2-4

    def test_short_doc_whole_text_window(self, spark):
        from orc_spark.textops import dedup

        df = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "c")], "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.n_removed, r.clean_text)
            for r in dedup.purge_dup_windows(df, k=3).collect()
        }
        assert got == {1: (0, "a b"), 2: (2, ""), 3: (0, "c")}

    def test_matches_duckdb_twin(self, spark):
        import duckdb

        from orc_spark.textops import dedup

        df = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps"),
                (2, "the quick brown cat sits"),
                (3, "lazy dog the quick brown fox naps"),
                (4, "the quick brown fox jumps"),
            ],
            "doc_id long, text string",
        )
        got = [
            (r.doc_id, r.n_tokens, r.n_removed, r.clean_text)
            for r in dedup.purge_dup_windows(df, k=3).collect()
        ]
        con = duckdb.connect()
        con.register("docs_pd", df.toPandas())
        con.execute("CREATE VIEW d AS SELECT * FROM docs_pd")
        want = con.execute(
            dedup.purge_dup_windows_sql("d", k=3)
        ).fetchall()
        assert got == [tuple(w) for w in want]


class TestTfidfTopTerms:
    def test_idf_zeroes_ubiquitous_term(self, spark):
        import math

        df = spark.createDataFrame(
            [(1, "common rare1 common"), (2, "common rare2")],
            "doc_id long, text string",
        )
        rows = analysis.tfidf_top_terms(df, k=2).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append((r.term, r.tf, r.score))
        # 'common' appears in both docs -> idf = ln(2/2) = 0
        for doc, terms in by_doc.items():
            top_term, tf, score = terms[0]
            assert top_term.startswith("rare")
            assert score == pytest.approx(math.log(2.0))
        common = [t for ts in by_doc.values() for t in ts if t[0] == "common"]
        assert all(t[2] == 0.0 for t in common)

    def test_k_bounds_rows_per_doc(self, spark, documents):
        out = analysis.tfidf_top_terms(documents, k=3)
        counts = out.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
        assert counts <= 3


class TestMojibakeScore:
    def test_counts_and_flag(self, spark):
        df = spark.createDataFrame(
            [
                (1, "clean text"),
                (2, "bad � char � twice"),
                (3, "bell \x07 and null-ish \x01"),
            ],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_replacement, r.n_control, r.is_suspect)
            for r in analysis.mojibake_score(df).collect()
        }
        assert got == {
            1: (0, 0, False),
            2: (2, 0, True),
            3: (0, 2, True),
        }

    def test_tab_and_newline_not_control_flagged(self, spark):
        df = spark.createDataFrame(
            [(1, "a\tb\nc")], "doc_id long, text string"
        )
        r = analysis.mojibake_score(df).collect()[0]
        assert (r.n_control, r.is_suspect) == (0, False)


class TestUrlHostFilter:
    def test_blocklist_and_regex(self, spark):
        df = spark.createDataFrame(
            [
                (1, "https://good.example.com/a"),
                (2, "https://blocked.example.com/b"),
                (3, "https://casino.example.net/c"),
                (4, "https://good.example.com/casino-in-path"),
            ],
            "doc_id long, url string",
        )
        out = extraction.url_host_filter(
            df, blocklist=["blocked.example.com"]
        ).collect()
        assert [r.doc_id for r in out] == [1, 4]  # path spam is NOT a host match
        assert all(r.host == "good.example.com" for r in out)


class TestPagerankHosts:
    def test_two_node_cycle_is_uniform(self, spark):
        from orc_spark.textops import graph

        edges = spark.createDataFrame(
            [("a", "b", 1), ("b", "a", 1)],
            "src_host string, dst_host string, n_links long",
        )
        ranks = {r.host: r.rank for r in graph.pagerank_hosts(edges).collect()}
        assert ranks["a"] == pytest.approx(0.5)
        assert ranks["b"] == pytest.approx(0.5)

    def test_authority_outranks_spoke(self, spark):
        from orc_spark.textops import graph

        # star: three spokes all link to hub, hub links to one spoke
        edges = spark.createDataFrame(
            [("s1", "hub", 1), ("s2", "hub", 1), ("s3", "hub", 1), ("hub", "s1", 1)],
            "src_host string, dst_host string, n_links long",
        )
        ranks = {r.host: r.rank for r in graph.pagerank_hosts(edges).collect()}
        assert ranks["hub"] > ranks["s1"] > ranks["s2"]
        assert ranks["s2"] == ranks["s3"]  # symmetric spokes tie exactly

    def test_weighted_edges_split_proportionally(self, spark):
        from orc_spark.textops import graph

        # a sends 3/4 of its mass to b, 1/4 to c (one iteration checkable)
        edges = spark.createDataFrame(
            [("a", "b", 3), ("a", "c", 1)],
            "src_host string, dst_host string, n_links long",
        )
        ranks = {
            r.host: r.rank
            for r in graph.pagerank_hosts(edges, iterations=1).collect()
        }
        base = 0.15 / 3
        assert ranks["a"] == pytest.approx(base)  # no in-links
        assert ranks["b"] == pytest.approx(base + 0.85 * (1 / 3) * 0.75)
        assert ranks["c"] == pytest.approx(base + 0.85 * (1 / 3) * 0.25)


class TestDomainCap:
    def test_cap_respected_and_deterministic(self, spark, documents):
        out = analysis.domain_cap(documents, cap=5)
        per = out.groupBy("domain").count().collect()
        assert all(r["count"] <= 5 for r in per)
        # deterministic: same survivors on a re-run
        a = sorted((r.doc_id, r.domain) for r in out.collect())
        b = sorted((r.doc_id, r.domain) for r in analysis.domain_cap(documents, cap=5).collect())
        assert a == b

    def test_salt_changes_the_draw(self, spark, documents):
        a = {r.doc_id for r in analysis.domain_cap(documents, cap=5, salt="s1").collect()}
        b = {r.doc_id for r in analysis.domain_cap(documents, cap=5, salt="s2").collect()}
        assert a != b  # 25-docs-per-domain corpus: collision is ~impossible

    def test_small_domain_survives_whole(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string"
        )
        out = analysis.domain_cap(df, cap=10).collect()
        assert len(out) == 3


class TestBigramLm:
    def test_probs_sum_to_one_per_context(self, spark, documents):
        out = analysis.bigram_lm(documents, min_count=1)
        sums = out.groupBy("w1").agg(F.sum("prob").alias("p")).collect()
        for r in sums:
            assert abs(r.p - 1.0) < 1e-9, (r.w1, r.p)

    def test_hand_computed(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
        )
        out = {(r.w1, r.w2): (r.c, r.prob) for r in
               analysis.bigram_lm(df, min_count=1).collect()}
        # pairs: (a,b)x3, (b,a)x1, (b,c)x1
        assert out[("a", "b")] == (3, 1.0)
        assert out[("b", "a")] == (1, 0.5)
        assert out[("b", "c")] == (1, 0.5)

    def test_min_count_filters_after_totals(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a b a c")], "doc_id long, text string"
        )
        out = {(r.w1, r.w2): r.prob for r in
               analysis.bigram_lm(df, min_count=2).collect()}
        # pairs: (a,b)x2 (b,a)x2 (a,c)x1 — (a,c) drops, but (a,b)'s
        # prob uses the FULL a-total (3), not the filtered one
        assert out == {
            ("a", "b"): pytest.approx(2 / 3),
            ("b", "a"): pytest.approx(1.0),
        }


class TestAnchorTextIndex:
    def test_extracts_hosts_and_texts(self, spark):
        df = spark.createDataFrame(
            [
                (1, '<a href="https://x.com/a">click here</a>'
                    '<a href="https://x.com/b">click here</a>'
                    '<a href="https://y.com/">other</a>'),
            ],
            "doc_id long, html string",
        )
        got = {r.dst_host: (r.n_anchors, r.n_texts, r.texts)
               for r in extraction.anchor_text_index(df).collect()}
        assert got == {
            "x.com": (2, 1, "click here"),
            "y.com": (1, 1, "other"),
        }

    def test_empty_anchor_text_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, '<a href="https://x.com/"></a>')], "doc_id long, html string"
        )
        assert extraction.anchor_text_index(df).count() == 0


class TestGopherRules:
    def test_bullet_heavy_doc_rejected(self, spark):
        good = " ".join(
            "the quick brown fox and that dog have fun with it".split() * 8
        )
        bullets = "\n".join(f"- item {i}" for i in range(20))
        df = spark.createDataFrame(
            [(1, good), (2, bullets)], ["doc_id", "text"]
        )
        out = {
            r.id: r for r in analysis.gopher_rules(df, min_words=20).collect()
        }
        assert out[1].keep is True
        assert out[2].keep is False
        assert out[2].bullet_ratio == 1.0

    def test_stopword_gate(self, spark):
        # long enough, right word shapes, but zero Gopher stopwords
        no_stops = " ".join(["lorem", "ipsum", "dolor", "amet"] * 20)
        df = spark.createDataFrame([(1, no_stops)], ["doc_id", "text"])
        row = analysis.gopher_rules(df, min_words=20).collect()[0]
        assert row.stop_hits == 0 and row.keep is False

    def test_empty_and_null_safe(self, spark):
        df = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
        rows = analysis.gopher_rules(df).collect()
        assert all(r.keep is False and r.n_words == 0 for r in rows)


class TestChunkDocuments:
    def test_window_layout(self, spark):
        toks = [f"t{i}" for i in range(10)]
        df = spark.createDataFrame([(1, " ".join(toks))], ["doc_id", "text"])
        rows = sorted(
            analysis.chunk_documents(df, chunk=4, overlap=1).collect(),
            key=lambda r: r.chunk_start,
        )
        # step 3: starts 0,3,6,9; last chunk is the 1-token tail
        assert [r.chunk_start for r in rows] == [0, 3, 6, 9]
        assert [r.chunk_tokens for r in rows] == [4, 4, 4, 1]
        assert rows[0].chunk_text == "t0 t1 t2 t3"
        assert rows[1].chunk_text == "t3 t4 t5 t6"
        assert rows[3].chunk_text == "t9"

    def test_every_token_covered(self, spark):
        df = spark.createDataFrame(
            [(1, " ".join(str(i) for i in range(57)))], ["doc_id", "text"]
        )
        rows = analysis.chunk_documents(df, chunk=16, overlap=4).collect()
        seen = set()
        for r in rows:
            seen.update(range(r.chunk_start, r.chunk_start + r.chunk_tokens))
        assert seen == set(range(57))

    def test_overlap_must_be_smaller(self, spark):
        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            analysis.chunk_documents(df, chunk=4, overlap=4)


class TestNfcNormalize:
    def test_decomposed_composes_and_flags(self, spark):
        df = spark.createDataFrame(
            [(1, "café"), (2, "café"), (3, None)],
            "doc_id long, text string",
        )
        out = {r.id: r for r in analysis.nfc_normalize(df).collect()}
        assert out[1].text_nfc == "café" and out[1].changed is True
        assert out[2].text_nfc == "café" and out[2].changed is False
        assert out[3].text_nfc is None and out[3].changed is False


class TestExtractTitleMeta:
    def test_escape_roundtrip(self, spark):
        df = spark.createDataFrame(
            [(1, 'A <b> & "q"', 'desc with "quotes" & <tags>', "body")],
            ["doc_id", "title", "desc", "text"],
        )
        pages = df.select(
            "doc_id",
            extraction.page_with_meta_expr(
                F.col("title"), F.col("desc"), F.col("text")
            ).alias("html"),
        )
        row = extraction.extract_title_meta(pages).collect()[0]
        assert row.title == 'A <b> & "q"'
        assert row.description == 'desc with "quotes" & <tags>'

    def test_missing_head_yields_empty(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"<html><body>no head</body></html>"))],
            "doc_id long, html binary",
        )
        row = extraction.extract_title_meta(df).collect()[0]
        assert row.title == "" and row.description == ""


class TestLengthBuckets:
    def test_bucket_floors(self, spark):
        df = spark.createDataFrame(
            [(i, " ".join(["w"] * n)) for i, n in enumerate([1, 16, 40, 64, 2000])],
            ["doc_id", "text"],
        )
        rows = {r.bucket_lo: r for r in analysis.length_buckets(df).collect()}
        assert rows[0].n_docs == 1       # 1 token
        assert rows[16].n_docs == 1      # exactly at the 16 floor
        assert rows[32].n_docs == 1      # 40 -> bucket 32
        assert rows[64].n_docs == 1
        assert rows[1024].n_docs == 1    # 2000 -> floor 1024
        assert rows[1024].total_tokens == 2000


class TestWinnowFingerprints:
    def test_shared_run_guarantee(self, spark):
        # winnowing guarantee: token runs >= k+w-1 (=8 here) shared
        # between docs must share at least one fingerprint
        shared = "alpha beta gamma delta epsilon zeta eta theta"
        df = spark.createDataFrame(
            [
                (1, f"xx yy {shared} zz"),
                (2, f"{shared} completely different tail words here"),
                (3, "nothing in common with the others at all okay"),
            ],
            ["doc_id", "text"],
        )
        rows = analysis.winnow_fingerprints(df, k=5, w=4).collect()
        fps = {}
        for r in rows:
            fps.setdefault(r.id, set()).add(r.fp)
        assert fps[1] & fps[2]
        assert not (fps[3] & fps[1])

    def test_density_bound(self, spark):
        # ~2/(w+1) of grams become fingerprints, never more than grams
        text = " ".join(f"w{i}" for i in range(200))
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        n_fp = analysis.winnow_fingerprints(df, k=5, w=4).count()
        assert 0 < n_fp <= 196  # n-k+1 grams

    def test_short_doc_dropped(self, spark):
        df = spark.createDataFrame([(1, "too few tokens")], ["doc_id", "text"])
        assert analysis.winnow_fingerprints(df, k=5, w=4).count() == 0


class TestBm25Rank:
    def test_tf_and_idf_ordering(self, spark):
        filler = "pad " * 30
        df = spark.createDataFrame(
            [
                (1, filler + "spark spark spark"),
                (2, filler + "spark"),
                (3, filler + "nothing relevant"),
                (4, filler + "rare"),
            ],
            ["doc_id", "text"],
        )
        rows = analysis.bm25_rank(df, ["spark"], k=10).collect()
        ids = [r.id for r in rows]
        assert ids[0] == 1 and 2 in ids and 3 not in ids and 4 not in ids

    def test_rare_term_outweighs_common(self, spark):
        # 'common' appears in every doc, 'rare' in one — a doc matching
        # only the rare term must outrank one matching only the common
        docs = [(i, "common filler words here") for i in range(1, 9)]
        docs.append((9, "rare filler words here"))
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        rows = analysis.bm25_rank(df, ["common", "rare"], k=10).collect()
        score = {r.id: r.bm25 for r in rows}
        assert score[9] > score[1]


class TestGopherRepetition:
    def test_repeated_grams_detected(self, spark):
        df = spark.createDataFrame(
            [
                (1, "buy now " * 10 + "limited offer"),   # heavy repeats
                (2, " ".join(f"w{i}" for i in range(30))),  # all distinct
            ],
            ["doc_id", "text"],
        )
        out = {r.id: r for r in analysis.gopher_repetition(df, n=3).collect()}
        assert out[1].dup_fraction > 0.5
        assert out[2].dup_fraction == 0.0

    def test_short_doc_excluded(self, spark):
        df = spark.createDataFrame([(1, "two words")], ["doc_id", "text"])
        assert analysis.gopher_repetition(df, n=3).count() == 0


class TestRobotsDirectives:
    def test_flags_and_canonical(self, spark):
        pages = [
            (1, b'<html><head><meta name="robots" content="noindex, nofollow">'
                b'<link rel="canonical" href="https://e.x/a&amp;b"></head>'
                b'<body>x</body></html>'),
            (2, b"<html><head></head><body>no directives</body></html>"),
        ]
        df = spark.createDataFrame(
            [(i, bytearray(h)) for i, h in pages], "doc_id long, html binary"
        )
        out = {r.id: r for r in extraction.robots_directives(df).collect()}
        assert out[1].noindex is True and out[1].nofollow is True
        assert out[1].canonical == "https://e.x/a&b"  # entity-unescaped
        assert out[2].noindex is False and out[2].canonical == ""


class TestCharEntropy:
    def test_degenerate_vs_natural(self, spark):
        df = spark.createDataFrame(
            [
                (1, "aaaaaaaaaaaaaaaaaaaa"),           # 0 bits
                (2, "the quick brown fox jumps over"),  # natural ~4
                (3, "abab"),                            # exactly 1 bit
            ],
            ["doc_id", "text"],
        )
        out = {r.id: r for r in analysis.char_entropy(df).collect()}
        assert out[1].entropy_bits == 0.0
        assert out[3].entropy_bits == 1.0
        assert 3.0 < out[2].entropy_bits < 5.0


class TestPerplexityScore:
    def test_repetitive_scores_lower(self, spark):
        common = "the cat sat on the mat and " * 20
        docs = [(i, common) for i in range(1, 9)]
        docs.append((9, common + " zyx wvu tsr qpo nml kji"))  # rare tail
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = {r.id: r for r in analysis.perplexity_score(df, min_count=2).collect()}
        # the doc with unseen-bigram junk must score higher perplexity
        assert out[9].pseudo_ppl > out[1].pseudo_ppl
        assert out[1].n_bigrams > 0


class TestTemperatureWeights:
    def test_alpha_flattens_toward_uniform(self, spark):
        docs = [(i, "w " * 100, "big") for i in range(90)]
        docs += [(100 + i, "w " * 100, "small") for i in range(10)]
        df = spark.createDataFrame(docs, ["doc_id", "text", "source"])
        out = {r.source: r for r in
               analysis.temperature_weights(df, alpha=0.3).collect()}
        # sampled share must sit between natural share and uniform
        assert out["small"].p_natural < out["small"].q_sampled < 0.5
        assert 0.5 < out["big"].q_sampled < out["big"].p_natural
        # resample weights upsample the minority, downsample the bulk
        assert out["small"].resample_weight > 1 > out["big"].resample_weight

    def test_alpha_one_is_natural_mix(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c", "x"), (2, "a b", "y")], ["doc_id", "text", "source"]
        )
        for r in analysis.temperature_weights(df, alpha=1.0).collect():
            assert r.p_natural == r.q_sampled


class TestCurationPipeline:
    def test_gate_precedence(self, spark):
        good = " ".join("the quick brown fox and that dog have fun with it"
                        .split() * 8)
        rows = [
            (1, good),              # keeper, passes all gates
            (2, good),              # exact dup of 1 -> 'dup'
            (3, good + " \x00\x01"),  # control chars -> 'mojibake'
            (4, "too short"),       # fails gopher
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r.id: r for r in
               analysis.curation_pipeline(df, min_words=20).collect()}
        assert out[1].keep is True and out[1].reject_reason == "ok"
        assert out[2].reject_reason == "dup"
        assert out[3].reject_reason == "mojibake"
        assert out[4].reject_reason == "gopher"


class TestLabelCentroids:
    def test_known_means(self, spark):
        from orc_spark.textops import similarity

        df = spark.createDataFrame(
            [
                (1, [1.0, 0.0], 0),
                (2, [3.0, 2.0], 0),
                (3, [10.0, 10.0], 1),
            ],
            "vec_id long, embedding array<float>, label int",
        )
        out = {r.label: r for r in similarity.label_centroids(df).collect()}
        assert out[0].centroid == [2.0, 1.0] and out[0].n_vectors == 2
        assert out[1].centroid == [10.0, 10.0] and out[1].n_vectors == 1


class TestCompactFragmented:
    def test_binpacks_only_fragmented_partitions(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from orc_spark.engine import pipeline, retention

        df = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 13).cast("string").alias("lang"),
        )
        cfg = pipeline.EncodeJobConfig(
            out_dir=str(tmp_path / "r"), run_id="frag", key="doc_id",
            columns=["doc_id", "lang"], n_partitions=4, stripe_rows=64,
        )
        pipeline.run_encode_job(spark, df, cfg)
        before = pipeline.decode_job(
            spark, cfg.out_dir, "frag", df.schema
        ).collect()

        rep = pipeline.compact_fragmented(
            spark, cfg.out_dir, "frag", df.schema,
            target_stripe_rows=65536,
        )
        assert rep["partitions_compacted"] == 4
        assert rep["stripes_after"] == 4  # one fat stripe per partition
        assert rep["stripes_before"] > rep["stripes_after"]

        after = pipeline.decode_job(
            spark, cfg.out_dir, "frag", df.schema
        ).collect()
        assert sorted(map(tuple, after)) == sorted(map(tuple, before))

        # already compacted -> nothing is fragmented any more
        rep2 = pipeline.compact_fragmented(
            spark, cfg.out_dir, "frag", df.schema,
            target_stripe_rows=65536,
        )
        assert rep2["partitions_compacted"] == 0

        # vacuum physically reclaims the superseded small stripes
        reclaimed = retention.vacuum_epochs(
            spark, cfg.out_dir, run_id="frag"
        )
        final = pipeline.decode_job(
            spark, cfg.out_dir, "frag", df.schema
        ).collect()
        assert sorted(map(tuple, final)) == sorted(map(tuple, before))
        assert reclaimed  # something was removed

    def test_materializes_position_deletes(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from orc_spark.engine import deletes as deletes_mod
        from orc_spark.engine import pipeline

        df = spark.range(500).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).cast("string").alias("lang"),
        )
        cfg = pipeline.EncodeJobConfig(
            out_dir=str(tmp_path / "r"), run_id="fragdel", key="doc_id",
            columns=["doc_id", "lang"], n_partitions=2, stripe_rows=64,
        )
        pipeline.run_encode_job(spark, df, cfg)
        pipeline.delete_rows(
            spark, cfg.out_dir, "fragdel", df.schema,
            [("doc_id", "==", 123)],
        )
        want = sorted(
            map(tuple, pipeline.decode_job(
                spark, cfg.out_dir, "fragdel", df.schema
            ).collect())
        )
        assert len(want) == 499
        pipeline.compact_fragmented(
            spark, cfg.out_dir, "fragdel", df.schema,
            target_stripe_rows=65536,
        )
        got = sorted(
            map(tuple, pipeline.decode_job(
                spark, cfg.out_dir, "fragdel", df.schema
            ).collect())
        )
        assert got == want


class TestStripeBytes:
    def test_byte_target_adapts_rows_to_width(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from orc_spark.engine import pipeline

        wide = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.rpad(F.col("id").cast("string"), 400, "x").alias("text"),
        )
        narrow = spark.range(2000).select(
            F.col("id").alias("doc_id"), (F.col("id") % 9).alias("v")
        )
        stats = {}
        for rid, df in (("w", wide), ("n", narrow)):
            cfg = pipeline.EncodeJobConfig(
                out_dir=str(tmp_path / rid), run_id=rid, key="doc_id",
                columns=df.columns, n_partitions=2,
                stripe_bytes=64 * 1024,
            )
            pipeline.run_encode_job(spark, df, cfg)
            meta = (
                pipeline.read_stripes(spark, cfg.out_dir, rid)
                .filter(F.col("column") == "doc_id")
                .agg(
                    F.avg("n_rows").alias("avg"),
                    F.count(F.lit(1)).alias("ns"),
                ).first()
            )
            stats[rid] = meta
            back = pipeline.decode_job(
                spark, cfg.out_dir, rid, df.schema
            )
            assert back.count() == 2000
        # ~160 rows/stripe for 400B rows, full 1000-row partitions for
        # narrow ints (target 64KB / ~16B = 4096 > partition size)
        assert stats["w"].avg < 300
        assert stats["n"].avg == 1000
        assert stats["w"].ns > stats["n"].ns

    def test_rows_and_bytes_exclusive(self, spark, tmp_path):
        import pytest
        from pyspark.sql import functions as F

        from orc_spark.engine import encode, pipeline, selector

        df = spark.range(10).select(F.col("id").alias("doc_id"))
        with pytest.raises(ValueError, match="not both"):
            encode.encode_stage(
                df, selector.plan_for_schema(
                    pipeline._arrow_schema(df)
                ), "x", stripe_rows=10, stripe_bytes=100,
            )


class TestKeyPartitionFastPath:
    def test_key_equality_pins_partitions_and_stays_exact(
        self, spark, tmp_path
    ):
        from pyspark.sql import functions as F

        from orc_spark.engine import pipeline

        df = spark.range(3000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 11).cast("string").alias("lang"),
        )
        cfg = pipeline.EncodeJobConfig(
            out_dir=str(tmp_path / "r"), run_id="kp", key="doc_id",
            columns=["doc_id", "lang"], n_partitions=8, stripe_rows=256,
        )
        pipeline.run_encode_job(spark, df, cfg)

        # the restriction matches the physical layout for every probe
        for v in (0, 17, 1234, 2999):
            pids = pipeline._key_partition_restriction(
                spark, cfg.out_dir, "kp", df.schema,
                [("doc_id", "==", v)],
            )
            assert pids is not None and len(pids) == 1
            got = pipeline.decode_job(
                spark, cfg.out_dir, "kp", df.schema,
                predicate=[("doc_id", "==", v)],
            ).filter(F.col("doc_id") == v).collect()
            assert [r.doc_id for r in got] == [v]

        # IN unions pids; AND of two key conjuncts intersects
        pids_in = pipeline._key_partition_restriction(
            spark, cfg.out_dir, "kp", df.schema,
            [("doc_id", "in", [1, 2, 3, 4, 5])],
        )
        assert pids_in is not None and 1 <= len(pids_in) <= 5
        pids_and = pipeline._key_partition_restriction(
            spark, cfg.out_dir, "kp", df.schema,
            [("doc_id", "==", 1), ("doc_id", "==", 2)],
        )
        # distinct values usually hash apart -> empty intersection OK
        assert pids_and is not None

        # non-key or non-equality conjuncts: no restriction
        assert pipeline._key_partition_restriction(
            spark, cfg.out_dir, "kp", df.schema,
            [("lang", "==", "3")],
        ) is None
        assert pipeline._key_partition_restriction(
            spark, cfg.out_dir, "kp", df.schema,
            [("doc_id", ">", 5)],
        ) is None
        # literal that cannot carry the column type: conservative None
        assert pipeline._key_partition_restriction(
            spark, cfg.out_dir, "kp", df.schema,
            [("doc_id", "==", "not-an-int")],
        ) is None


def test_dnf_key_union_pins_and_voids(spark, tmp_path):
    """decode_job_dnf: every-branch-pinned unions pids and stays
    exact; one unpinned branch voids the restriction (full result)."""
    from pyspark.sql import functions as F

    from orc_spark.engine import pipeline, zonemap

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("lang"),
    )
    cfg = pipeline.EncodeJobConfig(
        out_dir=str(tmp_path / "r"), run_id="dk", key="doc_id",
        columns=["doc_id", "lang"], n_partitions=8, stripe_rows=128,
    )
    pipeline.run_encode_job(spark, df, cfg)
    branches = [[("doc_id", "==", 42)], [("doc_id", "==", 1777)]]
    got = (
        pipeline.decode_job_dnf(
            spark, cfg.out_dir, "dk", df.schema, branches
        )
        .filter(zonemap.predicate_dnf_expr(branches))
        .collect()
    )
    assert sorted(r.doc_id for r in got) == [42, 1777]
    # unpinned second branch: result must still be complete
    branches2 = [[("doc_id", "==", 42)], [("lang", "==", "3")]]
    got2 = (
        pipeline.decode_job_dnf(
            spark, cfg.out_dir, "dk", df.schema, branches2
        )
        .filter(zonemap.predicate_dnf_expr(branches2))
        .count()
    )
    want2 = df.filter(
        (F.col("doc_id") == 42) | (F.col("lang") == "3")
    ).count()
    assert got2 == want2


def test_salted_join_equals_plain_join(spark):
    """salted_join == plain join bit-for-bit (inner and left, with
    unmatched keys), and the hot key's rows spread over several salt
    buckets; right/full refused."""
    import pytest
    from pyspark.sql import functions as F

    from orc_spark.engine import skew

    left = spark.createDataFrame(
        [(i, 1 if i % 10 else 2) for i in range(2000)] + [(9999, 777)],
        "row_id bigint, k bigint",
    )
    right = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (3, "nobody")], "k bigint, tag string"
    )
    for how in ("inner", "left"):
        got = sorted(
            map(tuple, skew.salted_join(
                left, right, "k", n_salts=8,
                how=how, salt_on=F.col("row_id"),
            ).select("row_id", "k", "tag").collect())
        )
        want = sorted(
            map(tuple, left.join(right, "k", how)
                .select("row_id", "k", "tag").collect())
        )
        assert got == want, how
    # the hot key (k=1, 1800 rows) lands in >1 salt bucket
    salted = left.filter(F.col("k") == 1).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("row_id")), F.lit(8))
    )
    assert salted.select("_salt").distinct().count() > 4
    with pytest.raises(ValueError, match="inner/left"):
        skew.salted_join(left, right, "k", how="full")
