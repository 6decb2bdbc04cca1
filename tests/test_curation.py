"""Semantic tests for the curation/search/vector-training queries — the
properties the oracle hash can't express (coverage, monotonicity,
convergence)."""

from __future__ import annotations

from tests.conftest import SF0001, SF001


class TestChunks:
    def test_every_token_covered_and_overlap_correct(self, spark):
        from posting_lines_spark.queries.curation_q import (
            CHUNK_SIZE,
            CHUNK_STRIDE,
            curation_chunks,
        )
        from posting_lines_spark.sources import load_table

        chunks = curation_chunks(spark, SF0001).collect()
        docs = {
            r.doc_id: len(r.text.split(" "))
            for r in load_table(spark, SF0001, "documents").collect()
        }
        by_doc: dict[int, list] = {}
        for r in chunks:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert set(by_doc) == set(docs)
        for doc_id, rows in by_doc.items():
            rows.sort(key=lambda r: r.chunk_id)
            n_tok = docs[doc_id]
            # chunk starts advance by the stride; the last chunk reaches
            # the final token exactly (full coverage, no overshoot)
            for i, r in enumerate(rows):
                start = i * CHUNK_STRIDE  # 0-based
                assert r.chunk_id == i
                assert r.n_chunk_tokens == min(CHUNK_SIZE, n_tok - start)
                assert r.n_chunk_tokens >= 1
            last = rows[-1]
            assert last.chunk_id * CHUNK_STRIDE + last.n_chunk_tokens == n_tok

    def test_chunk_text_digest_matches_python(self, spark):
        import hashlib

        from posting_lines_spark.queries.curation_q import (
            CHUNK_SIZE,
            CHUNK_STRIDE,
            curation_chunks,
        )
        from posting_lines_spark.sources import load_table

        texts = {
            r.doc_id: r.text.split(" ")
            for r in load_table(spark, SF0001, "documents").collect()
        }
        for r in curation_chunks(spark, SF0001).collect():
            toks = texts[r.doc_id]
            start = r.chunk_id * CHUNK_STRIDE
            expect = " ".join(toks[start : start + CHUNK_SIZE])
            assert r.chunk_digest == hashlib.md5(expect.encode()).hexdigest()


class TestDomainCapAndSampling:
    def test_domain_cap_bounds_and_determinism(self, spark):
        from posting_lines_spark.queries.curation_q import DOMAIN_CAP, curation_domain_cap

        rows = curation_domain_cap(spark, SF001).collect()
        per_source: dict[str, int] = {}
        for r in rows:
            per_source[r.source] = per_source.get(r.source, 0) + 1
            assert 1 <= r.rk <= DOMAIN_CAP
        assert all(n <= DOMAIN_CAP for n in per_source.values())
        again = curation_domain_cap(spark, SF001).collect()
        assert rows == again

    def test_weighted_sampling_prefers_heavier_docs(self, spark):
        """Priority sampling must skew the kept set toward long docs:
        the mean weight of winners should exceed the corpus mean."""
        from pyspark.sql import functions as F

        from posting_lines_spark.queries.curation_q import sample_weighted
        from posting_lines_spark.sources import load_table

        kept = sample_weighted(spark, SF001).collect()
        corpus_mean = (
            load_table(spark, SF001, "documents").agg(F.avg("n_chars")).collect()[0][0]
        )
        kept_mean = sum(r.weight for r in kept) / len(kept)
        assert kept_mean > corpus_mean


class TestSearch:
    def test_bm25_rewards_matches_and_brevity(self, spark):
        from posting_lines_spark.queries.search_q import QUERY_TERMS, search_bm25
        from posting_lines_spark.sources import load_table

        top = search_bm25(spark, SF001).collect()
        assert len(top) > 0
        # scores are positive, sorted desc, and every hit matches ≥1 term
        scores = [r.bm25_score for r in top]
        assert scores == sorted(scores, reverse=True)
        docs = {
            r.doc_id: r.text.split(" ")
            for r in load_table(spark, SF001, "documents").collect()
        }
        for r in top:
            assert r.n_terms_matched >= 1
            assert any(t in docs[r.doc_id] for t in QUERY_TERMS)
        # the top hit matches all query terms (on this corpus every term
        # is common enough that full matches exist)
        assert top[0].n_terms_matched == len(QUERY_TERMS)


class TestKMeans:
    def test_partition_is_total_and_inertia_improves(self, spark):
        from posting_lines_spark.queries.vectors_q import KM_K, sim_kmeans_ivf
        from posting_lines_spark.sources import load_table

        rows = sim_kmeans_ivf(spark, SF0001).collect()
        n_vecs = load_table(spark, SF0001, "embeddings").count()
        assert sum(r.n_members for r in rows) == n_vecs
        assert len(rows) <= KM_K
        # Lloyd iterations cannot increase total inertia: compare the
        # trained assignment against assigning every vector to the init
        # centroids (iteration 0): run the same SQL with c0 as the final
        # centroid set by truncating the CTE chain.
        from posting_lines_spark.functions.hashing import md5_int_spark
        from posting_lines_spark.queries.vectors_q import (
            _KM_LONG_SPARK,
            _kmeans_sql,
        )

        full = _kmeans_sql(
            _KM_LONG_SPARK, md5_int_spark("CAST(vec_id AS STRING)", salt="kmeans")
        )
        it0 = full.replace("a2 a JOIN", "a1 a JOIN")  # stats over round-1 assignment
        load_table(spark, SF0001, "embeddings").createOrReplaceTempView("embeddings")
        rows0 = spark.sql(it0).collect()
        inertia_trained = sum(float(r.mean_dist2) * r.n_members for r in rows)
        inertia_round1 = sum(float(r.mean_dist2) * r.n_members for r in rows0)
        assert inertia_trained <= inertia_round1 + 1e-9


class TestStreamStreamJoin:
    def test_attribution_pairs_match_batch_interval_join(self, spark):
        from pyspark.sql import functions as F

        from posting_lines_spark.queries.stream_q import stream_stream_join
        from posting_lines_spark.sources import load_table

        got = {(r.user_id, r.left_id, r.right_id) for r in stream_stream_join(spark, SF0001).collect()}
        ev = load_table(spark, SF0001, "events")
        a = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("u"), F.col("ts").alias("ta"), F.col("event_id").alias("la")
        )
        b = ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("u"), F.col("ts").alias("tb"), F.col("event_id").alias("rb")
        )
        want = {
            (r.u, r.la, r.rb)
            for r in a.join(b, "u")
            .filter((F.col("tb") >= F.col("ta")) & (F.col("tb") <= F.col("ta") + F.expr("INTERVAL 30 MINUTES")))
            .collect()
        }
        assert got == want


class TestChecksum:
    def test_checksum_is_order_independent_and_row_sensitive(self, spark):
        """Same rows in any order → identical digests; one changed row →
        both digest channels move."""
        from pyspark.sql import functions as F

        from posting_lines_spark.functions.hashing import md5_int_spark

        def digest(df):
            h = F.expr(md5_int_spark("concat(k, '|', v)"))
            row = df.select(h.alias("h")).agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(h)").alias("x"),
                F.sum(F.col("h") % 1000000007).alias("s"),
            ).collect()[0]
            return (row.n, row.x, row.s)

        rows = [(i, f"v{i}") for i in range(100)]
        df1 = spark.createDataFrame(rows, "k long, v string")
        df2 = spark.createDataFrame(list(reversed(rows)), "k long, v string").repartition(7)
        assert digest(df1) == digest(df2)
        mutated = [(i, "DIFFERENT" if i == 50 else f"v{i}") for i in range(100)]
        df3 = spark.createDataFrame(mutated, "k long, v string")
        d1, d3 = digest(df1), digest(df3)
        assert d1[0] == d3[0] and d1[1] != d3[1] and d1[2] != d3[2]


def test_leakage_safe_split_keeps_pairs_together(spark):
    """The guard's end-to-end property: every verified near-dup PAIR has
    both members in the same split (re-derived through the real pair
    pipeline, not the grp function), and the guard is load-bearing on
    this corpus (at least one multi-doc group exists)."""
    from pyspark.sql import functions as F

    from posting_lines_spark.functions.hashing import md5_int_spark
    from posting_lines_spark.operators import graph
    from posting_lines_spark.queries.curation_q import _split_expr
    from posting_lines_spark.queries.graph_q import _spark_pairs
    from tests.conftest import SF0001

    pairs = _spark_pairs(spark, SF0001).localCheckpoint(eager=False)
    assert pairs.count() > 0, "guard not load-bearing: no near-dup pairs"
    comp = graph.connected_components(pairs)
    assigned = comp.select(
        "node",
        F.expr(
            _split_expr(md5_int_spark("CAST(component AS STRING)", salt="split"))
        ).alias("split"),
    )
    a = assigned.select(F.col("node").alias("id_a"), F.col("split").alias("split_a"))
    b = assigned.select(F.col("node").alias("id_b"), F.col("split").alias("split_b"))
    straddling = (
        pairs.join(a, "id_a").join(b, "id_b").filter(F.col("split_a") != F.col("split_b"))
    )
    assert straddling.count() == 0, "a near-dup pair straddles splits"
