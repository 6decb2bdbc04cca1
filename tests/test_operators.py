"""Unit tests for the extension operators: dedup, similarity, temporal
joins, multimodal plumbing, sources."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from posting_lines_spark.operators import dedup, multimodal, temporal
from posting_lines_spark.operators import similarity as sim


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDedup:
    def test_exact_dedup_groups_copies(self, spark):
        df = docs_df(spark, [(1, "a b c"), (2, "a b c"), (3, "x y z")])
        out = {r.doc_id_kept: r.n_copies for r in dedup.exact_dedup(df, ["text"], "doc_id").collect()}
        assert out == {1: 2, 3: 1}

    def test_shingles(self, spark):
        df = docs_df(spark, [(1, "a b c d")])
        got = {r.shingle for r in dedup.shingles(df, "doc_id", "text", k=3).collect()}
        assert got == {"a b c", "b c d"}

    def test_identical_docs_same_signature_and_lsh_pair(self, spark):
        df = docs_df(spark, [(1, "the quick brown fox jumps over dogs"),
                             (2, "the quick brown fox jumps over dogs"),
                             (3, "completely different words here folks again")])
        sh = dedup.shingles(df, "doc_id", "text")
        sig = dedup.minhash_signature(sh, "doc_id", num_hashes=8)
        rows = {r.doc_id: tuple(r[i] for i in range(1, 9)) for r in sig.collect()}
        assert rows[1] == rows[2] != rows[3]
        pairs = dedup.lsh_candidate_pairs(sig, "doc_id", num_hashes=8, bands=4)
        verified = dedup.jaccard_verify(pairs, sh, "doc_id", threshold=0.99).collect()
        assert [(r.id_a, r.id_b, r.jaccard) for r in verified] == [(1, 2, 1.0)]

    def test_simhash_identical_zero_hamming(self, spark):
        df = docs_df(spark, [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
                             (3, "epsilon zeta eta theta iota kappa")])
        sig = dedup.simhash(df, "doc_id", "text", bits=32)
        pairs = dedup.simhash_near_pairs(sig, "doc_id", bits=32, max_hamming=3).collect()
        assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(1, 2, 0)]

    def test_shingles_short_doc_empty_not_crash(self, spark):
        # docs with < k tokens must shingle to [] (DuckDB range(1,1) parity),
        # not raise INVALID_ARRAY_INDEX_IN_ELEMENT_AT from sequence(1, 0)
        df = docs_df(spark, [(1, "one two"), (2, "solo"), (3, "a b c d")])
        got = dedup.shingles(df, "doc_id", "text", k=3).collect()
        assert {r.doc_id for r in got} == {3}
        sig = dedup.minhash_signature(
            dedup.shingles(df, "doc_id", "text", k=3, distinct=False), "doc_id", 4
        ).collect()
        assert {r.doc_id for r in sig} == {3}

    def test_prefix_filter_join_equals_brute_force(self, spark):
        """PPJoin candidates must recover EVERY pair with Jaccard ≥ t —
        verified against the all-pairs join on a corpus with heavy
        boilerplate overlap (the case where prefixes prune the most)."""
        from tests.conftest import SF0001

        from posting_lines_spark.sources import load_table

        t = 0.5
        sh = dedup.shingles(
            load_table(spark, SF0001, "documents"), "doc_id", "text"
        ).localCheckpoint(eager=False)
        exact = dedup.jaccard_verify(
            dedup.prefix_filter_candidates(sh, "doc_id", t), sh, "doc_id", t
        )
        a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
        b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
        all_pairs = (
            a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        brute = dedup.jaccard_verify(all_pairs, sh, "doc_id", t)
        got = {(r.id_a, r.id_b, r.n_common) for r in exact.collect()}
        want = {(r.id_a, r.id_b, r.n_common) for r in brute.collect()}
        assert got == want

    def test_prefix_filter_prunes_boilerplate_shingles(self, spark):
        """The hottest shingle must not appear in any prefix when every
        doc also has rarer shingles — the fanout bound in action."""
        boiler = "x y z"  # shared 3-token boilerplate → 1 hot shingle
        rows = [(i, f"{boiler} u{i} v{i} w{i}") for i in range(40)]
        sh = dedup.shingles(docs_df(spark, rows), "doc_id", "text", k=3)
        from posting_lines_spark.operators.dedup import prefix_filter_candidates

        # reconstruct the prefix internally: candidates must be empty
        # because each doc's rare shingles are unique to it
        cand = prefix_filter_candidates(sh, "doc_id", 0.5)
        assert cand.count() == 0

    def test_hot_band_salting_is_output_equivalent(self, spark):
        # 120 identical docs (one giant band bucket per band, width 120 >
        # hot_width 16) + a distinct pair: the blocked self-join must
        # produce exactly the plain join's candidate set
        rows = [(i, "the same boilerplate sentence repeated everywhere") for i in range(120)]
        rows += [(200, "rare unique words one"), (201, "rare unique words one")]
        sig = dedup.minhash_signature(
            dedup.shingles(docs_df(spark, rows), "doc_id", "text", distinct=False),
            "doc_id",
            num_hashes=8,
        )
        plain = {
            (r.id_a, r.id_b)
            for r in dedup.lsh_candidate_pairs(sig, "doc_id", 8, 4).collect()
        }
        salted = {
            (r.id_a, r.id_b)
            for r in dedup.lsh_candidate_pairs(sig, "doc_id", 8, 4, hot_width=16).collect()
        }
        assert salted == plain
        assert (120 * 119) // 2 + 1 == len(plain)

    def test_stop_shingle_cap_bounds_boilerplate_fanout(self, spark):
        # 10 docs sharing ONLY a boilerplate footer shingle: uncapped, the
        # inverted index fans the footer out to 45 candidate pairs; with
        # the cap the footer is dropped and no candidates survive, while a
        # genuine near-dup pair (docs 100/101, all shingles shared) stays.
        rows = [(i, f"u{i}a u{i}b u{i}c legal footer text") for i in range(10)]
        rows += [(100, "alpha beta gamma delta"), (101, "alpha beta gamma delta")]
        sh = dedup.shingles(docs_df(spark, rows), "doc_id", "text", k=3)
        capped = dedup.stop_shingle_cap(sh, "doc_id", max_df=5)
        pairs = dedup.jaccard_verify(
            capped.select(F.col("doc_id").alias("id_a"), "shingle")
            .join(capped.select(F.col("doc_id").alias("id_b"), "shingle"), "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct(),
            capped,
            "doc_id",
            threshold=0.01,
        ).collect()
        assert [(p.id_a, p.id_b) for p in pairs] == [(100, 101)]
        # uncapped, the boilerplate shingle alone creates 45 candidates
        uncapped_cands = (
            sh.select(F.col("doc_id").alias("id_a"), "shingle")
            .join(sh.select(F.col("doc_id").alias("id_b"), "shingle"), "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
            .count()
        )
        assert uncapped_cands == 45 + 1

    def test_simhash_long_doc_matches_unpacked_python(self, spark):
        # 1500 distinct tokens/doc overflowed the old 10-bit vote lanes;
        # verify the packed 20-bit computation against an unpacked replay.
        import hashlib

        bits, toks = 16, [f"tok{i}" for i in range(1500)]
        df = docs_df(spark, [(1, " ".join(toks))])
        got = dedup.simhash(df, "doc_id", "text", bits=bits).collect()[0].simhash
        hashes = [int(hashlib.md5(f"simhash|{t}".encode()).hexdigest()[:15], 16) for t in toks]
        want = sum(
            1 << b
            for b in range(bits)
            if 2 * sum((h >> b) & 1 for h in hashes) > len(toks)
        )
        assert got == want


class TestSimilarity:
    def test_duplicate_vector_is_top1(self, spark):
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0]), (3, [0.0, 1.0, 0.0]), (4, [0.5, 0.5, 0.0])],
            "vec_id long, embedding array<float>",
        )
        q = emb.filter("vec_id = 1")
        top = sim.brute_force_topk(emb, q, k=2).collect()
        assert top[0].vec_id == 2 and top[0].rank == 1
        assert abs(top[0].cosine - 1.0) < 1e-12

    def test_multiprobe_improves_recall(self, spark):
        from posting_lines_spark.sources import load_table
        from tests.conftest import SF0001

        emb = load_table(spark, SF0001, "embeddings")
        queries = emb.filter(F.col("vec_id") < 20)
        planes = sim.hyperplanes(spark, num_planes=6, dims=64)
        truth = {
            (r.query_id, r.vec_id)
            for r in sim.brute_force_topk(emb, queries, k=10).collect()
        }

        def recall(probes):
            got = {
                (r.query_id, r.vec_id)
                for r in sim.ivf_topk(
                    emb, queries, planes, k=10, probes=probes, num_planes=6
                ).collect()
            }
            return len(got & truth) / len(truth)

        r0, r1, r2 = recall(0), recall(1), recall(2)
        # deterministic data + deterministic planes → stable values
        assert r1 > r0, f"multi-probe recall {r1} not above single-probe {r0}"
        assert r2 > r1, f"Hamming-2 recall {r2} not above Hamming-1 {r1}"

    def test_ivf_bucket_join_contains_duplicate(self, spark):
        emb = spark.createDataFrame(
            [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2), 0.5]) for i in range(12)]
            + [(100, [1.0, 0.0, 0.0, 0.5])],
            "vec_id long, embedding array<float>",
        )
        planes = sim.hyperplanes(spark, num_planes=3, dims=4)
        q = emb.filter("vec_id = 100")
        out = sim.ivf_topk(emb, q, planes, k=5).collect()
        assert out, "query bucket should not be empty"
        assert out[0].vec_id in (0, 3, 6, 9)  # identical-direction vectors


class TestTemporal:
    def _events(self, spark):
        base = datetime.datetime(2024, 1, 1)
        mk = lambda s: base + datetime.timedelta(seconds=s)
        left = spark.createDataFrame(
            [(1, 1, mk(10)), (2, 1, mk(100)), (3, 2, mk(50))], "event_id long, user_id long, ts timestamp"
        )
        right = spark.createDataFrame(
            [(11, 1, mk(5), 1.5), (12, 1, mk(60), 2.5), (13, 3, mk(1), 9.9)],
            "event_id long, user_id long, ts timestamp, value double",
        )
        return left, right

    def test_as_of_join_latest_prior(self, spark):
        left, right = self._events(spark)
        out = {r.event_id: r.asof_value for r in
               temporal.as_of_join(left, right, "user_id", "ts", ["value"]).collect()}
        # event 1 (t=10) ← right t=5 (1.5); event 2 (t=100) ← right t=60 (2.5);
        # event 3 (user 2) has no right rows → NULL
        assert out == {1: 1.5, 2: 2.5, 3: None}

    def test_as_of_join_tolerance(self, spark):
        left, right = self._events(spark)
        out = {r.event_id: r.asof_value for r in
               temporal.as_of_join(left, right, "user_id", "ts", ["value"],
                                   tolerance_us=10_000_000).collect()}
        # event 1: 5s old → within 10s tolerance; event 2: 40s old → dropped
        assert out == {1: 1.5, 2: None, 3: None}

    def test_as_of_join_left_column_collision_preserved(self, spark):
        # a left column named like an entry of right_cols must come back
        # untouched (the old implementation clobbered it to NULL)
        base = datetime.datetime(2024, 1, 1)
        mk = lambda s: base + datetime.timedelta(seconds=s)
        left = spark.createDataFrame(
            [(1, 1, mk(10), 111.0)], "event_id long, user_id long, ts timestamp, value double"
        )
        right = spark.createDataFrame(
            [(1, mk(5), 1.5)], "user_id long, ts timestamp, value double"
        )
        row = temporal.as_of_join(left, right, "user_id", "ts", ["value"]).collect()[0]
        assert row.value == 111.0 and row.asof_value == 1.5

    def test_range_join_half_open(self, spark):
        base = datetime.datetime(2024, 1, 1)
        mk = lambda s: base + datetime.timedelta(seconds=s)
        left = spark.createDataFrame([(1, mk(0))], "lid long, lts timestamp")
        right = spark.createDataFrame(
            [(10, mk(0)), (11, mk(59)), (12, mk(60)), (13, mk(-1))], "rid long, rts timestamp"
        )
        out = temporal.range_join_bucketed(left, right, "lts", "rts", 0, 60_000_000)
        got = sorted(r.rid for r in out.collect())
        assert got == [10, 11]  # [lower, upper): 60s excluded, -1s excluded


class TestMultimodal:
    def test_feature_extraction_matches_bytes(self, spark):
        df = spark.createDataFrame([(1, "hi"), (2, "abc")], "doc_id long, text string")
        media = multimodal.attach_payload(df)
        feats = {r.doc_id: (r.n_bytes, r.first_byte, r.last_byte)
                 for r in multimodal.extract_features(media).collect()}
        assert feats == {1: (2, ord("h"), ord("i")), 2: (3, ord("a"), ord("c"))}

    def test_decode_mode_is_stubbed(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(NotImplementedError):
            multimodal.extract_features(multimodal.attach_payload(df), mode="decode")


class TestSources:
    def test_csv_roundtrip(self, spark, tmp_path):
        from posting_lines_spark.sources import load_csv

        p = str(tmp_path / "t.csv")
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string").write.option(
            "header", "true"
        ).csv(p)
        back = load_csv(spark, p, schema="id long, s string")
        assert sorted((r.id, r.s) for r in back.collect()) == [(1, "a"), (2, "b")]


class TestSkew:
    def test_salted_join_equals_plain_join(self, spark):
        from posting_lines_spark.operators.skew import salted_join

        left = spark.createDataFrame(
            [(1, i) for i in range(100)] + [(2, 0), (3, 7)], "k long, payload long"
        )
        right = spark.createDataFrame([(1, "hot"), (2, "warm"), (4, "unused")], "k long, tag string")
        plain = left.join(right, "k").select("k", "payload", "tag")
        salted = salted_join(left, right, "k", salt_n=4).select("k", "payload", "tag")
        assert plain.exceptAll(salted).count() == 0
        assert salted.exceptAll(plain).count() == 0


class TestBucketing:
    def test_bucketed_join_avoids_shuffle(self, spark, tmp_path):
        """bucketBy co-locates join keys at write time so the later join
        plans without a shuffle on either side (SURVEY.md P6-adjacent;
        pyspark guide 'Partitioning & shuffle')."""
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
        try:
            a = spark.range(0, 10000).withColumnRenamed("id", "k")
            b = spark.range(0, 10000).withColumnRenamed("id", "k")
            a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_a")
            b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_b")
            joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan[:2000]
            assert joined.count() == 10000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
            spark.sql("DROP TABLE IF EXISTS bkt_a")
            spark.sql("DROP TABLE IF EXISTS bkt_b")


class TestGraph:
    def test_connected_components_chain_and_triangle(self, spark):
        from posting_lines_spark.operators.graph import connected_components, dedup_groups

        # chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
            "id_a long, id_b long",
        )
        comp = {r.node: r.component for r in connected_components(edges).collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
        groups = {r.component: (r.n_members, r.survivor, r.n_drops)
                  for r in dedup_groups(connected_components(edges)).collect()}
        assert groups == {1: (4, 1, 3), 10: (3, 10, 2), 20: (2, 20, 1)}


def test_stream_stream_join_multibatch_watermark_eviction(spark, tmp_path):
    """Pin the eviction semantics the stream-stream join documents — and
    their exact boundary, measured on the engine: with
    maxFilesPerTrigger=1 each source file is its own micro-batch. The
    watermark advanced by batch 1 evicts join state, so a late click
    arriving in batch 2 cannot match its purchase arriving in batch 3
    (cross-batch match against evicted state) — that drop is the bounded-
    state guarantee. NOTE a late PAIR arriving together in ONE batch
    still matches (symmetric hash join probes same-batch rows before
    eviction; verified in round 3) — cross-batch eviction, not late-input
    filtering, is the contract. The batch interval join would emit all
    four pairs; streaming must emit exactly three."""
    import os
    import time

    from posting_lines_spark.streaming import incremental

    def ev(eid, uid, etype, minute):
        return (eid, uid, etype, datetime.datetime(2026, 1, 1, 0, 0) + datetime.timedelta(minutes=minute))

    schema = "event_id long, user_id long, event_type string, ts timestamp"
    # batch 1: pairs (1,2), (3,4); watermark (10 min) after it ≈ 01:50
    # (min over sides: clicks max 02:00, purchases max 02:04)
    batches = [
        [ev(1, 10, "click", 0), ev(2, 10, "purchase", 2),
         ev(3, 11, "click", 120), ev(4, 11, "purchase", 124)],
        # batch 2: click 5 @00:01 is far behind the watermark (its state
        # is evicted at batch end); click 7 @02:30 is on time
        [ev(5, 12, "click", 1), ev(7, 13, "click", 150)],
        # batch 3: purchase 6 @00:03 finds click 5's state gone → no
        # match; purchase 8 @02:32 matches retained click 7
        [ev(6, 12, "purchase", 3), ev(8, 13, "purchase", 152)],
    ]
    src = str(tmp_path / "src")
    seen: set[str] = set()
    base_t = time.time()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).repartition(1).write.mode("append").parquet(src)
        # FileStreamSource replays files oldest-mtime-first: pin each
        # write's new part files to a strictly increasing mtime
        for name in os.listdir(src):
            p = os.path.join(src, name)
            if name.endswith(".parquet") and name not in seen:
                os.utime(p, (base_t + 10 * i, base_t + 10 * i))
                seen.add(name)

    res = incremental.stream_stream_join_append_parquet(
        spark,
        None,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        horizon="5 minutes",
        watermark="10 minutes",
        src_dir=src,
        max_files_per_trigger=1,
    )
    pairs = {(r.left_id, r.right_id) for r in res.collect()}
    assert pairs == {(1, 2), (3, 4), (7, 8)}, pairs  # (5, 6) dropped by eviction


def test_stream_quantile_hist_batching_invariance(spark, tmp_path):
    """The mergeable-sketch claim, pinned end to end: because each
    micro-batch appends a PARTIAL histogram and the merge is plain
    integer addition (exact, associative, commutative), the final
    quantile rows must be BIT-IDENTICAL no matter how the stream was
    batched. Drain the same values as 1 micro-batch and as 8, compare
    the full result rows bit-for-bit (round-3 verdict #9)."""
    from pyspark.sql import functions as F

    from posting_lines_spark.queries.stream_q import _SQH_BIN, _sqh_tail
    from posting_lines_spark.sources import load_table
    from tests.conftest import SF0001

    events = load_table(spark, SF0001, "events")
    events.createOrReplaceTempView("events")

    def drain(n_files: int) -> list:
        src = str(tmp_path / f"src_{n_files}")
        out = str(tmp_path / f"out_{n_files}")
        ckpt = str(tmp_path / f"ckpt_{n_files}")
        events.select("value").repartition(n_files).write.parquet(src)
        schema = spark.read.parquet(src).schema

        def per_batch(batch_df, epoch_id):
            (
                batch_df.selectExpr(f"{_SQH_BIN} AS bin")
                .groupBy("bin")
                .agg(F.count(F.lit(1)).alias("n"))
                .write.mode("append")
                .parquet(out)
            )

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(per_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_batches = spark.read.parquet(out).groupBy("bin").count().agg(
            F.max("count")
        ).first()[0]
        spark.read.parquet(out).createOrReplaceTempView("sqh_partials")
        rows = spark.sql(
            _sqh_tail(
                "SELECT bin, CAST(sum(n) AS BIGINT) AS n "
                "FROM sqh_partials GROUP BY bin"
            )
        ).collect()
        return n_batches, [tuple(r) for r in rows]

    n1, one_batch = drain(1)
    n8, eight_batches = drain(8)
    assert n1 == 1 and n8 > 1, "the 8-file drain must really multi-batch"
    assert one_batch == eight_batches  # bit-for-bit, incl. the bound flag


def test_cw_minhash_sql_matches_python_mirror(spark):
    """The Spark-side CW mix (limbs from md5, integer mix) must equal the
    pure-Python mirror bit-for-bit — the same property the DuckDB oracle
    relies on, pinned engine-side."""
    import hashlib

    from posting_lines_spark.functions.hashing import (
        CW_MOD,
        cw_constants,
        cw_mix_sql,
        md5_limb_spark,
    )

    toks = ["alpha beta", "x", "", "Straße-ascii-not", "VESSEL_42"]
    df = spark.createDataFrame([(t,) for t in toks], "shingle string")
    d = df.withColumn("__d", F.expr("md5(concat('mh|', shingle))")).withColumns(
        {f"__l{i}": F.expr(md5_limb_spark("__d", i)) for i in range(4)}
    )
    limbs = [f"__l{i}" for i in range(4)]
    out = d.select(
        "shingle", *[F.expr(cw_mix_sql(limbs, j)).alias(f"h{j}") for j in range(12)]
    ).collect()

    for row in out:
        dig = hashlib.md5(f"mh|{row.shingle}".encode()).hexdigest()
        lm = [int(dig[i * 8 : (i + 1) * 8], 16) for i in range(4)]
        for j in range(12):
            a = cw_constants(j)
            want = (sum(a[i] * lm[i] for i in range(4)) + j) % CW_MOD
            assert row[f"h{j}"] == want, (row.shingle, j)


class TestPQ:
    def test_pq_full_rerank_equals_brute_force(self, spark):
        """With rerank >= n the ADC stage is a pure candidate pass-through
        and the exact re-rank must reproduce brute force bit-for-bit —
        pins that PQ's join/fold plumbing loses no candidates and scores
        with the same cosine kernel (data-independent property)."""
        from posting_lines_spark.queries.vectors_q import PQ_KPRIME, PQ_M, PQ_SUBDIM
        from posting_lines_spark.sources import load_table
        from tests.conftest import SF0001

        emb = load_table(spark, SF0001, "embeddings")
        n = emb.count()
        queries = emb.filter(F.col("vec_id") < 5)
        subs = sim.pq_subvectors(emb, PQ_M, PQ_SUBDIM)
        codebook = subs.filter(F.col("vec_id") < PQ_KPRIME).select(
            "m", F.col("vec_id").alias("code"), F.col("sub").alias("cent")
        )
        codes = sim.pq_encode(subs, codebook)
        dtable = (
            subs.filter(F.col("vec_id") < 5)
            .withColumnRenamed("vec_id", "query_id")
            .join(F.broadcast(codebook), "m")
            .select("query_id", "m", "code",
                    F.expr(sim.l2sq_spark("sub", "cent")).alias("qd"))
        )
        got = sorted(
            (r.query_id, r.vec_id, r.cosine, r.rank)
            for r in sim.pq_adc_topk(codes, dtable, emb, queries, 10, rerank=n).collect()
        )
        want = sorted(
            (r.query_id, r.vec_id, r.cosine, r.rank)
            for r in sim.brute_force_topk(emb, queries, k=10).collect()
        )
        assert got == want

    def test_pq_beats_random_candidate_floor(self, spark):
        """ADC recall at a 10% rerank budget must clearly beat the 10%
        random-candidate expectation (measured ~5× above it; asserted
        loosely so the pin survives testdata regeneration)."""
        from posting_lines_spark.queries.vectors_q import PQ_KPRIME, PQ_M, PQ_SUBDIM
        from posting_lines_spark.sources import load_table
        from tests.conftest import SF0001

        emb = load_table(spark, SF0001, "embeddings")
        queries = emb.filter(F.col("vec_id") < 20)
        truth = {
            (r.query_id, r.vec_id)
            for r in sim.brute_force_topk(emb, queries, k=10).collect()
        }
        subs = sim.pq_subvectors(emb, PQ_M, PQ_SUBDIM)
        codebook = subs.filter(F.col("vec_id") < PQ_KPRIME).select(
            "m", F.col("vec_id").alias("code"), F.col("sub").alias("cent")
        )
        codes = sim.pq_encode(subs, codebook)
        dtable = (
            subs.filter(F.col("vec_id") < 20)
            .withColumnRenamed("vec_id", "query_id")
            .join(F.broadcast(codebook), "m")
            .select("query_id", "m", "code",
                    F.expr(sim.l2sq_spark("sub", "cent")).alias("qd"))
        )
        got = {
            (r.query_id, r.vec_id)
            for r in sim.pq_adc_topk(codes, dtable, emb, queries, 10, rerank=50).collect()
        }
        recall = len(got & truth) / len(truth)
        assert recall > 0.25, f"PQ recall {recall} not above the random floor"


def test_minhash_index_stream_batching_invariance(spark, tmp_path):
    """Continuous index maintenance must be batching-invariant: every
    pair is discovered exactly once (when its later member arrives), so
    draining the corpus as 1 file or as 5 files yields the SAME verified
    pair rows bit-for-bit — and both equal the one-shot batch pipeline."""
    from posting_lines_spark.operators import dedup
    from posting_lines_spark.queries.dedup_q import (
        BANDS,
        JACCARD_T,
        NEAR_BASE_SPARK,
        NUM_HASHES,
    )
    from posting_lines_spark.sources import load_table
    from posting_lines_spark.streaming import incremental
    from tests.conftest import SF0001

    load_table(spark, SF0001, "documents").createOrReplaceTempView("documents")
    base = spark.sql(NEAR_BASE_SPARK).filter(F.col("doc_id") % 7 < 2)

    def drain(n_files: int, tag: str):
        src = str(tmp_path / f"src_{tag}")
        for k in range(n_files):
            base.filter(F.col("doc_id") % n_files == k).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        pairs = incremental.minhash_index_stream(
            spark,
            src,
            str(tmp_path / f"state_{tag}"),
            str(tmp_path / f"ckpt_{tag}"),
            NUM_HASHES,
            BANDS,
            JACCARD_T,
        )
        return sorted((r.id_a, r.id_b, r.n_common, r.jaccard) for r in pairs.collect())

    one, five = drain(1, "one"), drain(5, "five")
    assert one == five and len(one) > 0

    sig = dedup.minhash_signature(
        dedup.shingles(base, "doc_id", "text", distinct=False), "doc_id", NUM_HASHES
    )
    cand = dedup.lsh_candidate_pairs(sig, "doc_id", NUM_HASHES, BANDS)
    sh = dedup.shingles(base, "doc_id", "text")
    batch = sorted(
        (r.id_a, r.id_b, r.n_common, r.jaccard)
        for r in dedup.jaccard_verify(cand, sh, "doc_id", JACCARD_T).collect()
    )
    assert one == batch


def test_cdc_chunking_is_insertion_tolerant():
    """The content-defined property, pinned: inserting one byte mid-doc
    re-chunks only the neighborhood of the edit — the digest multisets
    before/after differ in a handful of chunks, not everything after the
    edit (fixed-offset chunking would shift every later chunk). Runs the
    same SQL the oracle uses, on DuckDB only (no session needed)."""
    import duckdb

    from posting_lines_spark.functions.hashing import md5_int_duck
    from posting_lines_spark.queries.stream_q import _CDC_GRAMS_DUCK, _cdc_sql

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW base AS SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') WHERE doc_id = 7"
    )
    # per-chunk digests (not the registered summary): reuse the chain up
    # to `content` by rewriting the tail
    chain = _cdc_sql(_CDC_GRAMS_DUCK, md5_int_duck("gram", salt="cdc"))
    chain = chain[: chain.index("uniq AS")] + "x AS (SELECT 1)\nSELECT digest FROM content"

    def digests(view_sql: str) -> list[str]:
        con.sql(f"CREATE OR REPLACE VIEW documents AS {view_sql}")
        return sorted(r[0] for r in con.sql(chain).fetchall())

    before = digests("SELECT * FROM base")
    after = digests(
        "SELECT doc_id, substr(text, 1, 200) || 'X' || substr(text, 201) AS text FROM base"
    )
    assert len(before) > 6, "doc too short to exercise chunking"
    from collections import Counter

    diff = Counter(before) - Counter(after) | Counter(after) - Counter(before)
    changed = sum(diff.values())
    assert changed <= 6, (
        f"insertion changed {changed} chunks of {len(before)} — boundaries "
        "are not content-defined"
    )
    # and most chunks survived verbatim
    assert len(Counter(before) & Counter(after)) >= len(before) - 4


def test_stateful_attribution_state_writes_scale_with_touched_users(spark):
    """Pins the scale property of stream_attribution_stateful (round-4
    verdict #7): the state store persists per-batch DELTAS, so each
    micro-batch's numRowsUpdated is bounded by the users that batch
    actually TOUCHED — never the full user corpus the foreachBatch twin
    rewrites every epoch. Slices are mtime-ordered, so progress batch i
    corresponds to slice file i."""
    import os

    from posting_lines_spark.queries.stream_q import (
        _ATTR_TOUCH_TYPES,
        _attr_stateful_run,
    )
    from posting_lines_spark.sources import load_table
    from tests.conftest import SF0001

    _credits, progress = _attr_stateful_run(spark, SF0001)
    batches = [
        p for p in progress if p.get("stateOperators") and p["numInputRows"] > 0
    ]
    assert len(batches) == 4, f"expected 4 slice batches, got {len(batches)}"

    events = load_table(spark, SF0001, "events")
    total_users = events.select("user_id").distinct().count()
    # per-slice touched-user counts, in slice (mtime) order
    from posting_lines_spark.fixtures import _CACHE

    # Match the FULL cache key (name, sf_dir, stamp): another test
    # materializing the attribution fixture at a different SF in the same
    # process must not satisfy this lookup (ADVICE r5).
    src = next(
        v
        for k, v in _CACHE.items()
        if k[0] == "attr_events_src" and k[1] == SF0001
    )
    files = sorted(
        (os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    assert len(files) == 4
    touched = [
        spark.read.parquet(f)
        .filter(F.col("event_type").isin(list(_ATTR_TOUCH_TYPES)))
        .select("user_id")
        .distinct()
        .count()
        for f in files
    ]
    updated = [b["stateOperators"][0]["numRowsUpdated"] for b in batches]
    for i, (u, t) in enumerate(zip(updated, touched)):
        assert u <= t, f"batch {i}: {u} state writes > {t} touched users"
    # and the corpus-shaped cost the twin avoids: later batches must NOT
    # rewrite all users (only first-touch movers update after batch 0)
    assert sum(updated) < 4 * total_users
    assert updated[0] > 0


def test_stateful_attribution_recovers_after_restart(spark):
    """Crash/resume path of the state store (round-5 VERDICT item 5):
    drain slices 0-1, STOP the query (checkpoint + per-user state
    persisted), append slices 2-3, then start a brand-new query object
    from the same checkpoint. The resumed query must reload the per-user
    (first,last) carry from the state store — a purchase in slice 2 by a
    user whose only touches were in slice 0 still credits that touch —
    so the final ledger equals the one-shot batch query exactly."""
    import os
    import shutil

    from pyspark.sql.streaming.state import GroupStateTimeout

    from posting_lines_spark.fixtures import scratch_dir
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.stream_q import (
        _attr_ledger,
        _attr_state_update,
        _attr_write_slices,
    )
    from posting_lines_spark.sources import load_table
    from tests.conftest import SF0001

    events = load_table(spark, SF0001, "events")
    full = scratch_dir("pls_attrrec_full_")
    _attr_write_slices(events)(full)
    slices = sorted(
        (os.path.join(full, f) for f in os.listdir(full) if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    assert len(slices) == 4

    src = scratch_dir("pls_attrrec_src_")
    out = scratch_dir("pls_attrrec_out_")
    ckpt = scratch_dir("pls_attrrec_ckpt_")
    schema = spark.read.parquet(full).schema

    def drain_available() -> None:
        credits = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .groupBy("user_id")
            .applyInPandasWithState(
                _attr_state_update,
                outputStructType="eff_first string, eff_last string, value double",
                stateStructType="f string, l string",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        q = (
            credits.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # phase 1: slices 0-1 visible; query drains them and terminates
    for f in slices[:2]:
        shutil.copy2(f, os.path.join(src, os.path.basename(f)))
    drain_available()
    # phase 2: slices 2-3 appear; a NEW query resumes from the checkpoint
    # (copy2 preserves the forced mtimes, so drain order is still 2, 3)
    for f in slices[2:]:
        shutil.copy2(f, os.path.join(src, os.path.basename(f)))
    drain_available()

    purch = spark.read.schema(
        "eff_first string, eff_last string, value double"
    ).parquet(out)
    got = [tuple(r) for r in _attr_ledger(purch).collect()]
    want = [
        tuple(r)
        for r in load_all()["attribution_touch_models"].fn(spark, SF0001).collect()
    ]
    assert got == want
