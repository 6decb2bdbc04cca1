"""Round-8 regression tests: ADVICE fixes (BPE back-to-back greedy
merges, degenerate-divisor nullif guards, pagerank empty-seed guard)."""

from __future__ import annotations

from collections import Counter

import pytest

from tests.conftest import SF0001


def _greedy_bpe_python(word_freqs, rounds):
    """Sennrich alg. 1 reference replay: greedy left-to-right
    non-overlapping merge, argmax under (count DESC, pair ASC)."""
    seqs = {w: tuple(w) for w, _ in word_freqs}
    freq = dict(word_freqs)
    out = []
    for k in range(1, rounds + 1):
        pairs: Counter = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq[w]
        (pa, pb), n = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]}|{kv[0][1]}")
        )
        out.append((k, f"{pa}|{pb}", n))
        merged = pa + pb
        new_seqs = {}
        for w, syms in seqs.items():
            acc = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pa and syms[i + 1] == pb:
                    acc.append(merged)
                    i += 2
                else:
                    acc.append(syms[i])
                    i += 1
            new_seqs[w] = tuple(acc)
        seqs = new_seqs
    return out


def test_bpe_back_to_back_pair_merges_greedily(spark):
    """The round-7 ADVICE medium finding: when the winning pair abuts
    itself ('aaaa' with pair (a,a), 'abab' with (a,b)), the single-
    sentinel replace dropped every second merge. The per-symbol-wrapped
    representation must match the pure-Python greedy replay exactly —
    this corpus is built so rounds 2–3 DIVERGE under the old semantics
    ('aaaa' old → [aa,a,a]; greedy → [aa,aa])."""
    from posting_lines_spark.queries.text_q import BPE_ROUNDS, _bpe_train

    word_freqs = [("aaaa", 10), ("abab", 6), ("banana", 4), ("aerie", 3)]
    w0 = spark.createDataFrame(word_freqs, "word string, freq long")
    got = [
        (r["round"], r["merged_pair"], r["n_occ"])
        for r in _bpe_train(spark, w0).collect()
    ]
    want = _greedy_bpe_python(word_freqs, BPE_ROUNDS)
    assert got == want
    # the corpus actually exercises the back-to-back path: round 1 must
    # pick (a,a) and round 2 must see the (aa,aa) pair that only exists
    # under true greedy semantics
    assert want[0][1] == "a|a"
    assert any(p == "aa|aa" for _, p, _ in want)


def test_bpe_oracle_matches_spark_on_documents(spark, duck):
    """Engine vs DuckDB oracle on the real sf0.001 corpus after the
    representation change (both sides moved together)."""
    from posting_lines_spark.queries import load_all

    reg = load_all()["text_bpe_merge_rounds"]
    got = [
        (r["round"], r["merged_pair"], r["n_occ"])
        for r in reg.fn(spark, SF0001).collect()
    ]
    want = [tuple(r) for r in duck.execute(reg.oracle).fetchall()]
    assert got == [(int(a), b, int(c)) for a, b, c in want]


def test_mann_kendall_constant_series_is_null(spark):
    """A fully tied daily-mean series → var18 = 0 → z_mk must be NULL
    on both engines (nullif guard), not a Spark ANSI divide error."""
    import duckdb

    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.temporal_q import _mann_kendall_sql

    reg = load_all()["timeseries_mann_kendall"]
    spark.sql(
        """
SELECT CAST(id AS BIGINT) AS event_id,
       CAST(1000 + id AS BIGINT) AS user_id,
       'click' AS event_type,
       CAST(100 AS BIGINT) AS value,
       timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,CAST(id % 7 AS INT),0,0,0) AS ts,
       CAST(NULL AS STRING) AS payload
FROM range(0, 200) t(id)
"""
    ).createOrReplaceTempView("events")
    # run the engine-side SQL directly against the degenerate view
    rows = spark.sql(_mann_kendall_sql("unix_micros(ts)")).collect()
    assert len(rows) > 0
    assert all(r["z_mk"] is None for r in rows)
    con = duckdb.connect()
    con.execute(
        """
CREATE VIEW events AS
SELECT CAST(id AS BIGINT) AS event_id,
       CAST(1000 + id AS BIGINT) AS user_id,
       'click' AS event_type,
       CAST(100 AS BIGINT) AS value,
       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (id % 7) DAY AS ts,
       CAST(NULL AS VARCHAR) AS payload
FROM range(0, 200) t(id)
"""
    )
    drows = con.execute(reg.oracle).fetchall()
    assert len(drows) == len(rows)
    zcol = [d[0] for d in con.description].index("z_mk")
    assert all(d[zcol] is None for d in drows)


def test_kappa_one_class_corpus_is_null(spark):
    """Both raters constant → pe = 1 → kappa NULL on both engines."""
    import duckdb

    from posting_lines_spark.queries import load_all

    reg = load_all()["stats_cohens_kappa"]
    mk = """
SELECT CAST(id AS BIGINT) AS event_id,
       CAST(1 AS BIGINT) AS user_id,
       'view' AS event_type,
       CAST(1 AS BIGINT) AS value,
       TIMESTAMP '2024-01-01 00:00:00' AS ts,
       CAST(NULL AS {s}) AS payload
FROM range(0, 50) t(id)
"""
    spark.sql(mk.format(s="STRING")).createOrReplaceTempView("events")
    row = spark.sql(reg.oracle).collect()[0]
    assert row["kappa"] is None and row["pe"] == 1.0
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS " + mk.format(s="VARCHAR"))
    drow = con.execute(reg.oracle).fetchone()
    cols = [d[0] for d in con.description]
    assert drow[cols.index("kappa")] is None


def test_distribution_distance_empty_cohort_no_error(spark):
    """One event_id-parity cohort empty → no Spark ANSI divide error,
    and both engines agree on the degenerate row (the shared SQL is
    engine-portable, so run it on both)."""
    import duckdb

    from posting_lines_spark.queries import load_all

    reg = load_all()["stats_distribution_distance"]
    mk = """
SELECT CAST(id * 2 AS BIGINT) AS event_id,
       CAST(1 AS BIGINT) AS user_id,
       CASE WHEN id % 3 = 0 THEN 'view' ELSE 'click' END AS event_type,
       CAST(1 AS BIGINT) AS value,
       TIMESTAMP '2024-01-01 00:00:00' AS ts,
       CAST(NULL AS {s}) AS payload
FROM range(0, 40) t(id)
"""
    spark.sql(mk.format(s="STRING")).createOrReplaceTempView("events")
    row = spark.sql(reg.oracle).collect()[0]
    assert row["n_b"] == 0
    assert row["tv_distance"] is None
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS " + mk.format(s="VARCHAR"))
    drow = con.execute(reg.oracle).fetchone()
    cols = [d[0] for d in con.description]
    for c in ("n_a", "n_b", "tv_distance", "hellinger", "js_nats"):
        assert drow[cols.index(c)] == row[c], c


def test_pagerank_empty_seed_set_raises(spark):
    """seeds disjoint from the graph → clear ValueError, not a bare
    ZeroDivisionError from PR_SCALE // k."""
    from posting_lines_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 1, 1)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(99,)], "node long")
    with pytest.raises(ValueError, match="seed"):
        pagerank(edges, iters=2, seeds=seeds)


def _scored_001():
    import pyarrow.parquet as pq

    from tests.conftest import SF001

    return [
        (round(r["value"] * 100), 1 if r["event_type"] == "purchase" else 0)
        for r in pq.read_table(SF001 + "/events.parquet").to_pylist()
    ]


def test_ml_pr_auc_matches_python(spark):
    """sklearn-convention average precision replay: thresholds at
    distinct scores descending, AP = Σ ΔR·P. The engine's decimal-
    routed term sum quantizes each term at 1e-6, so the tolerance is
    n_terms·5e-7/P above float noise."""
    from posting_lines_spark.queries import load_all
    from tests.conftest import SF001

    npn = {}
    for s, y in _scored_001():
        a, b = npn.get(s, (0, 0))
        npn[s] = (a + y, b + (1 - y))
    P = sum(a for a, _ in npn.values())
    ap = 0.0
    tp = fp = 0
    for s in sorted(npn, reverse=True):
        a, b = npn[s]
        tp += a
        fp += b
        if a:
            ap += (a / P) * (tp / (tp + fp))
    got = load_all()["ml_pr_auc"].fn(spark, SF001).collect()[0]
    assert got["n_pos"] == P
    tol = len(npn) * 5e-7 / P + 1e-9
    assert abs(got["average_precision"] - ap) < tol


def test_ml_brier_decomposition_identity(spark):
    """Murphy identity: reliability − resolution + uncertainty must
    equal ml_brier_score's BS (same corpus, same session)."""
    from posting_lines_spark.queries import load_all
    from tests.conftest import SF001

    reg = load_all()
    d = reg["ml_brier_decomposition"].fn(spark, SF001).collect()[0]
    b = reg["ml_brier_score"].fn(spark, SF001).collect()[0]
    assert d["n"] == b["n"] and d["n_pos"] == b["n_pos"]
    # rel/res terms are 1e-6-quantized per distinct score; the identity
    # holds to that quantization
    n_terms_bound = d["n"]  # distinct scores ≤ n
    tol = 2 * min(n_terms_bound, 50000) * 5e-7 / d["n"] + 1e-9
    assert abs((d["reliability"] - d["resolution"] + d["uncertainty"]) - b["brier"]) < tol
