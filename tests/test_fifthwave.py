"""Independent Python replays for the fifth-wave operators — each test
re-derives the expected result from raw parquet with plain Python (no
Spark, no DuckDB), so correctness doesn't rest on the shared-SQL oracle
alone (the round-3 advice pattern: an algorithm bug mirrored into the
oracle would be invisible to the parity check, but not to these)."""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq

from tests.conftest import SF0001


def _md5_int(s: str, salt: str) -> int:
    return int(hashlib.md5(f"{salt}|{s}".encode()).hexdigest()[:15], 16)


def _docs(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    return t


def _near_base(docs):
    """Mirror of dedup_q.NEAR_BASE_*: corpus + tail-truncated near-copies."""
    out = [(d["doc_id"], d["text"]) for d in docs]
    for d in docs:
        if d["doc_id"] % 5 == 0:
            toks = d["text"].split(" ")
            out.append((d["doc_id"] + 100000, " ".join(toks[: max(len(toks) - 2, 1)])))
    return out


def _shingles(text: str, k: int = 3) -> set:
    toks = text.split(" ")
    if len(toks) < k:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_snm_matches_bruteforce_window_scan(spark):
    """Candidate completeness, independently: sort by the prefix key,
    brute-force compare EVERY pair within rank distance w, keep
    jaccard >= threshold — must equal the query's output exactly."""
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.dedup_q import JACCARD_T, SNM_KEYLEN, SNM_WINDOW

    base = _near_base(_docs(SF0001))
    ranked = sorted(base, key=lambda p: (p[1][:SNM_KEYLEN], p[0]))
    expected = {}
    for i, (id_a, ta) in enumerate(ranked):
        for j in range(i + 1, min(i + 1 + SNM_WINDOW, len(ranked))):
            id_b, tb = ranked[j]
            sa, sb = _shingles(ta), _shingles(tb)
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union and inter / union >= JACCARD_T:
                expected[(id_a, id_b)] = inter / union
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in load_all()["dedup_sorted_neighborhood"].fn(spark, SF0001).collect()
    }
    assert got == expected


def test_kmv_estimate_matches_python_sketch_replay(spark):
    """The KMV sketch replayed in plain Python: per-source bottom-K of
    md5 shingle hashes, union-sketch intersection rule — the estimate
    column must match bit-for-bit, and the mergeability identity
    bottom-K(A ∪ B) == bottom-K(sketch(A) ∪ sketch(B)) is checked
    per pair (the property that makes the sketch shardable)."""
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.sketch_q import KMV_K

    docs = _docs(SF0001)
    full: dict[str, set] = {}
    for d in docs:
        full.setdefault(d["source"], set()).update(
            _md5_int(s, "kmv") for s in _shingles(d["text"])
        )
    sk = {src: set(sorted(hs)[:KMV_K]) for src, hs in full.items()}
    rows = load_all()["sketch_kmv_overlap"].fn(spark, SF0001).collect()
    assert rows
    for r in rows:
        a, b = r.source_a, r.source_b
        union_bottom = set(sorted(full[a] | full[b])[: r.k_used])
        merged_bottom = set(sorted(sk[a] | sk[b])[: r.k_used])
        assert union_bottom == merged_bottom, (a, b)
        n_shared = len(union_bottom & sk[a] & sk[b])
        assert r.n_shared == n_shared, (a, b)
        assert r.jaccard_est == n_shared / r.k_used, (a, b)


def test_psi_matches_python_replay(spark):
    """PSI re-derived with the Python mirror of the integer-ln kernel:
    per-bin contributions and the ordered-fold total must match
    bit-for-bit."""
    from posting_lines_spark.functions.dmath import dln_int_py
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.schema_q import PSI_BINS, PSI_WIDTH

    orders = pq.read_table(f"{SF0001}/orders.parquet").to_pylist()
    import datetime

    split = datetime.datetime(1998, 7, 1)
    n_a = [0] * PSI_BINS
    n_b = [0] * PSI_BINS
    for o in orders:
        b = min(int(o["o_totalprice"] // PSI_WIDTH), PSI_BINS - 1)
        if o["o_orderdate"] < split:
            n_a[b] += 1
        else:
            n_b[b] += 1
    ta, tb = sum(n_a), sum(n_b)
    contribs = []
    for i in range(PSI_BINS):
        p = (n_a[i] + 1) / (ta + PSI_BINS)
        q = (n_b[i] + 1) / (tb + PSI_BINS)
        lnr = dln_int_py((n_a[i] + 1) * (tb + PSI_BINS)) - dln_int_py(
            (n_b[i] + 1) * (ta + PSI_BINS)
        )
        contribs.append((p - q) * lnr)
    psi = 0.0
    for c in contribs:
        psi += c
    rows = load_all()["profile_psi_drift"].fn(spark, SF0001).collect()
    assert len(rows) == PSI_BINS
    for r in rows:
        assert r.n_a == n_a[r.bin] and r.n_b == n_b[r.bin]
        assert r.contrib == contribs[r.bin], r.bin
        assert r.psi == psi


def test_pattern_match_equals_regex_replay(spark):
    """MATCH_RECOGNIZE semantics cross-checked against an actual regex:
    per user, the event sequence becomes a character string and
    re.finditer(r'v+cp') — greedy, non-overlapping, left-to-right — must
    produce exactly the query's matches (start ts, view count, end ts)."""
    import re as _re

    from posting_lines_spark.queries import load_all

    events = pq.read_table(f"{SF0001}/events.parquet").to_pylist()
    by_user: dict = {}
    for e in events:
        by_user.setdefault(e["user_id"], []).append(e)
    code = {"view": "v", "click": "c", "purchase": "p"}
    expected = []
    for uid, evs in by_user.items():
        evs.sort(key=lambda e: e["ts"])
        s = "".join(code.get(e["event_type"], "x") for e in evs)
        for m in _re.finditer(r"v+cp", s):
            n_views = m.end() - m.start() - 2
            expected.append(
                (uid, n_views, evs[m.start()]["ts"], evs[m.end() - 1]["ts"])
            )
    expected.sort()
    got = sorted(
        (r.user_id, r.n_views, r.ts_start, r.ts_purchase)
        for r in load_all()["events_pattern_match"].fn(spark, SF0001).collect()
    )
    assert got == expected and got


def test_hilbert_sql_equals_reference_xy2d_exhaustively(spark):
    """The staged-CTE Hilbert index must equal the standard
    rotate-and-descend xy2d on EVERY cell of the 64x64 grid, and be a
    bijection onto [0, 4096)."""
    from posting_lines_spark.queries.extra_q import _hilbert_layers

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    hsql, hlast = _hilbert_layers("cells")
    rows = spark.sql(
        f"""
WITH cells AS (
  SELECT CAST(floor(id / 64) AS BIGINT) AS cx, CAST(id % 64 AS BIGINT) AS cy
  FROM (SELECT explode(sequence(0, 4095)) AS id)
),
{hsql}
SELECT cx, cy, hd FROM {hlast}
"""
    ).collect()
    assert len(rows) == 4096
    assert all(r.hd == xy2d(64, r.cx, r.cy) for r in rows)
    assert len({r.hd for r in rows}) == 4096


def test_hilbert_locality_beats_morton(spark):
    """The point of the operator: on the occupied AIS cells, consecutive
    Hilbert positions must be grid-local at least as often as Morton's
    (strictly more on this data), with a smaller mean index gap."""
    from posting_lines_spark.queries import load_all

    rows = {
        r.curve: r
        for r in load_all()["spatial_hilbert_locality"].fn(spark, SF0001).collect()
    }
    h, m = rows["hilbert"], rows["morton"]
    assert h.n_hops == m.n_hops
    assert h.n_local_hops > m.n_local_hops


def test_pattern_negation_equals_backward_scan_replay(spark):
    """Exclusion-pattern semantics replayed directly: for each purchase,
    scan back to the nearest view; qualify iff no error strictly
    between. Output tuples must match exactly."""
    from posting_lines_spark.queries import load_all

    events = pq.read_table(f"{SF0001}/events.parquet").to_pylist()
    by_user: dict = {}
    for e in events:
        by_user.setdefault(e["user_id"], []).append(e)
    expected = []
    for uid, evs in by_user.items():
        evs.sort(key=lambda e: e["ts"])
        for i, e in enumerate(evs):
            if e["event_type"] != "purchase":
                continue
            for j in range(i - 1, -1, -1):
                if evs[j]["event_type"] == "view":
                    between = [x["event_type"] for x in evs[j + 1 : i]]
                    if "error" not in between:
                        expected.append((uid, j + 1, i + 1, e["ts"], i - j - 1))
                    break
    expected.sort()
    got = sorted(
        (r.user_id, r.view_rn, r.purchase_rn, r.ts_purchase, r.n_between)
        for r in load_all()["events_pattern_negation"].fn(spark, SF0001).collect()
    )
    assert got == expected and got


def test_ewma_matches_python_recurrence(spark):
    """EWMA replayed in plain Python: exact-decimal daily means (2-dp
    values make the decimal route exact), then the seeded recurrence —
    final smoothed values must match bit-for-bit."""
    from decimal import Decimal

    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.analytics_q import EWMA_ALPHA

    events = pq.read_table(f"{SF0001}/events.parquet").to_pylist()
    agg: dict = {}
    for e in events:
        day = int((e["ts"].timestamp() * 1e6) // 86400000000)
        key = (e["event_type"], day)
        s, n = agg.get(key, (Decimal(0), 0))
        agg[key] = (s + Decimal(str(e["value"])), n + 1)
    series: dict = {}
    for (et, day), (s, n) in agg.items():
        series.setdefault(et, []).append((day, float(str(s)) / n))
    expected = {}
    for et, pts in series.items():
        pts.sort()
        acc = pts[0][1]
        for _, v in pts[1:]:
            acc = EWMA_ALPHA * v + (1 - EWMA_ALPHA) * acc
        expected[et] = (len(pts), acc)
    rows = load_all()["timeseries_ewma"].fn(spark, SF0001).collect()
    assert {r.event_type: (r.n_days, r.ewma) for r in rows} == expected


def test_target_encoding_matches_python_replay(spark):
    """LOO target encoding replayed with exact-decimal sums: every
    sampled row's encoded value must match bit-for-bit, and the
    encoding must exclude the row's own target (leakage guard: encoding
    differs from the plain category mean whenever n_cat > 1)."""
    from decimal import Decimal

    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.analytics_q import TE_SMOOTH

    orders = pq.read_table(f"{SF0001}/orders.parquet").to_pylist()
    cust = {
        c["c_custkey"]: c["c_mktsegment"]
        for c in pq.read_table(f"{SF0001}/customer.parquet").to_pylist()
    }
    stats: dict = {}
    gsum, gn = Decimal(0), 0
    for o in orders:
        seg = cust[o["o_custkey"]]
        s, n = stats.get(seg, (Decimal(0), 0))
        stats[seg] = (s + Decimal(str(o["o_totalprice"])), n + 1)
        gsum += Decimal(str(o["o_totalprice"]))
        gn += 1
    prior = float(str(gsum)) / gn
    rows = load_all()["feature_target_encoding"].fn(spark, SF0001).collect()
    assert rows
    for r in (o for o in orders if o["o_orderkey"] % 97 == 0):
        seg = cust[r["o_custkey"]]
        s, n = stats[seg]
        exp = (float(str(s)) - r["o_totalprice"] + TE_SMOOTH * prior) / (
            n - 1 + TE_SMOOTH
        )
        got = next(x for x in rows if x.o_orderkey == r["o_orderkey"])
        assert got.seg == seg and got.target_enc == exp


def test_feature_hashing_matches_hashlib_replay(spark):
    """The signed hashing trick replayed with hashlib: same index, same
    sign, same cancelled-out zero weights."""
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.text_q import FH_DIM

    docs = _docs(SF0001)
    expected: dict = {}
    for d in docs:
        if d["doc_id"] % 10 != 0:
            continue
        for tok in d["text"].split(" "):
            hx = hashlib.md5(f"fh|{tok}".encode()).hexdigest()
            idx = int(hx[:15], 16) % FH_DIM
            sgn = 1 if int(hx[15:30], 16) % 2 == 0 else -1
            k = (d["doc_id"], idx)
            expected[k] = expected.get(k, 0) + sgn
    expected = {k: v for k, v in expected.items() if v != 0}
    got = {
        (r.doc_id, r.idx): r.w
        for r in load_all()["feature_hashing"].fn(spark, SF0001).collect()
    }
    assert got == expected and got


def test_stream_pattern_match_equals_batch_and_spans_boundaries(spark):
    """The streaming matcher must equal the batch matcher exactly AND the
    fixture must contain matches that SPAN micro-batch boundaries — i.e.
    the cross-batch carry path is genuinely exercised, not vacuous."""
    import re as _re

    from posting_lines_spark.queries import load_all

    reg = load_all()
    batch = sorted(
        (r.user_id, r.n_views, r.ts_start, r.ts_purchase)
        for r in reg["events_pattern_match"].fn(spark, SF0001).collect()
    )
    stream = sorted(
        (r.user_id, r.n_views, r.ts_start, r.ts_purchase)
        for r in reg["stream_pattern_match"].fn(spark, SF0001).collect()
    )
    assert stream == batch and stream
    # at least one match must cross a slice boundary (8-day slices)
    events = pq.read_table(f"{SF0001}/events.parquet").to_pylist()
    day0 = min(int(e["ts"].timestamp() * 1e6) // 86400000000 for e in events)

    def sl(ts):
        return (int(ts.timestamp() * 1e6) // 86400000000 - day0) // 8

    assert any(sl(a) != sl(b) for (_, _, a, b) in batch)


def test_pattern_matchers_on_random_sequences(spark):
    """Adversarial coverage beyond the fixture: 200 random users with
    random-length random event strings (seeded), including degenerate
    shapes (all views, single event, empty-ish) — both pattern matchers
    must equal their Python replays exactly."""
    import datetime
    import random
    import re as _re

    from posting_lines_spark.queries.analytics_q import (
        PATTERN_NEG_SQL,
        PATTERN_SQL,
    )

    rng = random.Random(42)
    types = ["view", "click", "purchase", "error", "signup"]
    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    for uid in range(200):
        n = rng.choice([1, 2, 3, 5, 8, 13, 21, 34])
        if uid == 0:
            seq = ["view"] * 10  # all-views degenerate
        elif uid == 1:
            seq = ["view", "click", "purchase"] * 5  # back-to-back matches
        else:
            seq = [rng.choice(types) for _ in range(n)]
        for i, et in enumerate(seq):
            rows.append((uid, t0 + datetime.timedelta(minutes=i), et))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_type string")
    df.createOrReplaceTempView("events")

    code = {"view": "v", "click": "c", "purchase": "p", "error": "e"}
    by_user: dict = {}
    for uid, ts, et in rows:
        by_user.setdefault(uid, []).append((ts, et))

    exp_match, exp_neg = [], []
    for uid, evs in by_user.items():
        evs.sort()
        s = "".join(code.get(et, "x") for _, et in evs)
        for m in _re.finditer(r"v+cp", s):
            exp_match.append((uid, m.end() - m.start() - 2, evs[m.start()][0], evs[m.end() - 1][0]))
        for i, (ts, et) in enumerate(evs):
            if et != "purchase":
                continue
            for j in range(i - 1, -1, -1):
                if evs[j][1] == "view":
                    if all(evs[x][1] != "error" for x in range(j + 1, i)):
                        exp_neg.append((uid, j + 1, i + 1, ts, i - j - 1))
                    break
    got_match = sorted(
        (r.user_id, r.n_views, r.ts_start, r.ts_purchase)
        for r in spark.sql(PATTERN_SQL).collect()
    )
    got_neg = sorted(
        (r.user_id, r.view_rn, r.purchase_rn, r.ts_purchase, r.n_between)
        for r in spark.sql(PATTERN_NEG_SQL).collect()
    )
    assert got_match == sorted(exp_match) and got_match
    assert got_neg == sorted(exp_neg) and got_neg


def test_global_row_number_equals_window_and_parallelizes(spark):
    """The two-pass distributed ranker must produce EXACTLY the
    single-partition window's ranks on a total order, and its plan must
    rank inside range partitions (no Exchange SinglePartition feeding
    the row_number window)."""
    from pyspark.sql import functions as F

    from posting_lines_spark.operators.ranking import global_row_number

    df = spark.range(0, 10000).selectExpr(
        "id", "CAST(id % 977 AS STRING) AS k"  # dense dup keys, id tiebreak
    )
    got = global_row_number(df, ["k", "id"], num_partitions=7)
    expected = df.selectExpr(
        "id", "k", "CAST(row_number() OVER (ORDER BY k, id) AS BIGINT) AS rnk"
    )
    assert got.select("id", "rnk").exceptAll(expected.select("id", "rnk")).count() == 0
    assert got.count() == 10000
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan[:2000]
    assert "Window" in plan


def test_rank_formula_reproduces_ntile_for_ragged_n(spark):
    """ntile_from_rank_sql must equal ntile(k) exactly, including the
    ragged case where the first (n mod k) buckets take the remainder
    (the naive floor((rank-1)·k/n)+1 diverges there — 6 rows at
    n=10007, which is why the helper exists)."""
    from posting_lines_spark.queries.schema_q import ntile_from_rank_sql

    df = spark.range(0, 10007).selectExpr("id")  # n not divisible by k
    expr = ntile_from_rank_sql("(row_number() OVER (ORDER BY id))", 10007, 10)
    got = spark.sql(
        f"""
SELECT id,
       CAST({expr} AS BIGINT) AS formula,
       CAST(ntile(10) OVER (ORDER BY id) AS BIGINT) AS nt
FROM {{df}}
""",
        df=df,
    )
    assert got.filter("formula <> nt").count() == 0


def test_ntile_from_rank_formula_exhaustive():
    """Pure-Python exhaustive check of ntile_from_rank_sql's arithmetic
    against ntile's front-loaded sizing for every n ≤ 60 (plus primes
    997, 10007) × k ∈ {1,2,3,7,10} — including n < k and n % k == 0."""
    from posting_lines_spark.queries.schema_q import ntile_from_rank_sql  # noqa: F401

    def ref(n, k):
        q, r = divmod(n, k)
        out = []
        for i in range(k):
            out += [i + 1] * (q + (1 if i < r else 0))
        return out

    def formula(n, k):
        q, r = divmod(n, k)
        big, cut = q + 1, r * (q + 1)
        res = []
        for rank in range(1, n + 1):
            if r == 0:
                v = (rank - 1) // q + 1
            elif q == 0:
                v = rank
            elif rank <= cut:
                v = (rank - 1) // big + 1
            else:
                v = r + (rank - cut - 1) // q + 1
            res.append(v)
        return res

    for n in list(range(1, 61)) + [997, 10007]:
        for k in (1, 2, 3, 7, 10):
            assert formula(n, k) == ref(n, k), (n, k)
