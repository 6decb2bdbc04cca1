"""Round-9 regression tests: the four ADVICE-r8 findings.

1. _track_gaps must buffer a group's chunks before sorting (a group
   whose rows span multiple Arrow record batches within one micro-batch
   must fold gaps in global time order, not per-chunk order).
2. ml_map_at_k normalizes by min(K, TOTAL positives per user) — the
   standard TREC convention.
3. sketch_linear_counting reports NULL (not garbage) in the saturated
   v_empty = 0 regime.
4. graph_modularity's q_num arithmetic survives operands whose products
   exceed int64 (decimal routing + VARCHAR final cast, both engines).
"""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF001


class _FakeState:
    """Minimal GroupState stand-in for unit-driving _track_gaps."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True


def _fold_python(ts_list):
    ts = sorted(ts_list)
    n = sg = sgg = 0
    for a, b in zip(ts, ts[1:]):
        g = b - a
        n += 1
        sg += g
        sgg += g * g
    return n, sg, sgg


def test_track_gaps_multichunk_group():
    """A group split across unsorted Arrow chunks must fold the SAME
    moments as one globally-sorted pass (the r8 ADVICE medium: per-chunk
    sorting computed gaps between misordered neighbors)."""
    from posting_lines_spark.streaming.stateful import _LANE, _track_gaps

    # Timestamps deliberately interleaved so per-chunk sorting would see
    # negative boundary gaps: chunk1 holds late rows, chunk2 early ones.
    c1 = pd.DataFrame({"ts_us": [5_000_000, 9_000_000], "event_id": [5, 9]})
    c2 = pd.DataFrame({"ts_us": [1_000_000, 7_000_000], "event_id": [1, 7]})
    c3 = pd.DataFrame({"ts_us": [3_000_000], "event_id": [3]})
    st = _FakeState()
    [out] = list(_track_gaps((42, "click"), iter([c1, c2, c3]), st))
    n, sg, sgg = _fold_python([5e6, 9e6, 1e6, 7e6, 3e6])
    assert int(out["n"][0]) == n
    assert int(out["sg"][0]) == sg
    assert int(out["sgg_hi"][0]) * _LANE + int(out["sgg_lo"][0]) == sgg
    # State carries; a later batch continues from the global max ts.
    c4 = pd.DataFrame({"ts_us": [11_000_000], "event_id": [11]})
    [out2] = list(_track_gaps((42, "click"), iter([c4]), st))
    n2, sg2, sgg2 = _fold_python([5e6, 9e6, 1e6, 7e6, 3e6, 11e6])
    assert int(out2["n"][0]) == n2
    assert int(out2["sg"][0]) == sg2
    assert int(out2["sgg_hi"][0]) * _LANE + int(out2["sgg_lo"][0]) == sgg2


def test_stream_interarrival_twin_multichunk(spark):
    """End-to-end: with Arrow batches forced tiny (7 rows), every group
    spans many chunks inside each micro-batch; the stateful twin must
    still equal the batch query exactly."""
    from posting_lines_spark.queries import load_all

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")
    try:
        reg = load_all()
        batch = {
            r["event_type"]: (r["n"], r["mean_gap_us"], r["var_gap_us"])
            for r in reg["events_interarrival_burstiness"]
            .fn(spark, SF001)
            .collect()
        }
        twin = {
            r["event_type"]: (r["n"], r["mean_gap_us"], r["var_gap_us"])
            for r in reg["stream_interarrival_stateful"]
            .fn(spark, SF001)
            .collect()
        }
    finally:
        spark.conf.set(key, old)
    assert twin == batch


def test_map_at_k_standard_normalization(spark):
    """A user whose relevant items mostly sit OUTSIDE the top-K must not
    score AP=1.0 from one rank-1 hit: the divisor is min(K, total
    positives), and zero-hit users with positives still count (AP=0)."""
    from posting_lines_spark.queries.ml_q import MAP_K, _map_sql

    import duckdb

    con = duckdb.connect()
    # user 1: 1 hit at rank 1, but 30 relevant total -> AP = 1/min(K,30)
    # user 2: positives only at ranks K+1.. -> AP = 0, still in the mean
    rows = []
    for rnk in range(1, 61):
        rows.append((1, rnk, 1 if (rnk == 1 or rnk > 30) else 0))
    for rnk in range(1, 61):
        rows.append((2, rnk, 1 if rnk > MAP_K else 0))
    con.execute("CREATE TABLE ranked(user_id BIGINT, rnk BIGINT, y BIGINT)")
    con.executemany("INSERT INTO ranked VALUES (?, ?, ?)", rows)
    sql = _map_sql()
    # swap the events-derived ranking for the synthetic one
    head, _, tail = sql.partition("),\nnp AS (")
    sql = "WITH r AS (SELECT user_id, rnk, y FROM ranked),\nnp AS (" + tail
    got = con.execute(sql).fetchone()
    con.close()
    ap1 = 1.0 / MAP_K  # min(K, 30) = K
    ap2 = 0.0
    assert got[0] == 2
    assert abs(got[1] - (ap1 + ap2) / 2) < 1e-12


def test_linear_counting_saturated_is_null(spark):
    """v_empty = 0 (every bucket occupied) must yield NULL n_est and
    rel_err — not the integer-ln kernel's finite-wrong value at 0."""
    from posting_lines_spark.functions.hashing import md5_int_spark
    from posting_lines_spark.queries.sketch_q import _linear_counting_sql

    spark.range(200_000).selectExpr("id AS user_id").createOrReplaceTempView(
        "events"
    )
    row = spark.sql(
        _linear_counting_sql(md5_int_spark("user_id", salt="lc"))
    ).collect()[0]
    assert row["v_empty"] == 0
    assert row["n_exact"] == 200_000
    assert row["n_est"] is None
    assert row["rel_err"] is None


def test_modularity_qnum_above_int64(spark, duck):
    """The decimal-routed q_num arithmetic is exact and engine-identical
    when intra*w2 and strength^2 exceed int64 (the r8 ADVICE overflow:
    raw BIGINT products wrapped on Spark, errored on DuckDB)."""
    w2 = 4_000_000_000  # doubled total edge weight past the ~3e9 wrap point
    rows = [(3_900_000_000, 1_000_000_000), (3_800_000_000, 1_000_000_000)]
    frag = """
SELECT CAST(CAST(sum(CAST(intra AS DECIMAL(19,0)) * CAST({w2} AS DECIMAL(19,0))
              - CAST(strength AS DECIMAL(19,0)) * CAST(strength AS DECIMAL(19,0)))
         AS STRING) AS DOUBLE) AS q_num
FROM per_c
""".format(w2=w2)
    exact = sum(i * w2 - s * s for i, s in rows)
    assert exact > 2**63  # genuinely out of int64 range
    spark.createDataFrame(rows, "intra long, strength long").createOrReplaceTempView("per_c")
    got_spark = spark.sql(frag).collect()[0]["q_num"]
    duck.execute("CREATE OR REPLACE TABLE per_c(intra BIGINT, strength BIGINT)")
    duck.executemany("INSERT INTO per_c VALUES (?, ?)", rows)
    got_duck = duck.execute(frag).fetchone()[0]
    duck.execute("DROP TABLE per_c")
    assert got_spark == got_duck == float(exact)


def test_interarrival_stateful_recovers_after_restart(spark):
    """Crash/resume path of the gap-moment state store (round-8 VERDICT
    item 3, mirroring test_stateful_attribution_recovers_after_restart):
    drain the first half of the time slices, STOP the query (offsets +
    per-(user,type) lane state checkpointed), reveal the rest, then
    start a BRAND-NEW query from the same checkpoint. The resumed query
    must reload (last_ts, n, Σg, Σg²-lanes) from the state store — the
    boundary gap between the halves is only correct if last_ts
    survived — so the per-key union-max partials equal the
    uninterrupted run's exactly."""
    import os
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql import Window as W
    from pyspark.sql.streaming.state import GroupStateTimeout

    from posting_lines_spark.fixtures import scratch_dir
    from posting_lines_spark.queries.stream_q import _sess_write_slices
    from posting_lines_spark.sources import load_table
    from posting_lines_spark.streaming.stateful import (
        _track_gaps,
        interarrival_stateful,
    )

    events = load_table(spark, SF001, "events")
    full = scratch_dir("pls_gaprec_full_")
    _sess_write_slices(events)(full)
    files = sorted(
        (os.path.join(full, f) for f in os.listdir(full) if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    assert len(files) == 6  # 4 slices + 2 watermark-flush sentinels

    src = scratch_dir("pls_gaprec_src_")
    sink = scratch_dir("pls_gaprec_out_")
    ckpt = scratch_dir("pls_gaprec_ckpt_")
    schema = spark.read.parquet(full).schema

    def drain() -> None:
        # The memory sink can't recover from a checkpoint, so the
        # restart path uses a parquet sink in append mode: every
        # micro-batch appends each touched key's RUNNING totals, and
        # the max-n row per key is the final answer — same row-shape
        # and same _track_gaps state encoding as the registered query.
        out = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .where(F.col("user_id") >= 0)
            .withColumn("ts_us", F.expr("unix_micros(ts)"))
            .groupBy("user_id", "event_type")
            .applyInPandasWithState(
                _track_gaps,
                outputStructType="user_id long, event_type string, n long,"
                " sg long, sgg_hi long, sgg_lo long",
                stateStructType="last_ts long, n long, sg long,"
                " sgg_hi long, sgg_lo long",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for f in files[:3]:
        shutil.copy2(f, os.path.join(src, os.path.basename(f)))
    drain()
    for f in files[3:]:
        shutil.copy2(f, os.path.join(src, os.path.basename(f)))
    drain()  # new query object; resumes from ckpt

    # final per-key row = max-n row across all appended running totals
    both = spark.read.schema(
        "user_id long, event_type string, n long, sg long,"
        " sgg_hi long, sgg_lo long"
    ).parquet(sink)
    w = W.partitionBy("user_id", "event_type").orderBy(F.col("n").desc())
    got = {
        (r["user_id"], r["event_type"]): (r["n"], r["sg"], r["sgg_hi"], r["sgg_lo"])
        for r in both.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .collect()
    }
    want = {
        (r["user_id"], r["event_type"]): (r["n"], r["sg"], r["sgg_hi"], r["sgg_lo"])
        for r in interarrival_stateful(spark, full).collect()
    }
    assert got == want


# ---- wave-15 replay tests (independent Python, the parity-blindness
# lesson: a green oracle row only proves the engines AGREE) ----


def _events_rows(sf=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.conftest import SF0001

    t = pq.read_table(sf or (SF0001 + "/events.parquet"))
    us = t.column("ts").cast(pa.int64()).to_pylist()
    rows = t.to_pylist()
    for r, u in zip(rows, us):
        r["ts_us"] = u
        r["cents"] = _round_half_even(r["value"] * 100.0)
    return rows


def _round_half_even(x):
    # SQL round() is half-away-from-zero on both engines for doubles?
    # No: Spark/DuckDB round(double) round HALF-EVEN per IEEE rint.
    # The cents domain in TESTDATA is exact 2-dp values, so the two
    # conventions cannot diverge; use Python round (half-even) which
    # matches for exact inputs.
    return int(round(x))


def _lpa_edges_python():
    import pyarrow.parquet as pq

    from tests.conftest import SF0001

    li = pq.read_table(
        SF0001 + "/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pylist()
    orders = {}
    for r in li:
        orders.setdefault(r["l_orderkey"], []).append(r["l_partkey"])
    pairs = set()
    for parts in orders.values():
        for i, a in enumerate(parts):
            for b in parts[i + 1:]:
                if a != b:
                    pairs.add((min(a, b), max(a, b)))
    return pairs


def test_assortativity_matches_python(spark):
    from posting_lines_spark.queries import load_all
    from tests.conftest import SF0001

    pairs = _lpa_edges_python()
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m2 = 2 * len(pairs)
    s1 = sum(deg[a] + deg[b] for a, b in pairs)
    s2 = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in pairs)
    sxy = sum(2 * deg[a] * deg[b] for a, b in pairs)
    mu = s1 / m2
    want = (sxy / m2 - mu * mu) / (s2 / m2 - mu * mu)
    got = load_all()["graph_assortativity"].fn(spark, SF0001).collect()[0]
    assert got["n_directed_edges"] == m2
    assert got["n_nodes"] == len(deg)
    assert abs(got["assortativity"] - want) < 1e-12


def test_rich_club_matches_python(spark):
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.graph_q import _RICH_KS
    from tests.conftest import SF0001

    pairs = _lpa_edges_python()
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    got = {
        r["k"]: (r["n_k"], r["e_k"], r["phi"])
        for r in load_all()["graph_rich_club"].fn(spark, SF0001).collect()
    }
    for k in _RICH_KS:
        nodes = {n for n, d in deg.items() if d > k}
        if not nodes:
            assert k not in got  # inner join on nk drops empty clubs
            continue
        ek = sum(1 for a, b in pairs if a in nodes and b in nodes)
        want_phi = (
            2.0 * ek / (len(nodes) * (len(nodes) - 1.0))
            if len(nodes) > 1
            else None
        )
        assert got[k][0] == len(nodes)
        assert got[k][1] == ek
        if want_phi is None:
            assert got[k][2] is None
        else:
            assert abs(got[k][2] - want_phi) < 1e-12


def test_turning_points_matches_python(spark):
    from posting_lines_spark.queries import load_all
    from tests.conftest import SF0001

    daily = {}
    for r in _events_rows():
        day = r["ts_us"] // 86_400_000_000
        key = (r["event_type"], day)
        daily[key] = daily.get(key, 0) + 1
    series = {}
    for (et, day), c in daily.items():
        series.setdefault(et, []).append((day, c))
    got = {
        r["event_type"]: r
        for r in load_all()["timeseries_turning_points"].fn(spark, SF0001).collect()
    }
    for et, pts in series.items():
        pts.sort()
        cs = [c for _, c in pts]
        n = len(cs)
        t = sum(
            1
            for i in range(1, n - 1)
            if (cs[i] > cs[i - 1] and cs[i] > cs[i + 1])
            or (cs[i] < cs[i - 1] and cs[i] < cs[i + 1])
        )
        e = 2.0 * (n - 2) / 3.0
        v = (16.0 * n - 29.0) / 90.0
        row = got[et]
        assert row["n_days"] == n
        assert row["t_obs"] == t
        assert abs(row["z"] - (t - e) / v**0.5) < 1e-9


def test_variance_ratio_matches_python(spark):
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.temporal_q import VR_Q
    from tests.conftest import SF0001

    daily = {}
    for r in _events_rows():
        day = r["ts_us"] // 86_400_000_000
        key = (r["event_type"], day)
        daily[key] = daily.get(key, 0) + r["cents"]
    series = {}
    for (et, day), x in daily.items():
        series.setdefault(et, []).append((day, x))
    got = {
        r["event_type"]: r
        for r in load_all()["timeseries_variance_ratio"].fn(spark, SF0001).collect()
    }
    q = VR_Q
    for et, pts in series.items():
        pts.sort()
        xs = [x for _, x in pts]
        n = len(xs)
        mu = (xs[-1] - xs[0]) / (n - 1)
        d1 = [xs[i] - xs[i - 1] for i in range(1, n)]
        dq = [xs[i] - xs[i - q] for i in range(q, n)]
        var1 = sum((d - mu) ** 2 for d in d1) / len(d1)
        varq = sum((d - q * mu) ** 2 for d in dq) / (q * len(dq))
        vr = varq / var1
        z = (vr - 1.0) / (2.0 * (2 * q - 1) * (q - 1) / (3.0 * q * n)) ** 0.5
        row = got[et]
        assert row["n_days"] == n
        assert abs(row["vr"] - vr) < 1e-9
        assert abs(row["z"] - z) < 1e-9


def test_mood_median_matches_python(spark):
    from posting_lines_spark.queries import load_all
    from tests.conftest import SF0001

    rows = _events_rows()
    cents = sorted(r["cents"] for r in rows)
    n = len(cents)
    # lower median: smallest s with 2*cum >= n over the per-value table
    med = cents[(n - 1) // 2] if n % 2 == 1 else cents[n // 2 - 1]
    groups = {}
    for r in rows:
        hi = 1 if r["cents"] > med else 0
        g = groups.setdefault(r["event_type"], [0, 0])
        g[hi] += 1
    k = len(groups)
    t_hi = sum(g[1] for g in groups.values())
    t_lo = sum(g[0] for g in groups.values())
    chi2 = 0.0
    for et in sorted(groups):
        lo, hi = groups[et]
        rt = lo + hi
        e_hi = rt * t_hi / n
        e_lo = rt * t_lo / n
        chi2 += (hi - e_hi) ** 2 / e_hi + (lo - e_lo) ** 2 / e_lo
    got = load_all()["stats_mood_median"].fn(spark, SF0001).collect()[0]
    assert got["median_cents"] == med
    assert (got["k"], got["n"], got["dof"]) == (k, n, k - 1)
    assert abs(got["chi2"] - chi2) < 1e-9


def test_cronbach_alpha_matches_python(spark):
    from posting_lines_spark.queries import load_all
    from tests.conftest import SF0001

    cells = {}
    for r in _events_rows():
        key = (r["user_id"], r["event_type"])
        cells[key] = cells.get(key, 0) + r["cents"]
    users = sorted({u for u, _ in cells})
    items = sorted({i for _, i in cells})
    nu, k = len(users), len(items)
    sum_iv = 0.0
    for it in items:
        xs = [cells.get((u, it), 0) for u in users]
        sx, sxx = sum(xs), sum(x * x for x in xs)
        sum_iv += sxx / nu - (sx / nu) ** 2
    ts = [sum(cells.get((u, it), 0) for it in items) for u in users]
    st, stt = sum(ts), sum(t * t for t in ts)
    tv = stt / nu - (st / nu) ** 2
    alpha = k / (k - 1) * (1 - sum_iv / tv)
    got = load_all()["stats_cronbach_alpha"].fn(spark, SF0001).collect()[0]
    assert (got["k"], got["n_subj"]) == (k, nu)
    assert abs(got["sum_item_var"] - sum_iv) < 1e-6 * abs(sum_iv)
    assert abs(got["alpha"] - alpha) < 1e-9


def test_icc_matches_python(spark):
    from posting_lines_spark.queries import load_all
    from tests.conftest import SF0001

    g = {}
    for r in _events_rows():
        g.setdefault(r["user_id"], []).append(r["cents"])
    G, N = len(g), sum(len(v) for v in g.values())
    syy_tot = sum(y * y for v in g.values() for y in v)
    sy_tot = sum(y for v in g.values() for y in v)
    s2 = sum(sum(v) ** 2 / len(v) for v in g.values())
    sum_ni_sq = sum(len(v) ** 2 for v in g.values())
    msw = (syy_tot - s2) / (N - G)
    msb = (s2 - sy_tot**2 / N) / (G - 1)
    k0 = (N - sum_ni_sq / N) / (G - 1)
    icc = (msb - msw) / (msb + (k0 - 1) * msw)
    got = load_all()["stats_icc"].fn(spark, SF0001).collect()[0]
    assert (got["n_groups"], got["n_tot"]) == (G, N)
    assert abs(got["icc1"] - icc) < 1e-9


def test_lin_ccc_matches_python(spark):
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.analytics_q import _CCC_A, _CCC_B
    from tests.conftest import SF0001

    daily = {}
    for r in _events_rows():
        if r["event_type"] not in (_CCC_A, _CCC_B):
            continue
        day = r["ts_us"] // 86_400_000_000
        key = (r["event_type"], day)
        daily[key] = daily.get(key, 0) + r["cents"]
    days = sorted(
        {d for et, d in daily if (_CCC_A, d) in daily and (_CCC_B, d) in daily}
    )
    xa = [daily[(_CCC_A, d)] for d in days]
    xb = [daily[(_CCC_B, d)] for d in days]
    n = len(days)
    ma, mb = sum(xa) / n, sum(xb) / n
    va = sum(x * x for x in xa) / n - ma * ma
    vb = sum(x * x for x in xb) / n - mb * mb
    cab = sum(a * b for a, b in zip(xa, xb)) / n - ma * mb
    ccc = 2 * cab / (va + vb + (ma - mb) ** 2)
    r_p = cab / (va**0.5 * vb**0.5)
    got = load_all()["stats_lin_ccc"].fn(spark, SF0001).collect()[0]
    assert got["n_days"] == n
    assert abs(got["pearson_r"] - r_p) < 1e-12
    assert abs(got["ccc"] - ccc) < 1e-12


def test_mantel_haenszel_matches_python(spark):
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.analytics_q import _MH_THRESH
    from tests.conftest import SF0001

    strata = {}
    for r in _events_rows():
        dow = (r["ts_us"] // 86_400_000_000) % 7
        expo = 1 if r["event_type"] == "purchase" else 0
        outc = 1 if r["cents"] >= _MH_THRESH else 0
        cell = strata.setdefault(dow, [[0, 0], [0, 0]])
        cell[expo][outc] += 1
    s_ad = s_bc = s_e = s_v = sum_a = 0.0
    for dow in sorted(strata):
        # cells: a = expo&outc, b = expo&~outc, c = ~expo&outc, d = ~expo&~outc
        a = strata[dow][1][1]
        b = strata[dow][1][0]
        c = strata[dow][0][1]
        d = strata[dow][0][0]
        n = a + b + c + d
        sum_a += a
        s_ad += a * d / n
        s_bc += b * c / n
        s_e += (a + b) * (a + c) / n
        s_v += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
    or_mh = s_ad / s_bc
    chi2 = (sum_a - s_e) ** 2 / s_v
    got = load_all()["stats_mantel_haenszel"].fn(spark, SF0001).collect()[0]
    assert got["n_strata"] == len(strata)
    assert got["sum_a"] == sum_a
    assert abs(got["or_mh"] - or_mh) < 1e-9
    assert abs(got["cmh_chi2"] - chi2) < 1e-9


def test_jaro_winkler_matches_duckdb_bitexact():
    """The load-bearing claim of text_jaro_winkler_join: the pure-Python
    kernel and DuckDB's C++ builtin agree BIT-FOR-BIT, so engine and
    oracle doubles hash-match and the threshold filter cannot straddle.
    Random + adversarial (1-edit, reversed) pairs."""
    import random

    import duckdb

    from posting_lines_spark.functions.strdist import jaro, jaro_winkler

    rng = random.Random(20260815)
    words = [
        "".join(rng.choice("abcdef ") for _ in range(rng.randint(1, 14)))
        for _ in range(1000)
    ]
    pairs = [(rng.choice(words), rng.choice(words)) for _ in range(4000)]
    for _ in range(2000):
        w = rng.choice(words)
        i = rng.randrange(len(w))
        pairs.append((w, w[:i] + rng.choice("abcdef") + w[i + 1:]))
        pairs.append((w, w[::-1]))
    pairs.append(("", ""))
    pairs.append(("", "abc"))
    con = duckdb.connect()
    con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    rows = con.execute(
        "SELECT a, b, jaro_winkler_similarity(a, b), jaro_similarity(a, b) FROM p"
    ).fetchall()
    con.close()
    for a, b, d_jw, d_j in rows:
        assert jaro_winkler(a, b) == d_jw, (a, b)
        assert jaro(a, b) == d_j, (a, b)


def test_jaro_winkler_join_matches_python(spark):
    """End-to-end replay of the JW record linkage at sf0.001: same md5
    transposition typos, same blocking, kernel scores, same (jw DESC,
    match_id) argmax — identical winners and scores."""
    import hashlib

    import pyarrow.parquet as pq

    from posting_lines_spark.functions.strdist import jaro_winkler
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.text_q import JW_PROBE_MOD
    from tests.conftest import SF0001

    def blocksig(name):
        t1 = len(name.split(" ")[0])
        return (name.split(" ")[0], "".join(sorted(name[t1 + 1:])))

    parts = pq.read_table(
        SF0001 + "/part.parquet", columns=["p_partkey", "p_name"]
    ).to_pylist()
    blocks = {}
    for r in parts:
        blocks.setdefault(blocksig(r["p_name"]), []).append(
            (r["p_partkey"], r["p_name"])
        )
    want = {}
    n_self = 0
    for r in parts:
        key, name = r["p_partkey"], r["p_name"]
        if key % JW_PROBE_MOD != 0:
            continue
        h = int(hashlib.md5(f"jwp|{key}".encode()).hexdigest()[:15], 16)
        t1 = len(name.split(" ")[0])
        pos = t1 + 2 + h % (len(name) - t1 - 3)  # 1-based SQL position
        i = pos - 1
        probe = name[:i] + name[i + 1] + name[i] + name[i + 2:]
        best = None
        for mid, mname in blocks.get(blocksig(probe), []):
            jw = jaro_winkler(probe, mname)
            if best is None or jw > best[1] or (jw == best[1] and mid < best[0]):
                best = (mid, jw)
        want[key] = best
        if best and best[0] == key:
            n_self += 1
    got = {
        r["probe_id"]: (r["match_id"], r["jw"], r["matched_self"])
        for r in load_all()["text_jaro_winkler_join"].fn(spark, SF0001).collect()
    }
    assert set(got) == set(want)
    for k, (mid, jw) in want.items():
        assert got[k][0] == mid, (k, got[k], mid, jw)
        assert got[k][1] == jw
        assert got[k][2] == (1 if mid == k else 0)
    assert n_self > 0  # the typo is usually recoverable — non-vacuous


def test_audio_vad_matches_python(spark):
    """Replay the whole audio lane in Python: md5 fake PCM, frame
    energies, threshold, segment runs — per-doc stats must be equal."""
    import hashlib

    import pyarrow.parquet as pq

    from posting_lines_spark.operators.multimodal import (
        AUDIO_NF_MOD,
        AUDIO_SAMPLES_PER_FRAME,
    )
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.stream_q import VAD_THRESH
    from tests.conftest import SF0001

    doc_ids = [
        r["doc_id"]
        for r in pq.read_table(SF0001 + "/documents.parquet", columns=["doc_id"]).to_pylist()
    ]
    want = {}
    for doc_id in doc_ids:
        nf = 1 + doc_id % AUDIO_NF_MOD
        sp = []
        for f in range(nf):
            d = hashlib.md5(f"{doc_id}:{f}:vad".encode()).digest()
            e = sum(
                (int.from_bytes(d[2 * s : 2 * s + 2], "big") - 32768) ** 2
                for s in range(AUDIO_SAMPLES_PER_FRAME)
            )
            sp.append(1 if e > VAD_THRESH else 0)
        runs = []
        cur = 0
        for v in sp:
            if v:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        want[doc_id] = (nf, sum(sp), len(runs), max(runs) if runs else 0)
    got = {
        r["doc_id"]: (r["n_frames"], r["n_speech"], r["n_segments"], r["max_run"])
        for r in load_all()["multimodal_audio_vad"].fn(spark, SF0001).collect()
    }
    assert got == want


def test_page_trend_matches_python(spark):
    """Replay Page's L: blocks = days, treatments = alphabetical event
    types, midranks on zero-filled daily cents, tie-uncorrected z."""
    from posting_lines_spark.queries import load_all
    from tests.conftest import SF0001

    cells = {}
    for r in _events_rows():
        day = r["ts_us"] // 86_400_000_000
        key = (day, r["event_type"])
        cells[key] = cells.get(key, 0) + r["cents"]
    days = sorted({d for d, _ in cells})
    types = sorted({t for _, t in cells})
    k, n = len(types), len(days)
    L = 0.0
    for d in days:
        vals = [cells.get((d, t), 0) for t in types]
        for j, t in enumerate(types, 1):
            v = cells.get((d, t), 0)
            rank = (
                sum(1 for x in vals if x < v)
                + (sum(1 for x in vals if x == v) + 1) / 2.0
            )
            L += j * rank
    e = n * k * (k + 1) ** 2 / 4.0
    var = n * k * k * (k + 1) ** 2 * (k - 1) / 144.0
    z = (L - e) / var**0.5
    got = load_all()["stats_page_trend"].fn(spark, SF0001).collect()[0]
    assert (got["k"], got["n"]) == (k, n)
    assert abs(got["l_stat"] - L) < 1e-9
    assert abs(got["l_expected"] - e) < 1e-9
    assert abs(got["z"] - z) < 1e-9


def test_powerlaw_mle_matches_python(spark):
    """CSN continuous MLE replay over the co-order degree tail, with
    the kernel-identical dln mirror."""
    from posting_lines_spark.functions.dmath import dln_int_py
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.graph_q import PL_DMIN
    from tests.conftest import SF0001

    pairs = _lpa_edges_python()
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    tail = [d for d in deg.values() if d >= PL_DMIN]
    s = sum(dln_int_py(d) - dln_int_py(PL_DMIN) for d in tail)
    alpha = 1.0 + len(tail) / s
    got = load_all()["graph_powerlaw_mle"].fn(spark, SF0001).collect()[0]
    assert got["n_tail"] == len(tail)
    assert got["d_min"] == PL_DMIN
    assert abs(got["alpha"] - alpha) < 1e-9
    assert abs(got["alpha_se"] - (alpha - 1) / len(tail) ** 0.5) < 1e-9


def test_periodogram_matches_python(spark):
    """Replay the quadrant-reduced deterministic-trig periodogram with
    the dcos_py/dsin_py kernel mirrors."""
    import math

    from posting_lines_spark.functions.geo import dcos_py, dsin_py
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.temporal_q import PERIODOGRAM_PERIODS
    from tests.conftest import SF0001

    daily = {}
    for r in _events_rows():
        day = r["ts_us"] // 86_400_000_000
        key = (r["event_type"], day)
        daily[key] = daily.get(key, 0) + r["cents"]
    series = {}
    for (et, day), x in daily.items():
        series.setdefault(et, []).append((day, x))
    got = {
        (r["event_type"], r["period_days"]): (r["n_days"], r["power"])
        for r in load_all()["timeseries_periodogram"].fn(spark, SF0001).collect()
    }
    for et, pts in series.items():
        pts.sort()
        d0 = pts[0][0]
        n = len(pts)
        mu = sum(x for _, x in pts) / n
        for p in PERIODOGRAM_PERIODS:
            c = s = 0.0
            for day, x in pts:
                t = day - d0
                r_ = t % p
                q = (4 * r_) // p
                u = (math.pi / 2.0) * ((4 * r_ - q * p) / p)
                cu, su = dcos_py(u), dsin_py(u)
                cos_t = [cu, -su, -cu, su][q]
                sin_t = [su, cu, -su, -cu][q]
                # mirror the engine's scale-2 decimal routing per term
                c += round((x - mu) * cos_t, 2)
                s += round((x - mu) * sin_t, 2)
            power = (c * c + s * s) / n
            gn, gp = got[(et, p)]
            assert gn == n
            assert abs(gp - power) < max(1e-6, 1e-8 * abs(power))


def test_anderson_darling_k_matches_python(spark):
    """Full replay of A²akN + the exact Scholz-Stephens normalization
    (quantized harmonic prefix mirrored with SQL half-up rounding)."""
    from posting_lines_spark.queries import load_all
    from tests.conftest import SF0001

    rows = _events_rows()
    samples = {}
    for r in rows:
        samples.setdefault(r["event_type"], []).append(r["cents"])
    k = len(samples)
    N = sum(len(v) for v in samples.values())
    names = sorted(samples)
    pooled = sorted(set(c for v in samples.values() for c in v))
    l = {z: sum(v.count(z) for v in samples.values()) for z in pooled}
    cum = {}
    acc = 0
    for z in pooled:
        acc += l[z]
        cum[z] = acc
    a2 = 0.0
    for g in names:
        xs = sorted(samples[g])
        n_i = len(xs)
        import bisect

        for z in pooled:
            c = xs.count(z)
            before = bisect.bisect_left(xs, z)
            m2 = 2 * before + c
            b2 = 2 * cum[z] - l[z]
            q = N * m2 - n_i * b2
            den = n_i * (b2 * (2 * N - b2) - N * l[z])
            if den != 0:
                a2 += l[z] * q * q / den
    a2 *= (N - 1) / N
    H = sum(1.0 / len(samples[g]) for g in names)
    # quantized harmonic prefix, SQL round = half away from zero
    r_m = [int(1e15 / m + 0.5) for m in range(1, N)]
    pref = [0]
    for r_ in r_m:
        pref.append(pref[-1] + r_)  # pref[m] = Σ_{1..m}
    rtot = pref[N - 1]
    h = sum(1.0 / m for m in range(1, N))
    g_ = sum((1.0 / j) * ((rtot - pref[N - j]) / 1e15) for j in range(2, N))
    a = (4 * g_ - 6) * (k - 1) + (10 - 6 * g_) * H
    b = (
        (2 * g_ - 4) * k * k + 8 * h * k + (2 * g_ - 14 * h - 4) * H
        - 8 * h + 4 * g_ - 6
    )
    c = (
        (6 * h + 2 * g_ - 2) * k * k + (4 * h - 4 * g_ + 6) * k
        + (2 * h - 6) * H + 4 * h
    )
    d = (2 * h + 6) * k * k - 4 * h * k
    var = (a * N**3 + b * N**2 + c * N + d) / ((N - 1) * (N - 2) * (N - 3))
    t_kn = (a2 - (k - 1)) / var**0.5
    got = load_all()["stats_anderson_darling_k"].fn(spark, SF0001).collect()[0]
    assert (got["n"], got["k"]) == (N, k)
    assert abs(got["a2"] - a2) < 1e-6 * abs(a2)
    assert abs(got["a2_var"] - var) < 1e-6 * abs(var)
    assert abs(got["t_kn"] - t_kn) < 1e-6 * max(1.0, abs(t_kn))


def test_hurst_rs_matches_python(spark):
    """Replay R/S: exact integer W ranges, block std, quantized-ln
    points, s-ordered OLS slope — mirrors the kernel with dln_int_py."""
    from posting_lines_spark.functions.dmath import dln_int_py
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.temporal_q import _HURST_Q, HURST_WINDOWS
    from tests.conftest import SF0001

    daily = {}
    for r in _events_rows():
        day = r["ts_us"] // 86_400_000_000
        key = (r["event_type"], day)
        daily[key] = daily.get(key, 0) + r["cents"]
    series = {}
    for (et, day), x in daily.items():
        series.setdefault(et, []).append((day, x))
    got = {
        r["event_type"]: (r["n_pts"], r["hurst"])
        for r in load_all()["timeseries_hurst_rs"].fn(spark, SF0001).collect()
    }
    for et, pts in series.items():
        pts.sort()
        xs = [x for _, x in pts]
        pts_ln = []
        for s in HURST_WINDOWS:
            rss = []
            for b0 in range(0, len(xs) - s + 1, s):
                blk = xs[b0 : b0 + s]
                if len(blk) < s:
                    continue
                sx = sum(blk)
                sxx = sum(v * v for v in blk)
                var = sxx / s - (sx / s) ** 2
                if var <= 0:
                    continue
                cum = 0
                ws = []
                for t, v in enumerate(blk, 1):
                    cum += v
                    ws.append(s * cum - t * sx)
                r_ = (max(ws) - min(ws)) / s
                rss.append(r_ / var**0.5)
            if not rss:
                continue
            # mirror dsum scale-6 quantization of the block mean
            rs_mean = sum(round(v, 6) for v in rss) / len(rss)
            if rs_mean <= 0:
                continue
            lq = int(rs_mean * _HURST_Q + 0.5)  # SQL round half-up
            pts_ln.append(
                (dln_int_py(s), dln_int_py(lq) - dln_int_py(_HURST_Q))
            )
        n = len(pts_ln)
        sx_ = sum(x for x, _ in pts_ln)
        sy = sum(y for _, y in pts_ln)
        sxy = sum(x * y for x, y in pts_ln)
        sxx_ = sum(x * x for x, _ in pts_ln)
        h = (n * sxy - sx_ * sy) / (n * sxx_ - sx_ * sx_)
        gn, gh = got[et]
        assert gn == n
        assert abs(gh - h) < 1e-6


def test_functional_dependencies_matches_python(spark):
    """FD audit replay: exact distinct counts per candidate, and the
    semantically-known candidates behave (keys hold, reverses fail)."""
    import pyarrow.parquet as pq

    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.schema_q import _FD_CANDIDATES
    from tests.conftest import SF0001

    got = {
        r["fd"]: (r["n_lhs"], r["n_pairs"], r["violations"], r["holds"])
        for r in load_all()["dq_functional_dependencies"].fn(spark, SF0001).collect()
    }
    for tbl, lhs, rhs in _FD_CANDIDATES:
        rows = pq.read_table(
            SF0001 + f"/{tbl}.parquet", columns=[lhs, rhs]
        ).to_pylist()
        n_lhs = len({r[lhs] for r in rows})
        n_pairs = len({(r[lhs], r[rhs]) for r in rows})
        key = f"{tbl}.{lhs}->{rhs}"
        assert got[key] == (
            n_lhs,
            n_pairs,
            n_pairs - n_lhs,
            1 if n_pairs == n_lhs else 0,
        )
    # key -> attribute FDs must hold
    assert got["orders.o_orderkey->o_custkey"][3] == 1
    assert got["nation.n_nationkey->n_regionkey"][3] == 1
    assert got["part.p_partkey->p_name"][3] == 1
    assert got["customer.c_custkey->c_nationkey"][3] == 1
    # reverse of a genuinely many-to-one mapping must fail
    assert got["nation.n_regionkey->n_nationkey"][3] == 0


def test_mood_median_single_group_degenerate(spark):
    """k = 1: χ² must agree across engines (0 when both cells occupied
    — every expected equals its observed)."""
    import duckdb

    from posting_lines_spark.queries.analytics_q import _mood_fold, _mood_sql

    duck = duckdb.connect()

    rows = [("click", v) for v in (1.0, 2.0, 3.0, 4.0)]
    spark.createDataFrame(rows, "event_type string, value double")\
        .createOrReplaceTempView("events")
    got_s = spark.sql(_mood_sql(_mood_fold("spark"))).collect()[0]
    duck.execute("CREATE TABLE events(event_type VARCHAR, value DOUBLE)")
    duck.executemany("INSERT INTO events VALUES (?, ?)", rows)
    got_d = duck.execute(_mood_sql(_mood_fold("duck"))).fetchone()
    duck.close()
    assert (got_s["k"], got_s["dof"]) == (1, 0)
    assert got_s["median_cents"] == 200 == got_d[0]
    assert got_s["chi2"] == got_d[4] == 0.0


def test_variance_ratio_short_series_drops_type(spark):
    """A type with fewer than q+1 days has no q-step diffs: BOTH
    engines drop it via the inner join, no error/NULL divergence."""
    import datetime

    import duckdb

    duck = duckdb.connect()

    from posting_lines_spark.queries.temporal_q import (
        VR_Q,
        _variance_ratio_sql,
    )

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for d in range(VR_Q + 3):  # long type: enough days
        rows.append(("long", base + datetime.timedelta(days=d), 10.0 + d))
    for d in range(2):  # short type: too few
        rows.append(("short", base + datetime.timedelta(days=d), 5.0))
    spark.createDataFrame(rows, "event_type string, ts timestamp, value double")\
        .createOrReplaceTempView("events")
    got_s = spark.sql(_variance_ratio_sql("unix_micros(ts)")).collect()
    duck.execute(
        "CREATE TABLE events(event_type VARCHAR, ts TIMESTAMP, value DOUBLE)"
    )
    duck.executemany("INSERT INTO events VALUES (?, ?, ?)", rows)
    got_d = duck.execute(_variance_ratio_sql("epoch_us(ts)")).fetchall()
    duck.close()
    assert [r["event_type"] for r in got_s] == ["long"]
    assert [r[0] for r in got_d] == ["long"]
    assert got_s[0]["vr"] == got_d[0][3]


def test_brunner_munzel_matches_python(spark):
    """Replay BM from scratch with midranks over raw values (no cents
    grid) — validates the window algebra, the exact T_iv mean-clearing,
    and the final W/df chain."""
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.analytics_q import _MW_A, _MW_B
    from tests.conftest import SF0001

    xs, ys = [], []
    for r in _events_rows():
        if r["event_type"] == _MW_A:
            xs.append(r["cents"])
        elif r["event_type"] == _MW_B:
            ys.append(r["cents"])
    pooled = sorted(xs + ys)
    n1, n2 = len(xs), len(ys)

    def midranks(vals, within):
        import bisect

        w = sorted(within)
        out = []
        for v in vals:
            lo, hi = bisect.bisect_left(w, v), bisect.bisect_right(w, v)
            out.append((lo + hi + 1) / 2.0)
        return out

    rc1 = midranks(xs, pooled)
    rc2 = midranks(ys, pooled)
    r1 = midranks(xs, xs)
    r2 = midranks(ys, ys)
    rb1 = sum(rc1) / n1
    rb2 = sum(rc2) / n2
    s1 = sum(
        (a - b - rb1 + (n1 + 1) / 2.0) ** 2 for a, b in zip(rc1, r1)
    ) / (n1 - 1)
    s2 = sum(
        (a - b - rb2 + (n2 + 1) / 2.0) ** 2 for a, b in zip(rc2, r2)
    ) / (n2 - 1)
    p_hat = (rb2 - (n2 + 1) / 2.0) / n1
    w = n1 * n2 * (rb2 - rb1) / (n1 + n2) / (n1 * s1 + n2 * s2) ** 0.5
    df = (n1 * s1 + n2 * s2) ** 2 / (
        (n1 * s1) ** 2 / (n1 - 1) + (n2 * s2) ** 2 / (n2 - 1)
    )
    got = load_all()["stats_brunner_munzel"].fn(spark, SF0001).collect()[0]
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert abs(got["p_hat"] - p_hat) < 1e-12
    assert abs(got["w_stat"] - w) < 1e-9
    assert abs(got["df"] - df) < 1e-6 * df


def test_cvm_ksamples_matches_python(spark):
    """Replay T = (1/N)Σᵢ nᵢ Σⱼ (lⱼ/N)(F_ij − F̄_j)² with exact
    fractions (integer Q algebra mirrored)."""
    from fractions import Fraction

    from posting_lines_spark.queries import load_all
    from tests.conftest import SF0001

    samples = {}
    for r in _events_rows():
        samples.setdefault(r["event_type"], []).append(r["cents"])
    N = sum(len(v) for v in samples.values())
    pooled = sorted(set(c for v in samples.values() for c in v))
    l = {z: sum(v.count(z) for v in samples.values()) for z in pooled}
    cum = {}
    acc = 0
    for z in pooled:
        acc += l[z]
        cum[z] = acc
    t = Fraction(0)
    import bisect

    for g, xs in samples.items():
        xs = sorted(xs)
        n_i = len(xs)
        for z in pooled:
            cum_i = bisect.bisect_right(xs, z)
            q = N * cum_i - n_i * cum[z]
            t += Fraction(l[z] * q * q, n_i)
    t = t / N**3
    got = load_all()["stats_cvm_ksamples"].fn(spark, SF0001).collect()[0]
    assert (got["n"], got["k"]) == (N, len(samples))
    assert abs(got["cvm_t"] - float(t)) < 1e-9 * max(1.0, float(t))
