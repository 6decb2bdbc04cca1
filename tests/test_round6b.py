"""Independent replays + properties for the round-6 fifth/sixth waves.

Same discipline as tests/test_round6.py: each statistical query gets a
plain-Python replay so correctness doesn't rest only on the cross-engine
oracle; algorithmic queries get their guarantee property pinned.
"""

from __future__ import annotations

import hashlib
import math
import re
import statistics
from collections import defaultdict
from decimal import Decimal

import pyarrow.parquet as pq

from tests.conftest import SF0001


def _events(cols):
    return pq.read_table(f"{SF0001}/events.parquet", columns=cols).to_pylist()


def _events_us():
    """(event_id, ts_us, user_id, event_type, value) with int64 micros."""
    t = pq.read_table(f"{SF0001}/events.parquet")
    ts_us = t.column("ts").cast("int64").to_pylist()
    rows = t.to_pylist()
    for r, us in zip(rows, ts_us):
        r["ts_us"] = us
    return rows


def _midranks(values):
    """value -> average rank over the sorted multiset."""
    s = sorted(values)
    out = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        out[s[i]] = (i + 1 + j) / 2.0
        i = j
    return out


def _daily_means():
    """Per (event_type, day) decimal-routed daily means, mirroring
    davg_expr (DECIMAL(38,6) sum -> string -> double -> /n)."""
    rows = _events_us()
    acc = defaultdict(lambda: [Decimal(0), 0])
    for r in rows:
        day = r["ts_us"] // 86_400_000_000
        a = acc[(r["event_type"], day)]
        a[0] += Decimal(repr(r["value"])).quantize(Decimal("0.000001"))
        a[1] += 1
    series = defaultdict(list)
    for (et, day), (s, n) in sorted(acc.items()):
        series[et].append((day, float(str(s)) / n))
    return {et: [v for _, v in sorted(pts)] for et, pts in series.items()}


# --- Spearman: midrank + Pearson replay ---


def test_spearman_matches_python_replay(spark):
    from posting_lines_spark.queries import load_all

    rows = _events(["user_id", "event_type"])
    x = defaultdict(int)
    y = defaultdict(int)
    users = set()
    for r in rows:
        users.add(r["user_id"])
        if r["event_type"] == "click":
            x[r["user_id"]] += 1
        elif r["event_type"] == "purchase":
            y[r["user_id"]] += 1
    xs = [x[u] for u in users]
    ys = [y[u] for u in users]
    rx_map, ry_map = _midranks(xs), _midranks(ys)
    rx = [rx_map[v] for v in xs]
    ry = [ry_map[v] for v in ys]
    n = len(users)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    rho = num / den

    row = load_all()["stats_spearman_corr"].fn(spark, SF0001).collect()[0]
    assert row.n == n
    assert abs(row.spearman_rho - rho) < 1e-9


# --- Kruskal-Wallis: pooled midrank replay ---


def test_kruskal_wallis_matches_python_replay(spark):
    from posting_lines_spark.queries import load_all

    rows = _events(["event_type", "value"])
    groups = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append(r["value"])
    pooled = [v for vs in groups.values() for v in vs]
    ranks = _midranks(pooled)
    nt = len(pooled)
    # tie sum
    from collections import Counter

    tie_sum = sum(t**3 - t for t in Counter(pooled).values())
    rsum = sum(
        (sum(ranks[v] for v in vs)) ** 2 / len(vs) for vs in groups.values()
    )
    h = (12.0 / (nt * (nt + 1.0)) * rsum - 3.0 * (nt + 1.0)) / (
        1.0 - tie_sum / (nt**3 - nt)
    )

    row = load_all()["stats_kruskal_wallis"].fn(spark, SF0001).collect()[0]
    assert (row.nt, row.tie_sum) == (nt, tie_sum)
    assert abs(row.h_stat - h) < 1e-9


# --- Theil-Sen: pairwise-slope median replay ---


def test_theilsen_matches_python_replay(spark):
    from posting_lines_spark.queries import load_all

    series = _daily_means()
    out = {
        r.event_type: r
        for r in load_all()["timeseries_theilsen_slope"].fn(spark, SF0001).collect()
    }
    for et, vs in series.items():
        n = len(vs)
        slopes = [
            (vs[j] - vs[i]) / (j - i) for i in range(n) for j in range(i + 1, n)
        ]
        slope = statistics.median(slopes)
        intercept = statistics.median(v - slope * (i + 1) for i, v in enumerate(vs))
        r = out[et]
        assert r.n_pairs == len(slopes)
        assert abs(r.slope - slope) < 1e-9
        assert abs(r.intercept - intercept) < 1e-9


# --- Hampel: rolling median/MAD replay ---


def test_hampel_matches_python_replay(spark):
    from posting_lines_spark.queries import load_all

    series = _daily_means()
    expected = set()
    for et, vs in series.items():
        n = len(vs)
        for i in range(n):
            lo, hi = max(0, i - 3), min(n, i + 4)
            win = vs[lo:hi]
            med = statistics.median(win)
            mad = statistics.median(abs(w - med) for w in win)
            if abs(vs[i] - med) > 3.0 * 1.4826 * mad:
                expected.add((et, i))
    got = load_all()["timeseries_hampel_outliers"].fn(spark, SF0001).collect()
    # map day back to index per type
    rows = _events_us()
    days = defaultdict(set)
    for r in rows:
        days[r["event_type"]].add(r["ts_us"] // 86_400_000_000)
    day_idx = {
        et: {d: i for i, d in enumerate(sorted(ds))} for et, ds in days.items()
    }
    got_keys = {(r.event_type, day_idx[r.event_type][r.day]) for r in got}
    assert got_keys == expected


# --- Holt-Winters: recurrence replay ---


def test_holt_winters_matches_python_replay(spark):
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.temporal_q import (
        HW_ALPHA,
        HW_BETA,
        HW_GAMMA,
        HW_PERIOD,
    )

    series = _daily_means()
    out = {
        r.event_type: r
        for r in load_all()["timeseries_holt_winters"].fn(spark, SF0001).collect()
    }
    m = HW_PERIOD
    for et, vs in series.items():
        if len(vs) < 2 * m:
            assert et not in out
            continue
        l = sum(vs[:m]) / float(m)
        b = (sum(vs[m : 2 * m]) / float(m) - l) / float(m)
        s = [v - l for v in vs[:m]]
        for y in vs[2 * m :]:
            new_l = HW_ALPHA * (y - s[0]) + (1 - HW_ALPHA) * (l + b)
            new_b = HW_BETA * (new_l - l) + (1 - HW_BETA) * b
            new_s = HW_GAMMA * (y - new_l) + (1 - HW_GAMMA) * s[0]
            s = s[1:] + [new_s]
            l, b = new_l, new_b
        r = out[et]
        assert abs(r.level - l) < 1e-9
        assert abs(r.trend - b) < 1e-9
        assert abs(r.forecast_next - (l + b + s[0])) < 1e-9


# --- SAX: z-norm + PAA + breakpoint replay ---


def test_sax_matches_python_replay(spark):
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.temporal_q import SAX_W

    series = _daily_means()
    out = {
        r.event_type: r.sax
        for r in load_all()["timeseries_sax_symbols"].fn(spark, SF0001).collect()
    }
    breaks = [-0.8416212335729142, -0.2533471031357997, 0.2533471031357997,
              0.8416212335729142]
    for et, vs in series.items():
        n = len(vs)
        mu = sum(vs) / n
        sd = math.sqrt(sum(v * v for v in vs) / n - mu * mu)
        z = [(v - mu) / sd for v in vs]
        segs = defaultdict(list)
        for i, zv in enumerate(z):
            segs[(i * SAX_W) // n].append(zv)
        sax = ""
        for sg in sorted(segs):
            m = sum(segs[sg]) / len(segs[sg])
            k = sum(1 for b in breaks if m >= b)
            sax += "abcde"[k]
        assert out[et] == sax, et


# --- MIPS: exactness + monotonicity properties ---


def test_mips_dots_exact_and_monotone(spark):
    from posting_lines_spark.queries import load_all

    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in pq.read_table(f"{SF0001}/embeddings.parquet").to_pylist()
    }
    rows = load_all()["sim_mips_norm_augment"].fn(spark, SF0001).collect()
    assert rows
    m2 = max(sum(x * x for x in v) for v in emb.values())
    by_q = defaultdict(list)
    for r in rows:
        by_q[r.query_id].append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        qv = emb[q]
        qn = math.sqrt(sum(x * x for x in qv))
        prev = None
        for r in rs:
            # reported dot equals the exact dot of the raw vectors
            exact = sum(a * b for a, b in zip(qv, emb[r.vec_id]))
            assert abs(r.dot - exact) < 1e-9
            # ranks descend by dot
            assert prev is None or r.dot <= prev + 1e-12
            prev = r.dot
            # monotonicity of the reduction: augmented cosine ordering
            # == dot ordering (cos = dot / (|q|·M), a fixed positive scale)
            assert abs(
                (r.dot / (qn * math.sqrt(m2)))
                - (exact / (qn * math.sqrt(m2)))
            ) < 1e-12


# --- readability: regex replay ---


def test_readability_matches_python_replay(spark):
    from posting_lines_spark.queries import load_all

    docs = pq.read_table(
        f"{SF0001}/documents.parquet", columns=["source", "text"]
    ).to_pylist()
    agg = defaultdict(lambda: [0, 0.0, 0.0, 0])  # n, sum_wps, sum_score, easy
    for d in docs:
        words = len(d["text"].split(" "))
        if words == 0:
            continue
        sents = max(len(re.findall(r"[.!?]+", d["text"])), 1)
        syll = len(re.findall(r"[aeiouy]+", d["text"].lower()))
        score = 206.835 - 1.015 * (words / sents) - 84.6 * (syll / words)
        a = agg[d["source"]]
        a[0] += 1
        a[1] += words / sents
        a[2] += score
        a[3] += 1 if score >= 60.0 else 0
    out = load_all()["text_readability"].fn(spark, SF0001).collect()
    for r in out:
        n, swps, ssc, easy = agg[r.source]
        assert r.n_docs == n
        assert abs(r.avg_words_per_sentence - swps / n) < 1e-6
        assert abs(r.avg_flesch - ssc / n) < 1e-6
        assert r.n_easy == easy


# --- peak concurrency: brute-force sweep replay ---


def test_peak_concurrency_matches_python_replay(spark):
    from posting_lines_spark.queries import load_all

    rows = _events_us()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts_us"], r["event_id"]))
    spans = []
    for u, ts in by_user.items():
        ts.sort()
        start = prev = ts[0][0]
        for t, _ in ts[1:]:
            if t - prev > 1_800_000_000:
                spans.append((start, prev))
                start = t
            prev = t
        spans.append((start, prev))
    bounds = defaultdict(lambda: [0, 0])
    for s, e in spans:
        bounds[s][0] += 1
        bounds[e][1] += 1
    run_p = run_m = 0
    peak = defaultdict(int)
    started = defaultdict(int)
    for t in sorted(bounds):
        p, m = bounds[t]
        run_p += p
        bal = run_p - run_m  # ends at t subtract AFTER starts at t
        run_m += m
        day = t // 86_400_000_000
        peak[day] = max(peak[day], bal)
        started[day] += p
    out = load_all()["events_peak_concurrency"].fn(spark, SF0001).collect()
    got = {r.day: (r.peak_concurrency, r.sessions_started) for r in out}
    assert got == {d: (peak[d], started[d]) for d in started if started[d] or peak[d]}


# --- l-diversity: plain groupby replay ---


def test_l_diversity_matches_python_replay(spark):
    from posting_lines_spark.queries import load_all

    rows = pq.read_table(f"{SF0001}/customer.parquet").to_pylist()
    cls = defaultdict(lambda: [set(), 0])
    for r in rows:
        band = math.floor(r["c_acctbal"] / 1000.0)
        c = cls[(r["c_nationkey"], band)]
        c[0].add(r["c_mktsegment"])
        c[1] += 1
    per_nation = defaultdict(lambda: [0, 0, 0, 99])
    for (nk, _), (sens, size) in cls.items():
        p = per_nation[nk]
        p[0] += 1
        if len(sens) < 3:
            p[1] += 1
            p[2] += size
        p[3] = min(p[3], len(sens))
    out = load_all()["privacy_l_diversity"].fn(spark, SF0001).collect()
    for r in out:
        p = per_nation[r.c_nationkey]
        assert (r.n_classes, r.n_undiverse_classes, r.rows_at_risk,
                r.min_diversity) == tuple(p)


# --- DP release: kernel + inverse-CDF replay ---


def test_dp_release_matches_python_replay(spark):
    from posting_lines_spark.functions.dmath import dln_int_py
    from posting_lines_spark.queries import load_all

    docs = pq.read_table(
        f"{SF0001}/documents.parquet", columns=["source"]
    ).to_pylist()
    counts = defaultdict(int)
    for d in docs:
        counts[d["source"]] += 1
    out = load_all()["privacy_dp_release"].fn(spark, SF0001).collect()
    assert len(out) == len(counts)
    for r in out:
        h = int(hashlib.md5(f"dplap|{r.source}".encode()).hexdigest()[:15], 16)
        k = h % 1999 - 999
        sgn = (k > 0) - (k < 0)
        noise = 2.0 * sgn * (dln_int_py(1000) - dln_int_py(1000 - abs(k)))
        assert r.n_true == counts[r.source]
        assert abs(r.released_count - (counts[r.source] + noise)) < 1e-9
        # the mechanism actually perturbs (not all-zero noise)
    assert any(abs(r.released_count - r.n_true) > 0.01 for r in out)


# --- permutation test: md5-parity replay ---


def test_permutation_test_matches_python_replay(spark):
    from posting_lines_spark.queries import load_all

    rows = _events(["event_id", "event_type", "value"])
    pts = [
        (r["event_id"], r["event_type"], r["value"])
        for r in rows
        if r["event_type"] in ("purchase", "click")
    ]
    na = sum(1 for _, t, _ in pts if t == "purchase")
    nb = len(pts) - na
    sa = sum(v for _, t, v in pts if t == "purchase")
    sb = sum(v for _, t, v in pts if t == "click")
    gap_obs = sa / na - sb / nb
    n_ext = 0
    for b in range(64):
        ra = rb = 0
        ca = cb = 0
        for eid, _, v in pts:
            h = int(
                hashlib.md5(f"perm|{eid}_{b}".encode()).hexdigest()[:15], 16
            )
            if h % 2 == 1:
                ra += v
                ca += 1
            else:
                rb += v
                cb += 1
        if ca == 0 or cb == 0 or abs(ra / ca - rb / cb) >= abs(gap_obs):
            n_ext += 1
    row = load_all()["stats_permutation_test"].fn(spark, SF0001).collect()[0]
    assert (row.na, row.nb, row.b_total) == (na, nb, 64)
    assert abs(row.gap_obs - gap_obs) < 1e-6
    assert row.n_extreme == n_ext
    assert abs(row.p_value - (1 + n_ext) / 65.0) < 1e-12
