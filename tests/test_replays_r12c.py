"""Round-12 replay batch 3: ten more pure-Python replays for the
verbatim-shared-text risk class (rationale in tests/test_replays_r12.py).
Targets: q5/q15, scalar/lateral subqueries, map functions, MAD anomaly
gate (exact half-integer percentile interpolation mirrored), the three
deterministic-hash sampling/capping primitives, and vocab-OOV."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from tests.conftest import SF0001


def _tbl(name: str) -> list[dict]:
    return pq.read_table(f"{SF0001}/{name}.parquet").to_pylist()


def _dsum(values, scale: int = 6) -> float:
    q = Decimal(1).scaleb(-scale)
    tot = Decimal(0)
    for v in values:
        tot += Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP)
    return float(str(tot))


def _md5_int(s: str, salt: str) -> int:
    return int(hashlib.md5(f"{salt}|{s}".encode()).hexdigest()[:15], 16)


def _run(spark, name):
    from posting_lines_spark.queries import load_all

    return load_all()[name].fn(spark, SF0001).collect()


def _pctl_cont(sorted_ints, q):
    """SQL percentile(): linear interpolation at rank (n-1)*q over the
    SORTED values — on integers every midpoint is exact in binary."""
    n = len(sorted_ints)
    pos = (n - 1) * q
    lo = int(pos)
    frac = pos - lo
    if lo + 1 < n:
        return sorted_ints[lo] + (sorted_ints[lo + 1] - sorted_ints[lo]) * frac
    return float(sorted_ints[lo])


def test_replay_anomaly_mad(spark):
    by_t = defaultdict(list)
    for e in _tbl("events"):
        by_t[e["event_type"]].append(e)
    flagged = {}
    for t, es in by_t.items():
        vs = sorted(round(e["value"] * 100) for e in es)
        med = _pctl_cont(vs, 0.5)
        mad = _pctl_cont(sorted(abs(v - med) for v in vs), 0.5)
        for e in es:
            v = round(e["value"] * 100)
            if abs(v - med) > 6.0 * mad:
                flagged[e["event_id"]] = (med / 100.0, mad / 100.0)
    got = _run(spark, "anomaly_mad")
    assert {r["event_id"] for r in got} == set(flagged)
    for r in got:
        med, mad = flagged[r["event_id"]]
        assert r["group_median"] == med and r["group_mad"] == mad
    assert flagged


def test_replay_scalar_subquery(spark):
    orders = _tbl("orders")
    avg = _dsum([o["o_totalprice"] for o in orders]) / len(orders)
    ranked = sorted(orders, key=lambda o: (-o["o_totalprice"], o["o_orderkey"]))[:50]
    got = _run(spark, "scalar_subquery")
    assert [(r["o_orderkey"], r["price_ratio"]) for r in got] == [
        (o["o_orderkey"], o["o_totalprice"] / avg) for o in ranked
    ]


def test_replay_lateral_topn(spark):
    nations = {n["n_nationkey"]: n["n_name"] for n in _tbl("nation")}
    by_nat = defaultdict(list)
    for c in _tbl("customer"):
        by_nat[c["c_nationkey"]].append((-c["c_acctbal"], c["c_name"]))
    want = []
    for nk, rows in by_nat.items():
        for negbal, name in sorted(rows)[:2]:
            want.append((nations[nk], name, -negbal))
    want.sort(key=lambda t: (t[0], -t[2], t[1]))
    got = [(r["nation"], r["customer"], r["acctbal"]) for r in _run(spark, "lateral_topn")]
    assert got == want
    assert len(want) >= 2 * 5  # several nations contribute 2 rows each


def test_replay_map_funcs(spark):
    lc = Counter((d["source"], d["lang"]) for d in _tbl("documents"))
    per_src = defaultdict(dict)
    for (s, lang), n in lc.items():
        per_src[s][lang] = n
    got = {r["source"]: r for r in _run(spark, "map_funcs")}
    assert set(got) == set(per_src)
    for s, langs in per_src.items():
        assert got[s]["n_langs"] == len(langs)
        assert got[s]["lang_counts"] == "|".join(
            f"{k}:{langs[k]}" for k in sorted(langs)
        )
        assert len(langs) > 1  # multi-language sources: map is non-trivial


def test_replay_sample_weighted(spark):
    from posting_lines_spark.queries.curation_q import WEIGHTED_K

    docs = _tbl("documents")
    # SQL casts the 60-bit hash to DOUBLE *before* dividing; Python's
    # int/int division rounds the exact rational instead — mirror the
    # cast-first order or the last ulp differs.
    pri = sorted(
        (
            float(_md5_int(str(d["doc_id"]), "wsamp")) / float(d["n_chars"]),
            d["doc_id"],
            d["source"],
            d["n_chars"],
        )
        for d in docs
    )[:WEIGHTED_K]
    got = [
        (r["priority"], r["doc_id"], r["source"], r["weight"])
        for r in _run(spark, "sample_weighted")
    ]
    assert got == pri
    # length-weighting is live: winners skew longer than the corpus mean
    mean_chars = sum(d["n_chars"] for d in docs) / len(docs)
    assert sum(w for _, _, _, w in pri) / WEIGHTED_K > 0.8 * mean_chars


def test_replay_sample_bottomk_per_group(spark):
    from posting_lines_spark.queries.curation_q import BOTTOMK_K

    by_src = defaultdict(list)
    for d in _tbl("documents"):
        by_src[d["source"]].append(d["doc_id"])
    want = []
    for src in sorted(by_src):
        ranked = sorted(by_src[src], key=lambda i: (_md5_int(str(i), "bk"), i))
        for rk, did in enumerate(ranked[:BOTTOMK_K], start=1):
            want.append((src, did, rk))
    got = [(r["source"], r["doc_id"], r["sample_rank"]) for r in _run(spark, "sample_bottomk_per_group")]
    assert got == want


def test_replay_text_vocab_oov(spark):
    from posting_lines_spark.queries.text_q import OOV_VOCAB_K

    grams = []
    for d in _tbl("documents"):
        t = d["text"]
        if len(t) >= 3:
            grams.extend((d["source"], t[i : i + 3]) for i in range(len(t) - 2))
    counts = Counter(g for _, g in grams)
    vocab = {
        g
        for g, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :OOV_VOCAB_K
        ]
    }
    stats = defaultdict(lambda: [0, 0, set()])
    for src, g in grams:
        s = stats[src]
        s[0] += 1
        if g not in vocab:
            s[1] += 1
            s[2].add(g)
    got = {r["source"]: r for r in _run(spark, "text_vocab_oov")}
    assert set(got) == set(stats)
    for src, (n, oov, types) in stats.items():
        r = got[src]
        assert r["n_tokens"] == n
        assert r["n_oov"] == oov
        assert r["oov_rate"] == oov / n
        assert r["n_oov_types"] == len(types)
        assert 0.0 < r["oov_rate"] < 1.0  # vocab neither trivial nor total


def test_replay_q15_top_supplier(spark):
    rev = defaultdict(list)
    for li in _tbl("lineitem"):
        d = li["l_shipdate"].strftime("%Y-%m-%d")
        if "1996-01-01" <= d < "1996-04-01":
            rev[li["l_suppkey"]].append(
                li["l_extendedprice"] * (1.0 - li["l_discount"])
            )
    totals = {k: _dsum(v) for k, v in rev.items()}
    best = max(totals.values())
    names = {s["s_suppkey"]: s["s_name"] for s in _tbl("supplier")}
    want = sorted(
        (k, names[k], v) for k, v in totals.items() if v == best
    )
    got = [(r["s_suppkey"], r["s_name"], r["total_revenue"]) for r in _run(spark, "q15_top_supplier")]
    assert got == want and len(got) >= 1


def test_replay_q5_local_supplier(spark):
    nations = {
        n["n_nationkey"]: (n["n_name"], n["n_regionkey"]) for n in _tbl("nation")
    }
    asia = {
        r["r_regionkey"] for r in _tbl("region") if r["r_name"] == "ASIA"
    }
    cust_nat = {c["c_custkey"]: c["c_nationkey"] for c in _tbl("customer")}
    supp_nat = {s["s_suppkey"]: s["s_nationkey"] for s in _tbl("supplier")}
    ord_ok = {}
    for o in _tbl("orders"):
        d = o["o_orderdate"].strftime("%Y-%m-%d")
        if "1996-01-01" <= d < "1997-01-01":
            ord_ok[o["o_orderkey"]] = cust_nat[o["o_custkey"]]
    rev = defaultdict(list)
    for li in _tbl("lineitem"):
        cn = ord_ok.get(li["l_orderkey"])
        if cn is None:
            continue
        sn = supp_nat[li["l_suppkey"]]
        if sn == cn and nations[sn][1] in asia:
            rev[nations[sn][0]].append(
                li["l_extendedprice"] * (1.0 - li["l_discount"])
            )
    want = sorted(
        ((n, _dsum(v)) for n, v in rev.items()), key=lambda t: (-t[1], t[0])
    )
    got = [(r["n_name"], r["revenue"]) for r in _run(spark, "q5_local_supplier")]
    # sf0.001's cyclic same-nation constraint leaves one qualifying
    # nation; the value equality is the check, breadth comes at sf0.01+
    assert got == want and len(want) >= 1


def test_replay_geo_heatmap_counts(spark):
    """Partial replay of geo_heatmap_grid: the n_points per cell derive
    from the projected coordinates, which we take from the ENGINE's own
    enrichment (the Albers kernel has its own dedicated parity tests in
    test_geo.py); what this verifies independently is the tiling math
    and both zoom aggregations."""
    import math

    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.geo_q import enriched_sql
    from posting_lines_spark.sources import load_table

    load_table(spark, SF0001, "lineitem").createOrReplaceTempView("lineitem")
    pts = spark.sql(f"SELECT x1, y1 FROM ({enriched_sql()})").collect()
    cells = Counter()
    for p in pts:
        cells[(1, math.floor(p["x1"] / 400000.0), math.floor(p["y1"] / 400000.0))] += 1
        cells[(2, math.floor(p["x1"] / 100000.0), math.floor(p["y1"] / 100000.0))] += 1
    got = _run(spark, "geo_heatmap_grid")
    assert len(got) == len(cells)
    for r in got:
        assert cells[(r["zoom"], r["cell_x"], r["cell_y"])] == r["n_points"]
