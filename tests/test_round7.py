"""Round-7 replay tests: the perceptual-hash dedup family.

The r6 verdict flagged `multimodal_phash_dedup` as shipped outside every
gate (no replay test, vacuous sf0.01 parity — 0 rows on both engines).
These tests close that: a NON-EMPTY expected pair set via the synthetic
twin, the Hamming T / T+1 banding boundary, the empty-payload contract
(r6 ADVICE), and an independent pure-Python replay of phash48 itself.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from posting_lines_spark.operators.multimodal import PHASH_BITS
from posting_lines_spark.queries.stream_q import PHASH_HAM_T, _phash_pairs_sql
from tests.conftest import SF001


def _phash_py(payload: bytes) -> int:
    """Independent replay of operators/multimodal.phash48 byte math."""
    n = len(payload)
    if n == 0:
        return 0
    pos = [k * (n - 1) // (PHASH_BITS - 1) for k in range(PHASH_BITS)]
    smp = [payload[p] for p in pos]
    s = sum(smp)
    h = 0
    for k, v in enumerate(smp):
        if v * PHASH_BITS > s:
            h |= 1 << k
    return h


def test_phash48_matches_python_replay(spark):
    from posting_lines_spark.operators import multimodal
    from posting_lines_spark.sources import load_table

    d = load_table(spark, SF001, "documents").limit(200)
    got = {
        r["doc_id"]: r["phash"]
        for r in multimodal.phash48(multimodal.attach_payload(d)).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}
    assert got and set(got) == set(texts)
    for doc_id, text in texts.items():
        assert got[doc_id] == _phash_py(text.encode("utf-8")), doc_id


def test_phash_synth_pairs_nonempty_with_hamming0_copies(spark):
    """The synthetic twin must produce a NON-EMPTY pair set at the
    driver's correctness SF, and every (doc, byte-identical copy) pair
    must be present at hamming 0 — the non-vacuous guarantee."""
    from posting_lines_spark.queries import load_all

    df = load_all()["multimodal_phash_dedup_synth"].fn(spark, SF001)
    rows = df.collect()
    assert len(rows) > 0
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    base_ids = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    base_ids = [i for i in base_ids if i < 10000000]
    # every base doc has its +10M byte-identical copy at hamming 0
    assert len(base_ids) >= 1
    for i in base_ids:
        assert pairs.get((i, i + 10000000)) == 0, i
    # all reported distances respect the threshold
    assert all(0 <= h <= PHASH_HAM_T for h in pairs.values())


def test_phash_banding_hamming_boundary(spark):
    """Pigeonhole banding boundary: with 4 bands × 12 bits, a pair at
    hamming T=3 with the flips spread over 3 bands is found (band 4
    intact), while a pair at T+1=4 with one flip PER band shares no band
    and must be absent — and would be dropped by the verify filter even
    if a band collided."""
    h = 0x123456789ABC
    b_ham3 = h ^ (1 << 0) ^ (1 << 12) ^ (1 << 24)  # bands 0,1,2 touched
    c_ham4 = b_ham3 ^ (1 << 36)  # one flip in every band
    spark.createDataFrame(
        [(1, h), (2, b_ham3), (3, c_ham4)], "doc_id long, phash long"
    ).createOrReplaceTempView("pls_phash_boundary")
    rows = spark.sql(
        _phash_pairs_sql(
            "SELECT doc_id, phash FROM pls_phash_boundary",
            lambda b: f"shiftright(phash, {12 * b}) & 4095",
            "bit_count(ph_a ^ ph_b)",
        )
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    # (1,2) at hamming 3: kept (band 3 intact). (2,3) differ in bit 36
    # only → hamming 1: kept. (1,3) at hamming 4 with one flip per band:
    # no shared band, absent.
    assert got == {(1, 2): 3, (2, 3): 1}
    assert (1, 3) not in got


def test_phash_empty_payload_excluded(spark):
    """r6 ADVICE: empty docs hash to phash=0 engine-side but the oracle
    drops n=0 rows; the registered query must filter them so two empty
    docs never pair. Verified on a crafted corpus via the same operator
    + pair SQL the registered query uses, with the length guard."""
    from pyspark.sql import functions as F

    from posting_lines_spark.operators import multimodal

    d = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "a real document body here")],
        "doc_id long, text string",
    ).filter(F.length("text") > 0)
    ph = multimodal.phash48(multimodal.attach_payload(d))
    ph.createOrReplaceTempView("pls_phash_empty")
    rows = spark.sql(
        _phash_pairs_sql(
            "SELECT doc_id, phash FROM pls_phash_empty",
            lambda b: f"shiftright(phash, {12 * b}) & 4095",
            "bit_count(ph_a ^ ph_b)",
        )
    ).collect()
    assert rows == []  # the two empty docs are gone, not paired at hamming 0


# --- round-7 second wave: independent Python replays ---
# Same policy as test_fifthwave/test_sixthwave/test_seventhwave: each
# expected result re-derived from raw parquet with plain Python so
# correctness does not rest on the shared-SQL oracle alone.


def _events():
    return pq.read_table(SF001 + "/events.parquet").to_pylist()


def test_ml_auc_roc_matches_python(spark):
    from posting_lines_spark.queries import load_all

    rows = _events()
    scored = sorted(
        (round(r["value"] * 100), 1 if r["event_type"] == "purchase" else 0)
        for r in rows
    )
    # O(n log n) replay: walk scores ascending, count negatives below
    num2 = 0
    nn_below = 0
    from itertools import groupby

    P = sum(y for _, y in scored)
    N = len(scored) - P
    for _s, grp in groupby(scored, key=lambda t: t[0]):
        g = list(grp)
        np_ = sum(y for _, y in g)
        nn_ = len(g) - np_
        num2 += np_ * (2 * nn_below + nn_)
        nn_below += nn_
    want_auc = num2 / (2.0 * P * N)
    got = load_all()["ml_auc_roc"].fn(spark, SF001).collect()[0]
    assert (got["n_pos"], got["n_neg"]) == (P, N)
    assert got["auc"] == want_auc
    assert abs(got["gini"] - (2 * want_auc - 1)) < 1e-15


def test_ml_threshold_sweep_matches_python(spark):
    from posting_lines_spark.queries import load_all

    rows = _events()
    scored = [
        (round(r["value"] * 100), 1 if r["event_type"] == "purchase" else 0)
        for r in rows
    ]
    P = sum(y for _, y in scored)
    got = {r["thr"]: r for r in load_all()["ml_threshold_sweep"].fn(spark, SF001).collect()}
    assert sorted(got) == list(range(5000, 45001, 5000))
    for thr, r in got.items():
        tp = sum(y for s, y in scored if s >= thr)
        fp = sum(1 - y for s, y in scored if s >= thr)
        assert (r["tp"], r["fp"]) == (tp, fp)
        assert r["fn"] == P - tp
        assert r["recall_at_t"] == tp / P
        if tp + fp:
            assert r["precision_at_t"] == tp / (tp + fp)
            assert r["f1_at_t"] == 2 * tp / (tp + fp + P)


def test_ml_calibration_ece_matches_python(spark):
    from posting_lines_spark.queries import load_all

    rows = _events()
    C = 50000
    bins: dict[int, list[int]] = {}
    for r in rows:
        s = round(r["value"] * 100)
        y = 1 if r["event_type"] == "purchase" else 0
        b = bins.setdefault(int(s // (C // 10)), [0, 0, 0])
        b[0] += 1
        b[1] += y
        b[2] += s
    n_total = sum(b[0] for b in bins.values())
    want_ece = sum(abs(C * b[1] - b[2]) for b in bins.values()) / (C * n_total)
    got = load_all()["ml_calibration_bins"].fn(spark, SF001).collect()
    assert len(got) == len(bins)
    for r in got:
        n, sy, sc = bins[r["bin"]]
        assert r["n_bin"] == n
        assert r["accuracy"] == sy / n
        assert r["confidence"] == sc / (n * C)
        assert abs(r["ece"] - want_ece) < 1e-15


def test_kalman_level_matches_python(spark):
    from collections import defaultdict
    from decimal import Decimal

    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.temporal_q import KALMAN_P0, KALMAN_Q, KALMAN_R

    acc = defaultdict(lambda: defaultdict(lambda: [Decimal(0), 0]))
    for r in _events():
        day = (r["ts"].timestamp() * 1e6) // 86400000000.0
        a = acc[r["event_type"]][day]
        a[0] += Decimal(str(round(r["value"], 2)))
        a[1] += 1
    got = {r["event_type"]: r for r in load_all()["timeseries_kalman_level"].fn(spark, SF001).collect()}
    for et, days in acc.items():
        vs = [float(s) / n for _, (s, n) in sorted(days.items())]
        l, p = vs[0], KALMAN_P0
        for x in vs[1:]:
            k = (p + KALMAN_Q) / (p + KALMAN_Q + KALMAN_R)
            l = l + k * (x - l)
            p = (1.0 - k) * (p + KALMAN_Q)
        r = got[et]
        assert r["n_days"] == len(vs)
        assert abs(r["level"] - l) < 1e-12, et
        assert abs(r["p_var"] - p) < 1e-15, et
        # the filter must have converged essentially to steady state:
        # gain satisfies k = (p+Q)/(p+Q+R) with p the fixed point
        k_next = (p + KALMAN_Q) / (p + KALMAN_Q + KALMAN_R)
        assert abs(r["gain_next"] - k_next) < 1e-15


def test_geo_stay_points_matches_python(spark):
    from collections import defaultdict

    from posting_lines_spark.queries import load_all

    fixes = defaultdict(list)
    for r in _events():
        us = int(r["ts"].timestamp() * 1e6)
        cell = int(round(r["value"] * 100) // 5000)
        fixes[r["user_id"]].append((us, r["event_id"], cell))
    want = []
    for uid, fx in fixes.items():
        fx.sort()
        run: list[tuple] = []
        for us, _eid, cell in fx + [(None, None, "END")]:
            if run and cell == run[-1][1]:
                run.append((us, cell))
                continue
            if len(run) >= 3:
                want.append((uid, run[0][1], run[0][0], run[-1][0], len(run)))
            run = [(us, cell)] if cell != "END" else []
    got = load_all()["geo_stay_points"].fn(spark, SF001).collect()
    got_set = {
        (r["user_id"], r["clat"], r["start_us"], r["end_us"], r["n_fixes"]) for r in got
    }
    assert got_set == set(want)
    assert len(got) > 500  # non-vacuous at the correctness SF


def test_sketch_ams_f2_replay(spark):
    import hashlib
    from collections import Counter

    from posting_lines_spark.queries import load_all

    f = Counter(r["l_partkey"] for r in pq.read_table(SF001 + "/lineitem.parquet").to_pylist())
    zs = [0] * 16
    for k, c in f.items():
        h = int(hashlib.md5(f"ams|{k}".encode()).hexdigest()[:15], 16)
        for e in range(16):
            zs[e] += (((h >> e) & 1) * 2 - 1) * c
    exact = sum(c * c for c in f.values())
    est = sum(z * z for z in zs) / 16.0
    got = load_all()["sketch_ams_f2"].fn(spark, SF001).collect()[0]
    assert got["n_keys"] == len(f)
    assert got["exact_f2"] == exact
    assert got["est_f2"] == est
    # the sketch should be in the right ballpark (1/sqrt(16) regime)
    assert abs(got["rel_err"]) < 1.0


def test_minhash_estimate_audit_bounds(spark):
    from posting_lines_spark.queries import load_all

    rows = load_all()["dedup_minhash_estimate_audit"].fn(spark, SF001).collect()
    assert len(rows) > 100  # candidate pairs exist (near-copy corpus)
    for r in rows:
        assert 0.0 < r["jaccard_exact"] <= 1.0
        assert 0.0 <= r["jaccard_est"] <= 1.0
        assert r["abs_err"] == abs(r["jaccard_est"] - r["jaccard_exact"])
    # every true near-copy pair (id, id+100000) must be a candidate with
    # high estimated similarity
    near = [r for r in rows if r["id_b"] == r["id_a"] + 100000]
    assert near and all(r["jaccard_est"] >= 0.5 for r in near)
