"""Round-13 replays (VERDICT r12 item 3): pure-Python re-derivations
for the FIVE stateful streaming twins — the family with the most moving
parts (watermarks, state eviction, micro-batch boundaries, mtime-forced
slice order, flush sentinels). Each test recomputes the final answer
from the raw sf0.001 events with plain Python (dict folds over pyarrow
rows — no Spark, no DuckDB, no shared SQL text) and compares the
registered query's engine output exactly. A state-store bug, a dropped
micro-batch, or a timer that never fires changes the engine output and
breaks these without touching parity.
"""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF0001

GAP_US = 1_800_000_000  # 30 min session gap
WM_DELAY_US = 3_600_000_000
WM_JITTER_US = 7_200_000_000


def _events():
    from tests.test_replays_r12 import _tbl

    return _tbl("events")


def _us(e) -> int:
    from datetime import datetime

    return int((e["ts"] - datetime(1970, 1, 1)).total_seconds() * 1e6)


def test_stream_stateful_stats_matches_python(spark):
    want = {}
    for e in _events():
        n, mx = want.get(e["user_id"], (0, None))
        want[e["user_id"]] = (
            n + 1,
            e["value"] if mx is None else max(mx, e["value"]),
        )
    rows = (
        __import__("posting_lines_spark.queries", fromlist=["load_all"])
        .load_all()["stream_stateful_stats"]
        .fn(spark, SF0001)
        .collect()
    )
    got = {r["user_id"]: (r["n_events"], r["max_value"]) for r in rows}
    assert got == want


def test_stream_sessions_stateful_matches_python(spark):
    from posting_lines_spark.queries import load_all

    per_user: dict[int, list[int]] = defaultdict(list)
    for e in _events():
        per_user[e["user_id"]].append(_us(e))
    want = []
    for uid in sorted(per_user):
        ts = sorted(per_user[uid])
        start, prev, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t - prev > GAP_US:
                want.append((uid, start, prev, n))
                start, n = t, 0
            prev = t
            n += 1
        want.append((uid, start, prev, n))
    rows = load_all()["stream_sessions_stateful"].fn(spark, SF0001).collect()
    got = [
        (r["user_id"], r["s_start_us"], r["s_end_us"], r["n_events"])
        for r in rows
    ]
    assert sorted(got) == sorted(want)


def test_stream_attribution_stateful_matches_python(spark):
    from decimal import Decimal

    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.stream_q import _ATTR_TOUCH_TYPES

    per_user = defaultdict(list)
    for e in _events():
        per_user[e["user_id"]].append((_us(e), e["event_id"], e["event_type"], e["value"]))
    ledger: dict[tuple[str, str], list] = defaultdict(lambda: [0, Decimal(0)])
    for uid, evs in per_user.items():
        f = l = None
        for _, _, et, val in sorted(evs):  # (ts, event_id) — the tie rule
            if et in _ATTR_TOUCH_TYPES:
                if f is None:
                    f = et
                l = et
            elif et == "purchase":
                d = Decimal(repr(val)).quantize(Decimal("0.000001"))
                for model, ch in (("first_touch", f), ("last_touch", l)):
                    row = ledger[(model, ch or "direct")]
                    row[0] += 1
                    row[1] += d
    rows = load_all()["stream_attribution_stateful"].fn(spark, SF0001).collect()
    got = {
        (r["model"], r["channel"]): (r["n_purchases"], r["revenue"]) for r in rows
    }
    want = {k: (n, float(s)) for k, (n, s) in ledger.items()}
    assert got == want


def test_stream_interarrival_stateful_matches_python(spark):
    from posting_lines_spark.queries import load_all

    per_key = defaultdict(list)
    for e in _events():
        per_key[(e["user_id"], e["event_type"])].append((_us(e), e["event_id"]))
    acc: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])  # n, Σg, Σg²
    for (uid, et), evs in per_key.items():
        evs.sort()  # (ts, event_id) — the oracle's lag() tie rule
        for (t0, _), (t1, _) in zip(evs, evs[1:]):
            g = t1 - t0
            a = acc[et]
            a[0] += 1
            a[1] += g
            a[2] += g * g
    want = {}
    for et, (n, sg_i, sgg_i) in acc.items():
        sg, sgg = float(sg_i), float(sgg_i)  # exact ints -> double, both engines
        mean = sg / float(n)
        var = sgg / float(n) - mean * mean
        cv2 = var / (mean * mean) if mean * mean != 0.0 else None
        want[et] = (n, mean, var, cv2)
    rows = load_all()["stream_interarrival_stateful"].fn(spark, SF0001).collect()
    got = {
        r["event_type"]: (r["n"], r["mean_gap_us"], r["var_gap_us"], r["cv2"])
        for r in rows
    }
    assert got == want


def test_stream_watermark_late_audit_matches_python(spark):
    import hashlib

    from posting_lines_spark.queries import load_all

    def md5_int(s: str) -> int:  # md5_int_spark slot 0: hex chars 1..15
        return int(hashlib.md5(f"wmj|{s}".encode()).hexdigest()[0:15], 16)

    evs = []
    for e in _events():
        t = _us(e)
        arrival = t + md5_int(str(e["event_id"])) % WM_JITTER_US
        evs.append((arrival, e["event_id"], t, e["event_type"]))
    evs.sort()  # arrival order (tie: event_id), the stream's replay order
    stats: dict[str, list] = defaultdict(lambda: [0, 0, None])  # n, late, worst
    runmax = None
    for arrival, _, t, et in evs:
        runmax = t if runmax is None else max(runmax, t)
        s = stats[et]
        s[0] += 1
        if t < runmax - WM_DELAY_US:
            s[1] += 1
            lateness = runmax - WM_DELAY_US - t
            s[2] = lateness if s[2] is None else max(s[2], lateness)
    want = {
        et: (n, late, worst, float(late) / float(n))
        for et, (n, late, worst) in stats.items()
    }
    rows = load_all()["stream_watermark_late_audit"].fn(spark, SF0001).collect()
    got = {
        r["event_type"]: (
            r["n_events"], r["n_late"], r["max_lateness_us"], r["late_frac"]
        )
        for r in rows
    }
    assert got == want
    # the r12 de-vacuization must hold: the late branch is ALIVE
    assert sum(v[1] for v in want.values()) > 0
