"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop write (full computation on
executors, no driver collect — measures the plan, not the pickle).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: kept deliberately stable across rounds so BENCH_r{N}.json
# trends are comparable. One representative per operator family.
HEADLINE = [
    "geo_flagship",
    "geo_project_points",
    "pipeline_enrich",
    "q1_pricing_summary",
    "join_region_revenue",
    "window_sessionize",
    "window_segments_producer",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_groups",
    "sim_topk_ivf",
    "sim_topk_bruteforce",
    "text_token_stats",
    "text_fingerprint",
    "json_funcs",
]


def tier2_names(n: int = 10) -> list[str]:
    """Second bench tier (VERDICT r11 item 7): the N registry queries
    with the largest MEASURED shuffle volume, parsed from the current
    PLANS.md — the frozen headline set covers 4% of the registry, so
    regressions in the heavy tail were invisible to BENCH. Membership
    is recomputed from PLANS.md each time, so the tier ROTATES as the
    registry grows and plans change; the headline set stays frozen for
    round-over-round comparability. Run with SPARK_GRAFT_BENCH_TIER=2
    (the closing SCALE.md entry reports both tiers)."""
    import re

    rows = []
    plans = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.md")
    with open(plans) as fh:
        for line in fh:
            m = re.match(r"\| ([a-z_0-9]+) \|.*\| ([0-9.]+|<0\.01|\?) \|$", line.strip())
            if m and m.group(2) not in ("?", "<0.01"):
                rows.append((float(m.group(2)), m.group(1)))
    rows.sort(reverse=True)
    return [name for _, name in rows[:n]]


def main() -> None:
    import __spark_entry__ as entrymod
    from posting_lines_spark.session import get_spark

    # Host-contention telemetry (round-4 lesson: BENCH_r04 ran under an
    # external load-avg >11 and inflated every query ~1.7× uniformly; an
    # idle re-run matched round 3 within 5%). Record load before/after
    # and flag the run as contended when the pre-existing load exceeds
    # half our own parallelism — such a run measures the host, not the
    # engine, and the artifact of record should say so itself.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_entry = os.getloadavg()

    # Contention guard (round-6 lesson: r4 AND r6 both shipped artifacts
    # taken under external load >12 — uniformly inflated, useless for
    # trends). If the host is busy at entry (1-min load > cpus/4), wait
    # it out in 30 s steps up to a bounded cooldown, then proceed either
    # way; BOTH readings are recorded so the artifact shows whether the
    # guard fired and what it achieved.
    threshold = cpus / 4
    cooldown_sec = 0
    max_cooldown = int(os.environ.get("SPARK_GRAFT_BENCH_COOLDOWN", "300"))
    while os.getloadavg()[0] > threshold and cooldown_sec < max_cooldown:
        print(
            f"# host busy (load {os.getloadavg()[0]:.1f} > {threshold:.0f}); "
            f"cooling down 30s ({cooldown_sec}/{max_cooldown}s)",
            flush=True,
        )
        time.sleep(30)
        cooldown_sec += 30
    load_before = os.getloadavg()

    spark = get_spark(app="bench")
    qs = entrymod.queries()
    tier = os.environ.get("SPARK_GRAFT_BENCH_TIER", "1")
    roster = tier2_names() if tier == "2" else HEADLINE
    names = [n for n in roster if n in qs] or list(qs)

    # warm the JVM + parquet footer cache once with a trivial action
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).count()

    # Warmup pass (untimed): compiles codegen, JITs the hot loops, and
    # materializes per-process fixtures, so the timed pass measures
    # steady-state operator throughput — the number that scales to a real
    # cluster — rather than one-time driver-side compilation.
    if os.environ.get("SPARK_GRAFT_WARMUP", "1") != "0":
        for name in names:
            try:
                qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            except Exception:  # noqa: BLE001
                pass

    # p50 of N timed runs per query so round-over-round trends aren't
    # single-sample noise; failed queries are EXCLUDED from the total and
    # reported in `errors` so a crash can't flatter the headline number.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        samples: list[float] = []
        for _ in range(runs):
            t0 = time.time()
            try:
                df = qs[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            except Exception as e:  # noqa: BLE001 — one bad query must not kill the bench
                print(f"# bench error in {name}: {e}", flush=True)
                errors[name] = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
                break
        if samples:
            timings[name] = round(sorted(samples)[len(samples) // 2], 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    load_after = os.getloadavg()
    # load_before is what OTHER processes were doing when we started
    # (our own Spark work legitimately drives load_after up to ~cpus);
    # a high 1-min load at entry means the timings are contended.
    contended = load_before[0] > threshold
    out = {
        "metric": (
            "tier2_heavy_queries_total_wall"
            if tier == "2"
            else "headline_queries_total_wall"
        ),
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "runs_per_query": runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "loadavg_entry": [round(x, 2) for x in load_entry],
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in load_after],
        "cooldown_sec": cooldown_sec,
        "cpus": cpus,
        "contended": contended,
    }
    if contended:
        print(
            f"# WARNING: pre-existing host load {load_before[0]:.1f} > "
            f"{threshold:.0f} after {cooldown_sec}s cooldown — timings "
            "measure host contention, not the engine; rerun idle for a "
            "trend-comparable number",
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
