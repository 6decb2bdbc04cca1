"""Streaming-twin scaling measurement (round-5 VERDICT item 8).

The batch families have sf0.1→sf1 (and sf1→sf10) scaling rows in
SCALE.md; the streaming twins had only sf0.1 evidence. This tool runs
each twin's FULL 4-slice drain at a given SF in a FRESH subprocess
(one JVM per query — the in-session inflation lesson from round 5),
timing the drain with the source fixture pre-warmed (run 1 builds the
slice fixture + drains, run 2 re-drains against the cached source and
is the number of record), and reports the state-size the twin carries
between epochs:

  stream_pattern_match — 3 scalars per user       (rows = distinct users)
  stream_ewma          — 1 carry row per series   (rows = event types)
  stream_attribution   — (first,last) per user    (rows = distinct users)
  stream_attribution_stateful — engine state store; per-batch
      numRowsUpdated/numRowsTotal from the progress metrics.

Usage: python tools/stream_scale.py [sf_dir] [query ...]
       (default sf_dir .benchdata/sf1; default = the four twins)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from posting_lines_spark.session import get_spark
from posting_lines_spark.queries import load_all

name, sf_dir = {name!r}, {sf_dir!r}
spark = get_spark(app=f"stream_scale_{{name}}")
qs = load_all()
out = {{"query": name, "sf_dir": sf_dir}}

t0 = time.time()
qs[name].fn(spark, sf_dir).collect()          # run 1: builds fixture + drains
out["wall_cold_s"] = round(time.time() - t0, 2)
t0 = time.time()
qs[name].fn(spark, sf_dir).collect()          # run 2: cached source, re-drain
out["wall_warm_s"] = round(time.time() - t0, 2)

from posting_lines_spark.sources import load_table
e = load_table(spark, sf_dir, "events")
if name in ("stream_pattern_match", "stream_attribution"):
    out["state_rows"] = e.select("user_id").distinct().count()
elif name == "stream_ewma":
    out["state_rows"] = e.select("event_type").distinct().count()
elif name == "stream_attribution_stateful":
    from posting_lines_spark.queries.stream_q import _attr_stateful_run
    t0 = time.time()
    _credits, progress = _attr_stateful_run(spark, sf_dir)
    out["wall_stateful_rerun_s"] = round(time.time() - t0, 2)
    batches = [p for p in progress if p.get("stateOperators") and p["numInputRows"] > 0]
elif name == "stream_sessions_stateful":
    from posting_lines_spark.fixtures import cached_fixture, scratch_dir
    from posting_lines_spark.queries.stream_q import _sess_write_slices
    from posting_lines_spark.streaming.stateful import sessionize_stateful
    src = cached_fixture(
        "sess_events_src", sf_dir, _sess_write_slices(e), "pls_sess_src_"
    )
    t0 = time.time()
    progress = sessionize_stateful(
        spark, src, scratch_dir("pls_sessst_out_"), scratch_dir("pls_sessst_ckpt_")
    )
    out["wall_stateful_rerun_s"] = round(time.time() - t0, 2)
    batches = [p for p in progress if p.get("stateOperators") and p["numInputRows"] > 0]
if name in ("stream_attribution_stateful", "stream_sessions_stateful"):
    out["per_batch"] = [
        {{
            "input_rows": p["numInputRows"],
            "batch_duration_ms": p["batchDuration"],
            "state_rows_total": p["stateOperators"][0]["numRowsTotal"],
            "state_rows_updated": p["stateOperators"][0]["numRowsUpdated"],
        }}
        for p in batches
    ]
    out["state_rows"] = batches[-1]["stateOperators"][0]["numRowsTotal"] if batches else 0
print("RESULT " + json.dumps(out))
spark.stop()
"""

DEFAULT_QUERIES = [
    "stream_pattern_match",
    "stream_ewma",
    "stream_attribution",
    "stream_attribution_stateful",
]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = next((a for a in args if "/" in a), os.path.join(REPO, ".benchdata/sf1"))
    only = [a for a in args if "/" not in a] or DEFAULT_QUERIES
    loadavg = os.getloadavg()[0]
    print(f"# sf_dir={sf_dir} loadavg_before={loadavg:.1f}")
    results = []
    for name in only:
        code = _CHILD.format(repo=REPO, name=name, sf_dir=sf_dir)
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")), None
        )
        if line is None:
            print(f"FAIL {name}: {proc.stderr.strip().splitlines()[-5:]}")
            continue
        r = json.loads(line[len("RESULT "):])
        results.append(r)
        print(json.dumps(r))
    print("\n| query | wall warm s (4-slice drain) | cross-epoch state rows |")
    print("|---|---|---|")
    for r in results:
        print(f"| {r['query']} | {r['wall_warm_s']} | {r.get('state_rows', '-')} |")


if __name__ == "__main__":
    main()
