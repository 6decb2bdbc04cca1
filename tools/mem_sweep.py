"""Proactive memory-pressure sweep (round-8 VERDICT item 4): run the
heaviest registered queries at sf1 under a deliberately SMALL heap and
record which spill cleanly vs which OOM — flushing out the next
broadcast/retention OOM class before a scale run trips over it.

Each query runs in its OWN subprocess (an OOM kills the JVM; isolation
keeps the sweep going) with SPARK_GRAFT_DRIVER_MEM set by --mem.

Usage: python tools/mem_sweep.py [--mem 4g] [--sf-dir .benchdata/sf1] [query ...]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_HEAVIEST = [
    "dedup_lsh_band_sweep",
    "graph_modularity",
    "graph_label_propagation",
    "graph_list_ranking",
    "graph_random_walks",
    "curation_semdedup",
    "curation_pipeline_lm",
    "dedup_sorted_neighborhood",
    "geo_dbscan_core",
    "dedup_containment",
    "dedup_minhash_lsh",
    "text_heaps_law",
]

RUNNER = """
import sys, time
sys.path.insert(0, {repo!r})
from posting_lines_spark.session import get_spark
from posting_lines_spark.queries import load_all
spark = get_spark(app="memsweep")
t0 = time.time()
load_all()[{name!r}].fn(spark, {sf!r}).write.format("noop").mode("overwrite").save()
print(f"MEMSWEEP_OK {{time.time() - t0:.1f}}")
spark.stop()
"""


def main() -> int:
    args = sys.argv[1:]
    mem = "4g"
    sf = os.path.join(REPO, ".benchdata", "sf1")
    if "--mem" in args:
        i = args.index("--mem")
        mem = args[i + 1]
        del args[i : i + 2]
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf = args[i + 1]
        del args[i : i + 2]
    names = args or DEFAULT_HEAVIEST
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem)
    print(f"# mem={mem} sf_dir={sf} loadavg={os.getloadavg()[0]:.1f}")
    print("| query | outcome | wall s |")
    print("|---|---|---|")
    for name in names:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", RUNNER.format(repo=REPO, name=name, sf=sf)],
                capture_output=True,
                text=True,
                cwd=REPO,
                timeout=1800,
            )
        except subprocess.TimeoutExpired:
            # per-query isolation: a hung query must not abort the sweep
            print(f"| {name} | TIMEOUT | {time.time() - t0:.1f} |", flush=True)
            continue
        wall = time.time() - t0
        ok = "MEMSWEEP_OK" in r.stdout
        if ok:
            outcome = "spills-clean"
        else:
            tail = (r.stderr or r.stdout).splitlines()
            oom = any("OutOfMemory" in ln or "GC overhead" in ln for ln in tail)
            outcome = "OOM" if oom else "FAIL"
        print(f"| {name} | {outcome} | {wall:.1f} |", flush=True)
        if not ok:
            sig = [ln for ln in (r.stderr or "").splitlines() if "Error" in ln][:2]
            for ln in sig:
                print(f"#   {ln[:120]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
