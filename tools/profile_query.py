"""Per-stage wall profile of named registered queries (optimization tooling).

Runs each named query end-to-end (noop sink) with the event log on, then
prints every stage's wall time, task count, summed executor run time,
shuffle read/write bytes and peak task time — the local stand-in for the
Spark UI stage page (guide §1.1/§7.1; the UI is disabled in session.py).

Usage: python tools/profile_query.py [sf_dir] [--runs N] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACC = {
    "internal.metrics.executorRunTime": "run_ms",
    "internal.metrics.shuffle.write.bytesWritten": "sh_w",
    "internal.metrics.shuffle.read.remoteBytesRead": "sh_r_rem",
    "internal.metrics.shuffle.read.localBytesRead": "sh_r_loc",
    "internal.metrics.jvmGCTime": "gc_ms",
    "internal.metrics.memoryBytesSpilled": "spill_mem",
    "internal.metrics.diskBytesSpilled": "spill_dsk",
}


def _parse(log_dir: str):
    stages: dict[int, dict] = {}
    stage_group: dict[int, str] = {}
    for fname in sorted(os.listdir(log_dir)):
        path = os.path.join(log_dir, fname)
        if not os.path.isfile(path):
            continue
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    grp = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                    if grp:
                        for sid in ev.get("Stage IDs", []):
                            stage_group[sid] = grp
                elif kind == "SparkListenerStageCompleted":
                    info = ev.get("Stage Info", {})
                    sid = info.get("Stage ID")
                    row = {
                        "grp": stage_group.get(sid, "?"),
                        "name": info.get("Stage Name", "")[:60],
                        "tasks": info.get("Number of Tasks", 0),
                        "wall_ms": (info.get("Completion Time", 0) or 0)
                        - (info.get("Submission Time", 0) or 0),
                    }
                    for acc in info.get("Accumulables", []):
                        k = ACC.get(acc.get("Name"))
                        if k:
                            row[k] = int(acc.get("Value", 0))
                    stages[sid] = row
    return stages


def main() -> int:
    args = sys.argv[1:]
    runs = 1
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = next((a for a in args if "/" in a), "/root/testdata/sf0.1")
    names = [a for a in args if "/" not in a]
    if not names:
        print("usage: profile_query.py [sf_dir] [--runs N] query ...")
        return 2

    from posting_lines_spark.queries import load_all
    from posting_lines_spark.session import get_spark

    log_dir = tempfile.mkdtemp(prefix="pls_profile_")
    spark = get_spark(
        app="profile",
        extra={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    registry = load_all()
    sc = spark.sparkContext
    walls: dict[str, list[float]] = {}
    for name in names:
        # warmup run (untimed, not attributed)
        sc.setJobGroup("__warmup__", name)
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        for r in range(runs):
            grp = f"{name}#{r}"
            sc.setJobGroup(grp, grp)
            t0 = time.time()
            registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.setdefault(name, []).append(time.time() - t0)
        sc.setJobGroup("", "")
    spark.stop()

    stages = _parse(log_dir)
    for name in names:
        for r in range(runs):
            grp = f"{name}#{r}"
            mine = sorted(
                (sid, s) for sid, s in stages.items() if s["grp"] == grp
            )
            total_wall = sum(s["wall_ms"] for _, s in mine)
            spill = sum(
                s.get("spill_mem", 0) + s.get("spill_dsk", 0) for _, s in mine
            )
            print(
                f"\n=== {grp}: wall {walls[name][r]:.2f}s | {len(mine)} stages, "
                f"sum stage wall {total_wall/1000:.2f}s"
                + (f", SPILL {spill/1e6:.0f} MB" if spill else "")
                + " ==="
            )
            print("stage  wall_ms  tasks  run_ms  gc_ms  sh_write  sh_read  name")
            for sid, s in mine:
                shr = s.get("sh_r_rem", 0) + s.get("sh_r_loc", 0)
                print(
                    f"{sid:>5}  {s['wall_ms']:>7}  {s['tasks']:>5}  "
                    f"{s.get('run_ms', 0):>6}  {s.get('gc_ms', 0):>5}  "
                    f"{s.get('sh_w', 0):>8}  {shr:>7}  {s['name']}"
                )
    print(f"\n# event log: {log_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
