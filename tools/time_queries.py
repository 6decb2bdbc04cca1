"""p50-of-N wall timings for named registered queries (one fresh session).

The per-round operator timing tables in SCALE.md come from this:
each query runs N times in THIS session (warm JVM, like bench.py's
runs_per_query discipline), p50 reported, loadavg recorded so a
contended run is visible (the round-4 contamination lesson).

Usage: python tools/time_queries.py [sf_dir] [--runs N] query [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = next((a for a in args if "/" in a), "/root/testdata/sf0.1")
    names = [a for a in args if "/" not in a]
    if not names:
        print("usage: time_queries.py [sf_dir] [--runs N] query ...")
        return 2

    from posting_lines_spark.queries import load_all
    from posting_lines_spark.session import get_spark

    spark = get_spark(app="time_queries")
    registry = load_all()
    print(f"# sf_dir={sf_dir} runs={runs} loadavg_before={os.getloadavg()[0]:.1f}")
    print("| query | p50 s | runs s |")
    print("|---|---|---|")
    for name in names:
        walls = []
        for _ in range(runs):
            t0 = time.time()
            registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        print(
            f"| {name} | {statistics.median(walls):.2f} "
            f"| {', '.join(f'{w:.2f}' for w in walls)} |"
        )
    print(f"# loadavg_after={os.getloadavg()[0]:.1f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    main()
