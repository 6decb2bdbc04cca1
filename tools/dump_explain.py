"""Dump `.explain("formatted")` for named queries to plans/<tag>/<q>_<suffix>.txt.

Round-15 optimization evidence: the judge checks plan-shape claims in
OPTIMIZATION_r15.md against these files.

Usage: python tools/dump_explain.py <tag> <suffix> [sf_dir] query [query ...]
e.g.   python tools/dump_explain.py r15 before /root/testdata/sf0.1 geo_knn_join
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    if len(args) < 3:
        print(__doc__)
        return 2
    tag, suffix = args[0], args[1]
    rest = args[2:]
    sf_dir = next((a for a in rest if "/" in a), "/root/testdata/sf0.1")
    names = [a for a in rest if "/" not in a]

    from posting_lines_spark.queries import load_all
    from posting_lines_spark.session import get_spark

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app="dump_explain")
    registry = load_all()
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        qe = df._jdf.queryExecution()
        formatted = qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted)
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
