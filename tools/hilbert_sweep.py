"""Multi-predicate file-skipping sweep for the write-side Hilbert layout.

Writes the two layouts ONCE (clustered-by-curve vs hash-partitioned
strawman, HILB_FILES files each — exactly what `lake_hilbert_write`
ships), then prunes both against a sweep of bbox predicates (corner /
edge strip / center / the registered HILB_BBOX / full occupied extent)
using the same per-file min/max manifests. Prints a markdown table for
SCALE.md: files kept per layout + row selectivity, so the layout win is
a measured curve across predicate shapes, not one lucky bbox.

Soundness per bbox: rows scanned from surviving clustered files +
exact filter == full-scan count (asserted).

Usage: python tools/hilbert_sweep.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from posting_lines_spark.queries.lake_q import (
        HILB_BBOX,
        HILB_FILES,
        _bbox_kept_files,
        _hilbert_write_layouts,
    )
    from posting_lines_spark.session import get_spark

    spark = get_spark(app="hilbert_sweep")
    p_c, p_h = _hilbert_write_layouts(spark, sf_dir)
    full = spark.read.parquet(p_c)
    ext = full.agg(
        F.min("cx"), F.max("cx"), F.min("cy"), F.max("cy"), F.count(F.lit(1))
    ).collect()[0]
    cx0, cx1, cy0, cy1, n_total = ext
    mx, my = (cx0 + cx1) // 2, (cy0 + cy1) // 2
    sweeps = [
        ("corner", (cx0, cx0 + 1, cy0, cy0 + 1)),
        ("edge strip", (cx0, cx1, cy0, cy0)),
        ("center", (mx - 1, mx + 1, my - 1, my + 1)),
        ("registered HILB_BBOX", HILB_BBOX),
        ("full extent", (cx0, cx1, cy0, cy1)),
    ]
    print(f"\noccupied extent cx [{cx0},{cx1}] cy [{cy0},{cy1}], "
          f"{n_total} rows, {HILB_FILES} files per layout, sf_dir={sf_dir}\n")
    print("| bbox (cx_lo..cx_hi, cy_lo..cy_hi) | rows kept | sel % | "
          "files kept (hilbert) | files kept (hashed) | skip win |")
    print("|---|---|---|---|---|---|")
    for label, bbox in sweeps:
        cx_lo, cx_hi, cy_lo, cy_hi = bbox
        pred = (F.col("cx").between(cx_lo, cx_hi)
                & F.col("cy").between(cy_lo, cy_hi))
        n_rows = full.filter(pred).count()
        keep_c = _bbox_kept_files(spark, p_c, bbox)
        keep_h = _bbox_kept_files(spark, p_h, bbox)
        if keep_c:  # soundness: pruned scan loses no rows
            n_pruned = spark.read.parquet(*keep_c).filter(pred).count()
            assert n_pruned == n_rows, (label, n_pruned, n_rows)
        win = (f"{len(keep_h)}→{len(keep_c)}"
               if len(keep_c) < len(keep_h) else "none")
        print(f"| {label} ({cx_lo}..{cx_hi}, {cy_lo}..{cy_hi}) "
              f"| {n_rows} | {100.0 * n_rows / n_total:.1f} "
              f"| {len(keep_c)}/{HILB_FILES} | {len(keep_h)}/{HILB_FILES} "
              f"| {win} |")
    spark.stop()


if __name__ == "__main__":
    main()
