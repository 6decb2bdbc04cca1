"""Skew handling: salted join (SURVEY.md scale notes; pyspark guide
"Partitioning & shuffle").

AQE's skew-join splitting (enabled in session.py) handles sort-merge skew
at runtime; `salted_join` is the explicit form for when the skew is known
ahead of time or the join shape defeats AQE (e.g. aggregation keys):
the build side is replicated SALT_N ways, the probe side scatters each
hot key uniformly across the replicas, so one hot key spreads over SALT_N
tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `key` with the right side replicated `salt_n`× and the
    left side scattered pseudo-randomly (deterministic: xxhash64 of the
    full row) across replicas. Result is identical to `left.join(right,
    key, how)` — only the physical key distribution changes."""
    salted_left = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*left.columns), F.lit(salt_n)).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    out = salted_left.join(salted_right, [key, "__salt"], how)
    return out.drop("__salt")
