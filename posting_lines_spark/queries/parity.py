"""Helpers for cross-engine (Spark ↔ DuckDB) value parity in query results.

Floating-point addition is not associative; Spark's partial aggregation
order (partition-parallel) differs from DuckDB's, so a plain sum(double)
can differ by ~sqrt(n)·ulp between engines — enough to break a value-hash
even after rounding. DECIMAL arithmetic is exact and associative, so
summing through DECIMAL makes the aggregate order-independent and
therefore bit-reproducible on both engines.

Magnitude bound: DECIMAL→DOUBLE casts are bit-identical across the two
engines up to ~1e15 (measured; at ~1e18 they can split by 1 ulp because
DuckDB divides int128 by 10^scale in FP while Spark rounds the exact
decimal). Keep summed magnitudes below ~1e15 — scale the measure or
lower the decimal scale if a query would exceed it.
"""

from __future__ import annotations


def dsum_expr(col_expr: str, scale: int = 6) -> str:
    """Order-independent SUM over doubles: route through DECIMAL(38,scale).

    scale=6 keeps per-value quantization at 1e-6 (coarser than the ~1e-15
    cross-engine noise floor of the deterministic kernels) while leaving
    31 digits of headroom for the sum.
    """
    return f"CAST(sum(CAST({col_expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


def davg_expr(col_expr: str, scale: int = 6) -> str:
    """Order-independent AVG: exact decimal sum / count."""
    return f"{dsum_expr(col_expr, scale)} / count({col_expr})"


def dsum(col_expr: str, alias: str, scale: int = 6) -> str:
    return f"{dsum_expr(col_expr, scale)} AS {alias}"


def davg(col_expr: str, alias: str, scale: int = 6) -> str:
    return f"{davg_expr(col_expr, scale)} AS {alias}"
