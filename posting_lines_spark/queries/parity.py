"""Helpers for cross-engine (Spark ↔ DuckDB) value parity in query results.

Floating-point addition is not associative; Spark's partial aggregation
order (partition-parallel) differs from DuckDB's, so a plain sum(double)
can differ by ~sqrt(n)·ulp between engines — enough to break a value-hash
even after rounding. DECIMAL arithmetic is exact and associative, so
summing through DECIMAL makes the aggregate order-independent and
therefore bit-reproducible on both engines.

Final-cast rounding: DuckDB's direct DECIMAL/HUGEINT→DOUBLE cast is NOT
correctly rounded above 2^53 (it converts int128→double then scales in
FP; measured 1-ulp misrounding at ~3.1e19 in round 3, while Spark's
BigDecimal path rounds correctly). Both engines' DECIMAL→VARCHAR
formatting is plain digits and their string→double parses ARE correctly
rounded, so the exact sum is cast through VARCHAR(48) on both sides —
bit-identical at any magnitude the 38-digit decimal can hold (verified
up to 1e35, signs, trailing zeros, NULL).

Per-row rounding bound (the subtler hazard, measured in round 2): the
double→DECIMAL cast itself can disagree — Spark rounds the double's
SHORTEST decimal representation (BigDecimal.valueOf), DuckDB rounds the
exact binary expansion, and the two land on opposite sides of a
0.5·10^-scale boundary when the value lies within half an ulp of one.
Expected disagreements over n rows of magnitude v:
≈ n · v · 2.2e-16 · 10^scale. Exact-by-construction data (2-dp prices,
int-derived values) never hits this; full-entropy doubles
(sqrt/projection outputs) do — keep the estimate ≪ 1 by lowering
`scale` (the geo aggregates use scale=3), and sweep sf0.1, not just
sf0.01, whenever a new float aggregate lands.
"""

from __future__ import annotations


def dsum_expr(col_expr: str, scale: int = 6) -> str:
    """Order-independent SUM over doubles: route through DECIMAL(38,scale).

    scale=6 keeps per-value quantization at 1e-6 (coarser than the ~1e-15
    cross-engine noise floor of the deterministic kernels) while leaving
    31 digits of headroom for the sum.
    """
    return (
        f"CAST(CAST(sum(CAST({col_expr} AS DECIMAL(38,{scale})))"
        f" AS STRING) AS DOUBLE)"
    )


def davg_expr(col_expr: str, scale: int = 6) -> str:
    """Order-independent AVG: exact decimal sum / count."""
    return f"{dsum_expr(col_expr, scale)} / count({col_expr})"


def dsum(col_expr: str, alias: str, scale: int = 6) -> str:
    return f"{dsum_expr(col_expr, scale)} AS {alias}"


def davg(col_expr: str, alias: str, scale: int = 6) -> str:
    return f"{davg_expr(col_expr, scale)} AS {alias}"


def lsum_expr(col_expr: str, scale: int = 3) -> str:
    """Order-independent SUM via int64 fixed-point — exact and associative
    like the decimal route at a fraction of the per-row cost (no 128-bit
    accumulation; measured 2× on the geo flagship, where the decimal casts
    were 60% of query time).

    Caller contract: |v|·10^scale·n_rows < 2^63. Right for BOUNDED
    physical measures — e.g. len_m ≤ ~4e6 mm leaves 2×10^12-row headroom
    — wrong for unbounded monetary/derived sums: use dsum_expr there.
    round(v·10^s) is engine-identical (both round half away from zero;
    its output is integer-valued so the BIGINT cast is exact on both)."""
    m = f"{10.0 ** scale!r}e0"
    return f"(CAST(sum(CAST(round({col_expr} * {m}) AS BIGINT)) AS DOUBLE) / {m})"


def lavg_expr(col_expr: str, scale: int = 3) -> str:
    """Order-independent AVG via int64 fixed-point (see lsum_expr)."""
    return f"({lsum_expr(col_expr, scale)} / count({col_expr}))"


def lsum(col_expr: str, alias: str, scale: int = 3) -> str:
    return f"{lsum_expr(col_expr, scale)} AS {alias}"


def lavg(col_expr: str, alias: str, scale: int = 3) -> str:
    return f"{lavg_expr(col_expr, scale)} AS {alias}"
