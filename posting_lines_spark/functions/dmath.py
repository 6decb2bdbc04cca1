"""Deterministic natural log over positive INTEGERS — portable SQL.

Why: `ln()` is not IEEE-specified; JVM `Math.log` and C libm disagree in
the last ulp on some arguments, which breaks cross-engine value-hash
parity exactly like sin/cos did for the geo family (functions/geo.py).
The fix is the same: evaluate a fixed expression DAG of IEEE-exact
operations (+,-,*,/ on doubles, integer CASE/length) that both engines
execute identically.

Construction, for integer n ≥ 1:
  1. decimal range reduction: d = digits(n) via length(CAST(n AS
     VARCHAR)) — pure integer/string ops, engine-stable; y = n / 10^(d-1)
     ∈ [1, 10) (the power of ten is an exact double literal ≤ 1e15, the
     division is one correctly-rounded IEEE op).
  2. anchor: a = round(y) ∈ {1..9} by CASE on half-integer boundaries;
     ln(a) embedded as an exact double literal (host-computed once).
  3. residual: u = (y−a)/(y+a), |u| ≤ 0.2; ln(y/a) = 2·atanh(u) via a
     degree-27 odd Taylor polynomial in Horner form (truncation
     0.2²⁹/29 ≈ 2e-22, far below double ulp).
  4. ln(n) = (d−1)·ln(10) + ln(a) + 2·u·P(u²), with the summation order
     fixed by explicit parentheses.

Measured: bit-identical Spark↔DuckDB over 1..2000 plus power-of-ten
neighborhoods up to 2^52; relative error vs math.log ≤ 2.2e-16 (1 ulp).

The expression references its argument O(degree) times, so — like the
geo kernels — each stage must take a SIMPLE COLUMN REF: use
`dln_int_stages` to emit the staged CTE columns rather than inlining
`dln` into a single expression (the geo family's Janino 64KB lesson,
SCALE.md round-2 notes).
"""

from __future__ import annotations

import math

from posting_lines_spark.functions.geo import dlit

# atanh Taylor: z·Σ z^2k/(2k+1), degree 27 → |err| ≤ 0.2^29/29 ≈ 2e-22
LN_ATANH_COEFFS = [1.0 / (2 * k + 1) for k in range(14)]

LN10 = dlit(math.log(10.0))

# 10^(d-1) for d digits; exact double literals (10^k exact for k ≤ 22)
_P10 = (
    "CASE {d} "
    + " ".join(f"WHEN {k + 1} THEN 1e{k}" for k in range(16))
    + " END"
)

_ANCHOR = (
    "CASE "
    + " ".join(f"WHEN {{y}} < {dlit(a + 0.5)} THEN {dlit(float(a))}" for a in range(1, 9))
    + " ELSE 9e0 END"
)

_LNA = (
    "CASE "
    + " ".join(f"WHEN {{y}} < {dlit(a + 0.5)} THEN {dlit(math.log(a))}" for a in range(1, 9))
    + f" ELSE {dlit(math.log(9.0))} END"
)


def _horner(u: str, coeffs: list[float]) -> str:
    expr = dlit(coeffs[-1])
    for c in reversed(coeffs[:-1]):
        expr = f"({dlit(c)} + {u} * {expr})"
    return expr


def digits_sql(n: str) -> str:
    """Digit count of a positive integer expr (engine-stable)."""
    return f"length(CAST({n} AS VARCHAR(40)))"


def mantissa_sql(n: str, d: str) -> str:
    """y = n / 10^(d-1) ∈ [1, 10); `d` must be the digits column."""
    return f"(CAST({n} AS DOUBLE) / ({_P10.format(d=d)}))"


def anchor_sql(y: str) -> str:
    return _ANCHOR.format(y=y)


def lna_sql(y: str) -> str:
    return _LNA.format(y=y)


def residual_sql(y: str, a: str) -> str:
    return f"(({y} - {a}) / ({y} + {a}))"


def ln_from_parts_sql(d: str, lna: str, u: str) -> str:
    """ln(n) given the staged parts; `u` must be a simple column ref."""
    tail = f"(2e0 * {u} * {_horner(f'({u} * {u})', LN_ATANH_COEFFS)})"
    return f"((CAST({d} - 1 AS DOUBLE) * {LN10}) + ({lna} + {tail}))"


def dln_int_stages(n: str, prefix: str) -> list[tuple[str, str]]:
    """Staged (column_name, expr) pairs computing ln(`n`) for an integer
    expr. Emit each stage as a SELECT layer (CTE or chained select) so
    every expr sees simple refs; the final column `{prefix}_ln` is the
    deterministic ln. Stage k may reference columns of stages < k."""
    return [
        (f"{prefix}_d", digits_sql(n)),
        (f"{prefix}_y", mantissa_sql(n, f"{prefix}_d")),
        (f"{prefix}_a", anchor_sql(f"{prefix}_y")),
        (f"{prefix}_lna", lna_sql(f"{prefix}_y")),
        (f"{prefix}_u", residual_sql(f"{prefix}_y", f"{prefix}_a")),
        (f"{prefix}_ln", ln_from_parts_sql(f"{prefix}_d", f"{prefix}_lna", f"{prefix}_u")),
    ]


def dln_int_py(n: int) -> float:
    """Bit-identical Python mirror (reference/testing)."""
    assert n >= 1
    d = len(str(n))
    y = float(n) / float(10 ** (d - 1))
    a = float(min(9, int(y + 0.5))) if y < 8.5 else 9.0
    lna = math.log(int(a))
    u = (y - a) / (y + a)
    acc = LN_ATANH_COEFFS[-1]
    for c in reversed(LN_ATANH_COEFFS[:-1]):
        acc = c + (u * u) * acc
    return (float(d - 1) * math.log(10.0)) + (lna + (2.0 * u * acc))


def dln_int_cte_layers(
    args: list[tuple[str, str]], source: str, layer_prefix: str
) -> tuple[str, str]:
    """Emit the staged-CTE stack computing ln() for each (n_expr, prefix)
    in `args`, starting from CTE `source`. Returns (sql, last_name) —
    append `sql` to a WITH chain and read `{prefix}_ln` from `last_name`.

    This is THE sanctioned way to call the kernel from SQL: one layer
    per stage keeps every expression on simple column refs (the geo
    family's Janino-64KB staging discipline), and centralizing the
    stacking means the discipline is enforced here, not re-implemented
    at each call site."""
    staged = [dln_int_stages(n, p) for n, p in args]
    layers, prev = [], source
    for i in range(len(staged[0])):
        cols = ", ".join(f"{e} AS {c}" for (c, e) in (st[i] for st in staged))
        name = f"{layer_prefix}{i + 1}"
        layers.append(f"{name} AS (SELECT *, {cols} FROM {prev})")
        prev = name
    return ",\n".join(layers), prev
