"""Round-10 regression tests.

1. ADVICE-r9 (medium): stats_icc / stats_cvm_ksamples engine-side
   integral division. Spark `div` (IntegralDivide) ALWAYS returns
   BIGINT, so the old direct `wide div n_i` quotient — and sum(BIGINT)
   over the quotients — wraps silently once values leave int64, while
   the DuckDB oracle's HUGEINT `//` stays int128-exact. Round 10
   replaced the engine's direct division with the trunc-division
   ladder (q = a·n + r; q² = a²n² + 2arn + r²; …) whose every BIGINT
   operand is int64-bounded. These tests drive BOTH formulas on
   synthetic data big enough that the direct form provably wraps, and
   assert the ladder matches an exact-Fraction Python replay while the
   direct form does not.
"""

from __future__ import annotations

from fractions import Fraction

from tests.conftest import SF001


def test_band_sweep_cap_ranking_equivalence(spark):
    """VERDICT-r9 item 1: a capped census must rank the 4 configs
    identically to the uncapped one (the sweep is a tuning audit).
    Force the cap to bind at sf0.01 and compare against cap=None."""
    from posting_lines_spark.queries.dedup_q import dedup_lsh_band_sweep

    exact = {
        r["bands"]: r
        for r in dedup_lsh_band_sweep(spark, SF001, cap=None).collect()
    }
    assert all(r["capped"] == 0 for r in exact.values())
    assert all(
        r["n_candidates"] == r["n_cand_sampled"] for r in exact.values()
    )
    assert all(
        r["n_pairs_bound"] >= r["n_candidates"] for r in exact.values()
    )

    cap = max(1, min(r["n_pairs_bound"] for r in exact.values()) // 2)
    capped = {
        r["bands"]: r
        for r in dedup_lsh_band_sweep(spark, SF001, cap=cap).collect()
    }
    assert all(r["capped"] == 1 for r in capped.values())
    # bounds are cap-independent; sampled counts respect the cap rate
    for b, r in capped.items():
        assert r["n_pairs_bound"] == exact[b]["n_pairs_bound"]
        assert r["n_cand_sampled"] <= exact[b]["n_candidates"]
        # unbiased estimate: generous 5σ binomial envelope
        n_kept = max(r["n_cand_sampled"], 1)
        rel = 5.0 / n_kept**0.5 + 0.02
        assert abs(r["n_candidates"] - exact[b]["n_candidates"]) <= max(
            rel * exact[b]["n_candidates"], 3
        )
    # THE equivalence the verdict asked for: identical config ranking
    rank_exact = sorted(exact, key=lambda b: (-exact[b]["n_candidates"], b))
    rank_capped = sorted(
        capped, key=lambda b: (-capped[b]["n_candidates"], b)
    )
    assert rank_exact == rank_capped


def test_band_sweep_cap_engine_oracle_parity(spark, duck):
    """The capped regime must hash-match across engines too: run the
    Spark query and the DuckDB oracle with the same binding cap at
    sf0.001 and compare every cell exactly."""
    from posting_lines_spark.queries.dedup_q import (
        _band_sweep_oracle,
        dedup_lsh_band_sweep,
    )

    probe = {
        r["bands"]: r
        for r in dedup_lsh_band_sweep(spark, "/root/testdata/sf0.001",
                                      cap=None).collect()
    }
    cap = max(1, min(r["n_pairs_bound"] for r in probe.values()) // 2)
    got = [
        tuple(r)
        for r in dedup_lsh_band_sweep(
            spark, "/root/testdata/sf0.001", cap=cap
        ).collect()
    ]
    want = duck.execute(_band_sweep_oracle(cap=cap)).fetchall()
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            if isinstance(gv, float) and gv is not None and wv is not None:
                assert gv == wv or abs(gv - wv) < 1e-15
            else:
                assert gv == wv


def test_icc_split_survives_int64_overflow(spark):
    """1000 rows/group of ~1e8 cents: (Σy)² ≈ 1e22, direct quotient
    ≈ 1e19 > 2⁶³ wraps; the r10 ladder stays exact."""
    from posting_lines_spark.queries.analytics_q import _icc_sql

    n = 1000
    rows = []
    groups = {}
    for g in ("a", "b"):
        off = 0 if g == "a" else 7
        ys = [10**8 + 13 * i + off for i in range(n)]
        groups[g] = ys
        rows += [(g, y / 100.0) for y in ys]
    spark.createDataFrame(rows, "user_id string, value double") \
        .createOrReplaceTempView("events")

    # replay: exact integers to the engine's wide-int boundary, then
    # the same fixed double chain (at these magnitudes syy−s2 is a
    # genuine double cancellation both sides share — mirror it, don't
    # average it away with Fractions)
    G, N = len(groups), sum(len(v) for v in groups.values())
    syy = float(sum(y * y for v in groups.values() for y in v))
    sy = sum(y for v in groups.values() for y in v)
    s2 = float(sum(sum(v) ** 2 // len(v) for v in groups.values())) + sum(
        (sum(v) ** 2 % len(v)) / len(v) for v in groups.values()
    )
    sum_ni_sq = float(sum(len(v) ** 2 for v in groups.values()))
    msw = (syy - s2) / (N - G)
    msb = (s2 - float(sy) * float(sy) / N) / (G - 1)
    k0 = (N - sum_ni_sq / N) / (G - 1)
    icc = (msb - msw) / (msb + (k0 - 1) * msw)

    got = spark.sql(_icc_sql("div", "DECIMAL(19,0)", split=True)).collect()[0]
    assert (got["n_groups"], got["n_tot"]) == (G, N)
    assert abs(got["icc1"] - icc) < 1e-9

    # the pre-r10 direct form dies at this magnitude: ArithmeticException
    # under ANSI (Spark 4 default), silent wrap/null with ANSI off
    try:
        old = spark.sql(
            _icc_sql("div", "DECIMAL(19,0)", split=False)
        ).collect()[0]
        assert old["icc1"] is None or abs(old["icc1"] - icc) > 1e-6
    except Exception:
        pass  # ANSI overflow error — the failure mode the ladder removes


def test_cvm_split_survives_int64_overflow(spark):
    """2M pooled rows over a 100-value domain: l·Q²/nᵢ quotients reach
    ~1e22 ≫ 2⁶³; the r10 ladder matches the exact-Fraction replay,
    the direct form does not."""
    from posting_lines_spark.queries.analytics_q import _cvm_sql

    n_rows = 2_000_000
    spark.range(n_rows).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS event_type",
        "CAST((id * 37) % 100 AS DOUBLE) / 100e0 AS value",
    ).createOrReplaceTempView("events")

    # count-based exact replay: cents c = (id*37) % 100, group = id % 2
    counts = {}  # (group, cents) -> count
    for rid in range(200):  # pattern repeats with period 200
        g, c = rid % 2, (rid * 37) % 100
        counts[(g, c)] = counts.get((g, c), 0) + n_rows // 200
    pooled = sorted({c for _, c in counts})
    n_i = {g: sum(v for (gg, _), v in counts.items() if gg == g)
           for g in (0, 1)}
    N = sum(n_i.values())
    t = Fraction(0)
    cum_all = 0
    cum_g = {0: 0, 1: 0}
    for z in pooled:
        lz = counts.get((0, z), 0) + counts.get((1, z), 0)
        cum_all += lz
        for g in (0, 1):
            cum_g[g] += counts.get((g, z), 0)
            q = N * cum_g[g] - n_i[g] * cum_all
            t += Fraction(lz * q * q, n_i[g])
    expect = float(t / N**3)

    got = spark.sql(_cvm_sql("div", "DECIMAL(19,0)", split=True)).collect()[0]
    assert (got["n"], got["k"]) == (N, 2)
    assert abs(got["cvm_t"] - expect) < 1e-9 * max(1.0, expect)

    try:
        old = spark.sql(
            _cvm_sql("div", "DECIMAL(19,0)", split=False)
        ).collect()[0]
        assert old["cvm_t"] is None or \
            abs(old["cvm_t"] - expect) > 1e-6 * max(1.0, expect)
    except Exception:
        pass  # ANSI overflow error — the failure mode the ladder removes
