"""Round-11 regression tests.

ADVICE-r10 items — both are engine/oracle envelope divergences where
Spark's IntegralDivide (`div` always returns BIGINT) or a narrowing
DECIMAL(19,0) cast wraps past int64 while the DuckDB oracle's HUGEINT
stays int128-exact:

1. (medium) stats_ansari_bradley's triangular helper T(x) = x(x+1)/2
   computed as `(wide·(x+1)) div 2` wraps once T(x) > 2⁶³, i.e. past
   N ≈ 4.3e9 pooled rows — a tighter global bound than the documented
   t < 3.04e9 tie-block bound. Fixed by halving the even factor FIRST
   (x(x+1) is always even), so every div operand stays int64 and only
   the product is widened. The wrap is rowcount-driven (positions, not
   values), so no feasible local table can trigger it through the full
   query — these tests drive the extracted `_tri_expr` fragment at the
   exact magnitudes instead, on both engines.

2. (low) stats_goodman_kruskal_gamma's engine narrowed the exact
   DECIMAL(38,0) concordant/discordant sums to DECIMAL(19,0) before
   the STRING→DOUBLE emit, capping C/D at ~1e19 (barely above int64)
   while the oracle casts to HUGEINT. Fixed by keeping DECIMAL(38,0)
   end-to-end. Same rowcount-driven wrap, so the test injects a grid
   with ~4e9-per-cell counts via _gamma_sql's grid override.
"""

from __future__ import annotations

from tests.conftest import SF0001


def _assert_query_matches_oracle(spark, duck, name):
    """Driver-style exact compare: run the registered engine query and
    its oracle SQL at sf0.001, canonicalize, and assert equality."""
    from posting_lines_spark.queries import load_all
    from tools.check_oracle import rows_canon

    q = load_all()[name]
    df = q.fn(spark, SF0001)
    res = duck.execute(q.oracle)
    dcols = [d[0].lower() for d in res.description]
    got = rows_canon(
        [tuple(r) for r in df.collect()], [c.lower() for c in df.columns]
    )
    want = rows_canon(res.fetchall(), dcols)
    assert got == want


# x values straddling the naive form's 4.3e9 cliff: small/parity
# cases, the largest safe naive x, the first wrapping magnitudes, and
# the int64 edge (T(x) ≈ 4.3e37 still inside DECIMAL(38,0)/HUGEINT).
_TRI_XS = [
    0,
    1,
    2,
    3,
    4_294_967_295,  # T(x) just under 2⁶³
    4_294_967_296,  # T(x) just over 2⁶³ — naive div wraps here
    4_294_967_297,
    10_000_000_000,
    2**62,
    2**63 - 2,
]


def test_tri_expr_split_survives_int64_overflow(spark):
    """The even-factor-first split matches exact Python x(x+1)//2 at
    every magnitude up to x = 2⁶³−2; the naive wide-product div dies
    past x ≈ 4.3e9 (ANSI ArithmeticException or wrap)."""
    from posting_lines_spark.queries.analytics_q import _tri_expr

    spark.createDataFrame(
        [(x,) for x in _TRI_XS], "x bigint"
    ).createOrReplaceTempView("tri_xs")

    split = _tri_expr("x", "div", "DECIMAL(38,0)")
    got = {
        r["x"]: r["t"]
        for r in spark.sql(
            f"SELECT x, CAST({split} AS STRING) AS t FROM tri_xs"
        ).collect()
    }
    want = {x: str(x * (x + 1) // 2) for x in _TRI_XS}
    assert got == want

    naive = _tri_expr("x", "div", "DECIMAL(38,0)", naive=True)
    try:
        old = {
            r["x"]: r["t"]
            for r in spark.sql(
                f"SELECT x, CAST({naive} AS STRING) AS t FROM tri_xs"
            ).collect()
        }
        bad = 4_294_967_296
        assert old[bad] is None or old[bad] != want[bad]
    except Exception:
        pass  # ANSI overflow error — the failure mode the split removes


def test_tri_expr_engine_oracle_parity_at_magnitude(spark, duck):
    """The SAME split template under DuckDB HUGEINT `//` agrees with
    the Spark DECIMAL(38,0) `div` form digit-for-digit at every
    magnitude — the fragment-level twin of the driver's value-hash."""
    from posting_lines_spark.queries.analytics_q import _tri_expr

    spark.createDataFrame(
        [(x,) for x in _TRI_XS], "x bigint"
    ).createOrReplaceTempView("tri_xs")
    s = spark.sql(
        "SELECT x, CAST("
        + _tri_expr("x", "div", "DECIMAL(38,0)")
        + " AS STRING) AS t FROM tri_xs ORDER BY x"
    ).collect()

    duck.execute(
        "CREATE OR REPLACE TEMP TABLE tri_xs AS SELECT * FROM "
        "(VALUES " + ", ".join(f"({x}::BIGINT)" for x in _TRI_XS) + ") v(x)"
    )
    d = duck.execute(
        "SELECT x, CAST("
        + _tri_expr("x", "//", "HUGEINT")
        + " AS VARCHAR) AS t FROM tri_xs ORDER BY x"
    ).fetchall()
    assert [(r["x"], r["t"]) for r in s] == [(x, t) for x, t in d]


def test_ansari_full_query_unchanged_by_tri_split(spark, duck):
    """The T(x) rewrite is a pure refactor at feasible N: the full
    Ansari-Bradley engine query still hash-matches the HUGEINT oracle
    at sf0.001 (driver-style exact compare)."""
    _assert_query_matches_oracle(spark, duck, "stats_ansari_bradley")


_GAMMA_GRID_CELLS = [
    # (x, y, n): three hours × two deciles, counts ~4e9 per cell so
    # C = Σ n·n' pairs ≈ 5e19 — past the old DECIMAL(19,0) cap and
    # past int64, inside DECIMAL(38,0)/HUGEINT.
    (0, 1, 4_000_000_000),
    (0, 3, 3_000_000_000),
    (1, 0, 3_500_000_000),
    (1, 2, 2_500_000_000),
    (2, 1, 4_100_000_000),
    (2, 4, 1_900_000_000),
]


def _gamma_python(cells):
    c = d = 0
    for xa, ya, na in cells:
        for xb, yb, nb in cells:
            if xb > xa and yb > ya:
                c += na * nb
            elif xb > xa and yb < ya:
                d += na * nb
    return c, d


def test_gamma_wide_engine_survives_1e19(spark):
    """With ~4e9-per-cell counts the C sum crosses 1e19: the r11
    DECIMAL(38,0) engine carries it exactly (string-exact vs Python
    int), the old DECIMAL(19,0) outer cast nulls or throws."""
    from posting_lines_spark.queries.analytics_q import _gamma_sql

    spark.createDataFrame(
        _GAMMA_GRID_CELLS, "x bigint, y bigint, n bigint"
    ).createOrReplaceTempView("gamma_grid")
    grid = "SELECT x, y, n FROM gamma_grid"
    c, d = _gamma_python(_GAMMA_GRID_CELLS)
    assert c > 10**19 or d > 10**19  # non-vacuous: past the old cap

    got = spark.sql(_gamma_sql("DECIMAL(38,0)", grid=grid)).collect()[0]
    assert got["c_pairs"] == float(c) and got["d_pairs"] == float(d)
    assert abs(got["gamma"] - (c - d) / (c + d)) < 1e-12

    try:
        old = spark.sql(_gamma_sql("DECIMAL(19,0)", grid=grid)).collect()[0]
        assert old["c_pairs"] is None or old["c_pairs"] != float(c)
    except Exception:
        pass  # ANSI overflow error — the failure mode the widening removes


def test_gamma_wide_engine_oracle_parity_at_magnitude(spark, duck):
    """Engine DECIMAL(38,0) vs oracle HUGEINT on the SAME >1e19 grid:
    identical C, D, and gamma."""
    from posting_lines_spark.queries.analytics_q import _gamma_sql

    spark.createDataFrame(
        _GAMMA_GRID_CELLS, "x bigint, y bigint, n bigint"
    ).createOrReplaceTempView("gamma_grid")
    grid = "SELECT x, y, n FROM gamma_grid"
    s = spark.sql(_gamma_sql("DECIMAL(38,0)", grid=grid)).collect()[0]

    duck.execute(
        "CREATE OR REPLACE TEMP TABLE gamma_grid AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({x}::BIGINT, {y}::BIGINT, {n}::BIGINT)"
            for x, y, n in _GAMMA_GRID_CELLS
        )
        + ") v(x, y, n)"
    )
    o = duck.execute(_gamma_sql("HUGEINT", grid=grid)).fetchone()
    assert (s["n_rows"], s["c_pairs"], s["d_pairs"]) == (o[0], o[1], o[2])
    assert abs(s["gamma"] - o[3]) < 1e-15


def test_gamma_full_query_unchanged_by_widening(spark, duck):
    """The DECIMAL(38,0) widening is a pure refactor at feasible N:
    the full gamma engine query still hash-matches the HUGEINT oracle
    at sf0.001."""
    _assert_query_matches_oracle(
        spark, duck, "stats_goodman_kruskal_gamma"
    )


# ---- JDBC: live embedded Derby (the r3-era "mock-tested only" caveat
# shrinks to dialect-only: a real database, real INSERTs, real parallel
# range reads, real pushdown into the DB) ----


def _derby_url(spark):
    from posting_lines_spark.fixtures import scratch_dir

    home = scratch_dir(prefix="pls_derby_home_")
    spark.sparkContext._jvm.System.setProperty("derby.system.home", home)
    return (
        f"jdbc:derby:{scratch_dir(prefix='pls_derby_')}/db;create=true",
        "org.apache.derby.jdbc.EmbeddedDriver",
    )


def test_jdbc_live_partitioned_read_and_pushdown(spark):
    """Round-trip through a live Derby DB: the partitioned read issues
    8 range-predicated scans (8 RDD partitions, no row lost or doubled)
    and a filter is pushed INTO the database (`*` = source-evaluated)."""
    import re

    from posting_lines_spark.sources import load_jdbc, load_table, write_jdbc
    from tests.conftest import SF0001

    url, driver = _derby_url(spark)
    c = load_table(spark, SF0001, "customer")
    write_jdbc(c, url, "customer_live", mode="overwrite", driver=driver)
    back = load_jdbc(
        spark,
        url,
        "customer_live",
        partition_column="c_custkey",
        num_partitions=8,
        lower_bound=1,
        upper_bound=c.count(),
        driver=driver,
    )
    assert back.rdd.getNumPartitions() == 8
    assert sorted(r["c_custkey"] for r in back.collect()) == sorted(
        r["c_custkey"] for r in c.collect()
    )

    flt = back.filter(back.c_acctbal > 1000.0).select("c_custkey")
    plan = flt._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "*GreaterThan(c_acctbal,1000.0)" in m.group(1)
    # column pruning reaches the DB too: only the needed columns scanned
    rs = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert rs and "c_name" not in rs.group(1)


def test_jdbc_roundtrip_matches_oracle(spark, duck):
    """The registered jdbc_roundtrip query (write → partitioned read →
    aggregate) hash-matches the parquet-side oracle at sf0.001."""
    _assert_query_matches_oracle(spark, duck, "jdbc_roundtrip")
