"""The hard TPC-H shapes: correlated subqueries, multi-EXISTS, double
aggregation with HAVING semi-joins, disjunctive join predicates.

The reference engine (SURVEY.md §2) only ever issues equality predicates
and one update-join; these queries exercise the decorrelation and
join-planning surface a warehouse engine needs beyond that. Columns the
driver's trimmed TPC-H schema lacks (l_commitdate/l_receiptdate, c_phone,
p_container) are substituted with available columns that preserve each
query's PLAN SHAPE — the correlation structure, not the business filter,
is what's under test. Adaptations are noted per query.

Scale notes: every correlated subquery here decorrelates to a join
Catalyst plans with the fact table shuffling at most once per aggregate;
EXISTS/NOT EXISTS become left-semi/left-anti joins on the correlation
key (no per-row subquery execution); the Q18 HAVING filter is a
semi-join against a pre-aggregated key set (tiny build side at any SF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from posting_lines_spark.queries import register
from posting_lines_spark.queries.parity import davg_expr, dsum_expr
from posting_lines_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for t in names:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# --- TPC-H Q10 (returned item reporting): 4-table join + top-k ---

Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       {dsum_expr("l_extendedprice * (1.0e0 - l_discount)")} AS revenue,
       n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register(
    "q10_returned_items",
    oracle=Q10_ORACLE,
    description="TPC-H Q10 shape: quarter + returnflag filters pushed to "
    "both fact scans, 4-table star (nation broadcast), revenue per "
    "customer, top-20 via TakeOrderedAndProject",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.expr(dsum_expr("l_extendedprice * (1.0e0 - l_discount)")).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --- TPC-H Q15 (top supplier): aggregate CTE + scalar-max self reference ---
# The revenue CTE is aggregated ONCE and referenced twice (rows + its
# max); the scalar max broadcasts back as a filter. Revenue goes through
# the decimal-routed sum so the max-equality comparison is bit-identical
# across engines (a plain double sum could make the argmax differ).

Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {dsum_expr("l_extendedprice * (1.0e0 - l_discount)")} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register(
    "q15_top_supplier",
    oracle=Q15_SQL,
    description="TPC-H Q15 shape: revenue CTE aggregated once, referenced "
    "as rows AND as a scalar max (argmax-by-filter); decimal-routed sum "
    "makes the equality comparison engine-stable; supplier side broadcast",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(Q15_SQL)


# --- TPC-H Q17 (small-quantity-order revenue): correlated scalar AVG ---
# (p_container filter replaced by the brand filter alone — the schema has
# no container column; correlation structure identical.)

Q17_SQL = f"""
SELECT {dsum_expr("l_extendedprice")} / 7.0e0 AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 2.0e-1 * avg(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
"""


@register(
    "q17_small_qty_revenue",
    oracle=Q17_SQL,
    description="TPC-H Q17 shape: correlated scalar AVG subquery — "
    "Catalyst decorrelates to a per-partkey aggregate joined back on the "
    "correlation key (one extra lineitem aggregate, NO per-row subquery); "
    "quantities are exact small ints so the avg threshold is engine-stable",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(Q17_SQL)


# --- TPC-H Q18 (large-volume customers): HAVING key-set semi-join ---

Q18_ORACLE = f"""
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice,
       {dsum_expr("l_quantity")} AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING sum(l_quantity) > 250.0e0
  )
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d'),
         o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register(
    "q18_large_volume",
    oracle=Q18_ORACLE,
    description="TPC-H Q18 shape: HAVING-filtered key set (per-order "
    "quantity sums, integer-valued so exact in double) semi-joined back "
    "into the 3-table star — the aggregate-then-filter-parent pattern; "
    "deterministic top-100 (orderkey tiebreak)",
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qsum"))
        .filter(F.col("qsum") > 250.0)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
        .agg(F.expr(dsum_expr("l_quantity")).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# --- TPC-H Q19 (discounted revenue): disjunctive join predicate ---
# The OR-of-conjunctions shape: Catalyst must extract the common
# p_partkey = l_partkey equi-condition so the join stays a hash join
# with a disjunctive residual — NOT a cartesian product. (p_container /
# l_shipmode legs replaced with p_size / l_quantity ranges; same
# predicate structure.)

Q19_SQL = f"""
SELECT {dsum_expr("l_extendedprice * (1.0e0 - l_discount)")} AS revenue
FROM lineitem, part
WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
       AND l_quantity >= 1.0e0 AND l_quantity <= 11.0e0
       AND p_size BETWEEN 1 AND 15)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
       AND l_quantity >= 10.0e0 AND l_quantity <= 20.0e0
       AND p_size BETWEEN 1 AND 25)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#7'
       AND l_quantity >= 20.0e0 AND l_quantity <= 30.0e0
       AND p_size BETWEEN 1 AND 35)
"""


@register(
    "q19_disjunctive_join",
    oracle=Q19_SQL,
    description="TPC-H Q19 shape: OR-of-conjunctions join predicate — the "
    "planner must extract the common partkey equi-condition (hash join + "
    "disjunctive residual, never a cartesian); plan-asserted in "
    "tests/test_plans.py",
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(Q19_SQL)


# --- TPC-H Q21 (waiting supplier): EXISTS + NOT EXISTS double correlation ---
# Adapted (no l_commitdate/l_receiptdate in the schema): the "late" line
# condition becomes l_returnflag = 'R'. Structure preserved exactly:
# suppliers whose returned line is the ONLY returned line on a
# multi-supplier finished order — one EXISTS (another supplier touched
# the order) and one NOT EXISTS (no OTHER supplier's line was returned),
# both correlated on (orderkey, suppkey-inequality).

Q21_SQL = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_3'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@register(
    "q21_waiting_supplier",
    oracle=Q21_SQL,
    description="TPC-H Q21 shape (returnflag substituted for the absent "
    "commit/receipt dates): EXISTS + NOT EXISTS both correlated on the "
    "order with a supplier-inequality — decorrelates to a left-semi and "
    "a left-anti join on l_orderkey with non-equi residuals; no per-row "
    "subquery execution at any scale",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    return spark.sql(Q21_SQL)


# --- TPC-H Q22 (global sales opportunity): anti-join + global scalar AVG ---
# Adapted (no c_phone): the country-code substring membership becomes a
# market-segment membership, and "never ordered" (which eliminates every
# customer at this data's 10-orders-per-customer density) becomes "never
# placed an URGENT order". Structure preserved: IN-list filter, scalar
# AVG subquery over a filtered copy of the same table, NOT EXISTS
# anti-join, final aggregate. The avg threshold goes through the
# decimal-routed mean so the > comparison is engine-stable.

Q22_SQL = f"""
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS numcust,
       {dsum_expr("c_acctbal")} AS totacctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
  AND c_acctbal > (
    SELECT {davg_expr("c_acctbal")} FROM customer
    WHERE c_acctbal > 0.0e0
      AND c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_mktsegment
ORDER BY segment
"""


@register(
    "q22_sales_opportunity",
    oracle=Q22_SQL,
    description="TPC-H Q22 shape (segment membership for the absent phone "
    "prefix; URGENT-order anti-condition for the degenerate never-ordered "
    "one): uncorrelated scalar AVG broadcast as a filter + NOT EXISTS "
    "anti-join against orders + final aggregate; decimal-routed mean "
    "keeps the balance threshold bit-identical across engines",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(Q22_SQL)
