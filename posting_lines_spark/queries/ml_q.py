"""Model-evaluation metrics over engine-resident prediction sets.

The training-data pipeline this engine targets ends in models, and the
evaluation of those models is itself a large-scale data problem: AUC
over billions of scored rows, threshold sweeps for serving cutoffs,
calibration audits before a score is trusted as a probability. The
reference has no analogue (it is a geometry ETL, sql_to_line.py:205-224)
— this family extends the engine the same way the stats_* ladder does.

Shared conventions: the "model" is a deterministic score derived from
the events table (cents = round(value·100) as BIGINT — integer-exact on
both engines), the label is purchase membership. The synthetic score is
intentionally near-random (AUC ≈ 0.5, gini ≈ 0); the queries audit the
MACHINERY, whose math is exact integers until a final division.

Scale designs (100 TB):
  - AUC: one (score) aggregate with map-side combine (state bounded by
    the score domain, ≤ 49k cents values), prefix sums via the range-
    partitioned two-pass global_running_sums (no single-partition
    window — the stats_mann_whitney / stats_ks_test discipline), then a
    1-row reduce. No data-shaped shuffle beyond the first aggregate.
  - threshold sweep: same per-score aggregate, then a 9-row broadcast
    cross join — never a per-row threshold scan.
  - calibration: one 10-bin conditional aggregate; ECE folds exact
    integer numerators (|C·Σy − Σc|) so the 10-term sum is order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from posting_lines_spark.queries import register
from posting_lines_spark.sources import load_table

_POS = "purchase"

_SCORED = (
    "SELECT CAST(round(value * 100e0) AS BIGINT) AS s, "
    f"CASE WHEN event_type = '{_POS}' THEN 1 ELSE 0 END AS y "
    "FROM events"
)

_PER_S = f"""
SELECT s,
       CAST(sum(y) AS BIGINT) AS np,
       CAST(count(*) - sum(y) AS BIGINT) AS nn
FROM ({_SCORED}) scored
GROUP BY s
"""

# --- AUC-ROC via the rank-sum identity ---
# AUC = P(score_pos > score_neg) + ½·P(tie). Per distinct score s with
# (np, nn) counts and nn_below negatives strictly below, each positive
# at s contributes nn_below wins and nn ties, so
#   2·AUC·P·N = Σ_s np·(2·nn_below + nn)   — an exact BIGINT.
# One division at the end; gini = 2·AUC − 1 from the same operands.


def _auc_final_sql(src: str) -> str:
    pn = "(CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))"
    return f"""
SELECT n_pos, n_neg, num2,
       CAST(num2 AS DOUBLE) / (2.0e0 * {pn}) AS auc,
       CAST(num2 AS DOUBLE) / {pn} - 1.0e0 AS gini
FROM {src}
"""


AUC_ORACLE = f"""
WITH per_s AS ({_PER_S}),
run AS (
  SELECT np, nn,
         sum(nn) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS run_nn
  FROM per_s
),
agg AS (
  SELECT CAST(sum(np) AS BIGINT) AS n_pos,
         CAST(sum(nn) AS BIGINT) AS n_neg,
         CAST(sum(np * (2 * (run_nn - nn) + nn)) AS BIGINT) AS num2
  FROM run
)
{_auc_final_sql("agg")}
"""


@register(
    "ml_auc_roc",
    oracle=AUC_ORACLE,
    description="AUC-ROC via the rank-sum identity (Mann-Whitney "
    "relation): per-distinct-score class counts (map-side combine, "
    "score-domain-bounded), negatives-below prefix sums via the range-"
    "partitioned two-pass global_running_sums (no single-partition "
    "window), 2·AUC·P·N as an exact BIGINT, one final division; "
    "gini = 2·AUC − 1 from the same operands",
)
def ml_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from posting_lines_spark.operators.ranking import global_running_sums

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    per_s = spark.sql(_PER_S)
    run = global_running_sums(per_s, ["s"], ["nn"])
    agg = run.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.sum(
            F.col("np") * (2 * (F.col("run_nn") - F.col("nn")) + F.col("nn"))
        )
        .cast("long")
        .alias("num2"),
    )
    agg.createOrReplaceTempView("pls_auc_agg")
    return spark.sql(_auc_final_sql("pls_auc_agg"))


# --- precision/recall/F1 threshold sweep ---
# Serving-cutoff selection: for each candidate threshold t, the
# confusion counts of the rule "predict positive iff s ≥ t". Computed
# from the SAME per-score aggregate as AUC (9 thresholds × score-domain
# rows, a broadcast-sized cross join), never a second data scan per
# threshold. Counts exact; the three ratios are per-row divisions of
# identical integer operands on both engines.

_THRESHOLDS = list(range(5000, 45001, 5000))  # cents: 50.00 … 450.00


def _sweep_sql() -> str:
    thr_rows = ", ".join(f"({t})" for t in _THRESHOLDS)
    return f"""
WITH per_s AS ({_PER_S}),
thr AS (SELECT * FROM (VALUES {thr_rows}) AS t(thr)),
tot AS (
  SELECT CAST(sum(np) AS BIGINT) AS p_all, CAST(sum(nn) AS BIGINT) AS n_all
  FROM per_s
),
conf AS (
  SELECT t.thr,
         CAST(sum(CASE WHEN p.s >= t.thr THEN p.np ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN p.s >= t.thr THEN p.nn ELSE 0 END) AS BIGINT) AS fp
  FROM per_s p CROSS JOIN thr t
  GROUP BY t.thr
)
SELECT c.thr,
       c.tp, c.fp,
       tot.p_all - c.tp AS fn,
       tot.n_all - c.fp AS tn,
       CAST(c.tp AS DOUBLE) / nullif(CAST(c.tp + c.fp AS DOUBLE), 0.0e0)
         AS precision_at_t,
       CAST(c.tp AS DOUBLE) / CAST(tot.p_all AS DOUBLE) AS recall_at_t,
       2.0e0 * CAST(c.tp AS DOUBLE)
         / nullif(CAST(c.tp + c.fp AS DOUBLE) + CAST(tot.p_all AS DOUBLE), 0.0e0)
         AS f1_at_t
FROM conf c CROSS JOIN tot
ORDER BY c.thr
"""


@register(
    "ml_threshold_sweep",
    oracle=_sweep_sql(),
    description="precision/recall/F1 confusion sweep over 9 serving "
    "thresholds from ONE per-score aggregate (score-domain-bounded "
    "state, 9-row broadcast cross join — no per-threshold rescan); "
    "exact integer counts, ratio divisions share identical operands on "
    "both engines; F1 = 2tp/(tp+fp+P) avoids the p·r/(p+r) double chain",
)
def ml_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_sweep_sql())


# --- calibration reliability bins + expected calibration error ---
# Before a score is used as a probability it must be calibrated:
# p̂ = cents / C (C = 50000, the score's declared normalization
# constant), 10 equal-width reliability bins, per-bin confidence
# (mean p̂) vs accuracy (positive rate), and
#   ECE = Σ_b (n_b/N)·|acc_b − conf_b|
#       = Σ_b |C·Σy_b − Σc_b| / (C·N)
# — the numerator is an EXACT BIGINT per bin, so the 10-term sum is
# order-free and the whole metric is one final division.

_CAL_C = 50000


def _calibration_sql() -> str:
    C = _CAL_C
    return f"""
WITH scored AS ({_SCORED}),
bins AS (
  SELECT CAST(floor(CAST(s AS DOUBLE) / {C // 10}.0e0) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n_bin,
         CAST(sum(y) AS BIGINT) AS sum_y,
         CAST(sum(s) AS BIGINT) AS sum_c
  FROM scored
  GROUP BY 1
)
SELECT bin, n_bin,
       CAST(sum_c AS DOUBLE) / (CAST(n_bin AS DOUBLE) * {C}.0e0) AS confidence,
       CAST(sum_y AS DOUBLE) / CAST(n_bin AS DOUBLE) AS accuracy,
       abs(CAST({C} * sum_y - sum_c AS DOUBLE))
         / (CAST(n_bin AS DOUBLE) * {C}.0e0) AS gap,
       CAST(sum(abs({C} * sum_y - sum_c)) OVER () AS DOUBLE)
         / ({C}.0e0 * CAST(sum(n_bin) OVER () AS DOUBLE)) AS ece
FROM bins
ORDER BY bin
"""


@register(
    "ml_calibration_bins",
    oracle=_calibration_sql(),
    description="calibration reliability bins + ECE: 10 equal-width "
    "bins from one conditional aggregate (bin-bounded state), per-bin "
    "confidence vs accuracy, ECE folded from exact BIGINT numerators "
    "|C·Σy − Σc| so the cross-bin sum is order-free — one final "
    "division for the whole metric",
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_calibration_sql())
