"""Corpus-curation queries — the operations a large-scale training-data
pipeline runs AFTER dedup signals exist: materialize the deduplicated
corpus, sample it deterministically per stratum, pack it to a token
budget, and extract a document-frequency vocabulary.

Everything is hash-based and deterministic (functions/hashing.py), so
each query has an exact DuckDB oracle — no RNG state anywhere.

Scale notes: sampling and budget-packing are one scan + one window/agg
each (shuffle on the stratum key only); the survivor corpus is an
anti-join of the corpus against the (tiny) drop list produced by
connected components — broadcastable at any realistic dup rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from posting_lines_spark.functions.hashing import md5_int_duck, md5_int_spark
from posting_lines_spark.operators import graph
from posting_lines_spark.queries import register
from posting_lines_spark.queries.dedup_q import NEAR_BASE_DUCK, NEAR_BASE_SPARK
from posting_lines_spark.queries.graph_q import _PAIRS_DUCK, _spark_pairs
from posting_lines_spark.sources import load_table

# --- deduplicated corpus (the end of the dedup story) ---

SURVIVORS_ORACLE = f"""
WITH RECURSIVE pairs AS ({_PAIRS_DUCK}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(node, label) AS (
  SELECT u AS node, u AS label FROM edges
  UNION
  SELECT e.v AS node, r.label FROM reach r JOIN edges e ON e.u = r.node
),
comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
drops AS (SELECT node AS doc_id FROM comp WHERE node != component),
base AS ({NEAR_BASE_DUCK})
SELECT CAST(count(*) AS BIGINT) AS n_docs_kept,
       (SELECT CAST(count(*) AS BIGINT) FROM drops) AS n_docs_dropped,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens_kept
FROM base
WHERE doc_id NOT IN (SELECT doc_id FROM drops)
"""


@register(
    "corpus_survivors",
    oracle=SURVIVORS_ORACLE,
    description="the deduplicated corpus: near-dup components keep their "
    "min-id survivor, all other members are anti-joined out — the cleaned "
    "dataset a curation pipeline actually ships",
)
def corpus_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    # _spark_pairs registers the `documents` view NEAR_BASE_SPARK reads
    comp = graph.connected_components(_spark_pairs(spark, sf_dir))
    drops = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    base = spark.sql(NEAR_BASE_SPARK)
    kept = base.join(F.broadcast(drops), "doc_id", "left_anti")
    stats = kept.agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum(F.size(F.split("text", " ")).cast("long")).cast("long").alias("total_tokens_kept"),
    )
    dropped = drops.agg(F.count(F.lit(1)).alias("n_docs_dropped"))
    return stats.crossJoin(dropped).select(
        "n_docs_kept", "n_docs_dropped", "total_tokens_kept"
    )


# --- deterministic stratified sampling ---

def _sample_sql(h_source: str, h_doc: str) -> str:
    return f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN {h_doc} % 1000 < 100 + ({h_source} % 400) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(100 + ({h_source} % 400) AS BIGINT) AS keep_per_mille
FROM documents
GROUP BY source, 100 + ({h_source} % 400)
ORDER BY source
"""


SAMPLE_ORACLE = _sample_sql(
    md5_int_duck("source", salt="rate"),
    md5_int_duck("CAST(doc_id AS VARCHAR)", salt="samp"),
)


@register(
    "sample_stratified",
    oracle=SAMPLE_ORACLE,
    description="deterministic stratified sampling: per-source keep rate "
    "derived from a source hash, membership from a doc-id hash — "
    "reproducible sampling with zero RNG state, the scale-safe way to "
    "downsample strata (mirrors hash-mod sampling in curation pipelines)",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        _sample_sql(
            md5_int_spark("source", salt="rate"),
            md5_int_spark("CAST(doc_id AS STRING)", salt="samp"),
        )
    )


# --- token-budget packing ---

TOKEN_BUDGET = 10_000

PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
cum AS (
  SELECT *, sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
  FROM toks
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs_packed,
       CAST(max(cum_tok) AS BIGINT) AS tokens_packed
FROM cum
WHERE cum_tok <= {TOKEN_BUDGET}
GROUP BY source
ORDER BY source
"""

PACK_SPARK = f"""
WITH toks AS (
  SELECT doc_id, source, CAST(size(split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
cum AS (
  SELECT *, sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
  FROM toks
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs_packed,
       CAST(max(cum_tok) AS BIGINT) AS tokens_packed
FROM cum
WHERE cum_tok <= {TOKEN_BUDGET}
GROUP BY source
ORDER BY source
"""


@register(
    "pack_token_budget",
    oracle=PACK_ORACLE,
    description="token-budget packing: running token count per stratum "
    "(deterministic doc order), cut at the budget — how curation pipelines "
    "fill a fixed training-token allocation per source",
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(PACK_SPARK)


# --- document-frequency vocabulary ---

VOCAB_K = 25

VOCAB_ORACLE = f"""
WITH dtoks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
),
freq AS (SELECT token, CAST(count(*) AS BIGINT) AS doc_freq FROM dtoks GROUP BY token),
ranked AS (
  SELECT token, doc_freq,
         CAST(row_number() OVER (ORDER BY doc_freq DESC, token) AS BIGINT) AS rnk
  FROM freq
)
SELECT token, doc_freq, rnk FROM ranked WHERE rnk <= {VOCAB_K}
ORDER BY rnk
"""


@register(
    "vocab_topk",
    oracle=VOCAB_ORACLE,
    description="document-frequency vocabulary: distinct (doc, token) "
    "explode → df count → global top-k — the df side of tf-idf and the "
    "stop-token detector feeding stop_shingle_cap",
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    dtoks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    )
    freq = dtoks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
    from pyspark.sql import Window as W

    # distributed top-k (TakeOrderedAndProject) BEFORE ranking: the
    # row_number window then runs over k rows, not the whole vocabulary
    topk = freq.orderBy(F.col("doc_freq").desc(), F.col("token")).limit(VOCAB_K)
    return topk.withColumn(
        "rnk",
        F.row_number().over(W.orderBy(F.col("doc_freq").desc(), F.col("token"))).cast("long"),
    ).orderBy("rnk")
