"""Full-text search over `documents` — the posting-list ("posting lines")
side of the engine: build term→document posting lists with tf/df stats,
score a fixed query with a BM25-style ranking function, return top-k.

Cross-engine float parity: the classic BM25 idf uses ln(), which is
transcendental and NOT bit-identical across engines. We use the log-free
rational idf  (N - df + 0.5)/(df + 0.5)  instead (same ordering for a
single-term contribution, monotone in df). Every input is an exact
integer (tf, df, dl, N) or a division of identical integers (avgdl), and
IEEE double +,-,*,/ are deterministic — so the score is bit-identical
Spark↔DuckDB with no decimal routing. Per-doc term combination goes
through per-term conditional MAX columns summed in fixed textual order
(never SUM over a double group, which is partial-aggregation-order
dependent).

Scale: tf is one explode→count with map-side combine keyed on
(doc_id, term) — but only AFTER the IN-list filter, so the shuffled
stream is |query terms| × docs, not the whole token stream. df and the
corpus stats are tiny aggregates broadcast back; top-k is
TakeOrderedAndProject (no global sort).

Reference: the repo this engine reimplements is named posting-lines;
its v1 pipeline (sql_to_line.py) builds per-day line tables — this
module is the IR-sense "posting lines" extension the north star asks
for on the documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from posting_lines_spark.queries import register
from posting_lines_spark.sources import load_table

QUERY_TERMS = ["join", "window", "stream"]
K1 = "1.2e0"
B = "0.75e0"
TOP_K = 15


def _bm25_sql(tok_explode: str) -> str:
    terms = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    per_term = ", ".join(
        f"coalesce(max(CASE WHEN term = '{t}' THEN s END), 0.0e0) AS s_{t}"
        for t in QUERY_TERMS
    )
    total = " + ".join(f"s_{t}" for t in QUERY_TERMS)
    matched = " + ".join(
        f"CASE WHEN s_{t} > 0.0e0 THEN 1 ELSE 0 END" for t in QUERY_TERMS
    )
    return f"""
WITH dl AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS dl
  FROM (SELECT doc_id, count(*) AS n_tokens FROM ({tok_explode}) GROUP BY doc_id)
),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
  FROM ({tok_explode}) WHERE tok IN ({terms})
  GROUP BY doc_id, tok
),
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id, tf.term,
         ((CAST(corpus.n_docs AS DOUBLE) - df.df + 0.5e0) / (df.df + 0.5e0))
         * (tf.tf * ({K1} + 1.0e0))
           / (tf.tf + {K1} * (1.0e0 - {B} + {B} * dl.dl / corpus.avgdl)) AS s
  FROM tf
  JOIN df ON tf.term = df.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN corpus
),
per_doc AS (
  SELECT doc_id, {per_term} FROM scored GROUP BY doc_id
)
SELECT doc_id,
       {total} AS bm25_score,
       CAST({matched} AS BIGINT) AS n_terms_matched
FROM per_doc
ORDER BY bm25_score DESC, doc_id
LIMIT {TOP_K}
"""


BM25_ORACLE = _bm25_sql(
    "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents"
)


@register(
    "search_bm25",
    oracle=BM25_ORACLE,
    description="posting-list search: tf/df stats + BM25-style rational-idf "
    "scoring (log-free for cross-engine bit parity) for a fixed term query, "
    "top-k by score. Filter-before-shuffle keeps the tf aggregate at "
    "|terms|×docs; corpus stats broadcast; TakeOrderedAndProject top-k",
)
def search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        _bm25_sql("SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents")
    )


# --- classic BM25 (Robertson log idf), via the deterministic ln kernel ---
# The rational idf above was the round-3 workaround for ln() not being
# IEEE-specified. functions/dmath.py (round 4) removes the constraint:
# idf = ln((N − df + ½)/(df + ½)) = ln(2N−2df+1) − ln(2(df)+1) — a
# difference of integer logs, which the staged kernel computes
# bit-identically on both engines. The idf stages run on the DF table
# (|query terms| rows — free); everything downstream is IEEE arithmetic.


def _bm25_ln_sql(tok_explode: str) -> str:
    from posting_lines_spark.functions.dmath import dln_int_cte_layers

    terms = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    per_term = ", ".join(
        f"coalesce(max(CASE WHEN term = '{t}' THEN s END), 0.0e0) AS s_{t}"
        for t in QUERY_TERMS
    )
    total = " + ".join(f"s_{t}" for t in QUERY_TERMS)
    stage_sql, prev = dln_int_cte_layers([("na", "na"), ("nb", "nb")], "idf0", "idf")
    return f"""
WITH dl AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS dl
  FROM (SELECT doc_id, count(*) AS n_tokens FROM ({tok_explode}) GROUP BY doc_id)
),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
  FROM ({tok_explode}) WHERE tok IN ({terms})
  GROUP BY doc_id, tok
),
idf0 AS (
  SELECT term, df, CAST(2 * n_docs - 2 * df + 1 AS BIGINT) AS na,
         CAST(2 * df + 1 AS BIGINT) AS nb
  FROM (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)
  CROSS JOIN corpus
),
{stage_sql},
idf AS (SELECT term, df, (na_ln - nb_ln) AS idf FROM {prev}),
scored AS (
  SELECT tf.doc_id, tf.term,
         idf.idf * (tf.tf * ({K1} + 1.0e0))
           / (tf.tf + {K1} * (1.0e0 - {B} + {B} * dl.dl / corpus.avgdl)) AS s
  FROM tf
  JOIN idf ON tf.term = idf.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN corpus
),
per_doc AS (
  SELECT doc_id, {per_term} FROM scored GROUP BY doc_id
)
SELECT doc_id,
       {total} AS bm25_score,
       CAST({" + ".join(f"CASE WHEN s_{t} > 0.0e0 THEN 1 ELSE 0 END" for t in QUERY_TERMS)} AS BIGINT) AS n_terms_matched
FROM per_doc
ORDER BY bm25_score DESC, doc_id
LIMIT {TOP_K}
"""


@register(
    "search_bm25_ln",
    oracle=_bm25_ln_sql(
        "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents"
    ),
    description="classic BM25 with the true Robertson log idf: "
    "ln((N−df+½)/(df+½)) as a difference of integer logs through the "
    "deterministic ln kernel (functions/dmath.py) — exact textbook "
    "scoring, still bit-identical across engines; idf stages run on the "
    "|terms|-row df table, so the kernel costs nothing at any scale",
)
def search_bm25_ln(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        _bm25_ln_sql("SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents")
    )


# --- exact phrase search (positional posting lists) ---
# The other half of an IR engine next to BM25's bag-of-words scoring:
# "table hash" as an exact phrase. Positional postings are built ONLY
# for the phrase's terms (the IN-list filter runs before the explode is
# shuffled, same discipline as the tf stage above), then adjacency is
# one equi-join on (doc, pos+1). Generalizes to k-word phrases as a
# chain of k−1 position joins; at 100 TB the positional index is the
# stored artifact and this is a pure index-side query.

PHRASE = ("table", "hash")


def _phrase_sql(tok_pos: str) -> str:
    w1, w2 = PHRASE
    return f"""
WITH tp AS ({tok_pos}),
p1 AS (SELECT doc_id, pos FROM tp WHERE tok = '{w1}'),
p2 AS (SELECT doc_id, pos FROM tp WHERE tok = '{w2}')
SELECT p1.doc_id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM p1 JOIN p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
GROUP BY p1.doc_id
ORDER BY n_occurrences DESC, p1.doc_id
LIMIT 20
"""


_TOKPOS_SPARK = (
    "SELECT doc_id, pos, tok FROM documents "
    "LATERAL VIEW posexplode(split(text, ' ')) v AS pos, tok"
)
_TOKPOS_DUCK = (
    "SELECT doc_id, unnest(range(len(string_split(text, ' ')))) AS pos, "
    "unnest(string_split(text, ' ')) AS tok FROM documents"
)


@register(
    "search_phrase",
    oracle=_phrase_sql(_TOKPOS_DUCK),
    description="exact phrase search over positional posting lists: "
    "postings built only for the phrase's terms (filter before shuffle), "
    "adjacency = one equi-join on (doc, pos+1), top-20 by occurrence — "
    "the phrase-query half of an IR engine next to BM25",
)
def search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_phrase_sql(_TOKPOS_SPARK))


# --- reciprocal-rank fusion (hybrid-ranker ensembling) ---
# RRF (Cormack et al., SIGIR'09): fuse N rankers without score
# calibration — each contributes 1/(k + rank), k=60. Here the two
# registered BM25 variants (rational idf vs true-ln idf) rank the same
# query and are fused over their FULL rankings. Ranks come from
# row_number over (score DESC, doc_id) — deterministic total order —
# so the fused score is a sum of reciprocals of exact integers:
# bit-identical cross-engine with no decimal routing.
#
# Scale: both rankers share one tf/df/dl/corpus build (the CTEs are
# written once and reused); ranking |matched docs| rows is
# top-k-sized work, and the fusion join is rank-table × rank-table.

RRF_K = 60


def _rrf_sql(tok_explode: str) -> str:
    from posting_lines_spark.functions.dmath import dln_int_cte_layers

    terms = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    per_term = ", ".join(
        f"coalesce(max(CASE WHEN term = '{t}' THEN s END), 0.0e0) AS s_{t}"
        for t in QUERY_TERMS
    )
    total = " + ".join(f"s_{t}" for t in QUERY_TERMS)
    stage_sql, prev = dln_int_cte_layers([("na", "na"), ("nb", "nb")], "idf0", "idf")
    norm = f"(tf.tf * ({K1} + 1.0e0)) / (tf.tf + {K1} * (1.0e0 - {B} + {B} * dl.dl / corpus.avgdl))"
    return f"""
WITH dl AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS dl
  FROM (SELECT doc_id, count(*) AS n_tokens FROM ({tok_explode}) GROUP BY doc_id)
),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
  FROM ({tok_explode}) WHERE tok IN ({terms})
  GROUP BY doc_id, tok
),
idf0 AS (
  SELECT term, df, CAST(2 * n_docs - 2 * df + 1 AS BIGINT) AS na,
         CAST(2 * df + 1 AS BIGINT) AS nb,
         ((CAST(n_docs AS DOUBLE) - df + 0.5e0) / (df + 0.5e0)) AS idf_rational
  FROM (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)
  CROSS JOIN corpus
),
{stage_sql},
idf AS (
  SELECT term, idf_rational, (na_ln - nb_ln) AS idf_ln FROM {prev}
),
scored_a AS (
  SELECT tf.doc_id, tf.term, idf.idf_rational * {norm} AS s
  FROM tf JOIN idf ON tf.term = idf.term
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN corpus
),
scored_b AS (
  SELECT tf.doc_id, tf.term, idf.idf_ln * {norm} AS s
  FROM tf JOIN idf ON tf.term = idf.term
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN corpus
),
rank_a AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r
  FROM (SELECT doc_id, {total} AS score
        FROM (SELECT doc_id, {per_term} FROM scored_a GROUP BY doc_id) pa) ra
),
rank_b AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r
  FROM (SELECT doc_id, {total} AS score
        FROM (SELECT doc_id, {per_term} FROM scored_b GROUP BY doc_id) pb) rb
)
SELECT a.doc_id, a.r AS rank_rational, b.r AS rank_ln,
       1.0e0 / ({RRF_K} + a.r) + 1.0e0 / ({RRF_K} + b.r) AS rrf
FROM rank_a a JOIN rank_b b ON a.doc_id = b.doc_id
ORDER BY rrf DESC, a.doc_id
LIMIT {TOP_K}
"""


@register(
    "search_rrf_fusion",
    oracle=_rrf_sql(
        "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents"
    ),
    description=f"reciprocal-rank fusion (k={RRF_K}) of the two BM25 "
    "variants' full rankings — score-calibration-free hybrid ensembling; "
    "both rankers share one tf/df/dl/corpus build, ranks are a "
    "deterministic total order, and the fused score is a sum of exact "
    "integer reciprocals (bit-identical with no decimal routing)",
)
def search_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        _rrf_sql("SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents")
    )


# --- TF-IDF cosine retrieval (vector-space model) ---
# The vector-space complement to the BM25 family: documents and the
# query are tf·idf vectors, ranked by cosine. Unlike BM25 (which only
# needs postings for the QUERY terms), the cosine denominator needs the
# FULL per-document norm over every term — the part naive ports get
# wrong by computing norms over query terms only. Determinism: idf =
# ln(n_docs) − ln(df) via the staged integer-ln kernel (both arguments
# are integers), every order-sensitive sum (doc norms over the whole
# vocab row set, per-doc query dot products) is decimal-routed, and the
# final chain (sqrt, ·, /) is fixed-order IEEE scalar math.
#
# Scale: tf is the full posting aggregate — one (doc, term) shuffle over
# the token stream (map-side combined); df/idf stages are |vocab| rows;
# norms are one more doc-keyed aggregate; the query-side join then
# touches only the query terms' postings. Top-k is
# TakeOrderedAndProject.

def _tfidf_cosine_sql(tok_explode: str) -> str:
    from posting_lines_spark.functions.dmath import dln_int_cte_layers
    from posting_lines_spark.queries.parity import dsum_expr

    terms = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    stage_sql, prev = dln_int_cte_layers([("df", "d"), ("n_docs", "n")], "idf0", "tfidf")
    return f"""
WITH tf AS (
  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
  FROM ({tok_explode})
  GROUP BY doc_id, tok
),
corpus AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
idf0 AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df, n_docs
  FROM tf CROSS JOIN corpus
  GROUP BY term, n_docs
),
{stage_sql},
idf AS (SELECT term, (n_ln - d_ln) AS idf FROM {prev}),
w AS (
  SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS w, idf.idf
  FROM tf JOIN idf ON tf.term = idf.term
),
norms AS (
  SELECT doc_id, sqrt({dsum_expr("w * w")}) AS norm_d
  FROM w GROUP BY doc_id
),
qnorm AS (
  SELECT sqrt({dsum_expr("idf * idf")}) AS norm_q
  FROM idf WHERE term IN ({terms})
),
dots AS (
  SELECT doc_id, {dsum_expr("w * idf")} AS dot
  FROM w WHERE term IN ({terms})
  GROUP BY doc_id
)
SELECT d.doc_id,
       d.dot / (n.norm_d * q.norm_q) AS cosine
FROM dots d
JOIN norms n ON n.doc_id = d.doc_id
CROSS JOIN qnorm q
ORDER BY cosine DESC, d.doc_id
LIMIT {TOP_K}
"""


@register(
    "search_tfidf_cosine",
    oracle=_tfidf_cosine_sql(
        "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents"
    ),
    description="TF-IDF cosine retrieval (vector-space model): full "
    "per-document norms over the whole vocabulary (not just query "
    "terms), staged integer-ln idf, decimal-routed norm/dot sums, "
    "fixed-order IEEE cosine; one (doc, term) posting aggregate + one "
    "doc-keyed norm aggregate, query-side work bounded by the query "
    "terms' postings",
)
def search_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        _tfidf_cosine_sql(
            "SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents"
        )
    )

# --- query-likelihood retrieval (Dirichlet smoothing) ---
# The language-modeling third member of the ranking ladder (BM25 →
# TF-IDF cosine → QL): score(q,d) = Σ_t ln P(t|θ_d) with Dirichlet
# smoothing P(t|θ_d) = (tf_td + μ·P(t|C)) / (dl_d + μ) (Zhai & Lafferty
# 2001). Unlike BM25's log-free rational idf, QL NEEDS the log — so
# every ln argument is arranged to be an EXACT INTEGER and routed
# through the deterministic integer-ln kernel:
#   ln P(t|θ_d) = ln(tf·C + μ·ctf_t) − ln(C·(dl+μ))
# (C = collection token count, ctf = collection term frequency, μ
# integer; numerator and denominator scaled by C to clear the rational
# P(t|C)). The smoothing decomposition keeps the computation SPARSE —
# unmatched terms enter only through the background
#   Σ_t ln(μ·ctf_t) − |q|·ln(C·(dl+μ)),
# which depends on the DOC only via dl — so the shuffled stream stays
# |query terms| × matching docs (the BM25 discipline), with the sparse
# correction ln(tf·C+μ·ctf) − ln(μ·ctf) added per MATCHED term via
# fixed-order conditional MAX columns (never a double SUM over a
# group). Bit-identical across engines; top-K is TakeOrdered.
#
# Scale: two aggregates over the token stream (dl needs the full
# stream; tf/ctf filter on the IN-list first), the |q|-row ctf/bg
# tables broadcast, one per-doc kernel ln. Magnitude bound:
# tf·C + μ·ctf ≤ (tf_max + μ)·C ≪ 2⁶³ through ~10⁹-token collections
# per partition-exact BIGINT; route through DECIMAL beyond.

QL_MU = 2000


def _ql_sql(tok_explode: str) -> str:
    from posting_lines_spark.functions.dmath import dln_int_cte_layers

    terms = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    nq = len(QUERY_TERMS)
    ln_bg, last_bg = dln_int_cte_layers([(f"{QL_MU} * ctf", "bg")], "ctf", "qlb")
    ln_nm, last_nm = dln_int_cte_layers([("num", "nm")], "tfx", "qln")
    ln_dn, last_dn = dln_int_cte_layers([(f"cc * (dl + {QL_MU})", "dn")], "dl2", "qld")
    bg_cols = ", ".join(
        f"coalesce(max(CASE WHEN term = '{t}' THEN bg_ln END), 0.0e0) AS bg_{t}"
        for t in QUERY_TERMS
    )
    bg_sum = " + ".join(f"bg_{t}" for t in QUERY_TERMS)
    corr_cols = ", ".join(
        f"coalesce(max(CASE WHEN term = '{t}' THEN corr END), 0.0e0) AS c_{t}, "
        f"coalesce(max(CASE WHEN term = '{t}' THEN 1 ELSE 0 END), 0) AS m_{t}"
        for t in QUERY_TERMS
    )
    corr_sum = " + ".join(f"c_{t}" for t in QUERY_TERMS)
    match_sum = " + ".join(f"m_{t}" for t in QUERY_TERMS)
    return f"""
WITH dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
  FROM ({tok_explode}) GROUP BY doc_id
),
corpus AS (SELECT CAST(sum(dl) AS BIGINT) AS cc FROM dl),
ctf AS (
  SELECT tok AS term, CAST(count(*) AS BIGINT) AS ctf
  FROM ({tok_explode}) WHERE tok IN ({terms})
  GROUP BY tok
),
{ln_bg},
bgp AS (SELECT {bg_cols} FROM {last_bg}),
tf AS (
  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
  FROM ({tok_explode}) WHERE tok IN ({terms})
  GROUP BY doc_id, tok
),
tfx AS (
  SELECT tf.doc_id, tf.term, b.bg_ln,
         tf.tf * corpus.cc + {QL_MU} * b.ctf AS num
  FROM tf JOIN {last_bg} b ON b.term = tf.term CROSS JOIN corpus
),
{ln_nm},
corr0 AS (SELECT doc_id, term, nm_ln - bg_ln AS corr FROM {last_nm}),
corr AS (
  SELECT doc_id, {corr_cols} FROM corr0 GROUP BY doc_id
),
dl2 AS (
  SELECT dl.doc_id, dl.dl, corpus.cc FROM dl CROSS JOIN corpus
),
{ln_dn},
scored AS (
  SELECT d.doc_id, d.dl,
         ({bg_sum}) - {nq}.0e0 * d.dn_ln
           + coalesce(c.csum, 0.0e0) AS score,
         CAST(coalesce(c.nmatch, 0) AS INT) AS n_matched
  FROM {last_dn} d
  CROSS JOIN bgp
  LEFT JOIN (
    SELECT doc_id, {corr_sum} AS csum, {match_sum} AS nmatch FROM corr
  ) c ON c.doc_id = d.doc_id
)
SELECT doc_id, dl, n_matched, score
FROM scored
ORDER BY score DESC, doc_id
LIMIT {TOP_K}
"""


@register(
    "search_query_likelihood",
    oracle=_ql_sql(
        "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents"
    ),
    description=f"query-likelihood retrieval with Dirichlet smoothing "
    f"(μ={QL_MU}) over the fixed {len(QUERY_TERMS)}-term query: every ln "
    "argument an exact integer through the deterministic kernel via the "
    "sparse background/correction decomposition (shuffle = matched "
    "postings only), fixed-order conditional-MAX term combination, "
    "TakeOrdered top-K — bit-identical across engines; the LM member of "
    "the BM25/TF-IDF ranking ladder",
)
def search_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        _ql_sql("SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents")
    )


# --- term-proximity search (minimum span between two query terms) ---
# The proximity-ranking half of an IR engine next to search_phrase's
# exact adjacency: for every document containing BOTH terms, the
# minimum token distance between any occurrence pair, the per-term
# occurrence counts, and how many pairs sit within a slop window.
# Ranking by (min_dist ASC, doc_id) is a deterministic total order of
# exact integers — no floats anywhere.
#
# Scale: postings are built ONLY for the two query terms (filter
# before shuffle — the search_phrase discipline); the within-doc pair
# join is tf_a × tf_b per doc, bounded by per-document term frequency,
# never corpus-shaped. Top-20 via ORDER/LIMIT = engine TakeOrdered.

PROX_TERMS = ("join", "stream")
PROX_SLOP = 5


def _proximity_sql(tok_pos: str) -> str:
    w1, w2 = PROX_TERMS
    return f"""
WITH tp AS ({tok_pos}),
p1 AS (SELECT doc_id, pos FROM tp WHERE tok = '{w1}'),
p2 AS (SELECT doc_id, pos FROM tp WHERE tok = '{w2}')
SELECT p1.doc_id AS doc_id,
       CAST(count(DISTINCT p1.pos) AS BIGINT) AS n_{w1},
       CAST(count(DISTINCT p2.pos) AS BIGINT) AS n_{w2},
       CAST(min(abs(p1.pos - p2.pos)) AS BIGINT) AS min_dist,
       CAST(sum(CASE WHEN abs(p1.pos - p2.pos) <= {PROX_SLOP}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_slop
FROM p1 JOIN p2 ON p2.doc_id = p1.doc_id
GROUP BY p1.doc_id
ORDER BY min_dist ASC, doc_id
LIMIT 20
"""


@register(
    "search_term_proximity",
    oracle=_proximity_sql(_TOKPOS_DUCK),
    description=f"term-proximity search for {PROX_TERMS}: min token "
    f"distance + slop-{PROX_SLOP} pair counts per co-containing doc, "
    "postings built only for the two terms (filter before shuffle), "
    "within-doc tf×tf pair join bounded by per-doc term frequency, "
    "deterministic integer ranking top-20",
)
def search_term_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_proximity_sql(_TOKPOS_SPARK))
