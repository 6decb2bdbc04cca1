"""Embedding similarity search over array<float> columns.

Two paths (SURVEY.md §7 phase 5 / the driver's north star):
  - brute-force cosine top-k: exact baseline, O(n·q) — right answer for
    few queries; JVM-side `aggregate(zip_with(...))` (no Python, no UDF).
  - LSH-bucketed ANN (random-hyperplane signatures): the scale path. A
    small deterministic hyperplane table is broadcast; each vector gets a
    B-bit bucket (sign of dot with each plane); search touches only the
    query's bucket. At 100 TB the bucket join replaces the all-pairs
    cross join; recall tunes with plane count / multi-probe.

Determinism: hyperplane weights derive from md5 (functions/hashing.py),
so a DuckDB oracle rebuilds identical planes, buckets, and cosines —
float dot products fold sequentially in index order on both engines
(measured bit-identical on the full embeddings table).

Float→double products are exact (24-bit mantissas), so the only rounding
is in the fold adds — identical order ⇒ identical bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

# --- portable expression fragments (Spark dialect) ---

def dot_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_spark(a: str) -> str:
    return f"sqrt({dot_spark(a, a)})"


def cosine_spark(a: str, b: str) -> str:
    return f"({dot_spark(a, b)} / ({norm_spark(a)} * {norm_spark(b)}))"


# --- deterministic random-hyperplane table ---

def plane_weight_spark(plane: str, dim: str) -> str:
    """Pseudo-random weight in [-1, 1): md5-derived, portable."""
    h = (
        f"CAST(conv(substring(md5(concat('plane', CAST({plane} AS STRING), '_', "
        f"CAST({dim} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    return f"(({h} % 2001) - 1000) / 1000.0e0"


def hyperplanes(spark: SparkSession, num_planes: int, dims: int) -> DataFrame:
    """(plane_idx, weights array<double>) — tiny, broadcast at use sites."""
    return spark.sql(
        f"""
        SELECT p AS plane_idx,
               transform(sequence(1, {dims}), d -> {plane_weight_spark('p', 'd')}) AS w
        FROM (SELECT explode(sequence(0, {num_planes - 1})) AS p)
        """
    )


def bucketize(
    emb: DataFrame, planes: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """B-bit LSH bucket per vector: bit p = sign(dot(v, plane_p))."""
    joined = emb.crossJoin(F.broadcast(planes))
    bit = F.when(F.expr(dot_spark(vec_col, "w")) > 0, F.lit(1)).otherwise(F.lit(0))
    return (
        joined.select(id_col, vec_col, "plane_idx", bit.alias("bit"))
        .groupBy(id_col, vec_col)
        .agg(F.sum(F.expr("bit * CAST(pow(2, plane_idx) AS BIGINT)")).alias("bucket"))
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query vector. Queries are broadcast; ranking
    window is per-query with id tiebreak (fully deterministic)."""
    q = queries.select(F.col(id_col).alias(query_id), F.col(vec_col).alias("qv"))
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id))
        .withColumn("cosine", F.expr(cosine_spark(vec_col, "qv")))
    )
    w = W.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


def probe_masks(num_planes: int, probes: int) -> list[int]:
    """Bucket-XOR masks for multi-probe: probes=0 → own bucket only;
    probes=1 → own + every Hamming-1 neighbor (flip each plane bit);
    probes=2 → additionally every Hamming-2 neighbor (flip each pair) —
    the next recall rung at ×C(B,2) extra candidate buckets."""
    masks = [0]
    if probes >= 1:
        masks += [1 << p for p in range(num_planes)]
    if probes >= 2:
        masks += [
            (1 << p) | (1 << q)
            for p in range(num_planes)
            for q in range(p + 1, num_planes)
        ]
    return masks


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    planes: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    probes: int = 0,
    num_planes: int | None = None,
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket, then
    exact cosine rank inside it. Scale path: the bucket equi-join shuffles
    on bucket id instead of materializing the n×q cross product.

    `probes=1` is the recall knob at equal plane count: each query also
    probes the buckets at Hamming distance 1 (one plane's sign flipped —
    exactly the near-misses where a neighbor sits just across one
    hyperplane). Candidate volume grows ×(num_planes+1) per query, still
    a vanishing fraction of the corpus; each (query, vector) pair matches
    at most once because probe buckets are distinct and every vector has
    one bucket."""
    eb = bucketize(emb, planes, id_col, vec_col)
    qb = bucketize(queries, planes, id_col, vec_col).select(
        F.col(id_col).alias(query_id), F.col(vec_col).alias("qv"), "bucket"
    )
    if probes >= 1:
        if num_planes is None:
            num_planes = planes.count()
        masks = probe_masks(num_planes, probes)
        qb = qb.select(
            query_id,
            "qv",
            F.explode(F.array(*[F.expr(f"bucket ^ {m}") for m in masks])).alias("bucket"),
        )
    scored = (
        eb.join(qb, "bucket")
        .filter(F.col(id_col) != F.col(query_id))
        .withColumn("cosine", F.expr(cosine_spark(vec_col, "qv")))
    )
    w = W.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


# --- product quantization (PQ) ---
# Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor Search"
# (TPAMI 2011): split each vector into M subvectors, quantize each against
# a per-subspace codebook of K' centroids, search with an Asymmetric
# Distance Computation (ADC) table — approx dist(q, v) = Σ_m
# ‖q_m − centroid[code_m(v)]‖². The corpus stores M small codes per
# vector (M·log2(K') bits — a 32× compression of a float32 dim-64
# embedding at M=4, K'=16), which is what makes exhaustive candidate
# scoring affordable at 100 TB: the scan touches codes, not vectors.
#
# Codebook here is sampled (the K' lexicographically-first vectors per
# subspace — the k-means init step; operators above own the Lloyd
# refinement), which keeps it deterministic and oracle-replayable.


def l2sq_spark(a: str, b: str) -> str:
    """Squared L2 distance, sequential fold in index order (portable)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def pq_subvectors(
    emb: DataFrame, m_subs: int, sub_dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, m, sub): each vector exploded into its M subspace slices."""
    subs = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(m_subs - 1)),
            lambda m: F.struct(
                m.alias("m"),
                F.slice(F.col(vec_col), m * sub_dim + 1, sub_dim).alias("sub"),
            ),
        )
    )
    return emb.select(id_col, subs.alias("s")).select(id_col, "s.m", "s.sub")


def pq_encode(
    subs: DataFrame, codebook: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """(id, m, code): argmin-centroid per subspace. The codebook
    (m, code, cent) is tiny (M·K' rows) and broadcasts; the n·M·K'
    distance stream is map-side only — the one shuffle is the argmin
    window on (id, m). Ties break on code (deterministic)."""
    d = subs.join(F.broadcast(codebook), "m").withColumn(
        "sq", F.expr(l2sq_spark("sub", "cent"))
    )
    w = W.partitionBy(id_col, "m").orderBy("sq", "code")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "m", "code")
    )


def pq_adc_topk(
    codes: DataFrame,
    dtable: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    rerank: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """ADC search + exact re-rank. `dtable` is the per-query distance
    table (query_id, m, code, qd) — M·K' rows per query, broadcast; the
    corpus side streams CODES only. The per-(query, vec) ADC sum folds
    the M partial distances in subspace order (engine-stable bits), takes
    the `rerank` closest, then re-scores just those against the real
    vectors for the final exact-cosine top-k.

    `candidates` (query_id, id) optionally pre-restricts which pairs are
    ADC-scored — the IVF-PQ composite passes its cell-routed pairs here;
    None means flat PQ (every query scores every coded vector). Keeping
    both paths in THIS function keeps the bit-parity-critical fold and
    tie-break in exactly one place."""
    if candidates is None:
        scored_src = codes.join(F.broadcast(dtable), ["m", "code"])
    else:
        scored_src = candidates.join(codes, id_col).join(
            F.broadcast(dtable), [query_id, "m", "code"]
        )
    adc = (
        scored_src
        .groupBy(query_id, id_col)
        .agg(
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(m, qd))), "
                "s -> s.qd), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            ).alias("adc")
        )
        .filter(F.col(id_col) != F.col(query_id))
    )
    wa = W.partitionBy(query_id).orderBy("adc", id_col)
    cand = adc.withColumn("rn", F.row_number().over(wa)).filter(F.col("rn") <= rerank)
    q = queries.select(F.col(id_col).alias(query_id), F.col(vec_col).alias("qv"))
    scored = (
        cand.join(emb, id_col)
        .join(F.broadcast(q), query_id)
        .withColumn("cosine", F.expr(cosine_spark(vec_col, "qv")))
    )
    wr = W.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


# --- Johnson–Lindenstrauss random projection ---
# Dimensionality reduction for the pre-filter stage of a similarity
# pipeline: project dim-D vectors onto R md5-derived random directions
# (same deterministic weight scheme as the LSH planes, distinct salt).
# JL: pairwise angles are preserved within ~1/sqrt(R), so the projected
# cosine ranks candidates cheaply at R/D of the scan cost.


def rp_weight_spark(row: str, dim: str) -> str:
    h = (
        f"CAST(conv(substring(md5(concat('rproj', CAST({row} AS STRING), '_', "
        f"CAST({dim} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    return f"(({h} % 2001) - 1000) / 1000.0e0"


def rp_matrix(spark: SparkSession, proj_dim: int, dims: int) -> DataFrame:
    """(row_idx, w array<double>): R×D projection matrix, broadcast-sized."""
    return spark.sql(
        f"""
        SELECT r AS row_idx,
               transform(sequence(1, {dims}), d -> {rp_weight_spark('r', 'd')}) AS w
        FROM (SELECT explode(sequence(0, {proj_dim - 1})) AS r)
        """
    )


def rp_project(
    emb: DataFrame, mat: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, vec, proj array<double>): one broadcast fan-out (n·R narrow
    rows, no shuffle) + one groupBy(id) to assemble the projected vector
    in row order (sorted fold — engine-stable bits)."""
    p = emb.crossJoin(F.broadcast(mat)).select(
        id_col, vec_col, "row_idx", F.expr(dot_spark(vec_col, "w")).alias("pv")
    )
    return p.groupBy(id_col, vec_col).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(row_idx, pv))), s -> s.pv)"
        ).alias("proj")
    )
