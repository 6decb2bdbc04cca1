"""ANN recall vs candidate-budget measurement (round-3 verdict #7).

Compares the repo's three index variants against brute-force ground
truth on the same embeddings table, reporting recall@K alongside the
candidate fraction each variant scans (the cost that matters at 100 TB:
candidates/query ≈ corpus_fraction × n). Run:

    python tools/ann_recall.py [sf_dir] [n_queries]

Writes one table to stdout; the round's numbers are recorded in
SCALE.md. On the synthetic random embeddings there is NO cluster
structure, so recall ≈ candidate fraction is the information-theoretic
expectation — the table shows each variant sits on that line and what
each probing rung buys.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from posting_lines_spark.operators import similarity as sim  # noqa: E402
from posting_lines_spark.queries.vectors_q import (  # noqa: E402
    _KM_LONG_SPARK,
    _km_chain,
    DIMS,
    KM_K,
    NUM_PLANES,
)
from posting_lines_spark.functions.hashing import md5_int_spark  # noqa: E402
from posting_lines_spark.session import get_spark  # noqa: E402
from posting_lines_spark.sources import load_table  # noqa: E402

K = 10


def kmeans_assignment(spark):
    """(vec_id, cluster_id) from the registered 2-round Lloyd training."""
    return spark.sql(
        f"""{_km_chain(_KM_LONG_SPARK, md5_int_spark("CAST(vec_id AS STRING)", salt="kmeans"))}
SELECT vec_id, cluster_id FROM a2"""
    )


def bucket_recall(emb, queries, truth, assign, n_queries):
    """Generic cell-index recall: join emb/queries on the cell id."""
    eb = emb.join(assign, "vec_id")
    qb = eb.filter(F.col("vec_id").isin([r for r in range(n_queries)])).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "cluster_id",
    )
    cand = eb.join(qb, "cluster_id").filter(F.col("vec_id") != F.col("query_id"))
    n_cand = cand.count()
    scored = cand.withColumn(
        "cosine", F.expr(sim.cosine_spark("embedding", "qv"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    got = {
        (r.query_id, r.vec_id)
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .collect()
    }
    return len(got & truth) / len(truth), n_cand


CLUSTERED_DIR = "/root/repo/.benchdata/emb_clustered"
CLUSTERED_N = 2000
CLUSTERED_C = 25
CLUSTERED_SIGMA = 0.25


def make_clustered(spark) -> str:
    """Deterministic mixture-of-Gaussians embeddings fixture (round-4
    verdict #5): the near-random synthetic table has no cluster
    structure, so recall ≈ candidate fraction is the information-
    theoretic floor for EVERY index and the variants can't separate.
    Real embedding corpora are clustered — this fixture is C unit-norm
    Gaussian centers with sigma-noise points (same schema as the
    testdata table: vec_id BIGINT, embedding FLOAT[], label INT =
    true cluster), fixed seed, written once and reused."""
    import os

    import numpy as np

    path = os.path.join(CLUSTERED_DIR, "embeddings.parquet")
    if not os.path.exists(path):
        rng = np.random.RandomState(20260814)
        centers = rng.randn(CLUSTERED_C, DIMS)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        labels = rng.randint(0, CLUSTERED_C, size=CLUSTERED_N)
        pts = centers[labels] + CLUSTERED_SIGMA * rng.randn(CLUSTERED_N, DIMS)
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "vec_id": np.arange(CLUSTERED_N, dtype=np.int64),
                "embedding": [row.astype(np.float32) for row in pts],
                "label": labels.astype(np.int32),
            }
        )
        os.makedirs(CLUSTERED_DIR, exist_ok=True)
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(path)
    return CLUSTERED_DIR


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    clustered = "--clustered" in argv
    argv = [a for a in argv if not a.startswith("--")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    n_queries = int(argv[1]) if len(argv) > 1 else 20
    spark = get_spark(app="ann_recall")
    if clustered:
        sf_dir = make_clustered(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    emb.createOrReplaceTempView("embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < n_queries)
    truth = {
        (r.query_id, r.vec_id)
        for r in sim.brute_force_topk(emb, queries, k=K).collect()
    }
    planes = sim.hyperplanes(spark, NUM_PLANES, DIMS)

    rows = []
    for probes in (0, 1, 2):
        got_df = sim.ivf_topk(
            emb, queries, planes, k=K, probes=probes, num_planes=NUM_PLANES
        )
        got = {(r.query_id, r.vec_id) for r in got_df.collect()}
        n_buckets = len(sim.probe_masks(NUM_PLANES, probes))
        # candidate count: emb joined on probed buckets
        eb = sim.bucketize(emb, planes)
        qb = sim.bucketize(queries, planes).select(
            F.col("vec_id").alias("query_id"), F.col("bucket").alias("qbucket")
        )
        masks = sim.probe_masks(NUM_PLANES, probes)
        probed = qb.select(
            "query_id",
            F.explode(
                F.array(*[F.expr(f"qbucket ^ {m}") for m in masks])
            ).alias("bucket"),
        )
        n_cand = (
            eb.join(probed, "bucket")
            .filter(F.col("vec_id") != F.col("query_id"))
            .count()
        )
        rows.append(
            (
                f"hyperplane B={NUM_PLANES} probes={probes} "
                f"({n_buckets}/{2**NUM_PLANES} buckets)",
                len(got & truth) / len(truth),
                n_cand / (n_queries * (n - 1)),
            )
        )

    r, n_cand = bucket_recall(
        emb, queries, truth, kmeans_assignment(spark), n_queries
    )
    rows.append(
        (
            f"kmeans IVF K={KM_K} cells probes=0",
            r,
            n_cand / (n_queries * (n - 1)),
        )
    )

    # PQ ADC: rerank-budget candidates from the code scan, exact re-rank
    from posting_lines_spark.queries.vectors_q import (
        PQ_KPRIME,
        PQ_M,
        PQ_RERANK,
        PQ_SUBDIM,
    )

    subs = sim.pq_subvectors(emb, PQ_M, PQ_SUBDIM)
    codebook = subs.filter(F.col("vec_id") < PQ_KPRIME).select(
        "m", F.col("vec_id").alias("code"), F.col("sub").alias("cent")
    )
    codes = sim.pq_encode(subs, codebook)
    dtable = (
        subs.filter(F.col("vec_id") < n_queries)
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(codebook), "m")
        .select("query_id", "m", "code",
                F.expr(sim.l2sq_spark("sub", "cent")).alias("qd"))
    )
    got = {
        (r.query_id, r.vec_id)
        for r in sim.pq_adc_topk(
            codes, dtable, emb, queries, K, PQ_RERANK
        ).collect()
    }
    rows.append(
        (
            f"PQ M={PQ_M} K'={PQ_KPRIME} ADC rerank={PQ_RERANK}",
            len(got & truth) / len(truth),
            PQ_RERANK / (n - 1),
        )
    )

    # IVF-PQ composite: kmeans cells route, PQ codes rank, exact rerank.
    # Recall is CAPPED by the cell router (a neighbor outside the query's
    # cell is unreachable), so compare against the kmeans IVF row — the
    # delta is what ADC ranking loses inside the cell, the scan saving is
    # codes-only reads.
    from posting_lines_spark.queries.vectors_q import IVFPQ_RERANK

    km = kmeans_assignment(spark)
    qcells = km.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "cluster_id"
    )
    cand0 = (
        km.join(F.broadcast(qcells), "cluster_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    n_cand = cand0.count()
    for rerank in (IVFPQ_RERANK, PQ_RERANK):
        got = {
            (r.query_id, r.vec_id)
            for r in sim.pq_adc_topk(
                codes, dtable, emb, queries, K, rerank, candidates=cand0
            ).collect()
        }
        rows.append(
            (
                f"IVF-PQ K={KM_K} cells, ADC rerank={rerank}",
                len(got & truth) / len(truth),
                n_cand / (n_queries * (n - 1)),
            )
        )

    # JL random projection: rerank-budget candidates by projected cosine
    from posting_lines_spark.queries.vectors_q import RP_DIM

    proj = sim.rp_project(emb, sim.rp_matrix(spark, RP_DIM, DIMS))
    qp = proj.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("proj").alias("q_proj"),
    )
    from pyspark.sql import Window as W

    wp = W.partitionBy("query_id").orderBy(
        F.col("cosine_proj").desc(), F.col("vec_id")
    )
    we = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    got = {
        (r.query_id, r.vec_id)
        for r in proj.crossJoin(F.broadcast(qp))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine_proj", F.expr(sim.cosine_spark("proj", "q_proj")))
        .withColumn("prank", F.row_number().over(wp))
        .filter(F.col("prank") <= PQ_RERANK)
        .withColumn("cosine", F.expr(sim.cosine_spark("embedding", "q_embedding")))
        .withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= K)
        .collect()
    }
    rows.append(
        (
            f"JL projection {DIMS}->{RP_DIM} rerank={PQ_RERANK}",
            len(got & truth) / len(truth),
            PQ_RERANK / (n - 1),
        )
    )

    print(f"\nANN recall@{K} vs candidate budget — {sf_dir}, n={n}, "
          f"{n_queries} queries")
    print(f"{'variant':<46} {'recall@10':>9} {'cand_frac':>10} {'ratio':>6}")
    for name, rec, frac in rows:
        ratio = rec / frac if frac else float("nan")
        print(f"{name:<46} {rec:>9.3f} {frac:>10.3f} {ratio:>6.2f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
