"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB (driver north star): media travels
as `binary` columns with a typed metadata struct; decode / feature-extract
/ resize / frame-sample run as Arrow-batched Pandas functions via
`mapInPandas` (one Python worker round-trip per batch, never per row).
The decode step needs codec libraries that are NOT in this environment,
so it is stubbed behind NotImplementedError with a deterministic fake
("meta" mode) — the Spark-side contract (schema, batching, partitioning)
is real and oracle-tested.

Scale notes: mapInPandas streams Arrow batches — peak memory is
batch-sized, not partition-sized; payload columns should be pruned before
shuffles (carry doc_id + features, join payloads back only if needed).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes long, first_byte int, last_byte int"


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a media table: utf-8 payload bytes + typed metadata struct.
    (With real media this is the ingestion boundary: blob + sidecar.)"""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain;fake").alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


def extract_features(df: DataFrame, mode: str = "meta") -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched
    mapInPandas. mode="meta": deterministic byte-level features (real
    plumbing, fake decode). mode="decode": the real codec path — stubbed,
    the container has no image/audio libraries.
    """
    if mode == "decode":
        raise NotImplementedError(
            "media decode requires codec libraries (PIL/ffmpeg) not present "
            "in this environment; the Spark-side plumbing below is the real "
            "path — swap the per-batch function body for the codec call"
        )

    def per_batch(batches: Iterator) -> Iterator:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pdf[["doc_id"]].copy()
            out["n_bytes"] = payloads.map(len).astype("int64")
            out["first_byte"] = payloads.map(lambda b: b[0] if len(b) else -1).astype("int32")
            out["last_byte"] = payloads.map(lambda b: b[-1] if len(b) else -1).astype("int32")
            yield out

    return df.mapInPandas(per_batch, schema=FEATURE_SCHEMA)
