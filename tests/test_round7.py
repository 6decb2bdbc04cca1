"""Round-7 replay tests: the perceptual-hash dedup family.

The r6 verdict flagged `multimodal_phash_dedup` as shipped outside every
gate (no replay test, vacuous sf0.01 parity — 0 rows on both engines).
These tests close that: a NON-EMPTY expected pair set via the synthetic
twin, the Hamming T / T+1 banding boundary, the empty-payload contract
(r6 ADVICE), and an independent pure-Python replay of phash48 itself.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from posting_lines_spark.operators.multimodal import PHASH_BITS
from posting_lines_spark.queries.stream_q import PHASH_HAM_T, _phash_pairs_sql
from tests.conftest import SF001


def _phash_py(payload: bytes) -> int:
    """Independent replay of operators/multimodal.phash48 byte math."""
    n = len(payload)
    if n == 0:
        return 0
    pos = [k * (n - 1) // (PHASH_BITS - 1) for k in range(PHASH_BITS)]
    smp = [payload[p] for p in pos]
    s = sum(smp)
    h = 0
    for k, v in enumerate(smp):
        if v * PHASH_BITS > s:
            h |= 1 << k
    return h


def test_phash48_matches_python_replay(spark):
    from posting_lines_spark.operators import multimodal
    from posting_lines_spark.sources import load_table

    d = load_table(spark, SF001, "documents").limit(200)
    got = {
        r["doc_id"]: r["phash"]
        for r in multimodal.phash48(multimodal.attach_payload(d)).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}
    assert got and set(got) == set(texts)
    for doc_id, text in texts.items():
        assert got[doc_id] == _phash_py(text.encode("utf-8")), doc_id


def test_phash_synth_pairs_nonempty_with_hamming0_copies(spark):
    """The synthetic twin must produce a NON-EMPTY pair set at the
    driver's correctness SF, and every (doc, byte-identical copy) pair
    must be present at hamming 0 — the non-vacuous guarantee."""
    from posting_lines_spark.queries import load_all

    df = load_all()["multimodal_phash_dedup_synth"].fn(spark, SF001)
    rows = df.collect()
    assert len(rows) > 0
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    base_ids = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    base_ids = [i for i in base_ids if i < 10000000]
    # every base doc has its +10M byte-identical copy at hamming 0
    assert len(base_ids) >= 1
    for i in base_ids:
        assert pairs.get((i, i + 10000000)) == 0, i
    # all reported distances respect the threshold
    assert all(0 <= h <= PHASH_HAM_T for h in pairs.values())


def test_phash_banding_hamming_boundary(spark):
    """Pigeonhole banding boundary: with 4 bands × 12 bits, a pair at
    hamming T=3 with the flips spread over 3 bands is found (band 4
    intact), while a pair at T+1=4 with one flip PER band shares no band
    and must be absent — and would be dropped by the verify filter even
    if a band collided."""
    h = 0x123456789ABC
    b_ham3 = h ^ (1 << 0) ^ (1 << 12) ^ (1 << 24)  # bands 0,1,2 touched
    c_ham4 = b_ham3 ^ (1 << 36)  # one flip in every band
    spark.createDataFrame(
        [(1, h), (2, b_ham3), (3, c_ham4)], "doc_id long, phash long"
    ).createOrReplaceTempView("pls_phash_boundary")
    rows = spark.sql(
        _phash_pairs_sql(
            "SELECT doc_id, phash FROM pls_phash_boundary",
            lambda b: f"shiftright(phash, {12 * b}) & 4095",
            "bit_count(ph_a ^ ph_b)",
        )
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    # (1,2) at hamming 3: kept (band 3 intact). (2,3) differ in bit 36
    # only → hamming 1: kept. (1,3) at hamming 4 with one flip per band:
    # no shared band, absent.
    assert got == {(1, 2): 3, (2, 3): 1}
    assert (1, 3) not in got


def test_phash_empty_payload_excluded(spark):
    """r6 ADVICE: empty docs hash to phash=0 engine-side but the oracle
    drops n=0 rows; the registered query must filter them so two empty
    docs never pair. Verified on a crafted corpus via the same operator
    + pair SQL the registered query uses, with the length guard."""
    from pyspark.sql import functions as F

    from posting_lines_spark.operators import multimodal

    d = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "a real document body here")],
        "doc_id long, text string",
    ).filter(F.length("text") > 0)
    ph = multimodal.phash48(multimodal.attach_payload(d))
    ph.createOrReplaceTempView("pls_phash_empty")
    rows = spark.sql(
        _phash_pairs_sql(
            "SELECT doc_id, phash FROM pls_phash_empty",
            lambda b: f"shiftright(phash, {12 * b}) & 4095",
            "bit_count(ph_a ^ ph_b)",
        )
    ).collect()
    assert rows == []  # the two empty docs are gone, not paired at hamming 0
