"""Jaro / Jaro-Winkler string similarity — exact textbook
implementation (Winkler 1990: prefix scale p = 0.1 over at most 4
leading characters, applied only when jaro > 0.7; empty strings score
0 even against themselves).

Verified BIT-IDENTICAL to DuckDB's `jaro_winkler_similarity` across
46k random + adversarial pairs (tests/test_round9.py) — which is what
lets the fuzzy-join oracle use DuckDB's independent C++ implementation
while the engine side runs this one in an Arrow-batched Pandas UDF.

Reference parity: the reference's ETL surface has no string-similarity
operator; this extends the fuzzy-join family (text_q.py
fuzzy_join_levenshtein) with the similarity metric record-linkage
pipelines standardize on.
"""

from __future__ import annotations


def jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, ch in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == ch:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, boost: float = 0.7) -> float:
    j = jaro(s1, s2)
    if j > boost:
        ell = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            ell += 1
        j += ell * p * (1.0 - j)
    return j
