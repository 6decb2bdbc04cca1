"""Portable deterministic hashing: identical int64 hashes in Spark & DuckDB.

Engine-native hash functions don't match across engines (Spark xxhash64
is seeded murmur-finalized xxHash; DuckDB `hash()` is its own), so every
cross-engine-checkable hash in this repo derives from md5 — byte-for-byte
identical in both — parsed from its leading 15 hex chars (60 bits, safely
inside int64).

The SQL *text* differs per engine (Spark `conv`, DuckDB `0x` cast) but the
value is identical; salting gives an arbitrary family of independent hash
functions (MinHash needs k of them).
"""

from __future__ import annotations


def md5_int_spark(expr: str, salt: str | None = None, slot: int = 0) -> str:
    """`slot` 0/1 selects hex chars 1-15 / 16-30 — two independent 60-bit
    hashes per md5 evaluation (halves the hash cost of MinHash families)."""
    s = f"concat('{salt}|', {expr})" if salt is not None else expr
    return f"CAST(conv(substring(md5({s}), {1 + slot * 15}, 15), 16, 10) AS BIGINT)"


def md5_int_duck(expr: str, salt: str | None = None, slot: int = 0) -> str:
    s = f"concat('{salt}|', {expr})" if salt is not None else expr
    return f"CAST('0x' || substring(md5({s}), {1 + slot * 15}, 15) AS BIGINT)"
