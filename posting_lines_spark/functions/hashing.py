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


# --- Carter-Wegman derived families: H hashes from ONE md5 digest ---
# A salted-md5-per-hash family prices every extra hash at a full digest;
# MinHash wants 12+. Instead: one md5 per value, split into four 32-bit
# limbs, and h_j = (a_j·l0 + b_j·l1 + c_j·l2 + d_j·l3 + j) mod (2^61-1)
# with fixed 28-bit odd constants — every intermediate < 2^62 (int64-safe,
# no bigint overflow on either engine), pure +/*/% (identical semantics in
# Spark and DuckDB on positive ints), and pairwise-independence-style
# mixing that is ample for LSH banding. 6× less hashing than the
# salt-per-pair scheme at NUM_HASHES=12.

CW_MOD = (1 << 61) - 1  # Mersenne 2^61-1


def cw_constants(j: int) -> list[int]:
    """Four fixed 28-bit odd multipliers for derived hash j (md5-seeded,
    engine-independent — plain Python ints embedded as SQL literals)."""
    import hashlib

    d = hashlib.md5(f"cw{j}".encode()).hexdigest()
    return [(int(d[i * 8 : (i + 1) * 8], 16) & ((1 << 28) - 1)) | 1 for i in range(4)]


def cw_mix_sql(limbs: list[str], j: int) -> str:
    """Engine-neutral SQL for derived hash j over four 32-bit limb refs."""
    a = cw_constants(j)
    terms = " + ".join(f"{a[i]} * {limbs[i]}" for i in range(4))
    return f"(({terms} + {j}) % {CW_MOD})"


def md5_limb_spark(digest_expr: str, i: int) -> str:
    """i-th 32-bit limb (hex chars 8i+1..8i+8) of an md5 hex digest."""
    return f"CAST(conv(substring({digest_expr}, {1 + 8 * i}, 8), 16, 10) AS BIGINT)"


def md5_limb_duck(digest_expr: str, i: int) -> str:
    return f"CAST('0x' || substring({digest_expr}, {1 + 8 * i}, 8) AS BIGINT)"
