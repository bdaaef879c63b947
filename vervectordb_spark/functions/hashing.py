"""Portable deterministic hashing for dedup / fingerprint operators.

Spark's built-in `hash()` (Murmur3) has no DuckDB twin, so every operator
that must be oracle-checkable derives integers from **md5**, which both
engines implement identically: take the first 15 hex digits (60 bits —
always a positive BIGINT) and parse as base-16.

Spark:   conv(substring(md5(s), 1, 15), 16, 10)::LONG
DuckDB:  ('0x' || substr(md5(s), 1, 15))::BIGINT

Seeded hash families (MinHash needs k independent functions) prepend the
seed: md5(concat(seed, ':', s)).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 60-bit hash space (15 hex digits).
HASH_BITS = 60


def md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT (portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def seeded_md5_long(col: Column, seed: int) -> Column:
    """k-th member of a portable seeded hash family."""
    return md5_long(F.concat(F.lit(f"{seed}:"), col))


def md5_long_sql(expr: str) -> str:
    """DuckDB twin of md5_long for oracle SQL composition."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def seeded_md5_long_sql(expr: str, seed: int) -> str:
    return md5_long_sql(f"'{seed}:' || {expr}")
