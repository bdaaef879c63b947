"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most skew at runtime;
salting is the plan-level tool for the two cases AQE doesn't cover:
aggregation fan-in on few hot keys, and joins where one side can't be
broadcast. The events fixture is exactly the agg case: millions of rows
over 5 event_types → 5 reducers do all the work unsalted.

  salted_agg      two-phase aggregation: (key, salt) partial agg spreads
                  each hot key over n_salts reducers, then a tiny final
                  agg over n_salts rows per key re-merges. Correct for
                  any algebraic aggregate passed as (partial, merge).
  salted_join     replicate the small side n_salts× with explicit salt,
                  salt the big side with rand-free row-hash — co-spreads
                  a skewed join key across reducers.

Both are semantics-preserving rewrites: results equal the unsalted form
(oracle-checked via events_type_counts_salted).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, n_salts: int, deterministic_col: str | None) -> Column:
    """Salt in [0, n_salts). Deterministic when a column is supplied (keeps
    oracle parity and retry-stability); else spark_partition_id-based."""
    if deterministic_col is not None:
        return F.pmod(F.xxhash64(F.col(deterministic_col)), F.lit(n_salts))
    return F.pmod(F.spark_partition_id(), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salts: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    `partial_aggs` run per (keys, salt); `final_aggs` re-merge the partials
    per keys (e.g. partial F.count('*').alias('c') + final
    F.sum('c').alias('n')). Shuffle 1 spreads hot keys over n_salts
    reducers; shuffle 2 moves n_salts rows per key — negligible."""
    salted = df.withColumn("_salt", _row_salt(df, n_salts, salt_col))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_col: str | None = None,
) -> DataFrame:
    """Skewed-key join without broadcast: small side replicated n_salts×
    (explode over the salt range), big side salted by row hash; join on
    (key, salt) spreads each hot key over n_salts reducers. Use ONLY when
    `small` is too big to broadcast but n_salts× small still fits shuffle
    budget.

    Only join modes that never EMIT unmatched small-side rows are legal:
    the small side is replicated n_salts×, so an outer mode preserving it
    ('right'/'full') would emit every unmatched small row n_salts times —
    silent row duplication. 'left'/'left_anti' are fine (the big side is
    salted, not replicated)."""
    allowed = {"inner", "left", "leftouter", "leftsemi", "leftanti", "cross"}
    if how.replace("_", "").lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "small side would emit unmatched rows n_salts times "
            "(supported: inner/left/left_semi/left_anti)"
        )
    small_rep = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    big_salted = big.withColumn(
        "_salt", _row_salt(big, n_salts, salt_col).cast("int")
    )
    return big_salted.join(small_rep, on=[on, "_salt"], how=how).drop("_salt")
