"""As-of (point-in-time) join — an operator Spark's built-ins lack,
composed from a union + per-key ordered window (strategy (a) of SURVEY's
custom-operator ladder: composition of existing DataFrame ops; no UDF, no
state).

Semantics (backward as-of): for each left row, the right row with the
greatest right_ts <= left_ts within the same key. Ties at equal timestamp
match (<=), deterministically: right rows sort before left rows at the
same instant.

Construction: tag right rows with their ts, union with left rows, one
window `max(right_ts) over (partition by key order by ts, tag)` running
max — the classic sort-merge as-of as a declarative plan. Payload columns
rejoin on (key, matched_ts) against a (key, ts)-deduped right side.

Scale: ONE shuffle on the key (the union sorts within key partitions);
right-side payload rejoin is a second key shuffle (skippable when only the
timestamp/lag is needed). Compare a naive range join — Q×N per key — this
is O(n log n) per key and AQE-balanced. Timestamps are int64 (epoch-us/ns)
throughout: exact comparisons, no double precision hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    matched_col: str = "matched_ts",
    payload: tuple[str, ...] = (),
) -> DataFrame:
    """Backward as-of join. Returns `left` + `matched_col` (greatest
    right_ts <= left_ts for the key; null when no prior right row) and,
    when `payload` names right-side columns, those columns from the
    matched row (right deduped to one row per (key, ts) — lowest payload
    row wins via min struct — so the rejoin can't fan out)."""
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),  # left sorts AFTER right at equal ts (<=)
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lt.unionByName(rt).withColumn(
        matched_col,
        F.max(F.when(F.col("_tag") == 0, F.col("_ts"))).over(w),
    )
    out = (
        merged.filter(F.col("_tag") == 1)
        .select(F.col("_lrow.*"), matched_col)
    )
    if not payload:
        return out
    # Deterministic dedup: rank-1 row per (key, ts) ordered by the payload
    # struct — dropDuplicates keeps an ARBITRARY row, which makes output
    # flap when (key, ts) repeats with different payloads. Unorderable
    # payload types (maps, anywhere in the nesting) order by their
    # canonical JSON serialization instead, so ANY payload column type
    # dedups deterministically.
    p_struct = F.struct(*[F.col(c) for c in payload])

    def _has_map(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, T.StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    orderable = not any(_has_map(right.schema[c].dataType) for c in payload)
    order_col = F.col("_p") if orderable else F.to_json(F.col("_p"))
    wp = Window.partitionBy(key, matched_col).orderBy(order_col)
    slim = (
        right.select(
            F.col(key),
            F.col(right_ts).alias(matched_col),
            p_struct.alias("_p"),
        )
        .withColumn("_rk", F.row_number().over(wp))
        .filter(F.col("_rk") == 1)
        .select(key, matched_col, "_p.*")
    )
    return out.join(slim, on=[key, matched_col], how="left")
