"""Skew-mitigation rewrites must be result-invisible (the oracle gate
covers salted_agg; here: salted_join vs plain join, plus shuffle-shape)."""

from pyspark.sql import functions as F

from vervectordb_spark.functions.skew import salted_agg, salted_join


def test_salted_join_equals_plain_join(spark):
    big = spark.createDataFrame(
        [(i, i % 3) for i in range(300)], "row_id long, k long"
    )
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "k long, label string"
    )
    plain = {(r["row_id"], r["label"]) for r in big.join(small, on="k").collect()}
    salted = {
        (r["row_id"], r["label"])
        for r in salted_join(big, small, on="k", n_salts=4,
                             salt_col="row_id").collect()
    }
    assert salted == plain and len(plain) == 300


def test_salted_agg_spreads_partials(spark):
    """Phase-1 groups = keys × salts (the point of the rewrite)."""
    df = spark.createDataFrame([(i % 2, i) for i in range(100)], "k long, v long")
    out = salted_agg(
        df, keys=["k"],
        partial_aggs=[F.count("*").alias("_c")],
        final_aggs=[F.sum("_c").alias("n")],
        n_salts=8, salt_col="v",
    )
    got = {r["k"]: r["n"] for r in out.collect()}
    assert got == {0: 50, 1: 50}
    # the phase-1 relation really is keys × salts wide
    from vervectordb_spark.functions.skew import _row_salt

    salted = df.withColumn("_salt", _row_salt(df, 8, "v"))
    assert salted.select("k", "_salt").distinct().count() > 8


def test_salted_join_rejects_small_side_preserving_modes(spark):
    """'right'/'full' would emit every unmatched small-side row n_salts
    times (the small side is replicated) — must raise, not corrupt."""
    import pytest

    from vervectordb_spark.functions.skew import salted_join

    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    for how in ("right", "full", "outer", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, on="k", n_salts=4, how=how)
    assert salted_join(big, small, on="k", n_salts=4, how="left").count() == 10
