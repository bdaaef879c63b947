"""As-of join semantics on controlled inputs (backward, <=, per-key)."""

from vervectordb_spark.operators.asof import asof_join_backward


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d")],
        "k long, ts long, name string",
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 99, 300.0)],
        "k long, ts long, px double",
    )
    out = {
        r["name"]: (r["matched_ts"], r["px"])
        for r in asof_join_backward(
            left, right, key="k", left_ts="ts", right_ts="ts", payload=("px",)
        ).collect()
    }
    assert out["a"] == (8, 100.0)     # 8 <= 10 < 15
    assert out["b"] == (15, 200.0)
    assert out["c"] == (None, None)   # nothing at-or-before 5
    assert out["d"] == (None, None)   # key 2's only right row is later


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame([(1, 10, "hit")], "k long, ts long, v string")
    row = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="ts", payload=("v",)
    ).collect()[0]
    assert row["matched_ts"] == 10 and row["v"] == "hit"  # <= semantics


def test_asof_payload_no_fanout(spark):
    """Duplicate right rows at one (key, ts) must not duplicate left rows."""
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 9, "x"), (1, 9, "y")], "k long, ts long, v string"
    )
    rows = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="ts", payload=("v",)
    ).collect()
    assert len(rows) == 1 and rows[0]["matched_ts"] == 9


def test_asof_payload_dedup_deterministic(spark):
    """ADVICE r1 (low): duplicate (key, ts) with DIFFERING payloads must
    resolve deterministically — the lowest payload struct wins."""
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 9, "zz", 5.0), (1, 9, "aa", 9.0)], "k long, ts long, v string, px double"
    )
    rows = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="ts", payload=("v", "px")
    ).collect()
    assert len(rows) == 1
    assert (rows[0]["v"], rows[0]["px"]) == ("aa", 9.0)  # min struct, not arbitrary


def test_asof_map_payload(spark):
    """Map-typed payload columns (unorderable in Spark) must work: the
    dedup ranks by canonical JSON instead of a min-struct, which raised
    AnalysisException for map payloads."""
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 9, {"b": "2"}), (1, 9, {"a": "1"})],
        "k long, ts long, metadata map<string,string>",
    )
    rows = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="ts",
        payload=("metadata",),
    ).collect()
    assert len(rows) == 1
    assert rows[0]["matched_ts"] == 9
    # deterministic winner: lowest JSON serialization
    assert dict(rows[0]["metadata"]) == {"a": "1"}
