"""Count-min sketch laws (functions/sketch_cms.py)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vervectordb_spark.functions import sketch_cms as C
from vervectordb_spark.schema import load_events

EPS = 0.01
CONF = 0.99


@pytest.fixture(scope="module")
def events(spark):
    return load_events(spark, SF_DIR).select("event_type", "user_id")


def test_cms_never_undercounts_and_bound_holds(spark, events):
    sk = C.cms_sketch(events, "event_type", eps=EPS, confidence=CONF)
    true = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(true.values())
    est = C.cms_estimate(spark, sk, list(true))
    for k, t in true.items():
        assert est[k] >= t                      # no under-count, ever
        assert est[k] <= t + EPS * n_total      # the eps*N over-count bound


def test_cms_merge_equals_whole(spark, events):
    half_a = events.filter(F.col("user_id") % 2 == 0)
    half_b = events.filter(F.col("user_id") % 2 == 1)
    kw = dict(eps=EPS, confidence=CONF, seed=42)
    merged = C.cms_merge(
        spark,
        C.cms_sketch(half_a, "event_type", **kw),
        C.cms_sketch(half_b, "event_type", **kw),
    )
    whole = C.cms_sketch(events, "event_type", **kw)
    keys = [r["event_type"] for r in events.select("event_type").distinct().collect()]
    # counter-wise merge is exact: estimates agree exactly with the
    # single-pass sketch (same seed -> same hash grid)
    assert C.cms_estimate(spark, merged, keys) == C.cms_estimate(spark, whole, keys)


def test_cms_absent_item_bounded_by_eps_n(spark, events):
    sk = C.cms_sketch(events, "event_type", eps=EPS, confidence=CONF)
    n_total = events.count()
    est = C.cms_estimate(spark, sk, ["no_such_event_type"])
    assert 0 <= est["no_such_event_type"] <= EPS * n_total
