"""H1–H4 harness tests: recall machinery self-consistency + the ANN/IVF
acceptance gates from SURVEY.md §5 run through the shared harness."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vervectordb_spark import harness as H
from vervectordb_spark.schema import load_table


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    ).cache()


def test_calculate_recall():
    assert H.calculate_recall([1, 2, 3], [1, 2, 4]) == pytest.approx(2 / 3)
    assert H.calculate_recall([], [1]) == 0.0
    assert H.calculate_recall([1], []) == 0.0


def test_recall_df(spark):
    res = spark.createDataFrame([(0, 1), (0, 2), (1, 9)], "query_id long, vec_id long")
    truth = spark.createDataFrame(
        [(0, 1), (0, 3), (1, 8), (1, 9)], "query_id long, vec_id long"
    )
    got = {r["query_id"]: r["recall"] for r in H.recall_df(res, truth).collect()}
    assert got == {0: 0.5, 1: 0.5}


def test_exact_method_has_recall_one(emb, queries):
    from vervectordb_spark.operators.search import batch_topk

    r = H.batch_recall(emb, queries, lambda c, q, k: batch_topk(c, q, top_k=k))
    assert r == 1.0


def test_ivf_batch_recall_gate(emb, queries):
    """SURVEY §5: IVF at reference pruning (nprobe=k/2) must clear the
    reference's working figure ballpark (0.748 measured; gate at 0.6)."""
    from vervectordb_spark.operators.ivf import IVFIndex

    idx = IVFIndex.build(emb, n_clusters=16, seed=42)
    r = H.batch_recall(
        emb, queries, lambda c, q, k: idx.batch_search(q, top_k=k, nprobe=8)
    )
    assert r >= 0.6


def test_ivf_full_probe_recall_one(emb, queries):
    from vervectordb_spark.operators.ivf import IVFIndex

    idx = IVFIndex.build(emb, n_clusters=16, seed=42)
    r = H.batch_recall(
        emb, queries, lambda c, q, k: idx.batch_search(q, top_k=k, nprobe=16)
    )
    assert r == 1.0


def test_compression_metrics(emb):
    from vervectordb_spark.operators.pq import PQCodec

    codec = PQCodec.fit(emb, dim=64, n_subquantizers=8, codebook_size=32, seed=42)
    m = H.compression_metrics(codec, emb)
    assert m["compression_ratio"] == 32.0
    assert 0.0 < m["mean_abs_error"] < 0.2  # BASELINE gate: <= 0.17 on ref data


def test_time_method():
    out = H.time_method(lambda: sum(range(1000)), repeats=3)
    assert out["runs"] == 3 and out["best_s"] <= out["total_s"]
