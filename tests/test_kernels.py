"""The two scoring kernels (Catalyst fold — bit-exact oracle path; GEMM —
throughput path) must agree: same (src, dst, rank) sets, sims within fp
tolerance."""

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vervectordb_spark.operators import search as S
from vervectordb_spark.schema import load_table


def _as_map(rows):
    return {(r["src_id"], r["rank"]): (r["dst_id"], r["sim"]) for r in rows}


def test_knn_kernels_agree(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    fold = _as_map(S.knn_self_join(emb, top_k=3, kernel="fold").collect())
    gemm = _as_map(S.knn_self_join(emb, top_k=3, kernel="gemm").collect())
    assert fold.keys() == gemm.keys()
    for key, (dst_f, sim_f) in fold.items():
        dst_g, sim_g = gemm[key]
        assert dst_f == dst_g, f"neighbor mismatch at {key}"
        assert math.isclose(sim_f, sim_g, abs_tol=1e-9)


def test_batch_kernels_agree(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    from pyspark.sql import functions as F

    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    fold = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["sim"])
        for r in S.batch_topk(emb, queries, top_k=5, kernel="fold").collect()
    }
    gemm = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["sim"])
        for r in S.batch_topk(emb, queries, top_k=5, kernel="gemm").collect()
    }
    assert fold.keys() == gemm.keys()
    for key, (vid_f, sim_f) in fold.items():
        vid_g, sim_g = gemm[key]
        assert vid_f == vid_g
        assert math.isclose(sim_f, sim_g, abs_tol=1e-9)


def test_gemm_blocked_query_side_matches_single_block(spark):
    """The blocked query-side path (bounded driver memory at scale) must be
    row-identical to the single-broadcast fast path."""
    from vervectordb_spark.operators.topk import gemm_topk
    from vervectordb_spark.schema import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 23).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    single = gemm_topk(emb, queries, top_k=5, block_size=10**6).collect()
    blocked = gemm_topk(emb, queries, top_k=5, block_size=7).collect()
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"])
    assert sorted(key(r) for r in single) == sorted(key(r) for r in blocked)


def test_knn_self_join_blocked_matches(spark):
    from vervectordb_spark.operators.search import knn_self_join
    from vervectordb_spark.schema import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").limit(40)
    single = knn_self_join(emb, top_k=3).collect()
    blocked = knn_self_join(emb, top_k=3, block_size=9).collect()
    key = lambda r: (r["src_id"], r["rank"], r["dst_id"])
    assert sorted(key(r) for r in single) == sorted(key(r) for r in blocked)
