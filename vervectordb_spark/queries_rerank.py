"""MMR diversified re-ranking registration (operators/rerank.py).

Oracle pattern: the greedy is sequential, so the DuckDB twin UNROLLS it —
one CTE layer per pick (k=3 here), each selecting argmax(lam*rel -
(1-lam)*redundancy) with GREATEST-of-cosines redundancy against the picks
so far and (mmr DESC, vec_id ASC) tie-break. The Spark side runs the
GENERAL operator (any k, applyInPandas greedy); both compute candidate
cosines with the identical sequential double fold, so every pick — and the
scores themselves — hash-match bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.queries import _cos, _query_vec, query
from vervectordb_spark.schema import load_table

_R = 16      # candidate pool (retriever top-R)
_K = 3       # diversified result size
_LAM = 0.7

# 1.0 - 0.7 in DuckDB is DECIMAL arithmetic (exactly 0.3, i.e. double
# 0.29999999999999998) — NOT the IEEE 0.30000000000000004 the kernel
# computes and the bit-exact contract requires; force DOUBLE subtraction
_MMR = f"({_LAM}::DOUBLE * rel - (1.0::DOUBLE - {_LAM}::DOUBLE) * red)"


@query(
    "mmr_rerank_topk",
    oracle=f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, {_cos('e.embedding::DOUBLE[]', 'q.qv')} AS rel,
         e.embedding::DOUBLE[] AS v
  FROM embeddings e CROSS JOIN q
),
cand AS (SELECT * FROM scored ORDER BY rel DESC, vec_id LIMIT {_R}),
s1 AS (SELECT vec_id, rel, v, 0.0 AS red FROM cand
       ORDER BY ({_LAM}::DOUBLE * rel - (1.0::DOUBLE - {_LAM}::DOUBLE) * 0.0)
           DESC, vec_id LIMIT 1),
r2 AS (
  SELECT c.vec_id, c.rel, c.v, {_cos('c.v', 's1.v')} AS red
  FROM cand c, s1 WHERE c.vec_id <> s1.vec_id
),
s2 AS (SELECT * FROM r2 ORDER BY {_MMR} DESC, vec_id LIMIT 1),
r3 AS (
  SELECT c.vec_id, c.rel, c.v,
         GREATEST({_cos('c.v', 's1.v')}, {_cos('c.v', 's2.v')}) AS red
  FROM cand c, s1, s2 WHERE c.vec_id NOT IN (s1.vec_id, s2.vec_id)
),
s3 AS (SELECT * FROM r3 ORDER BY {_MMR} DESC, vec_id LIMIT 1)
SELECT 1 AS rank, vec_id, ROUND(rel, 6) AS rel,
       ROUND(red, 6) AS redundancy, ROUND({_MMR}, 6) AS mmr FROM s1
UNION ALL
SELECT 2, vec_id, ROUND(rel, 6), ROUND(red, 6), ROUND({_MMR}, 6) FROM s2
UNION ALL
SELECT 3, vec_id, ROUND(rel, 6), ROUND(red, 6), ROUND({_MMR}, 6) FROM s3
""",
)
def mmr_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified top-3 from the exact top-16 of query vec 0: the MMR
    greedy (lam=0.7) demotes candidates that are near-duplicates of
    already-picked results. The general operator runs here; the oracle is
    the same greedy unrolled to k=3 in SQL — scores AND picks replay
    bit-exactly via the shared fold contract."""
    from vervectordb_spark.functions.similarity import cosine_expr
    from vervectordb_spark.operators.rerank import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    cand = (
        emb.select("vec_id", cosine_expr("embedding", qv).alias("rel"),
                   "embedding")
        .orderBy(F.desc("rel"), "vec_id")
        .limit(_R)
        .withColumn("query_id", F.lit(0))
    )
    out = mmr_rerank(cand, k=_K, lam=_LAM)
    return out.select(
        "rank", "vec_id",
        F.round("rel", 6).alias("rel"),
        F.round("redundancy", 6).alias("redundancy"),
        F.round("mmr", 6).alias("mmr"),
    )
