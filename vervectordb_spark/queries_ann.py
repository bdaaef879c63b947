"""ANN query registration — sign-LSH probe + exact rescore, with a full
DuckDB oracle twin.

This is the rare ANN index whose END-TO-END path is oracle-checkable: the
Rademacher planes derive from md5 (operators/ann.rademacher_planes), so
DuckDB re-derives the identical planes, signatures, probe set, and rescored
top-k. (MLlib BucketedRandomProjectionLSH, by contrast, is graded by the
recall harness in tests/test_ann.py — its random planes are JVM-internal.)

The reference analogue is hnsw_search (Q2, vervectordb/__init__.py:379-409)
— intent only; its implementation returns ≤1 row (bug B1) and is
deliberately not reproduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.queries import _Q0, query
from vervectordb_spark.schema import load_table

_N_TABLES = 4
_BITS = 8
_N_PLANES = _N_TABLES * _BITS

#: DuckDB twin of rademacher_planes: ±1 from bit 0 of the md5-60bit hash
_PLANES_SQL = f"""
  SELECT p,
    list_transform(range(0, 64),
      i -> CASE WHEN (('0x' || substr(md5('plane:' || p || ':' || i), 1, 15))::BIGINT & 1) = 1
                THEN 1.0 ELSE -1.0 END) AS plane
  FROM range({_N_PLANES}) t(p)
"""


@query(
    "ann_signlsh",
    oracle=f"""
WITH planes AS ({_PLANES_SQL}),
doc_bits AS (
  SELECT e.vec_id, p.p // {_BITS} AS tbl,
    CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.plane) > 0
         THEN 1 << (p.p % {_BITS}) ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN planes p
),
doc_buckets AS (
  SELECT vec_id, tbl, CAST(SUM(bit) AS BIGINT) AS bucket
  FROM doc_bits GROUP BY 1, 2
),
q_buckets AS (
  SELECT tbl, bucket FROM doc_buckets WHERE vec_id = 0
),
cand AS (
  SELECT DISTINCT d.vec_id
  FROM doc_buckets d JOIN q_buckets q ON d.tbl = q.tbl AND d.bucket = q.bucket
),
qv AS ({_Q0}),
scored AS (
  SELECT e.vec_id,
    (CASE WHEN list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0
          OR list_dot_product(q.qv, q.qv) = 0 THEN 0.0
          ELSE list_dot_product(e.embedding::DOUBLE[], q.qv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qv, q.qv))) END) AS sim
  FROM embeddings e JOIN cand c ON e.vec_id = c.vec_id CROSS JOIN qv q
)
SELECT vec_id, ROUND(sim, 6) AS sim
FROM (SELECT * FROM scored ORDER BY sim DESC, vec_id LIMIT 10)
""",
)
def ann_signlsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN: signature build → 4-table OR-probe → exact rescore →
    top-10. Candidate volume ≈ t·N/2^b rows; at scale the probe is a
    partition-pruned read (see operators/ann.py docstring)."""
    from vervectordb_spark.operators.ann import SignLSHIndex
    from vervectordb_spark.queries import _query_vec

    emb = load_table(spark, sf_dir, "embeddings")
    # kernel="fold": sequential-sum signature arithmetic, bit-exact with the
    # DuckDB list_dot_product twin above (the gemm kernel agrees to ~1e-13
    # but is not contractually bit-identical)
    idx = SignLSHIndex.build(emb, n_tables=_N_TABLES, bits=_BITS, kernel="fold")
    qv = _query_vec(spark, sf_dir)
    out = idx.search(qv, top_k=10)
    return out.select("vec_id", F.round("sim", 6).alias("sim"))


# ---------------------------------------------------------------------------
# LSH-pruned kNN self-join — the corpus-scale alternative to the blocked
# brute-force self-join (operators/topk.py): candidate pairs are rows
# sharing a (table, bucket) signature, so pair volume is ~t·N²/2^bits, not
# N², and nothing is ever collected to the driver. Oracle: DuckDB re-derives
# the planes, signatures, DISTINCT collision pairs, and the rescored top-3
# (first-match-table dedup in Spark == DISTINCT pairs in SQL — each
# colliding pair survives exactly once in both).
# ---------------------------------------------------------------------------

_SJ_TABLES = 4
_SJ_BITS = 6
_SJ_PLANES = _SJ_TABLES * _SJ_BITS

_SJ_PLANES_SQL = f"""
  SELECT p,
    list_transform(range(0, 64),
      i -> CASE WHEN (('0x' || substr(md5('plane:' || p || ':' || i), 1, 15))::BIGINT & 1) = 1
                THEN 1.0 ELSE -1.0 END) AS plane
  FROM range({_SJ_PLANES}) t(p)
"""

_SJ_COS = (
    "(CASE WHEN list_dot_product({a}, {a}) = 0 OR list_dot_product({b}, {b}) = 0 "
    "THEN 0.0 ELSE list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))) END)"
)


@query(
    "knn_self_join_lsh",
    oracle=f"""
WITH planes AS ({_SJ_PLANES_SQL}),
doc_bits AS (
  SELECT e.vec_id, p.p // {_SJ_BITS} AS tbl,
    CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.plane) > 0
         THEN 1 << (p.p % {_SJ_BITS}) ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN planes p
),
doc_buckets AS (
  SELECT vec_id, tbl, CAST(SUM(bit) AS BIGINT) AS bucket
  FROM doc_bits GROUP BY 1, 2
),
pairs AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS cand_id
  FROM doc_buckets a JOIN doc_buckets b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id <> b.vec_id
),
scored AS (
  SELECT p.query_id, p.cand_id AS vec_id,
         {_SJ_COS.format(a='eb.embedding::DOUBLE[]', b='ea.embedding::DOUBLE[]')} AS sim
  FROM pairs p
  JOIN embeddings ea ON ea.vec_id = p.query_id
  JOIN embeddings eb ON eb.vec_id = p.cand_id
)
SELECT query_id, vec_id, rank, ROUND(sim, 6) AS sim
FROM (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM scored
)
WHERE rank <= 3
""",
)
def knn_self_join_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-pruned kNN self-join (operators/ann.SignLSHIndex.self_join):
    bucket-collision candidate generation, first-match dedup, exact
    fold-kernel rescore, per-query top-3. kernel="fold" signatures are
    bit-exact with the DuckDB plane derivation."""
    from vervectordb_spark.operators.ann import SignLSHIndex

    emb = load_table(spark, sf_dir, "embeddings")
    idx = SignLSHIndex.build(emb, n_tables=_SJ_TABLES, bits=_SJ_BITS, kernel="fold")
    out = idx.self_join(top_k=3, rescore="fold")
    return out.select("query_id", "vec_id", "rank", F.round("sim", 6).alias("sim"))
