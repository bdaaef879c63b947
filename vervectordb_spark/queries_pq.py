"""PQ codec query registrations (reference C1–C5,
vervectordb/__init__.py:152-218, 489-515).

The oracle freezes the codebooks as data — subspace s's codebook k is the
s-th 8-dim slice of fixture embedding k (16 codes × 8 subspaces over the
64-dim vectors) — so encode (L2 argmin, ties to lowest code) and decode
(codebook gather) are replayed bit-exactly by DuckDB. The MLlib-fitted
codebook path is graded by reconstruction-error tests (tests/test_pq.py),
mirroring the reference's own acceptance metric
(examples/datawhale.py:59-61).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.queries import query
from vervectordb_spark.schema import load_table

_SUB_DIM = 8
_N_SUB = 8
_N_CODES = 16

#: DuckDB twin of the frozen codebook construction
_CB_SQL = f"""
  SELECT t.s::INT AS subspace, e.vec_id::INT AS code,
         list_slice(e.embedding::DOUBLE[], t.s*{_SUB_DIM}+1, t.s*{_SUB_DIM}+{_SUB_DIM}) AS centroid
  FROM embeddings e, range({_N_SUB}) t(s)
  WHERE e.vec_id < {_N_CODES}
"""

_DIFF = (
    f"list_transform(range(1, {_SUB_DIM}+1), "
    f"i -> sl[i] - centroid[i])"
)


def _frozen_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") < _N_CODES)
        .select(
            F.col("vec_id").cast("int").alias("code"),
            F.col("embedding").cast("array<double>").alias("_emb"),
            F.explode(F.sequence(F.lit(0), F.lit(_N_SUB - 1))).alias("subspace"),
        )
        .select(
            "subspace",
            "code",
            F.slice(
                F.col("_emb"), F.col("subspace") * _SUB_DIM + 1, _SUB_DIM
            ).alias("centroid"),
        )
    )


@query(
    "pq_encode_frozen",
    oracle=f"""
WITH cb AS ({_CB_SQL}),
sliced AS (
  SELECT e.vec_id, cb.subspace, cb.code, cb.centroid,
         list_slice(e.embedding::DOUBLE[], cb.subspace*{_SUB_DIM}+1,
                    cb.subspace*{_SUB_DIM}+{_SUB_DIM}) AS sl
  FROM embeddings e CROSS JOIN cb
),
scored AS (
  SELECT vec_id, subspace, code, centroid,
         list_dot_product({_DIFF}, {_DIFF}) AS dist
  FROM sliced
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id, subspace ORDER BY dist, code
  ) AS rk
  FROM scored
)
SELECT vec_id, subspace, code, ROUND(centroid[1], 6) AS c0
FROM ranked WHERE rk = 1
""",
)
def pq_encode_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 encode (per-subspace L2 argmin, vervectordb/__init__.py:198-199)
    + C5 decode gather (the returned c0 is the first reconstructed
    element), against frozen codebooks. 500 vectors × 8 subspaces."""
    from vervectordb_spark.operators.pq import PQCodec

    emb = load_table(spark, sf_dir, "embeddings")
    cb = _frozen_codebooks(spark, sf_dir)
    codes = PQCodec.encode_with_expr(emb, cb, sub_dim=_SUB_DIM)
    return codes.join(F.broadcast(cb), on=["subspace", "code"]).select(
        "vec_id",
        "subspace",
        "code",
        F.round(F.element_at("centroid", 1), 6).alias("c0"),
    )
