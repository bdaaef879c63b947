"""Inverted multi-index query registration (operators/imi.py): the
two-level coarse quantizer, frozen-centroid path.

Oracle pattern: both half-assignments, both probe rankings, the
rectangle filter, and the exact rescore replay in DuckDB — halves are
1-based inclusive list slices ((emb)[1:32] / (emb)[33:64], identical to
F.slice), cosines are the shared bit-exact fold (_cos), probes use the
fold-kernel probe_cells_exact on the Spark side so the two engines rank
cells on identical bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.queries import _cos, _query_vec, query
from vervectordb_spark.schema import load_table

_K = 8       # cells per half -> 64 cells from 16 centroid rows
_A = 2       # rectangle probe: 2x2 of 64 cells
_MID = 32

_E1 = "(e.embedding::DOUBLE[])[1:32]"
_E2 = "(e.embedding::DOUBLE[])[33:64]"


@query(
    "imi_search_rect",
    oracle=f"""
WITH c1 AS (
  SELECT vec_id::INTEGER AS cell_id, (embedding::DOUBLE[])[1:{_MID}] AS cv
  FROM embeddings WHERE vec_id < {_K}
),
c2 AS (
  SELECT vec_id::INTEGER AS cell_id,
         (embedding::DOUBLE[])[{_MID + 1}:64] AS cv
  FROM embeddings WHERE vec_id < {_K}
),
a1 AS (
  SELECT vec_id, cell_id AS cell1 FROM (
    SELECT e.vec_id, c.cell_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos(_E1, 'c.cv')} DESC, c.cell_id
           ) AS rk
    FROM embeddings e CROSS JOIN c1 c
  ) WHERE rk = 1
),
a2 AS (
  SELECT vec_id, cell_id AS cell2 FROM (
    SELECT e.vec_id, c.cell_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos(_E2, 'c.cv')} DESC, c.cell_id
           ) AS rk
    FROM embeddings e CROSS JOIN c2 c
  ) WHERE rk = 1
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
p1 AS (
  SELECT cell_id FROM c1 CROSS JOIN q
  ORDER BY {_cos('c1.cv', f'(q.qv)[1:{_MID}]')} DESC, cell_id LIMIT {_A}
),
p2 AS (
  SELECT cell_id FROM c2 CROSS JOIN q
  ORDER BY {_cos('c2.cv', f'(q.qv)[{_MID + 1}:64]')} DESC, cell_id LIMIT {_A}
)
SELECT vec_id, cell1, cell2, ROUND(sim, 6) AS sim FROM (
  SELECT e.vec_id, a1.cell1, a2.cell2,
         {_cos('e.embedding::DOUBLE[]', 'q.qv')} AS sim
  FROM embeddings e
  JOIN a1 USING (vec_id) JOIN a2 USING (vec_id) CROSS JOIN q
  WHERE a1.cell1 IN (SELECT cell_id FROM p1)
    AND a2.cell2 IN (SELECT cell_id FROM p2)
  ORDER BY sim DESC, e.vec_id LIMIT 10
)
""",
)
def imi_search_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMI rectangle-probe serving (operators/imi.py): 64 cells from 16
    frozen half-centroids (the two-level coarse quantizer for cell
    counts a flat IVF can't fit), probe the 2×2 best-cells rectangle,
    exact-cosine rescore inside it. Assignments, probe rankings, the
    rectangle filter, and the final sims all replay bit-exactly."""
    from vervectordb_spark.operators.imi import IMIIndex

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    base = emb.filter(F.col("vec_id") < _K)
    cent1 = base.select(
        F.col("vec_id").cast("int").alias("cell_id"),
        F.slice(F.col("embedding").cast("array<double>"), 1, _MID)
        .alias("centroid"))
    cent2 = base.select(
        F.col("vec_id").cast("int").alias("cell_id"),
        F.slice(F.col("embedding").cast("array<double>"), _MID + 1,
                64 - _MID).alias("centroid"))
    idx = IMIIndex.from_centroids(emb, cent1, cent2, dim=64)
    out = idx.search(qv, top_k=10, a=_A, b=_A, exact_probe=True)
    return out.select("vec_id", "cell1", "cell2",
                      F.round("sim", 6).alias("sim"))
