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


# ---------------------------------------------------------------------------
# IMI-PQ composed serving (operators/imi.IMIIndex.search_pq): the FAISS
# billion-scale layout — rectangle probe over the two-level quantizer, ADC
# over PQ codes inside the probed cells, exact rerank. The oracle is the
# imi_search_rect assignment/probe CTEs composed with queries_pq's frozen
# codebook / code-assignment / LUT / fixed-fold ADC CTEs verbatim.
# ---------------------------------------------------------------------------

def _imipq_oracle() -> str:
    from vervectordb_spark.functions.pq_fragments import (
        CB_SQL as _CB_SQL,
        CODE_DIFF as _CODE_DIFF,
        COS as _COS,
        RERANK_FETCH as _RERANK_FETCH,
        SUB_DIM as _SUB_DIM,
        seq_sum as _seq_sum,
    )

    return f"""
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
),
in_rect AS (
  SELECT vec_id FROM a1 JOIN a2 USING (vec_id)
  WHERE a1.cell1 IN (SELECT cell_id FROM p1)
    AND a2.cell2 IN (SELECT cell_id FROM p2)
),
cb AS ({_CB_SQL}),
sliced AS (
  SELECT e.vec_id, cb.subspace, cb.code, cb.centroid,
         list_slice(e.embedding::DOUBLE[], cb.subspace*{_SUB_DIM}+1,
                    cb.subspace*{_SUB_DIM}+{_SUB_DIM}) AS sl
  FROM embeddings e CROSS JOIN cb
),
code_scored AS (
  SELECT vec_id, subspace, code,
         list_dot_product({_CODE_DIFF}, {_CODE_DIFF}) AS dist
  FROM sliced
),
code_ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id, subspace ORDER BY dist, code
  ) AS rk
  FROM code_scored
),
codes AS (SELECT vec_id, subspace, code FROM code_ranked WHERE rk = 1),
lut AS (
  SELECT cb.subspace, cb.code,
         list_dot_product(
           list_slice(q.qv, cb.subspace*{_SUB_DIM}+1,
                      cb.subspace*{_SUB_DIM}+{_SUB_DIM}), cb.centroid
         ) AS dot_v,
         list_dot_product(cb.centroid, cb.centroid) AS norm_v
  FROM cb CROSS JOIN q
),
adc0 AS (
  SELECT c.vec_id,
         list(l.dot_v ORDER BY c.subspace) AS dl,
         list(l.norm_v ORDER BY c.subspace) AS nl
  FROM codes c
  JOIN lut l ON c.subspace = l.subspace AND c.code = l.code
  JOIN in_rect r ON r.vec_id = c.vec_id
  GROUP BY c.vec_id
),
adc AS (
  SELECT vec_id, {_seq_sum('dl')} AS dot_sum, {_seq_sum('nl')} AS norm_sum
  FROM adc0
),
qn AS (SELECT sqrt(list_dot_product(qv, qv)) AS v FROM q),
adc_sims AS (
  SELECT vec_id,
         CASE WHEN sqrt(norm_sum) * (SELECT v FROM qn) = 0 THEN 0.0
              ELSE dot_sum / (sqrt(norm_sum) * (SELECT v FROM qn)) END AS sim
  FROM adc
),
pool AS (
  SELECT vec_id FROM adc_sims ORDER BY sim DESC, vec_id LIMIT {_RERANK_FETCH}
),
rerank AS (
  SELECT e.vec_id, {_COS.format(a='e.embedding::DOUBLE[]', b='q.qv')} AS sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id IN (SELECT vec_id FROM pool)
)
SELECT vec_id, ROUND(sim, 6) AS sim
FROM (SELECT * FROM rerank ORDER BY sim DESC, vec_id LIMIT 10)
"""


@query("imipq_search_adc", oracle=_imipq_oracle())
def imipq_search_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMI-PQ end-to-end (IMIIndex.search_pq): 2×2 rectangle probe of 64
    cells from 16 frozen half-centroids → ADC over expr-encoded PQ codes
    inside the rectangle (LUT gather, m bytes/row) → exact rerank of the
    top-50 ADC pool → top-10. Completes the index×codec matrix's IMI row
    next to IVF-flat/PQ/resPQ/SQ8/BQ; every stage replays bit-exactly."""
    from vervectordb_spark.functions.similarity import to_double
    from vervectordb_spark.operators.imi import IMIIndex
    from vervectordb_spark.operators.pq import PQCodec
    from vervectordb_spark.queries_pq import _SUB_DIM, _frozen_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < _K)
    cent1 = base.select(
        F.col("vec_id").cast("int").alias("cell_id"),
        F.slice(to_double(F.col("embedding")), 1, _MID).alias("centroid"))
    cent2 = base.select(
        F.col("vec_id").cast("int").alias("cell_id"),
        F.slice(to_double(F.col("embedding")), _MID + 1,
                64 - _MID).alias("centroid"))
    idx = IMIIndex.from_centroids(emb, cent1, cent2, dim=64)
    cb = _frozen_codebooks(spark, sf_dir)
    codec = PQCodec.from_codebook_df(cb)
    codes = PQCodec.encode_with_expr(emb, cb, sub_dim=_SUB_DIM)
    pq_arr = codes.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda s: (s["code"] - 128).cast("tinyint"),
        ).alias("pq_code")
    )
    encoded = idx.assigned.select("vec_id", "cell1", "cell2").join(
        pq_arr, on="vec_id")
    qv = _query_vec(spark, sf_dir, 0)
    out = idx.search_pq(
        codec, encoded, qv, top_k=10, a=_A, b=_A,
        rerank=emb.select("vec_id", "embedding"), exact_probe=True,
    )
    return out.select("vec_id", F.round("sim", 6).alias("sim"))


def _calib_path() -> str:
    import os

    from vervectordb_spark.operators.imi import default_calibration_dir

    return os.path.join(default_calibration_dir(), "cdfs.parquet")


def _calibrated_oracle() -> str:
    """imi_search_rect's assignment/probe/rescore CTEs with the rectangle
    SHAPE derived in SQL from the COMMITTED calibration artifact
    (models/imi_probe_calib — frozen by tools/freeze_imi_calibration.py,
    reproducibility pytest-pinned): the alloc CTEs replay
    IMIIndex._alloc_calibrated exactly — candidate (a, b = budget//a)
    shapes joined to the frozen per-half CDFs, coverage = F1[a]*F2[b],
    balanced rectangle preferred unless an elongated one clears the 0.05
    noise guard, ties broken (a*b desc, |a-b| asc, a asc) == Python's
    first-max-of-key semantics over the a-ascending candidate list."""
    budget = _A * _A
    return f"""
WITH calib AS (SELECT half, rank, cdf FROM read_parquet('{_calib_path()}')),
cand AS (
  SELECT r.range + 1 AS a, least({_K}, {budget} // (r.range + 1)) AS b
  FROM range(0, least({_K}, {budget})) r
  WHERE least({_K}, {budget} // (r.range + 1)) >= 1
),
scored AS (
  SELECT c.a, c.b, f1.cdf * f2.cdf AS cov
  FROM cand c
  JOIN calib f1 ON f1.half = 1 AND f1.rank = c.a
  JOIN calib f2 ON f2.half = 2 AND f2.rank = c.b
),
bal AS (SELECT a, b, cov FROM scored
        ORDER BY a*b DESC, abs(a - b) ASC, a ASC LIMIT 1),
bst AS (SELECT a, b, cov FROM scored
        ORDER BY cov DESC, a*b DESC, abs(a - b) ASC, a ASC LIMIT 1),
alloc AS (
  SELECT CASE WHEN bst.cov > bal.cov + 0.05 THEN bst.a ELSE bal.a END AS a,
         CASE WHEN bst.cov > bal.cov + 0.05 THEN bst.b ELSE bal.b END AS b
  FROM bal, bst
),
c1 AS (
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
  SELECT cell_id FROM (
    SELECT c1.cell_id,
           row_number() OVER (
             ORDER BY {_cos('c1.cv', f'(q.qv)[1:{_MID}]')} DESC, c1.cell_id
           ) AS rk
    FROM c1 CROSS JOIN q
  ) WHERE rk <= (SELECT a FROM alloc)
),
p2 AS (
  SELECT cell_id FROM (
    SELECT c2.cell_id,
           row_number() OVER (
             ORDER BY {_cos('c2.cv', f'(q.qv)[{_MID + 1}:64]')} DESC,
                      c2.cell_id
           ) AS rk
    FROM c2 CROSS JOIN q
  ) WHERE rk <= (SELECT b FROM alloc)
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
"""


@query("imi_search_calibrated", oracle=_calibrated_oracle())
def imi_search_calibrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibrated rectangle serving, now HASH-GATED (VERDICT r10 task
    #5): the a×b shape comes from the COMMITTED per-half rank-coverage
    CDFs (models/imi_probe_calib — calibrate_probe frozen on the sf0.01
    fixture by tools/freeze_imi_calibration.py, reproducibility
    pytest-pinned) under the same 4-cell budget the fixed 2×2 rectangle
    spends, via the SAME _alloc_calibrated arithmetic the serving path
    uses; probing + rescore run the bit-exact fold kernel. The oracle
    replays the allocation in SQL over the committed parquet and the
    rectangle search with the SQL-derived shape — runtime calibration
    (the previously rows-only statistic) stays covered by
    tests/test_imi.py + RECALL.md."""
    from vervectordb_spark.operators.imi import (
        IMIIndex, load_probe_calibration)

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
    idx._probe_cdf = load_probe_calibration()
    a, b = idx._alloc_calibrated(budget=_A * _A)
    out = idx.search(qv, top_k=10, a=a, b=b, exact_probe=True)
    return out.select("vec_id", "cell1", "cell2",
                      F.round("sim", 6).alias("sim"))