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

#: frozen-codebook / ADC fragments — single-sourced in the leaf
#: functions/pq_fragments (shared with queries_imi's composed oracle;
#: import-order rationale there)
from vervectordb_spark.functions.pq_fragments import (  # noqa: E402
    CB_SQL as _CB_SQL, CODE_DIFF as _CODE_DIFF, COS as _COS,
    N_CODES as _N_CODES, N_SUB as _N_SUB, NPROBE as _NPROBE,
    RERANK_FETCH as _RERANK_FETCH, SUB_DIM as _SUB_DIM,
    seq_sum as _seq_sum)

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


# ---------------------------------------------------------------------------
# IVF-PQ end-to-end: cluster probe → ADC over codes in probed clusters →
# exact rerank — the flagship FAISS-style serving path
# (operators/ivf.IVFIndex.search_pq + operators/pq.PQCodec.adc_search),
# oracle-replayed with frozen centroids AND frozen codebooks. The ADC score
# mirrors the kernel's LUT structure exactly: per-subspace sequential dot
# folds, then a left-associative sum across the m subspaces.
# ---------------------------------------------------------------------------



@query(
    "ivfpq_search_adc",
    oracle=f"""
WITH cent AS (
  SELECT vec_id::INTEGER AS cluster_id, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < 16
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
assign AS (
  SELECT e.vec_id, c.cluster_id,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_COS.format(a='e.embedding::DOUBLE[]', b='c.cv')} DESC,
                    c.cluster_id
         ) AS rk
  FROM embeddings e CROSS JOIN cent c
),
assigned AS (SELECT vec_id, cluster_id FROM assign WHERE rk = 1),
probed AS (
  SELECT c.cluster_id FROM cent c CROSS JOIN q
  ORDER BY {_COS.format(a='c.cv', b='q.qv')} DESC, c.cluster_id
  LIMIT {_NPROBE}
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
  JOIN assigned a ON a.vec_id = c.vec_id
  WHERE a.cluster_id IN (SELECT cluster_id FROM probed)
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
""",
)
def ivfpq_search_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ serving path end-to-end (operators/ivf.py search_pq): probe
    nprobe=8 of 16 frozen centroids → ADC over expr-encoded codes in the
    probed clusters (LUT gather, m bytes/row) → exact rerank of the top-50
    ADC pool → top-10. Codes come from the bit-exact expr encoder (its
    equivalence to the GEMM encoder is pytest-gated)."""
    from vervectordb_spark.operators.ivf import IVFIndex
    from vervectordb_spark.operators.pq import PQCodec
    from vervectordb_spark.queries import _query_vec
    from vervectordb_spark.functions.similarity import to_double

    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("cluster_id"),
        to_double(F.col("embedding")).alias("centroid"),
    )
    idx = IVFIndex.from_centroids(emb, cent)
    cb = _frozen_codebooks(spark, sf_dir)
    codec = PQCodec.from_codebook_df(cb)
    codes = PQCodec.encode_with_expr(emb, cb, sub_dim=_SUB_DIM)
    pq_arr = codes.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda s: (s["code"] - 128).cast("tinyint"),
        ).alias("pq_code")
    )
    encoded = idx.assigned.select("vec_id", "cluster_id").join(pq_arr, on="vec_id")
    qv = _query_vec(spark, sf_dir)
    probed = idx.probe_clusters_exact(qv, nprobe=_NPROBE)
    out = idx.search_pq(
        codec, encoded, qv, top_k=10,
        rerank=emb.select("vec_id", "embedding"), probed=probed,
    )
    return out.select("vec_id", F.round("sim", 6).alias("sim"))


# ---------------------------------------------------------------------------
# Batched IVF-PQ: Q queries in ONE job — stacked per-query LUTs in one
# broadcast, ONE scan over the union of probed clusters with per-query
# cluster masking (operators/ivf.IVFIndex.batch_search_pq +
# operators/pq.PQCodec.batch_adc_search). The oracle is the single-query
# replay partitioned by query_id — proving the batch kernel is row-for-row
# the per-query path.
# ---------------------------------------------------------------------------

_N_BATCH_Q = 4


@query(
    "ivfpq_adc_batch",
    oracle=f"""
WITH cent AS (
  SELECT vec_id::INTEGER AS cluster_id, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < 16
),
qs AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {_N_BATCH_Q}
),
assign AS (
  SELECT e.vec_id, c.cluster_id,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_COS.format(a='e.embedding::DOUBLE[]', b='c.cv')} DESC,
                    c.cluster_id
         ) AS rk
  FROM embeddings e CROSS JOIN cent c
),
assigned AS (SELECT vec_id, cluster_id FROM assign WHERE rk = 1),
probed0 AS (
  SELECT q.query_id, c.cluster_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY {_COS.format(a='c.cv', b='q.qv')} DESC, c.cluster_id
         ) AS rk
  FROM cent c CROSS JOIN qs q
),
probed AS (SELECT query_id, cluster_id FROM probed0 WHERE rk <= {_NPROBE}),
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
  SELECT q.query_id, cb.subspace, cb.code,
         list_dot_product(
           list_slice(q.qv, cb.subspace*{_SUB_DIM}+1,
                      cb.subspace*{_SUB_DIM}+{_SUB_DIM}), cb.centroid
         ) AS dot_v,
         list_dot_product(cb.centroid, cb.centroid) AS norm_v
  FROM cb CROSS JOIN qs q
),
adc0 AS (
  SELECT l.query_id, c.vec_id,
         list(l.dot_v ORDER BY c.subspace) AS dl,
         list(l.norm_v ORDER BY c.subspace) AS nl
  FROM codes c
  JOIN lut l ON c.subspace = l.subspace AND c.code = l.code
  JOIN assigned a ON a.vec_id = c.vec_id
  JOIN probed p ON p.query_id = l.query_id AND p.cluster_id = a.cluster_id
  GROUP BY l.query_id, c.vec_id
),
adc AS (
  SELECT query_id, vec_id, {_seq_sum('dl')} AS dot_sum, {_seq_sum('nl')} AS norm_sum
  FROM adc0
),
qn AS (SELECT query_id, sqrt(list_dot_product(qv, qv)) AS v FROM qs),
adc_sims AS (
  SELECT a.query_id, a.vec_id,
         CASE WHEN sqrt(a.norm_sum) * n.v = 0 THEN 0.0
              ELSE a.dot_sum / (sqrt(a.norm_sum) * n.v) END AS sim
  FROM adc a JOIN qn n ON a.query_id = n.query_id
),
pool0 AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rk
  FROM adc_sims
),
pool AS (SELECT query_id, vec_id FROM pool0 WHERE rk <= {_RERANK_FETCH}),
rerank AS (
  SELECT p.query_id, e.vec_id,
         {_COS.format(a='e.embedding::DOUBLE[]', b='q.qv')} AS sim
  FROM embeddings e
  JOIN pool p ON p.vec_id = e.vec_id
  JOIN qs q ON q.query_id = p.query_id
)
SELECT query_id, vec_id, rank, ROUND(sim, 6) AS sim
FROM (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM rerank
)
WHERE rank <= 10
""",
)
def ivfpq_adc_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched IVF-PQ serving: {_N_BATCH_Q} queries, one stacked-LUT
    broadcast, one masked ADC scan over the probed-cluster union, one
    batched exact rerank — row-for-row the per-query ivfpq_search_adc
    path (the kernel preserves per-query sequential fold order)."""
    from vervectordb_spark.operators.ivf import IVFIndex
    from vervectordb_spark.operators.pq import PQCodec
    from vervectordb_spark.functions.similarity import to_double

    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("cluster_id"),
        to_double(F.col("embedding")).alias("centroid"),
    )
    idx = IVFIndex.from_centroids(emb, cent)
    cb = _frozen_codebooks(spark, sf_dir)
    codec = PQCodec.from_codebook_df(cb)
    codes = PQCodec.encode_with_expr(emb, cb, sub_dim=_SUB_DIM)
    pq_arr = codes.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda s: (s["code"] - 128).cast("tinyint"),
        ).alias("pq_code")
    )
    encoded = idx.assigned.select("vec_id", "cluster_id").join(pq_arr, on="vec_id")
    qdf = emb.filter(F.col("vec_id") < _N_BATCH_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    probe_sets = {
        int(r["query_id"]): idx.probe_clusters_exact(
            [float(x) for x in r["q_embedding"]], nprobe=_NPROBE
        )
        for r in qdf.collect()
    }
    out = idx.batch_search_pq(
        codec, encoded, qdf, top_k=10,
        rerank=emb.select("vec_id", "embedding"), probe_sets=probe_sets,
    )
    return out.select("query_id", "vec_id", "rank", F.round("sim", 6).alias("sim"))


# ---------------------------------------------------------------------------
# Residual IVF-PQ: quantize (embedding − assigned centroid) instead of the
# raw vector — true FAISS-style IVFPQ (operators/ivf.IVFIndex
# .search_residual_pq + operators/pq.PQCodec.adc_search_residual). The ADC
# LUTs fuse the coarse centroid into the fine codebook per probed cluster,
# so reconstruction x̂ = centroid ⊕ r̂ never materializes. The oracle
# replays assignment, residual encode (L2 argmin on residual slices), the
# fused LUT, the subspace-ordered fold, and the exact rerank.
# ---------------------------------------------------------------------------

#: frozen RESIDUAL codebooks: subspace slices of fixture embeddings 16..31
_CB_RES_SQL = f"""
  SELECT t.s::INT AS subspace, (e.vec_id - 16)::INT AS code,
         list_slice(e.embedding::DOUBLE[], t.s*{_SUB_DIM}+1, t.s*{_SUB_DIM}+{_SUB_DIM}) AS centroid
  FROM embeddings e, range({_N_SUB}) t(s)
  WHERE e.vec_id >= 16 AND e.vec_id < 32
"""

_RES_DIFF = f"list_transform(range(1, {_SUB_DIM}+1), i -> rsl[i] - centroid[i])"
_RECON = f"list_transform(range(1, {_SUB_DIM}+1), i -> csl[i] + cb.centroid[i])"


def _frozen_residual_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter((F.col("vec_id") >= 16) & (F.col("vec_id") < 32))
        .select(
            (F.col("vec_id") - 16).cast("int").alias("code"),
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
    "ivfpq_residual_adc",
    oracle=f"""
WITH cent AS (
  SELECT vec_id::INTEGER AS cluster_id, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < 16
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
assign AS (
  SELECT e.vec_id, c.cluster_id,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_COS.format(a='e.embedding::DOUBLE[]', b='c.cv')} DESC,
                    c.cluster_id
         ) AS rk
  FROM embeddings e CROSS JOIN cent c
),
assigned AS (SELECT vec_id, cluster_id FROM assign WHERE rk = 1),
probed AS (
  SELECT c.cluster_id FROM cent c CROSS JOIN q
  ORDER BY {_COS.format(a='c.cv', b='q.qv')} DESC, c.cluster_id
  LIMIT {_NPROBE}
),
cb AS ({_CB_RES_SQL}),
rsliced AS (
  SELECT e.vec_id, a.cluster_id, t.s AS subspace,
         list_transform(range(1, {_SUB_DIM}+1), i ->
           list_slice(e.embedding::DOUBLE[], t.s*{_SUB_DIM}+1, t.s*{_SUB_DIM}+{_SUB_DIM})[i]
           - list_slice(c.cv,               t.s*{_SUB_DIM}+1, t.s*{_SUB_DIM}+{_SUB_DIM})[i]
         ) AS rsl
  FROM embeddings e
  JOIN assigned a ON a.vec_id = e.vec_id
  JOIN cent c     ON c.cluster_id = a.cluster_id
  CROSS JOIN range({_N_SUB}) t(s)
),
code_scored AS (
  SELECT r.vec_id, r.cluster_id, r.subspace, cb.code,
         list_dot_product({_RES_DIFF}, {_RES_DIFF}) AS dist
  FROM rsliced r JOIN cb ON cb.subspace = r.subspace
),
code_ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id, subspace ORDER BY dist, code
  ) AS rk
  FROM code_scored
),
codes AS (
  SELECT vec_id, cluster_id, subspace, code FROM code_ranked WHERE rk = 1
),
lut AS (
  SELECT c.cluster_id, cb.subspace, cb.code,
         list_dot_product({_RECON},
           list_slice(q.qv, cb.subspace*{_SUB_DIM}+1, cb.subspace*{_SUB_DIM}+{_SUB_DIM})
         ) AS dot_v,
         list_dot_product({_RECON}, {_RECON}) AS norm_v
  FROM cent c
  JOIN probed p ON p.cluster_id = c.cluster_id
  CROSS JOIN cb CROSS JOIN q
  CROSS JOIN LATERAL (SELECT list_slice(c.cv, cb.subspace*{_SUB_DIM}+1,
                             cb.subspace*{_SUB_DIM}+{_SUB_DIM}) AS csl) sl
),
adc0 AS (
  SELECT c.vec_id,
         list(l.dot_v ORDER BY c.subspace) AS dl,
         list(l.norm_v ORDER BY c.subspace) AS nl
  FROM codes c
  JOIN lut l ON l.cluster_id = c.cluster_id
            AND l.subspace = c.subspace AND l.code = c.code
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
""",
)
def ivfpq_residual_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ end-to-end: assign to frozen centroids → residual
    encode against frozen residual codebooks (expr path, bit-exact) →
    probe nprobe=8 → fused-LUT ADC over the probed clusters → exact rerank
    of the top-50 pool → top-10. The quality gain of residual over raw
    quantization with FITTED codebooks is pinned in tests/test_pq.py."""
    from vervectordb_spark.operators.ivf import IVFIndex
    from vervectordb_spark.operators.pq import PQCodec, with_residual
    from vervectordb_spark.queries import _query_vec
    from vervectordb_spark.functions.similarity import to_double

    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("cluster_id"),
        to_double(F.col("embedding")).alias("centroid"),
    )
    idx = IVFIndex.from_centroids(emb, cent)
    cb_res = _frozen_residual_codebooks(spark, sf_dir)
    codec = PQCodec.from_codebook_df(cb_res)
    res = with_residual(idx.assigned, cent)
    codes = PQCodec.encode_with_expr(res, cb_res, emb_col="_residual",
                                     sub_dim=_SUB_DIM)
    pq_arr = codes.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda s: (s["code"] - 128).cast("tinyint"),
        ).alias("pq_code")
    )
    encoded = idx.assigned.select("vec_id", "cluster_id").join(pq_arr, on="vec_id")
    qv = _query_vec(spark, sf_dir)
    probed = idx.probe_clusters_exact(qv, nprobe=_NPROBE)
    out = idx.search_residual_pq(
        codec, encoded, qv, top_k=10,
        rerank=emb.select("vec_id", "embedding"), probed=probed,
    )
    return out.select("vec_id", F.round("sim", 6).alias("sim"))


@query(
    "ivfpq_residual_batch",
    oracle=f"""
WITH cent AS (
  SELECT vec_id::INTEGER AS cluster_id, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < 16
),
qs AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {_N_BATCH_Q}
),
assign AS (
  SELECT e.vec_id, c.cluster_id,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_COS.format(a='e.embedding::DOUBLE[]', b='c.cv')} DESC,
                    c.cluster_id
         ) AS rk
  FROM embeddings e CROSS JOIN cent c
),
assigned AS (SELECT vec_id, cluster_id FROM assign WHERE rk = 1),
probed0 AS (
  SELECT q.query_id, c.cluster_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY {_COS.format(a='c.cv', b='q.qv')} DESC, c.cluster_id
         ) AS rk
  FROM cent c CROSS JOIN qs q
),
probed AS (SELECT query_id, cluster_id FROM probed0 WHERE rk <= {_NPROBE}),
cb AS ({_CB_RES_SQL}),
rsliced AS (
  SELECT e.vec_id, a.cluster_id, t.s AS subspace,
         list_transform(range(1, {_SUB_DIM}+1), i ->
           list_slice(e.embedding::DOUBLE[], t.s*{_SUB_DIM}+1, t.s*{_SUB_DIM}+{_SUB_DIM})[i]
           - list_slice(c.cv,               t.s*{_SUB_DIM}+1, t.s*{_SUB_DIM}+{_SUB_DIM})[i]
         ) AS rsl
  FROM embeddings e
  JOIN assigned a ON a.vec_id = e.vec_id
  JOIN cent c     ON c.cluster_id = a.cluster_id
  CROSS JOIN range({_N_SUB}) t(s)
),
code_scored AS (
  SELECT r.vec_id, r.cluster_id, r.subspace, cb.code,
         list_dot_product({_RES_DIFF}, {_RES_DIFF}) AS dist
  FROM rsliced r JOIN cb ON cb.subspace = r.subspace
),
code_ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id, subspace ORDER BY dist, code
  ) AS rk
  FROM code_scored
),
codes AS (
  SELECT vec_id, cluster_id, subspace, code FROM code_ranked WHERE rk = 1
),
lut AS (
  SELECT p.query_id, c.cluster_id, cb.subspace, cb.code,
         list_dot_product({_RECON},
           list_slice(q.qv, cb.subspace*{_SUB_DIM}+1, cb.subspace*{_SUB_DIM}+{_SUB_DIM})
         ) AS dot_v,
         list_dot_product({_RECON}, {_RECON}) AS norm_v
  FROM probed p
  JOIN cent c ON c.cluster_id = p.cluster_id
  JOIN qs q   ON q.query_id = p.query_id
  CROSS JOIN cb
  CROSS JOIN LATERAL (SELECT list_slice(c.cv, cb.subspace*{_SUB_DIM}+1,
                             cb.subspace*{_SUB_DIM}+{_SUB_DIM}) AS csl) sl
),
adc0 AS (
  SELECT l.query_id, c.vec_id,
         list(l.dot_v ORDER BY c.subspace) AS dl,
         list(l.norm_v ORDER BY c.subspace) AS nl
  FROM codes c
  JOIN lut l ON l.cluster_id = c.cluster_id
           AND l.subspace = c.subspace AND l.code = c.code
  GROUP BY l.query_id, c.vec_id
),
adc AS (
  SELECT query_id, vec_id, {_seq_sum('dl')} AS dot_sum, {_seq_sum('nl')} AS norm_sum
  FROM adc0
),
qn AS (SELECT query_id, sqrt(list_dot_product(qv, qv)) AS v FROM qs),
adc_sims AS (
  SELECT a.query_id, a.vec_id,
         CASE WHEN sqrt(a.norm_sum) * n.v = 0 THEN 0.0
              ELSE a.dot_sum / (sqrt(a.norm_sum) * n.v) END AS sim
  FROM adc a JOIN qn n ON a.query_id = n.query_id
),
pool0 AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rk
  FROM adc_sims
),
pool AS (SELECT query_id, vec_id FROM pool0 WHERE rk <= {_RERANK_FETCH}),
rerank AS (
  SELECT p.query_id, e.vec_id,
         {_COS.format(a='e.embedding::DOUBLE[]', b='q.qv')} AS sim
  FROM embeddings e
  JOIN pool p ON p.vec_id = e.vec_id
  JOIN qs q ON q.query_id = p.query_id
)
SELECT query_id, vec_id, rank, ROUND(sim, 6) AS sim
FROM (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM rerank
)
WHERE rank <= 10
""",
)
def ivfpq_residual_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched residual IVF-PQ: 4 queries, one fused (query × probed
    cluster) LUT broadcast, one scan of the probed-cluster union, batched
    exact rerank — row-for-row the per-query ivfpq_residual_adc path
    (parity also pytest-pinned, tests/test_pq.py)."""
    from vervectordb_spark.operators.ivf import IVFIndex
    from vervectordb_spark.operators.pq import PQCodec, with_residual
    from vervectordb_spark.functions.similarity import to_double

    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("cluster_id"),
        to_double(F.col("embedding")).alias("centroid"),
    )
    idx = IVFIndex.from_centroids(emb, cent)
    cb_res = _frozen_residual_codebooks(spark, sf_dir)
    codec = PQCodec.from_codebook_df(cb_res)
    res = with_residual(idx.assigned, cent)
    codes = PQCodec.encode_with_expr(res, cb_res, emb_col="_residual",
                                     sub_dim=_SUB_DIM)
    pq_arr = codes.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda s: (s["code"] - 128).cast("tinyint"),
        ).alias("pq_code")
    )
    encoded = idx.assigned.select("vec_id", "cluster_id").join(pq_arr, on="vec_id")
    qdf = emb.filter(F.col("vec_id") < _N_BATCH_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    probe_sets = {
        int(r["query_id"]): idx.probe_clusters_exact(
            [float(x) for x in r["q_embedding"]], nprobe=_NPROBE
        )
        for r in qdf.collect()
    }
    out = idx.batch_search_residual_pq(
        codec, encoded, qdf, top_k=10,
        rerank=emb.select("vec_id", "embedding"), probe_sets=probe_sets,
    )
    return out.select("query_id", "vec_id", "rank", F.round("sim", 6).alias("sim"))
