"""SQ8 scalar-quantization query registrations (operators/sq.py) — the
second compression family next to PQ (reference codec surface C1-C5,
vervectordb/__init__.py:152-218; SQ itself is beyond the reference, the
FAISS-ScalarQuantizer/Milvus-SQ8 counterpart).

Oracle pattern: unlike PQ (whose MLlib-fit codebooks need FREEZING to
replay), SQ8's entire training state is a per-dimension min/max aggregate
— DuckDB recomputes it from the same corpus, so fit + encode + decode +
quantized-domain search replay bit-exactly end to end with NO frozen
inputs. All arithmetic is double in the written order; rounding is
floor(z + 0.5) in both engines (round() half-conventions differ).

  sq8_encode_roundtrip   codes + reconstruction + the |err| <= scale/2
                         bound as a gated boolean
  sq8_search_adc         asymmetric search: full-precision query scored
                         against reconstructions, exact top-k rerank
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.queries import _cos, _query_vec, query
from vervectordb_spark.schema import load_table

_DIM = 64

#: DuckDB twin of operators.sq.fit_sq_stats (0-based pos)
_STATS_SQL = f"""
  SELECT t.pos::INT AS pos,
         MIN((e.embedding::DOUBLE[])[t.pos + 1]) AS mn,
         MAX((e.embedding::DOUBLE[])[t.pos + 1]) AS mx
  FROM embeddings e CROSS JOIN range({_DIM}) t(pos)
  GROUP BY 1
"""

#: DuckDB twin of operators.sq.encode_expr / decode_expr, per element
_CODED_SQL = """
  SELECT e.vec_id, s.pos, s.mn, s.mx,
         (e.embedding::DOUBLE[])[s.pos + 1] AS x,
         CASE WHEN s.mx = s.mn THEN 0.0
              ELSE (s.mx - s.mn) / 255.0 END AS scale,
         CASE WHEN s.mx = s.mn THEN 0
              ELSE CAST(GREATEST(0.0, LEAST(255.0,
                   FLOOR(((e.embedding::DOUBLE[])[s.pos + 1] - s.mn)
                         / ((s.mx - s.mn) / 255.0) + 0.5))) AS INT)
         END AS code
  FROM embeddings e CROSS JOIN stats s
"""

_RECON_SQL = """
  SELECT vec_id, pos, x, code, scale,
         mn + code * scale AS xr
  FROM coded
"""


@query(
    "sq8_encode_roundtrip",
    oracle=f"""
WITH stats AS ({_STATS_SQL}),
coded AS ({_CODED_SQL}),
recon AS ({_RECON_SQL})
SELECT vec_id,
       CAST(SUM(code) AS BIGINT) AS code_sum,
       CAST(MAX(CASE WHEN pos = 0 THEN code END) AS INT) AS c0,
       ROUND(MAX(CASE WHEN pos = 0 THEN xr END), 6) AS r0,
       BOOL_AND(ABS(x - xr) <= scale * 0.5 + 1e-12) AS within_half_step
FROM recon
GROUP BY vec_id
""",
)
def sq8_encode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 fit -> encode -> decode over the whole embeddings fixture, with
    the codec's defining guarantee — per-dimension reconstruction error at
    most half a quantization step — asserted as a gated boolean (a false
    anywhere breaks the hash match). `code_sum`/`c0`/`r0` pin the actual
    codes and reconstructions, not just the bound."""
    from vervectordb_spark.operators import sq

    emb = load_table(spark, sf_dir, "embeddings")
    stats = sq.fit_sq_stats(emb)
    coded = sq.with_codes(emb, stats)
    recon = sq.with_reconstruction(coded, stats)
    # per-dim |x - xr| <= scale/2: three aligned arrays folded into one bool
    scales = F.zip_with(
        F.col("mns"), F.col("mxs"),
        lambda mn, mx: F.when(mx == mn, F.lit(0.0)).otherwise(
            (mx - mn) / 255.0
        ),
    )
    errs = F.zip_with(
        F.col("embedding").cast("array<double>"), F.col("sq_recon"),
        lambda x, r: F.abs(x - r),
    )
    ok = F.forall(
        F.zip_with(errs, scales, lambda e, s: e <= s * 0.5 + 1e-12),
        lambda b: b,
    )
    return (
        recon.crossJoin(F.broadcast(sq.stats_row(stats)))
        .select(
            "vec_id",
            F.aggregate(
                F.col("sq_code"), F.lit(0).cast("bigint"),
                lambda acc, c: acc + c.cast("bigint"),
            ).alias("code_sum"),
            F.element_at("sq_code", 1).cast("int").alias("c0"),
            F.round(F.element_at("sq_recon", 1), 6).alias("r0"),
            ok.alias("within_half_step"),
        )
    )


@query(
    "sq8_search_adc",
    oracle=f"""
WITH stats AS ({_STATS_SQL}),
coded AS ({_CODED_SQL}),
recon AS ({_RECON_SQL}),
rvec AS (
  SELECT vec_id, list(xr ORDER BY pos) AS rv FROM recon GROUP BY vec_id
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT r.vec_id, {_cos('r.rv', 'q.qv')} AS sim_q
  FROM rvec r CROSS JOIN q
),
cand AS (SELECT vec_id FROM scored ORDER BY sim_q DESC, vec_id LIMIT 30)
SELECT vec_id, ROUND(sim, 6) AS sim FROM (
  SELECT e.vec_id, {_cos('e.embedding::DOUBLE[]', 'q.qv')} AS sim
  FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q
  ORDER BY sim DESC, e.vec_id LIMIT 10
)
""",
)
def sq8_search_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric SQ8 search: the query keeps full precision, the corpus
    is scanned as uint8 codes reconstructed inside the scoring fold (1/4
    the bytes of the raw scan), top-30 by quantized-domain cosine via
    TakeOrderedAndProject, then the exact rerank re-scores ONLY those 30
    against raw vectors. Same probe->rerank shape as IVF-PQ ADC
    (operators/ivf.py) with a one-aggregate codec behind it."""
    from vervectordb_spark.operators import sq

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    stats = sq.fit_sq_stats(emb)
    out = sq.adc_search(emb, stats, qv, top_k=10, rerank_factor=3,
                        scorer="expr")
    return out.select("vec_id", F.round("sim", 6).alias("sim"))


_NPROBE = 8


@query(
    "ivfsq_search_adc",
    oracle=f"""
WITH stats AS ({_STATS_SQL}),
coded AS ({_CODED_SQL}),
recon AS ({_RECON_SQL}),
rvec AS (
  SELECT vec_id, list(xr ORDER BY pos) AS rv FROM recon GROUP BY vec_id
),
cent AS (
  SELECT vec_id::INTEGER AS cluster_id, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < 16
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
assign AS (
  SELECT e.vec_id, c.cluster_id,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_cos('e.embedding::DOUBLE[]', 'c.cv')} DESC,
                    c.cluster_id
         ) AS rk
  FROM embeddings e CROSS JOIN cent c
),
assigned AS (SELECT vec_id, cluster_id FROM assign WHERE rk = 1),
probed AS (
  SELECT c.cluster_id FROM cent c CROSS JOIN q
  ORDER BY {_cos('c.cv', 'q.qv')} DESC, c.cluster_id
  LIMIT {_NPROBE}
),
scored AS (
  SELECT r.vec_id, {_cos('r.rv', 'q.qv')} AS sim_q
  FROM rvec r
  JOIN assigned a ON a.vec_id = r.vec_id
  CROSS JOIN q
  WHERE a.cluster_id IN (SELECT cluster_id FROM probed)
),
cand AS (SELECT vec_id FROM scored ORDER BY sim_q DESC, vec_id LIMIT 30)
SELECT vec_id, ROUND(sim, 6) AS sim FROM (
  SELECT e.vec_id, {_cos('e.embedding::DOUBLE[]', 'q.qv')} AS sim
  FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q
  ORDER BY sim DESC, e.vec_id LIMIT 10
)
""",
)
def ivfsq_search_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ8 composed serving (the FAISS IVF_SQ8 index class) —
    completing the index x codec matrix next to IVF-flat, IVF-PQ raw,
    and IVF-PQ residual: probe nprobe=8 of 16 frozen centroids
    (partition-prunable cluster filter), SQ8 quantized-domain cosine over
    ONLY the probed clusters' uint8 codes (1/4 scan bytes of the probed
    subset), top-30 via TakeOrderedAndProject, exact rerank within the
    probed set. Both stages replay bit-exactly: the codec from the
    min/max aggregate, the probe from the frozen-centroid fold."""
    from vervectordb_spark.functions.similarity import to_double
    from vervectordb_spark.operators import sq
    from vervectordb_spark.operators.ivf import IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("cluster_id"),
        to_double(F.col("embedding")).alias("centroid"),
    )
    idx = IVFIndex.from_centroids(emb, cent)
    stats = sq.fit_sq_stats(emb)
    probes = idx.probe_clusters_exact(qv, nprobe=_NPROBE)
    probed = idx.assigned.filter(F.col("cluster_id").isin(probes))
    out = sq.adc_search(probed, stats, qv, top_k=10, rerank_factor=3,
                        scorer="expr")
    return out.select("vec_id", F.round("sim", 6).alias("sim"))
