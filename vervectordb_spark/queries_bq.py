"""Binary-quantization query registrations (operators/bq.py) — the third
compression family next to PQ and SQ8 (reference codec surface C1-C5,
vervectordb/__init__.py:152-218; BQ itself is beyond the reference — the
FAISS-binary-index / Milvus-BIN_FLAT counterpart).

Oracle pattern: like SQ8, the entire training state is an
order-independent aggregate (per-dimension min/max -> midrange
threshold), so DuckDB recomputes identical thresholds from the same
corpus and fit -> encode -> pack -> Hamming search replay bit-exactly
with NO frozen inputs. Thresholding is a comparison and packing is exact
integer arithmetic — there is no float drift anywhere before the final
(rounded) rerank cosine.

  bq_code_profile      the packed 60-bit words + popcount per vector —
                       pins the exact codes, not a summary
  bq_search_hamming    end-to-end serving: Hamming candidates -> exact
                       cosine rerank
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.queries import _cos, _query_vec, query
from vervectordb_spark.schema import load_table

_DIM = 64
_W = 60  # bq.BITS_PER_WORD

#: DuckDB twin of operators.bq.fit_bq_thresholds (0-based pos)
_THR_SQL = f"""
  SELECT t.pos::INT AS pos,
         (MIN((e.embedding::DOUBLE[])[t.pos + 1])
          + MAX((e.embedding::DOUBLE[])[t.pos + 1])) / 2.0 AS thr
  FROM embeddings e CROSS JOIN range({_DIM}) t(pos)
  GROUP BY 1
"""

#: DuckDB twin of operators.bq.encode_expr: strict >, 60-bit word pack.
#: Bit positions are disjoint so SUM(b << shift) == the OR-fold.
_WORDS_SQL = f"""
  SELECT e.vec_id, (s.pos // {_W})::INT AS w,
         CAST(SUM(CASE WHEN (e.embedding::DOUBLE[])[s.pos + 1] > s.thr
                       THEN 1::BIGINT << (s.pos % {_W}) ELSE 0 END)
              AS BIGINT) AS word
  FROM embeddings e CROSS JOIN thr s
  GROUP BY 1, 2
"""


@query(
    "bq_code_profile",
    oracle=f"""
WITH thr AS ({_THR_SQL}),
words AS ({_WORDS_SQL})
SELECT vec_id,
       CAST(MAX(CASE WHEN w = 0 THEN word END) AS BIGINT) AS w0,
       CAST(MAX(CASE WHEN w = 1 THEN word END) AS BIGINT) AS w1,
       CAST(SUM(bit_count(word)) AS BIGINT) AS popcnt
FROM words
GROUP BY vec_id
""",
)
def bq_code_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQ fit -> encode over the whole embeddings fixture: both packed
    words and the per-vector set-bit count cross the hash gate, pinning
    the exact bit pattern of every code (dim=64 -> words of 60 + 4
    bits)."""
    from vervectordb_spark.operators import bq

    emb = load_table(spark, sf_dir, "embeddings")
    thr = bq.fit_bq_thresholds(emb)
    coded = bq.with_codes(emb, thr, _DIM)
    return coded.select(
        "vec_id",
        F.element_at("bq_code", 1).alias("w0"),
        F.element_at("bq_code", 2).alias("w1"),
        F.aggregate(
            "bq_code", F.lit(0).cast("bigint"),
            lambda acc, w: acc + F.bit_count(w).cast("bigint"),
        ).alias("popcnt"),
    )


@query(
    "bq_search_hamming",
    oracle=f"""
WITH thr AS ({_THR_SQL}),
words AS ({_WORDS_SQL}),
qwords AS (SELECT w, word FROM words WHERE vec_id = 0),
ham AS (
  SELECT wo.vec_id,
         CAST(SUM(bit_count(xor(wo.word, qw.word))) AS BIGINT) AS hamming
  FROM words wo JOIN qwords qw USING (w)
  GROUP BY wo.vec_id
),
cand AS (SELECT vec_id, hamming FROM ham ORDER BY hamming, vec_id LIMIT 30),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, hamming, ROUND(sim, 6) AS sim FROM (
  SELECT e.vec_id, c.hamming,
         {_cos('e.embedding::DOUBLE[]', 'q.qv')} AS sim
  FROM embeddings e JOIN cand c USING (vec_id) CROSS JOIN q
  ORDER BY sim DESC, e.vec_id LIMIT 10
)
""",
)
def bq_search_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end BQ serving: the corpus is scanned as 2 BIGINTs per row
    (1/16 of raw bytes) with the Hamming distance computed entirely in
    integer codegen, top-30 candidates by (hamming ASC, id ASC) via
    TakeOrderedAndProject, then the exact cosine rerank re-scores ONLY
    those 30 against raw vectors. Both the Hamming distances and the
    final sims cross the hash gate."""
    from vervectordb_spark.operators import bq

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    thr = bq.fit_bq_thresholds(emb)
    out = bq.hamming_search(emb, thr, qv, top_k=10, rerank_factor=3)
    return out.select("vec_id", "hamming", F.round("sim", 6).alias("sim"))


_NPROBE = 8


@query(
    "ivfbq_search_hamming",
    oracle=f"""
WITH thr AS ({_THR_SQL}),
words AS ({_WORDS_SQL}),
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
qwords AS (SELECT w, word FROM words WHERE vec_id = 0),
ham AS (
  SELECT wo.vec_id,
         CAST(SUM(bit_count(xor(wo.word, qw.word))) AS BIGINT) AS hamming
  FROM words wo JOIN qwords qw USING (w)
  JOIN assigned a ON a.vec_id = wo.vec_id
  WHERE a.cluster_id IN (SELECT cluster_id FROM probed)
  GROUP BY wo.vec_id
),
cand AS (SELECT vec_id, hamming FROM ham ORDER BY hamming, vec_id LIMIT 30)
SELECT vec_id, hamming, ROUND(sim, 6) AS sim FROM (
  SELECT e.vec_id, c.hamming,
         {_cos('e.embedding::DOUBLE[]', 'q.qv')} AS sim
  FROM embeddings e JOIN cand c USING (vec_id) CROSS JOIN q
  ORDER BY sim DESC, e.vec_id LIMIT 10
)
""",
)
def ivfbq_search_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-BQ composed serving — the last cell of the index x codec
    matrix (next to IVF-flat, IVF-PQ raw/residual, IVF-SQ8, flat-SQ8,
    flat-BQ): probe nprobe=8 of 16 frozen centroids (partition-prunable
    cluster filter), integer bit_count(xor) Hamming scan over ONLY the
    probed clusters' packed sign words (2 BIGINTs/row on 1/2 the
    corpus), top-30 via TakeOrderedAndProject, exact cosine rerank
    within the probed set. Thresholds fit on the FULL corpus (codec
    state is probe-independent, so one codec serves every probe set);
    probe, Hamming distances, and final sims all replay bit-exactly."""
    from vervectordb_spark.functions.similarity import to_double
    from vervectordb_spark.operators import bq
    from vervectordb_spark.operators.ivf import IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("cluster_id"),
        to_double(F.col("embedding")).alias("centroid"),
    )
    idx = IVFIndex.from_centroids(emb, cent)
    thr = bq.fit_bq_thresholds(emb)
    probes = idx.probe_clusters_exact(qv, nprobe=_NPROBE)
    probed = idx.assigned.filter(F.col("cluster_id").isin(probes))
    out = bq.hamming_search(probed, thr, qv, top_k=10, rerank_factor=3)
    return out.select("vec_id", "hamming", F.round("sim", 6).alias("sim"))
