"""Hybrid retrieval queries (operators/hybrid.py) with DuckDB oracles.

The fused score is reciprocal-rank based, so the only floats crossing the
hash gate are ROUND(sim, 6) (the established cosine contract) and
1/(k+rank) sums over integer ranks computed in a fixed order — bit-exact
on both engines. BM25's ln() is NOT oracle-gated (libm drift); it is
pinned by tests/test_hybrid.py against an independent NumPy computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.operators import hybrid as H
from vervectordb_spark.queries import _Q0, _cos, query, _query_vec
from vervectordb_spark.schema import load_table

_TERMS = ("spark", "window", "join")

#: DuckDB twin of dedup.tokens_expr over the documents view
_DOC_TOKS = r"list_filter(regexp_split_to_array(lower(d.text), '[ \t\n\x0B\f\r]+'), x -> x <> '')"

_KW_SCORE = " + ".join(
    f"len(list_filter({_DOC_TOKS}, x -> x = '{t}'))" for t in _TERMS
)


@query(
    "hybrid_search_rrf",
    oracle=f"""
WITH q AS ({_Q0}),
kw AS (
  SELECT d.doc_id, CAST({_KW_SCORE} AS BIGINT) AS kw_score
  FROM documents d
),
kw_top AS (
  SELECT doc_id, kw_score FROM kw WHERE kw_score > 0
  ORDER BY kw_score DESC, doc_id LIMIT 50
),
kw_r AS (
  SELECT doc_id, kw_score,
    ROW_NUMBER() OVER (ORDER BY kw_score DESC, doc_id) AS kw_rank
  FROM kw_top
),
vec AS (
  SELECT e.vec_id, {_cos("e.embedding::DOUBLE[]", "q.qv")} AS sim
  FROM embeddings e CROSS JOIN q
),
vec_top AS (
  SELECT vec_id, sim FROM vec ORDER BY sim DESC, vec_id LIMIT 50
),
vec_r AS (
  SELECT vec_id, sim,
    ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS vec_rank
  FROM vec_top
)
SELECT COALESCE(k.doc_id, v.vec_id) AS doc_id,
  COALESCE(k.kw_score, CAST(-1 AS BIGINT)) AS kw_score,
  COALESCE(k.kw_rank, CAST(-1 AS BIGINT)) AS kw_rank,
  COALESCE(ROUND(v.sim, 6), CAST(-2 AS DOUBLE)) AS sim,
  COALESCE(v.vec_rank, CAST(-1 AS BIGINT)) AS vec_rank,
  COALESCE(CAST(1 AS DOUBLE) / (60 + k.kw_rank), CAST(0 AS DOUBLE))
    + COALESCE(CAST(1 AS DOUBLE) / (60 + v.vec_rank), CAST(0 AS DOUBLE))
    AS rrf_score
FROM kw_r k FULL OUTER JOIN vec_r v ON k.doc_id = v.vec_id
ORDER BY rrf_score DESC, doc_id
LIMIT 10
""",
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+dense retrieval, RRF-fused: integer term-frequency
    top-50 over documents.text, exact cosine top-50 over
    embeddings.embedding (query = vec_id 0, the house query vector), fused
    as 1/(60+rank) sums, top-10. Each candidate side is one
    TakeOrderedAndProject over its scan; the only windows run on the two
    50-row candidate sets."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    return H.hybrid_search(
        docs, emb, list(_TERMS), qv, n_candidates=50, top_k=10, rrf_k=60
    )


@query(
    "keyword_topk_tf",
    oracle=f"""
WITH kw AS (
  SELECT d.doc_id, CAST({_KW_SCORE} AS BIGINT) AS kw_score
  FROM documents d
)
SELECT doc_id, kw_score FROM kw WHERE kw_score > 0
ORDER BY kw_score DESC, doc_id LIMIT 20
""",
)
def keyword_topk_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-only retrieval: total query-term frequency (integer,
    map-only array filters — no explode, no shuffle before the bounded
    top-k)."""
    docs = load_table(spark, sf_dir, "documents")
    return H.keyword_topk(docs, list(_TERMS), top_k=20)


# ---------------------------------------------------------------------------
# batched hybrid: 3 queries, per-query term lists, one plan
# ---------------------------------------------------------------------------

_BATCH_TERMS = [
    (0, "spark"), (0, "window"),
    (1, "join"), (1, "query"),
    (2, "scan"), (2, "batch"),
]

_TERMS_VALUES = ", ".join(f"({q}, '{t}')" for q, t in _BATCH_TERMS)


@query(
    "hybrid_batch_rrf",
    oracle=f"""
WITH terms(tq, term) AS (VALUES {_TERMS_VALUES}),
qs AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 3
),
tok AS (
  SELECT d.doc_id, unnest({_DOC_TOKS}) AS term FROM documents d
),
kw AS (
  SELECT t.tq AS query_id, k.doc_id, COUNT(*)::BIGINT AS kw_score
  FROM tok k JOIN terms t ON k.term = t.term
  GROUP BY t.tq, k.doc_id
),
kw_r AS (
  SELECT * FROM (
    SELECT query_id, doc_id, kw_score,
      ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY kw_score DESC, doc_id) AS kw_rank
    FROM kw
  ) WHERE kw_rank <= 50
),
vec AS (
  SELECT q.query_id, e.vec_id,
    {_cos("e.embedding::DOUBLE[]", "q.qv")} AS sim
  FROM embeddings e CROSS JOIN qs q
),
vec_r AS (
  SELECT * FROM (
    SELECT query_id, vec_id, sim,
      ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY sim DESC, vec_id) AS vec_rank
    FROM vec
  ) WHERE vec_rank <= 50
),
fused AS (
  SELECT CAST(COALESCE(k.query_id, v.query_id) AS BIGINT) AS query_id,
    COALESCE(k.doc_id, v.vec_id) AS doc_id,
    COALESCE(k.kw_score, CAST(-1 AS BIGINT)) AS kw_score,
    COALESCE(k.kw_rank, CAST(-1 AS BIGINT)) AS kw_rank,
    COALESCE(ROUND(v.sim, 6), CAST(-2 AS DOUBLE)) AS sim,
    COALESCE(v.vec_rank, CAST(-1 AS BIGINT)) AS vec_rank,
    COALESCE(CAST(1 AS DOUBLE) / (60 + k.kw_rank), CAST(0 AS DOUBLE))
      + COALESCE(CAST(1 AS DOUBLE) / (60 + v.vec_rank), CAST(0 AS DOUBLE))
      AS rrf_score
  FROM kw_r k FULL OUTER JOIN vec_r v
    ON k.query_id = v.query_id AND k.doc_id = v.vec_id
)
SELECT * FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, doc_id) AS rank
  FROM fused
) WHERE rank <= 10
""",
)
def hybrid_batch_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three hybrid queries in ONE plan: batched lexical top-50 (token
    explode → broadcast term join → one (query, doc) count shuffle),
    batched dense top-50 (fold kernel — the bit-exact oracle path), RRF
    fusion, per-query final rank. Every window partitions by query_id."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    term_table = spark.createDataFrame(
        _BATCH_TERMS, "query_id long, term string"
    )
    queries = emb.filter(emb.vec_id < 3).select(
        emb.vec_id.alias("query_id"),
        emb.embedding.alias("q_embedding"),
    )
    return H.hybrid_search_batch(
        docs, emb, term_table, queries,
        n_candidates=50, top_k=10, rrf_k=60, kernel="fold",
    )


# ---------------------------------------------------------------------------
# retrieval pipeline e2e: token gate → hash-embed → hybrid RRF, one plan
# ---------------------------------------------------------------------------

from vervectordb_spark.functions.oracle_fragments import (  # noqa: E402
    TOKS as _DOCTOKS_PLAIN)
from vervectordb_spark.functions.oracle_fragments import (  # noqa: E402
    EMBED_DIM as _DIM)
from vervectordb_spark.functions.oracle_fragments import (  # noqa: E402
    embed_sql as _embed_sql_of)

_EMBED_SQL = _embed_sql_of(_DIM)

#: the gated-corpus twin of queries_embed._EMBED_SQL
_EMBED_GATED_SQL = _EMBED_SQL.replace("FROM documents", "FROM gated")

_E2E_TERMS = ("spark", "window")
_E2E_KW = " + ".join(
    f"len(list_filter({_DOC_TOKS}, x -> x = '{t}'))" for t in _E2E_TERMS
)


@query(
    "retrieval_pipeline_e2e",
    oracle=f"""
WITH gated AS (
  SELECT doc_id, text FROM documents
  WHERE len({_DOCTOKS_PLAIN}) >= 20 AND len({_DOCTOKS_PLAIN}) <= 1000
),
emb AS ({_EMBED_GATED_SQL}),
q AS (
  SELECT ne AS qv FROM ({_EMBED_SQL}) WHERE vec_id = 0
),
kw AS (
  SELECT d.doc_id, CAST({_E2E_KW} AS BIGINT) AS kw_score
  FROM gated d
),
kw_top AS (
  SELECT doc_id, kw_score FROM kw WHERE kw_score > 0
  ORDER BY kw_score DESC, doc_id LIMIT 20
),
kw_r AS (
  SELECT doc_id, kw_score,
    ROW_NUMBER() OVER (ORDER BY kw_score DESC, doc_id) AS kw_rank
  FROM kw_top
),
vec AS (
  SELECT e.vec_id, {_cos("e.ne", "q.qv")} AS sim
  FROM emb e CROSS JOIN q
),
vec_top AS (
  SELECT vec_id, sim FROM vec ORDER BY sim DESC, vec_id LIMIT 20
),
vec_r AS (
  SELECT vec_id, sim,
    ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS vec_rank
  FROM vec_top
)
SELECT COALESCE(k.doc_id, v.vec_id) AS doc_id,
  COALESCE(k.kw_rank, CAST(-1 AS BIGINT)) AS kw_rank,
  COALESCE(ROUND(v.sim, 6), CAST(-2 AS DOUBLE)) AS sim,
  COALESCE(v.vec_rank, CAST(-1 AS BIGINT)) AS vec_rank,
  COALESCE(CAST(1 AS DOUBLE) / (60 + k.kw_rank), CAST(0 AS DOUBLE))
    + COALESCE(CAST(1 AS DOUBLE) / (60 + v.vec_rank), CAST(0 AS DOUBLE))
    AS rrf_score
FROM kw_r k FULL OUTER JOIN vec_r v ON k.doc_id = v.vec_id
ORDER BY rrf_score DESC, doc_id
LIMIT 10
""",
)
def retrieval_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval-side composition proof (the sibling of
    corpus_pipeline_e2e's curation chain): token-count gate → CJK-aware
    hashed-BoW embedding of the gated corpus → hybrid lexical+dense
    retrieval with RRF — ONE lazy plan end-to-end (the query embedding is
    the only materialized scalar), fully replayed on DuckDB. The gate
    prunes before the embed projection, the embed is a scan-side
    expression, each candidate side is a bounded TakeOrderedAndProject."""
    from vervectordb_spark.operators.embed import embed_documents
    from vervectordb_spark.operators.text import n_tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    gated = docs.filter(
        (n_tokens_expr("text") >= 20) & (n_tokens_expr("text") <= 1000)
    )
    emb = embed_documents(gated, dim=_DIM).withColumnRenamed(
        "vec_id", "doc_id")
    qv = [
        float(x)
        for x in embed_documents(docs, dim=_DIM)
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0][0]
    ]
    out = H.hybrid_search(
        gated, emb.withColumnRenamed("doc_id", "vec_id"),
        list(_E2E_TERMS), qv, n_candidates=20, top_k=10, rrf_k=60,
    )
    return out.drop("kw_score")


# ---------------------------------------------------------------------------
# cross-encoder rerank, REAL trained tier (round-10): keyword top-50
# candidates rescored by the vendored pairwise logistic model, ranked by
# the exact linear logit. The oracle replays the WHOLE chain — candidate
# selection, the query's own checkpoint embedding from its literal text,
# every interaction feature, and the n/2^20 weight arithmetic.
# ---------------------------------------------------------------------------

from vervectordb_spark.functions.oracle_fragments import (  # noqa: E402
    ckpt_embed_sql as _ckpt_embed_sql_of)
from vervectordb_spark.operators.hybrid import (  # noqa: E402
    load_ce_weights as _load_ce_weights)
from vervectordb_spark.operators.embed import (  # noqa: E402
    checkpoint_parquet_path as _ckpt_path_of)

_CE_QTEXT = "spark table scan fast"
_CE_TERMS = tuple(_CE_QTEXT.split())
_CE_KW = " + ".join(
    f"len(list_filter({_DOC_TOKS}, x -> x = '{t}'))" for t in _CE_TERMS)
_CE_TOKS = r"list_filter(regexp_split_to_array(lower(c.text), '[ \t\n\x0B\f\r]+'), x -> x <> '')"
_CE_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in _CE_TERMS) + "]"
_CE_TF = " + ".join(
    f"len(list_filter({_CE_TOKS}, x -> x = '{t}'))" for t in _CE_TERMS)
_CE_W = _load_ce_weights()
_CE_DEN = float(1 << _CE_W["denom_shift"])


def _ce_w_sql(i: int) -> str:
    return f"({_CE_W['w_num'][i]}::DOUBLE / {int(_CE_DEN)}.0)"


_CE_B_SQL = f"({_CE_W['b_num']}::DOUBLE / {int(_CE_DEN)}.0)"


@query(
    "hybrid_ce_rerank",
    oracle=f"""
WITH cand AS (
  SELECT doc_id FROM (
    SELECT d.doc_id, CAST({_CE_KW} AS BIGINT) AS tf FROM documents d
  ) WHERE tf > 0 ORDER BY tf DESC, doc_id LIMIT 50
),
cdocs AS (SELECT d.doc_id, d.text FROM documents d JOIN cand USING (doc_id)),
emb AS ({_ckpt_embed_sql_of(_ckpt_path_of(), 16, src='cdocs')}),
qdoc AS (SELECT 0::BIGINT AS doc_id, '{_CE_QTEXT}' AS text),
qemb AS ({_ckpt_embed_sql_of(_ckpt_path_of(), 16, src='qdoc')}),
feat AS (
  SELECT c.doc_id,
         {_cos('e.ne', 'q.ne')} AS f1,
         len(list_intersect(list_distinct({_CE_TOKS}),
                            {_CE_TERMS_SQL}))::DOUBLE
           / {float(len(_CE_TERMS))} AS f2,
         CAST({_CE_TF} AS BIGINT)::DOUBLE
           / (1.0 + len({_CE_TOKS})::DOUBLE) AS f3,
         len({_CE_TOKS})::DOUBLE
           / (len({_CE_TOKS})::DOUBLE + 100.0) AS f4
  FROM cdocs c
  JOIN emb e ON e.vec_id = c.doc_id
  CROSS JOIN qemb q
)
SELECT doc_id,
       ROUND({_CE_B_SQL} + {_ce_w_sql(0)} * f1 + {_ce_w_sql(1)} * f2
             + {_ce_w_sql(2)} * f3 + {_ce_w_sql(3)} * f4, 6) AS ce_score
FROM feat ORDER BY ce_score DESC, doc_id LIMIT 10
""",
)
def hybrid_ce_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL trained cross-encoder rerank (operators/hybrid.
    rerank_checkpoint_ce): keyword top-50 candidates, each (query, doc)
    pair scored jointly by the vendored pairwise logistic model —
    checkpoint-embedding cosine, distinct-term overlap, tf density,
    brevity — ranked by the exact linear logit (n/2^20 weights, single
    divisions, fixed-order multiply-adds). The whole chain is
    hash-gated: candidates, the query's own embedding replayed from its
    literal text, features, and weights."""
    docs = load_table(spark, sf_dir, "documents")
    cand = H.keyword_topk(docs, list(_CE_TERMS), top_k=50)
    cdocs = docs.join(cand.select("doc_id"), on="doc_id")
    return H.rerank_checkpoint_ce(cdocs, _CE_QTEXT, top_k=10)
