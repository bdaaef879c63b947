"""S6 pipeline query: text → hashed-BoW embedding → store → cosine top-k.

End-to-end twin of the reference's intended (never-implemented) RAG
pipeline (SURVEY.md §2.1 S6). Every stage — CJK-aware tokenization, md5
bucket hashing, count vectorization, L2 normalization, float32 storage
rounding, cosine ranking — is replayed bit-exactly by DuckDB (the float32
storage cast is mirrored with ::FLOAT[] so both engines rank the same
rounded vectors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.queries import _cos, query
from vervectordb_spark.schema import load_table

from vervectordb_spark.functions.oracle_fragments import EMBED_DIM as _DIM

#: CJK chars spaced out, then whitespace tokens (== embed.mixed_tokens_expr)
_MIXED_TOKS = (
    r"list_filter(regexp_split_to_array(lower("
    r"regexp_replace(text, '([\x{4e00}-\x{9fff}])', ' \1 ', 'g')"
    r"), '[ \t\n\x0B\f\r]+'), x -> x <> '')"
)

_MD5 = "(('0x' || substr(md5(t), 1, 15))::BIGINT)"

#: single-sourced in functions/oracle_fragments (leaf; shared with
#: queries_hybrid — the import-order rationale lives there)
from vervectordb_spark.functions.oracle_fragments import (  # noqa: E402
    embed_sql as _embed_sql)

_EMBED_SQL = _embed_sql(_DIM)


@query(
    "text_embed_topk",
    oracle=f"""
WITH emb AS ({_EMBED_SQL}),
q AS (SELECT ne AS qv FROM emb WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, {_cos('e.ne', 'q.qv')} AS sim
  FROM emb e CROSS JOIN q
)
SELECT vec_id, ROUND(sim, 6) AS sim
FROM (SELECT * FROM scored ORDER BY sim DESC, vec_id LIMIT 10)
""",
)
def text_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read text → tokenize (CJK-aware) → hash-embed → store (float32) →
    exact cosine top-10 for the doc-0 embedding. One declarative plan:
    the embedding is a scan-side projection, the search is the standard
    TakeOrderedAndProject kernel."""
    from vervectordb_spark.operators.embed import embed_documents
    from vervectordb_spark.operators.search import brute_force_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = embed_documents(docs, dim=_DIM)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    out = brute_force_topk(emb, qv, top_k=10)
    return out.select("vec_id", F.round("sim", 6).alias("sim"))


# ---------------------------------------------------------------------------
# real-model tier: the vendored int8 SGNS checkpoint, hash-gated. The
# oracle replays the exact inference — vocab lookup, ORDER-FREE integer
# sum (int8 rows, exact in int64/float64), L2 normalize, float32 round —
# against the committed checkpoint parquet read by absolute path. This is
# S6's real-model slot proven end-to-end, not the hashed-BoW fake
# (round-9 verdict task #3; the reference only DECLARED its model:
# /root/reference/pyproject.toml:7-13, scripts/model_download.sh:1).
# ---------------------------------------------------------------------------

from vervectordb_spark.operators.embed import (  # noqa: E402
    checkpoint_parquet_path as _checkpoint_path)


_CKPT_DIM = 16

from vervectordb_spark.functions.oracle_fragments import (  # noqa: E402
    ckpt_embed_sql as _ckpt_embed_sql)


@query(
    "text_embed_checkpoint",
    oracle=f"""
SELECT vec_id, ne AS embedding
FROM ({_ckpt_embed_sql(_checkpoint_path(), _CKPT_DIM)})
""",
)
def text_embed_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-model S6: vendored int8 word2vec checkpoint → broadcast →
    mapInPandas batched inference → (vec_id, embedding). Map-only.
    The store column is float32; the comparator-facing projection widens
    to double (exact) so the value reprs line up with the DOUBLE[]
    oracle — same convention as every sim column."""
    from vervectordb_spark.operators.embed import checkpoint_embedding

    docs = load_table(spark, sf_dir, "documents")
    return checkpoint_embedding(docs).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))


# ---------------------------------------------------------------------------
# chunk-level retrieval with per-doc max-sim — the long-document pattern:
# embed overlapping chunks, score chunks, return docs by their best chunk.
# ---------------------------------------------------------------------------

_CH, _OV = 40, 10
_STRIDE = _CH - _OV


def _mixed_toks_sql(col: str) -> str:
    """== queries_embed._MIXED_TOKS, parameterized by column."""
    return (
        r"list_filter(regexp_split_to_array(lower("
        + f"regexp_replace({col}, '([\\x{{4e00}}-\\x{{9fff}}])', ' \\1 ', 'g')"
        + r"), '[ \t\n\x0B\f\r]+'), x -> x <> '')"
    )


#: embed chain over a (chunk_key, chunk_text) relation named `chunks`
_CHUNK_EMBED_SQL = f"""
  SELECT chunk_key AS vec_id,
    list_transform(CASE WHEN nrm = 0 THEN counts
                        ELSE list_transform(counts, x -> x / nrm) END,
                   x -> x::FLOAT)::DOUBLE[] AS ne
  FROM (
    SELECT chunk_key, counts, sqrt(list_dot_product(counts, counts)) AS nrm
    FROM (
      SELECT chunk_key,
        list_transform(range(0, {_DIM}),
          i -> len(list_filter(bks, b -> b = i))::DOUBLE) AS counts
      FROM (
        SELECT chunk_key,
          list_transform({_mixed_toks_sql('chunk_text')}, t -> {_MD5} % {_DIM}) AS bks
        FROM chunks
      )
    )
  )
"""

_PLAIN_TOKS = r"list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '')"


@query(
    "chunk_retrieval_maxsim",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_PLAIN_TOKS} AS toks FROM documents WHERE doc_id < 500
),
n AS (
  SELECT doc_id, toks,
    GREATEST(1, CAST((len(toks) - {_OV} + {_STRIDE - 1}) // {_STRIDE} AS INT)) AS nc
  FROM t
),
chunks AS (
  SELECT doc_id * 1000 + chunk_id AS chunk_key,
    array_to_string(list_slice(toks, chunk_id * {_STRIDE} + 1,
                               chunk_id * {_STRIDE} + {_CH}), ' ') AS chunk_text
  FROM (SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_id FROM n)
),
cemb AS ({_CHUNK_EMBED_SQL}),
q AS (SELECT ne AS qv FROM cemb WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id // 1000 AS doc_id, {_cos('e.ne', 'q.qv')} AS sim
  FROM cemb e CROSS JOIN q
),
best AS (
  SELECT doc_id, ROUND(MAX(sim), 6) AS best_sim, COUNT(*) AS n_chunks
  FROM scored GROUP BY doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, best_sim, n_chunks
FROM best ORDER BY best_sim DESC, doc_id LIMIT 10
""",
)
def chunk_retrieval_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document retrieval: chunk (40-token windows, 10 overlap) →
    hash-embed each chunk → cosine vs the query chunk → per-DOC max over
    its chunks → top-10 docs. The chunk table is a map-only projection;
    the doc rollup is one grouped max (sim floats are bit-exact, so max
    is engine-stable); top-10 via TakeOrderedAndProject."""
    from vervectordb_spark.operators.embed import embed_documents
    from vervectordb_spark.operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    chunks = chunk_documents(docs, chunk_tokens=_CH, overlap=_OV).withColumn(
        "chunk_key", F.col("doc_id") * 1000 + F.col("chunk_id")
    )
    cemb = embed_documents(
        chunks, dim=_DIM, text_col="chunk_text", id_col="chunk_key"
    )
    qv = [
        float(x)
        for x in cemb.filter(F.col("vec_id") == 0)
        .select("embedding").collect()[0][0]
    ]
    from vervectordb_spark.functions.similarity import cosine_expr

    scored = cemb.select(
        (F.col("vec_id") / 1000).cast("long").alias("doc_id"),
        cosine_expr(F.col("embedding"), qv).alias("sim"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.max("sim"), 6).alias("best_sim"),
            F.count("*").alias("n_chunks"),
        )
        .orderBy(F.desc("best_sim"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# semantic benchmark decontamination — embedding-space twin of the n-gram
# decontaminators. Eval split = doc_id % 97 == 0 (the decontaminate_ngrams
# convention); embeddings are the oracle-replayable hashed BoW.
# ---------------------------------------------------------------------------

_DECON_TAU = 0.90


@query(
    "decontam_embeddings",
    oracle=f"""
WITH raw AS ({_EMBED_SQL}),
n AS (
  SELECT vec_id,
         CASE WHEN list_dot_product(ne, ne) = 0 THEN ne
              ELSE list_transform(ne,
                     x -> x / sqrt(list_dot_product(ne, ne)))
         END AS ne
  FROM raw)
SELECT b.vec_id AS train_id, a.vec_id AS eval_id,
       ROUND(list_dot_product(b.ne, a.ne), 6) AS sim
FROM n a JOIN n b ON a.vec_id % 97 = 0 AND b.vec_id % 97 <> 0
WHERE list_dot_product(b.ne, a.ne) >= {_DECON_TAU}
""",
)
def decontam_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination (dedup.embedding_contamination_pairs):
    training documents whose hashed-BoW embedding cosine against ANY
    eval-split document reaches 0.90 — paraphrase-level leakage the
    shared-n-gram decontaminators miss. GEMM kernel: the benchmark-sized
    eval matrix broadcasts into an Arrow batch matmul over the map-only
    train side (zero train shuffles); candidates get the exact
    normalize+fold rescore, so the margin prescreen never decides
    membership and the output replays bit-exact on DuckDB's cross join."""
    from vervectordb_spark.operators.dedup import (
        embedding_contamination_pairs)
    from vervectordb_spark.operators.embed import embed_documents

    docs = load_table(spark, sf_dir, "documents")
    # filter BEFORE embedding: mapInPandas blocks pushdown, so filtering
    # the embedded frame would hash-embed the full corpus once per
    # consumer; filtering docs pushes the doc_id predicate to the scan
    # and the eval side embeds 1/97 of the corpus
    evals = embed_documents(docs.filter(F.col("doc_id") % 97 == 0),
                            dim=_DIM)
    train = embed_documents(docs.filter(F.col("doc_id") % 97 != 0),
                            dim=_DIM)
    out = embedding_contamination_pairs(train, evals, _DECON_TAU)
    return out.select("train_id", "eval_id",
                      F.round("sim", 6).alias("sim"))
