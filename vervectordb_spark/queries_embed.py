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

_DIM = 32

#: CJK chars spaced out, then whitespace tokens (== embed.mixed_tokens_expr)
_MIXED_TOKS = (
    r"list_filter(regexp_split_to_array(lower("
    r"regexp_replace(text, '([\x{4e00}-\x{9fff}])', ' \1 ', 'g')"
    r"), '\s+'), x -> x <> '')"
)

_MD5 = "(('0x' || substr(md5(t), 1, 15))::BIGINT)"

_EMBED_SQL = f"""
  SELECT doc_id AS vec_id,
    list_transform(CASE WHEN nrm = 0 THEN counts
                        ELSE list_transform(counts, x -> x / nrm) END,
                   x -> x::FLOAT)::DOUBLE[] AS ne
  FROM (
    SELECT doc_id, counts, sqrt(list_dot_product(counts, counts)) AS nrm
    FROM (
      SELECT doc_id,
        list_transform(range(0, {_DIM}),
          i -> len(list_filter(bks, b -> b = i))::DOUBLE) AS counts
      FROM (
        SELECT doc_id,
          list_transform({_MIXED_TOKS}, t -> {_MD5} % {_DIM}) AS bks
        FROM documents
      )
    )
  )
"""


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
