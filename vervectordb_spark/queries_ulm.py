"""Unigram-LM tokenizer queries (operators/ulm.py) with DuckDB oracles.

The headline act: the ORACLE REPLAYS THE VITERBI DP ITSELF — a
recursive CTE carries each word's best-score list (one level per
character), picks each cell's argmax with an integer (score, -i)
tie-break key, and a second recursive CTE walks the backpointers into
the piece sequence. That is only possible because the committed model's
scores are integer-quantized log2-probs (models/tiny_ulm, trained by
the DISTRIBUTED hard-EM trainer via tools/train_tiny_ulm.py): integer
sums compare exactly on any engine, so the argmax path — and therefore
every token — is engine-deterministic. Training itself (iterative EM)
is the registry's third documented rows-only query, pinned instead by
an independent-reference pytest, the quality-classifier precedent.

Corpus-side shape matches queries_bpe: positional word explode, join
the vocabulary-sized segmentation table, posexplode pieces, id join —
map-only on the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.operators import ulm
from vervectordb_spark.queries import query
from vervectordb_spark.schema import load_table


def _ulm_pieces_path() -> str:
    import os

    return os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "models", "tiny_ulm",
        "pieces.parquet"))


_ENC_DOCS = 20

#: Viterbi replay over the distinct words of `wsrc` (a relation exposing
#: a text column named `text`): pieces → substring candidates → DP
#: (recursive, carried best list, integer argmax key score*1024 - i;
#: 1024 > any word length so the key is injective per (score, i)) →
#: backpointer walk. Produces seg(word, pieces).
_VITERBI_CTES = f"""
pieces AS (SELECT piece, score
           FROM read_parquet('{_ulm_pieces_path()}')),
words AS (
  SELECT DISTINCT w AS word FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                  x -> x <> '' AND regexp_matches(x, '^[a-z]+$'))) AS w
    FROM wsrc)
),
sub AS (
  SELECT w.word, r.i::INT AS i, s.j::INT AS j, p.score
  FROM words w,
       LATERAL (SELECT unnest(range(0, length(w.word))) AS i) r,
       LATERAL (SELECT unnest(range(r.i + 1,
                 least(r.i + {ulm.MAX_PIECE_LEN},
                       length(w.word)) + 1)) AS j) s
  JOIN pieces p ON p.piece = substr(w.word, r.i + 1, (s.j - r.i)::INT)
),
dp AS (
  SELECT word, 0 AS j, [0::BIGINT] AS bests, []::INT[] AS back
  FROM words
  UNION ALL
  SELECT d.word, d.j + 1, list_append(d.bests, x.b),
         list_append(d.back, coalesce(x.bi, 0))
  FROM dp d,
       LATERAL (
         SELECT max(d.bests[s.i + 1] + s.score) AS b,
                arg_max(s.i,
                        (d.bests[s.i + 1] + s.score) * 1024 - s.i) AS bi
         FROM sub s WHERE s.word = d.word AND s.j = d.j + 1
           AND d.bests[s.i + 1] IS NOT NULL
       ) x
  WHERE d.j < length(d.word)
),
dpf AS (SELECT word, bests, back FROM dp WHERE j = length(word)),
path AS (
  SELECT word, length(word)::INT AS j, []::VARCHAR[] AS pieces
  FROM dpf WHERE bests[length(word) + 1] IS NOT NULL
  UNION ALL
  SELECT p.word, d.back[p.j],
         list_prepend(substr(p.word, d.back[p.j] + 1,
                             (p.j - d.back[p.j])::INT), p.pieces)
  FROM path p JOIN dpf d USING (word) WHERE p.j > 0
),
seg AS (SELECT word, pieces FROM path WHERE j = 0)
"""


@query(
    "ulm_encode_docs",
    oracle=f"""
WITH RECURSIVE
wsrc AS (SELECT text FROM documents WHERE doc_id < {_ENC_DOCS}),
{_VITERBI_CTES},
ids AS (
  SELECT piece,
         (ROW_NUMBER() OVER (ORDER BY piece) - 1)::BIGINT AS token_id
  FROM pieces
),
dw AS (
  SELECT doc_id, pr.wpos AS wpos, pr.word AS word FROM (
    SELECT doc_id,
           unnest(list_transform(range(0, len(a)),
                  i -> {{'wpos': i::INT, 'word': a[i + 1]}})) AS pr
    FROM (SELECT doc_id, regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+') AS a
          FROM documents WHERE doc_id < {_ENC_DOCS})
  ) WHERE pr.word <> '' AND regexp_matches(pr.word, '^[a-z]+$')
),
tok AS (
  SELECT d.doc_id, d.wpos, sp.spos AS spos, sp.piece AS piece FROM (
    SELECT d.doc_id, d.wpos,
           unnest(list_transform(range(0, len(v.pieces)),
                  j -> {{'spos': j::INT, 'piece': v.pieces[j + 1]}})) AS sp
    FROM dw d JOIN seg v USING (word)
  ) d(doc_id, wpos, sp)
)
SELECT t.doc_id, t.wpos::INT AS wpos, t.spos, t.piece, i.token_id
FROM tok t JOIN ids i USING (piece)
""",
)
def ulm_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization under the COMMITTED unigram-LM model
    (operators/ulm.encode_documents over models/tiny_ulm): one row per
    token with its (wpos, spos) position and dense token_id. The oracle
    re-derives every token by running the integer Viterbi DP in SQL —
    model file in, token stream out, nothing trusted from the engine
    under test. Encode band doc_id < {_ENC_DOCS} (the BPE convention)."""
    scores, max_len = ulm.load_ulm_model()
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _ENC_DOCS)
    return ulm.encode_documents(docs, scores=scores, max_len=max_len)


@query(
    "ulm_token_counts",
    oracle=f"""
WITH RECURSIVE
wsrc AS (SELECT text FROM documents),
{_VITERBI_CTES},
dw AS (
  SELECT w AS word, COUNT(*)::BIGINT AS n FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                  x -> x <> '' AND regexp_matches(x, '^[a-z]+$'))) AS w
    FROM documents) GROUP BY w
)
SELECT p.piece AS piece, SUM(d.n)::BIGINT AS n_tokens
FROM dw d JOIN seg v USING (word),
     LATERAL (SELECT unnest(v.pieces) AS piece) p
GROUP BY p.piece
""",
)
def ulm_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token counts under the committed ULM model: Σ word_count ×
    pieces-per-word, grouped by piece — the vocabulary-utilization
    profile (dead pieces, head-heavy distributions) a tokenizer owner
    watches. Same Viterbi-replay oracle as ulm_encode_docs, aggregated."""
    scores, max_len = ulm.load_ulm_model()
    docs = load_table(spark, sf_dir, "documents")
    enc = ulm.encode_documents(docs, scores=scores, max_len=max_len)
    return enc.groupBy("piece").agg(
        F.count("*").cast("bigint").alias("n_tokens"))


@query("ulm_train_pieces")
def ulm_train_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED hard-EM unigram-LM training on the corpus at hand
    (operators/ulm.train_unigram_lm): (piece, cnt, score). Rows-only by
    documented design — iterative EM is the third member of the
    rows-only set (quality_classifier_filter, imi_search_calibrated
    precedents); the training arithmetic is pinned instead by
    tests/test_ulm.py against an independent pure-Python reference, and
    the ARTIFACT the gated encode queries consume is this trainer's
    committed output."""
    docs = load_table(spark, sf_dir, "documents")
    return ulm.train_unigram_lm(docs)
