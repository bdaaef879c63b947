"""BPE vocabulary-training query registration (operators/bpe.py).

Oracle pattern: training is fully deterministic (count desc / pair asc
argmax, greedy left-to-right merges), so DuckDB replays ALL of it — word
counts, per-step pair counts, argmax, and merge application — and the
query gates each learned merge (pair AND its count) plus the final
total-symbol count, which proves the merge fold was applied to every
word (not just the argmax bookkeeping).

DuckDB replay notes:
  - duckdb 1.0's list_reduce mis-evaluates lambdas that capture
    correlated columns (the merge pair), so the oracle does NOT replay
    the Spark-side F.aggregate fold directly. Instead each word's symbol
    sequence is carried as a '<sym><sym>...' token string and the greedy
    non-overlapping merge is EXACTLY replace(s, '<a><b>', '<ab>'):
    replace scans left-to-right without rescanning replaced output,
    token boundaries ('<' prefix, '>' suffix) make prefix/suffix false
    matches impossible, and adjacent matches never share characters.
    Equivalence to the fold is pinned by tests/test_bpe.py against an
    independent scalar reference.
  - pair enumeration uses list_transform over range(1, len) — plain
    (non-reduce) lambdas are sound in duckdb 1.0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.functions.words import words_sql
from vervectordb_spark.queries import query
from vervectordb_spark.schema import load_table

_STEPS = 3

#: shared with the composed pretraining-export replay — single-sourced
#: in the leaf functions/oracle_fragments (import-order rationale there)
from vervectordb_spark.functions.oracle_fragments import (  # noqa: E402
    bpe_ctes as _bpe_ctes, split_of as _split_of)

_SPLIT = _split_of("s")


def _bpe_oracle(steps: int) -> str:
    finals = [f"SELECT {k} AS step, lft, rgt, cnt FROM m{k}"
              for k in range(1, steps + 1)]
    finals.append(f"SELECT 0 AS step, '' AS lft, '' AS rgt, "
                  f"SUM(len({_SPLIT}))::BIGINT AS cnt FROM s{steps}")
    return ("WITH " + _bpe_ctes(steps) + "\n"
            + "\nUNION ALL ".join(finals))


@query("bpe_train_merges", oracle=_bpe_oracle(_STEPS))
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 3 BPE merges on the documents corpus (operators/bpe.train_bpe)
    and emit (step, lft, rgt, cnt) per learned merge plus a step-0 row
    carrying the total symbol count of the merged vocabulary. ONE
    corpus-sized word-count job; every merge round runs on the
    distinct-word table only (corpus-size-independent iterations — the
    100 TB posture), with lineage cut per round."""
    from vervectordb_spark.operators.bpe import train_bpe

    docs = load_table(spark, sf_dir, "documents")
    merges, vocab = train_bpe(docs, n_merges=_STEPS)
    total = vocab.agg(F.sum(F.size("symbols")).cast("bigint")).collect()[0][0]
    rows = [(m.step, m.left, m.right, m.count) for m in merges]
    rows.append((0, "", "", int(total)))
    return spark.createDataFrame(
        rows, schema="step int, lft string, rgt string, cnt bigint"
    )


@query(
    "bpe_token_counts",
    oracle=f"""
WITH {_bpe_ctes(_STEPS)},
doc_words AS (SELECT doc_id, word FROM {words_sql('documents', id_col='doc_id')})
SELECT d.doc_id,
       COUNT(*)::BIGINT AS n_words,
       SUM(len({_split_of('v.s')}))::BIGINT AS n_tokens
FROM doc_words d JOIN (SELECT word, s FROM s{_STEPS}) v USING (word)
GROUP BY d.doc_id
""",
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts under the trained tokenizer — the number every
    packing/cost estimate downstream actually needs. Segmentation is a
    BROADCAST join of the corpus words against the trained vocabulary's
    merged symbol sequences (the vocab IS the segmentation table for
    in-vocabulary words — no per-document re-folding, no Python), then
    one groupBy(doc_id) aggregate. Words outside the oracle scope filter
    (non-ascii-lowercase) are excluded from BOTH counts by the inner
    join. 100 TB posture: corpus-sized explode + map-side broadcast
    lookup (gated — a Heaps-law 1e7-row web vocabulary falls back to
    AQE's shuffle-hash, operators/bpe.maybe_broadcast_vocab) + one key
    shuffle."""
    from vervectordb_spark.operators.bpe import (
        maybe_broadcast_vocab, train_bpe)

    from vervectordb_spark.functions.words import words as words_of

    docs = load_table(spark, sf_dir, "documents")
    _merges, vocab = train_bpe(docs, n_merges=_STEPS)
    seg = vocab.select("word", F.size("symbols").alias("_wtoks"))
    words = words_of(docs, "text", id_col="doc_id")
    return (
        words.join(maybe_broadcast_vocab(seg), on="word")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_words"),
             F.sum("_wtoks").cast("bigint").alias("n_tokens"))
    )


_ENC_DOCS = 20  # bounded gate output: encode the first doc-id band only


@query(
    "bpe_encode_docs",
    oracle=f"""
WITH {_bpe_ctes(_STEPS)},
ids AS (
  SELECT symbol,
         (ROW_NUMBER() OVER (ORDER BY symbol) - 1)::INT AS token_id
  FROM (SELECT DISTINCT unnest({_split_of('s')}) AS symbol FROM s{_STEPS})
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
seg AS (SELECT word, {_split_of('s')} AS syms FROM s{_STEPS}),
tok AS (
  SELECT d.doc_id, d.wpos, sp.spos AS spos, sp.symbol AS symbol FROM (
    SELECT d.doc_id, d.wpos,
           unnest(list_transform(range(0, len(v.syms)),
                  j -> {{'spos': j::INT, 'symbol': v.syms[j + 1]}})) AS sp
    FROM dw d JOIN seg v USING (word)
  ) d(doc_id, wpos, sp)
)
SELECT t.doc_id, t.wpos::INT AS wpos, t.spos, t.symbol, i.token_id
FROM tok t JOIN ids i USING (symbol)
""",
)
def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization under the trained BPE vocabulary
    (operators/bpe.encode_documents): one row per token with its
    deterministic (wpos, spos) position and dense token_id — the
    token-id-sequence step a training-data export ends with.

    Vocabulary trained on the FULL documents table (the _STEPS merges
    bpe_train_merges gates); encoding emitted for the doc_id < 20 band
    to bound the gate output. 100 TB shape: the corpus side is map-only
    (positional word explode + two broadcast joins against the
    language-sized segmentation and id tables); the only shuffle is the
    KB-class row_number assigning token ids."""
    from vervectordb_spark.operators.bpe import encode_documents, train_bpe

    docs = load_table(spark, sf_dir, "documents")
    _merges, vocab = train_bpe(docs, n_merges=_STEPS)
    out = encode_documents(docs.filter(F.col("doc_id") < _ENC_DOCS), vocab)
    return out.select(
        "doc_id", F.col("wpos").cast("int").alias("wpos"),
        F.col("spos").cast("int").alias("spos"), "symbol", "token_id")


_PACK_BUDGET_TOK = 2048


@query(
    "pack_by_bpe_tokens",
    oracle=f"""
WITH {_bpe_ctes(_STEPS)},
doc_words AS (SELECT doc_id, word
              FROM {words_sql('documents', id_col='doc_id')}),
tc AS (
  SELECT d.doc_id, SUM(len({_split_of('v.s')}))::BIGINT AS n_tokens
  FROM doc_words d JOIN (SELECT word, s FROM s{_STEPS}) v USING (word)
  GROUP BY d.doc_id),
j AS (SELECT doc.lang, t.doc_id, t.n_tokens
      FROM tc t JOIN documents doc USING (doc_id)),
c AS (
  SELECT lang, doc_id, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - n_tokens AS start
  FROM j)
SELECT lang,
       CAST(FLOOR(start::DOUBLE / {_PACK_BUDGET_TOK}.0) AS BIGINT) AS bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM c GROUP BY 1, 2
""",
)
def pack_by_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-aware context-window packing: REAL token counts under
    the trained BPE vocabulary (the bpe_token_counts broadcast-join
    shape) feed pack_by_token_offset's per-lang 2048-token layout — the
    composition a training-data export actually runs, replacing the
    n_chars proxy pack_sequences uses. ONE corpus word-count job for
    training, a broadcast segmentation join, one groupBy(doc), one
    doc-key lang join, one packing window — no stage is corpus² and the
    vocab state stays KB-class."""
    from vervectordb_spark.functions.words import words as words_of
    from vervectordb_spark.operators.bpe import (
        maybe_broadcast_vocab, train_bpe)
    from vervectordb_spark.operators.packing import pack_summary

    docs = load_table(spark, sf_dir, "documents")
    _merges, vocab = train_bpe(docs, n_merges=_STEPS)
    seg = vocab.select("word", F.size("symbols").alias("_wtoks"))
    wt = words_of(docs, "text", id_col="doc_id")
    counts = (wt.join(maybe_broadcast_vocab(seg), on="word")
              .groupBy("doc_id")
              .agg(F.sum("_wtoks").cast("bigint").alias("n_tokens")))
    j = counts.join(docs.select("doc_id", "lang"), on="doc_id")
    return pack_summary(j, token_col="n_tokens",
                        budget=_PACK_BUDGET_TOK,
                        order_col="doc_id", stream_col="lang")
