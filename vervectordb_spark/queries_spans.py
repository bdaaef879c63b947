"""Duplicate-span detection/removal query registration (operators/spans.py
— the ExactSubstr dedup variant of Lee et al., ACL 2022, at token-gram
granularity).

Oracle pattern: everything is exact — 120-bit md5 gram keys (two 60-bit
longs, the portable functions/hashing md5_long + md5_long_hi contract;
span removal destroys tokens, so the key is widened past the statistical
60-bit family — residual FP rate documented in operators/spans.py),
integer gaps-and-islands span merging, and
an original-case token rebuild — so DuckDB replays the WHOLE pipeline:
gram emit via list_transform(range), dup keys via GROUP BY/HAVING, span
merge via the same two-window island construction, and removal via an
inequality anti-join of token rows against the merged spans (spans are
disjoint by construction, so the join never duplicates a token row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.queries import query
from vervectordb_spark.schema import load_table

_L = 8  # gram length (tokens); fixture-scale analogue of Lee et al.'s 50


#: shared with the composed pretraining-export replay — single-sourced
#: in the leaf functions/oracle_fragments (import-order rationale there)
from vervectordb_spark.functions.oracle_fragments import (  # noqa: E402
    spancut_ctes, spans_ctes as _spans_ctes)


@query(
    "dup_spans_profile",
    oracle=f"WITH {_spans_ctes(_L)} "
           "SELECT doc_id, span_start, span_end, n_grams FROM spans",
)
def dup_spans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged maximal duplicated-span intervals per document
    (operators/spans.duplicate_spans at L=8): the regions an ExactSubstr
    pass would cut. 100 TB shape: map-only gram emit, a SKEW-IMMUNE
    gram-key count aggregate + shuffle-hash dup-key join (no sort of the
    gram stream — strategy notes and sf100 measurements in
    duplicate_gram_positions), one doc-key window — linear in corpus
    tokens + duplicated volume, never all-pairs."""
    from vervectordb_spark.operators.spans import duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    return duplicate_spans(docs, _L).select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
        F.col("n_grams").cast("bigint").alias("n_grams"))


@query(
    "dedup_remove_spans",
    oracle=f"""
WITH {spancut_ctes(_L)}
SELECT doc_id, n_tokens, n_removed AS n_tokens_removed, clean_text
FROM cleaned
""",
)
def dedup_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup applied (operators/spans.remove_duplicate_spans
    at L=8): every document with its duplicated regions cut — original
    case, single-space canonical rejoin — plus the token accounting.
    The removal itself is a map-only array-filter projection after one
    doc-key join of the bounded per-doc span lists."""
    from vervectordb_spark.operators.spans import remove_duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicate_spans(docs, _L).select(
        "doc_id", "n_tokens", "n_tokens_removed", "clean_text")


@query(
    "pipeline_spancut_e2e",
    oracle=f"""
WITH {spancut_ctes(_L, extra_cols=("lang",))},
ranked AS (
  SELECT doc_id, lang, n_tokens, n_removed,
         ROW_NUMBER() OVER (
           PARTITION BY ('0x' || substr(md5(clean_text), 1, 15))::BIGINT
           ORDER BY doc_id) AS rk
  FROM cleaned)
SELECT lang,
       CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups_dropped,
       CAST(SUM(CASE WHEN rk = 1 THEN n_tokens - n_removed ELSE 0 END) AS BIGINT)
         AS tokens_kept,
       CAST(SUM(CASE WHEN rk = 1 THEN n_removed ELSE 0 END) AS BIGINT)
         AS tokens_cut
FROM ranked GROUP BY lang
""",
)
def pipeline_spancut_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-cut → exact dedup composed as ONE lazy plan: cutting the
    duplicated regions first makes boilerplate-wrapped near-copies
    EXACTLY identical, so the cheap content-hash dedup then catches what
    would otherwise need a MinHash pass — the pipeline ordering
    ExactSubstr dedup exists for (Lee et al. 2022 run substring dedup
    before document dedup for the same reason). Reported per lang:
    surviving docs, exact dups dropped post-cut, tokens kept/cut.

    Plan shape: the span stages' two shuffles (gram key, doc key), ONE
    content-hash dedup window, one final aggregate — nothing quadratic,
    no driver loop."""
    from pyspark.sql import Window

    from vervectordb_spark.functions.hashing import md5_long
    from vervectordb_spark.operators.spans import remove_duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    cleaned = remove_duplicate_spans(docs, _L)
    rk = F.row_number().over(
        Window.partitionBy(md5_long(F.col("clean_text")))
        .orderBy("doc_id"))
    ranked = cleaned.withColumn("rk", rk)
    one = F.col("rk") == 1
    return ranked.groupBy("lang").agg(
        F.sum(F.when(one, 1).otherwise(0)).cast("long").alias("n_docs"),
        F.sum(F.when(~one, 1).otherwise(0)).cast("long")
        .alias("n_dups_dropped"),
        F.sum(F.when(one, F.col("n_tokens") - F.col("n_tokens_removed"))
              .otherwise(0)).cast("long").alias("tokens_kept"),
        F.sum(F.when(one, F.col("n_tokens_removed")).otherwise(0))
        .cast("long").alias("tokens_cut"))


@query(
    "dup_spans_stats",
    oracle=f"""
WITH {_spans_ctes(_L)},
tok_n AS (SELECT doc_id, len(a)::BIGINT AS n_tokens FROM toks),
per_doc AS (
  SELECT s.doc_id,
         SUM(s.span_end - s.span_start)::BIGINT AS dup_tokens,
         COUNT(*)::BIGINT AS n_spans
  FROM spans s GROUP BY s.doc_id)
SELECT
  (SELECT COUNT(*) FROM tok_n)::BIGINT AS n_docs,
  (SELECT COUNT(*) FROM per_doc)::BIGINT AS n_docs_with_spans,
  (SELECT COALESCE(SUM(n_spans), 0) FROM per_doc)::BIGINT AS n_spans,
  (SELECT COALESCE(SUM(dup_tokens), 0) FROM per_doc)::BIGINT AS dup_tokens,
  (SELECT SUM(n_tokens) FROM tok_n)::BIGINT AS total_tokens,
  (SELECT COALESCE(MAX(dup_tokens), 0) FROM per_doc)::BIGINT AS max_doc_dup_tokens
""",
)
def dup_spans_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-dedup observability (the dedup_band_stats pattern): ONE row
    of corpus-level counters — affected docs, span count, duplicated
    token volume vs total, worst single document — the dashboard that
    says how much an ExactSubstr pass will cut BEFORE running the cut.
    Exact integers end to end; two bounded aggregates over the span
    table plus one token-count aggregate."""
    from vervectordb_spark.operators.spans import (
        doc_token_array, duplicate_spans)

    docs = load_table(spark, sf_dir, "documents")
    spans = duplicate_spans(docs, _L)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("_dt"),
        F.count("*").alias("_ns"))
    tok = docs.select(F.size(doc_token_array("text")).alias("_n"))
    a = per_doc.agg(
        F.count("*").cast("long").alias("n_docs_with_spans"),
        F.coalesce(F.sum("_ns"), F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce(F.sum("_dt"), F.lit(0)).cast("long").alias("dup_tokens"),
        F.coalesce(F.max("_dt"), F.lit(0)).cast("long")
        .alias("max_doc_dup_tokens"))
    b = tok.agg(F.count("*").cast("long").alias("n_docs"),
                F.sum("_n").cast("long").alias("total_tokens"))
    return a.crossJoin(b).select(
        "n_docs", "n_docs_with_spans", "n_spans", "dup_tokens",
        "total_tokens", "max_doc_dup_tokens")


# ---------------------------------------------------------------------------
# incremental span dedup — new batch vs the persisted gram history (the
# daily-crawl ExactSubstr shape; the span twin of dedup_incremental).
# History = doc_id < 250; new batch = the rest plus 10 planted copies of
# history docs (negative ids, collision-proof at any scale) whose entire
# text MUST be cut. History-only duplicates produce no output rows —
# history never self-pairs.
# ---------------------------------------------------------------------------

_GRAMS_OF = (
    "unnest(list_transform(range(0, greatest(len(a) - {L} + 1, 0)), "
    "i -> {{'p': i::INT, "
    "'m': md5(array_to_string(a[i + 1 : i + {L}], ' '))}}))"
).format(L=_L)


@query(
    "dedup_spans_incremental",
    oracle=f"""
WITH newb AS MATERIALIZED (
  SELECT doc_id, text FROM documents WHERE doc_id >= 250
  UNION ALL
  SELECT -(doc_id + 1) AS doc_id, text FROM documents WHERE doc_id < 10),
htoks AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                     t -> t <> '') AS a
  FROM documents WHERE doc_id < 250),
hkeys AS MATERIALIZED (
  SELECT DISTINCT ('0x' || substr(g.m, 1, 15))::BIGINT AS gram_h,
                  ('0x' || substr(g.m, 16, 15))::BIGINT AS gram_h2
  FROM (SELECT {_GRAMS_OF} AS g FROM htoks) q(g)),
ntoks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                     t -> t <> '') AS a
  FROM newb),
npos AS MATERIALIZED (
  SELECT doc_id, g.p AS p,
         ('0x' || substr(g.m, 1, 15))::BIGINT AS gram_h,
         ('0x' || substr(g.m, 16, 15))::BIGINT AS gram_h2
  FROM (SELECT doc_id, {_GRAMS_OF} AS g FROM ntoks) q(doc_id, g)),
bdups AS (
  SELECT gram_h, gram_h2 FROM npos
  GROUP BY gram_h, gram_h2 HAVING COUNT(*) >= 2),
dup AS MATERIALIZED (
  SELECT gram_h, gram_h2 FROM hkeys
  UNION
  SELECT gram_h, gram_h2 FROM bdups),
marks AS (SELECT doc_id, p AS s, p + {_L} AS e
          FROM npos JOIN dup USING (gram_h, gram_h2)),
flagged AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS nw
  FROM marks),
isl AS (
  SELECT doc_id, s, e,
         SUM(nw) OVER (PARTITION BY doc_id ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS island
  FROM flagged),
spans AS MATERIALIZED (
  SELECT doc_id, MIN(s)::INT AS span_start, MAX(e)::INT AS span_end
  FROM isl GROUP BY doc_id, island),
orig AS MATERIALIZED (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), t -> t <> '') AS a
  FROM newb),
tok_rows AS (
  SELECT doc_id, ti.i AS i, ti.t AS t FROM (
    SELECT doc_id,
           unnest(list_transform(range(0, len(a)),
                  i -> {{'i': i::INT, 't': a[i + 1]}})) AS ti
    FROM orig) q(doc_id, ti)),
kept_toks AS (
  SELECT tr.doc_id, tr.i, tr.t
  FROM tok_rows tr LEFT JOIN spans sp
    ON tr.doc_id = sp.doc_id
   AND tr.i >= sp.span_start AND tr.i < sp.span_end
  WHERE sp.doc_id IS NULL)
SELECT o.doc_id,
       len(o.a)::BIGINT AS n_tokens,
       (len(o.a) - COALESCE(k.nk, 0))::BIGINT AS n_tokens_removed,
       COALESCE(k.clean_text, '') AS clean_text
FROM orig o LEFT JOIN (
  SELECT doc_id, COUNT(*) AS nk,
         string_agg(t, ' ' ORDER BY i) AS clean_text
  FROM kept_toks GROUP BY doc_id) k USING (doc_id)
""",
)
def dedup_spans_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ExactSubstr: span-cut the NEW batch against the
    persisted gram history (operators/spans.incremental_remove_duplicate_
    spans) — history positions never re-derived, history never
    self-pairs, spans cut only in the batch. The 10 planted history
    copies (negative ids) are guaranteed full-text cuts; organic
    new-vs-history and within-batch repeats ride along. Per-batch cost
    is |new| gram work + one key join against state (measured ∝ |new|,
    SCALE.md round-9 table)."""
    from vervectordb_spark.operators.spans import (
        gram_history, incremental_remove_duplicate_spans)

    docs = load_table(spark, sf_dir, "documents")
    hist = gram_history(docs.filter(F.col("doc_id") < 250), _L)
    planted = docs.filter(F.col("doc_id") < 10).select(
        (-(F.col("doc_id") + 1)).alias("doc_id"), "text")
    new = (docs.filter(F.col("doc_id") >= 250).select("doc_id", "text")
           .unionByName(planted))
    out = incremental_remove_duplicate_spans(new, hist, _L)
    return out.select("doc_id", "n_tokens", "n_tokens_removed",
                      "clean_text")
