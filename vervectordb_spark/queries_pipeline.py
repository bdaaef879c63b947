"""Training-pipeline query registrations: batch MERGE/CDC, deterministic
sampling, sequence packing, vocabulary — the corpus-construction surface
beyond the reference (SURVEY.md §2.8), each with a bit-exact DuckDB twin.

Portability contract (same as queries.py / queries_dedup.py):
  * hash draws via the md5-60-bit family; u = h / 2^60 is an exact binary
    fraction, so threshold comparisons agree bit-for-bit;
  * counts/sums cast to BIGINT explicitly (DuckDB SUM(BIGINT) is HUGEINT);
  * window ranks are ROW_NUMBER with full deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.operators import text as TX
from vervectordb_spark.operators.merge import apply_changes, merge_upsert
from vervectordb_spark.operators.packing import pack_summary
from vervectordb_spark.operators.sampling import stratified_hash_sample
from vervectordb_spark.queries import query
from vervectordb_spark.schema import load_table

#: lower-cased whitespace tokens, empties dropped == dedup.tokens_expr
_TOKS = r"list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '')"


# ---------------------------------------------------------------------------
# MERGE upsert — bulk replace-or-insert (the batch analogue of P2 update,
# vervectordb/__init__.py:299-317)
# ---------------------------------------------------------------------------

@query(
    "merge_upsert",
    oracle="""
WITH source AS (
  SELECT vec_id, label + 100 AS label FROM embeddings WHERE vec_id < 5
  UNION ALL
  SELECT vec_id + 1000000, 999 FROM embeddings WHERE vec_id < 3
),
merged AS (
  SELECT t.vec_id, t.label FROM embeddings t
  WHERE t.vec_id NOT IN (SELECT vec_id FROM source)
  UNION ALL
  SELECT vec_id, label FROM source
)
SELECT vec_id, label FROM merged WHERE vec_id < 8 OR vec_id >= 1000000
""",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO embeddings USING (5 updates + 3 inserts) ON vec_id:
    matched rows replaced, unmatched inserted. Window shows the 5 updated,
    3 untouched, and 3 inserted keys."""
    emb = load_table(spark, sf_dir, "embeddings")
    updates = emb.filter(F.col("vec_id") < 5).select(
        "vec_id", "embedding", (F.col("label") + 100).alias("label")
    )
    inserts = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        "embedding",
        F.lit(999).alias("label"),
    )
    merged = merge_upsert(emb, updates.unionByName(inserts), "vec_id")
    return merged.filter(
        (F.col("vec_id") < 8) | (F.col("vec_id") >= 1_000_000)
    ).select("vec_id", "label")


# ---------------------------------------------------------------------------
# CDC apply — versioned change batch with tombstones (batch analogue of
# P2+P3, vervectordb/__init__.py:299-335)
# ---------------------------------------------------------------------------

@query(
    "merge_apply_changes",
    oracle="""
WITH changes AS (
  SELECT vec_id, label + 10 AS label, 1 AS v, FALSE AS del
  FROM embeddings WHERE vec_id < 6
  UNION ALL
  SELECT vec_id, label + 20, 2, FALSE FROM embeddings WHERE vec_id < 3
  UNION ALL
  SELECT vec_id, label, 3, TRUE FROM embeddings WHERE vec_id IN (4, 5)
),
all_rows AS (
  SELECT vec_id, label, NULL::BIGINT AS v, FALSE AS del FROM embeddings
  UNION ALL
  SELECT vec_id, label, v::BIGINT, del FROM changes
),
ranked AS (
  SELECT vec_id, label, del,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY v DESC NULLS LAST) AS rk
  FROM all_rows
)
SELECT vec_id, label FROM ranked WHERE rk = 1 AND NOT del AND vec_id < 8
""",
)
def q_merge_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC batch: v1 updates keys 0-5, v2 re-updates keys 0-2,
    v3 tombstones keys 4-5. Latest version wins per key; tombstones drop.
    Expected keys <8: 0-2 at +20, 3 at +10, 6-7 untouched, 4-5 gone."""
    emb = load_table(spark, sf_dir, "embeddings")

    def delta(pred, label_expr, version, is_delete):
        return emb.filter(pred).select(
            "vec_id", "embedding", label_expr.alias("label"),
            F.lit(version).alias("version"), F.lit(is_delete).alias("is_delete"),
        )

    changes = (
        delta(F.col("vec_id") < 6, F.col("label") + 10, 1, False)
        .unionByName(delta(F.col("vec_id") < 3, F.col("label") + 20, 2, False))
        .unionByName(delta(F.col("vec_id").isin(4, 5), F.col("label"), 3, True))
    )
    out = apply_changes(emb, changes, "vec_id")
    return out.filter(F.col("vec_id") < 8).select("vec_id", "label")


# ---------------------------------------------------------------------------
# deterministic stratified sampling — the training-mix operator
# ---------------------------------------------------------------------------

_RATES = {"en": 0.5, "es": 0.2, "zh": 0.3}
_DEFAULT_RATE = 0.1
_SAMPLE_SEED = 42

_RATE_SQL = (
    "CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.2 WHEN 'zh' THEN 0.3 "
    "ELSE 0.1 END"
)


@query(
    "sample_stratified",
    oracle=f"""
SELECT doc_id, lang FROM documents
WHERE (('0x' || substr(md5('sample:{_SAMPLE_SEED}:' || doc_id), 1, 15))::BIGINT)::DOUBLE
      / 1152921504606846976.0 < {_RATE_SQL}
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang training-mix sampling (50% en / 30% zh / 20% es / 10%
    rest), membership a pure function of the row id — reproducible across
    runs, engines, and partitionings (operators/sampling.py)."""
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_hash_sample(
        docs, "lang", _RATES, id_col="doc_id",
        seed=_SAMPLE_SEED, default_fraction=_DEFAULT_RATE,
    )
    return out.select("doc_id", "lang")


# ---------------------------------------------------------------------------
# sequence packing — context-window layout by cumulative token offset
# ---------------------------------------------------------------------------

_PACK_BUDGET = 4000


@query(
    "pack_sequences",
    oracle=f"""
WITH c AS (
  SELECT lang, doc_id, n_chars,
    SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - n_chars AS start
  FROM documents
)
SELECT lang, CAST(FLOOR(start::DOUBLE / {_PACK_BUDGET}.0) AS BIGINT) AS bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_tokens
FROM c GROUP BY 1, 2
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents end-to-end into 4000-token bins per lang stream
    (token cost = n_chars here; any token column works), report per-bin
    occupancy (operators/packing.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_summary(
        docs, token_col="n_chars", budget=_PACK_BUDGET,
        order_col="doc_id", stream_col="lang",
    )


# ---------------------------------------------------------------------------
# corpus quality gate — keep/drop + failure reasons
# ---------------------------------------------------------------------------

@query(
    "corpus_quality_filter",
    oracle=f"""
WITH base AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
    len(toks) AS n_tokens,
    CASE WHEN len(toks) = 0 THEN 0.0
         ELSE list_sum(list_transform(toks, t -> length(t)))::DOUBLE / len(toks)
    END AS avg_token_len,
    CASE WHEN length(text) = 0 THEN 0.0
         ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9 \t\n\x0B\f\r]', '', 'g')))::DOUBLE
              / length(text) END AS punct_ratio,
    CASE WHEN len(toks) = 0 THEN 0.0
         ELSE len(list_filter(toks, t -> list_contains(
                ['the','a','an','and','or','of','to','in','is','are',
                 'for','on','with','as','by','at','from','that','this','it'], t)))::DOUBLE
              / len(toks) END AS stopword_ratio
  FROM base
),
g AS (
  SELECT doc_id,
    n_tokens >= 20 AND n_tokens <= 1000 AS ok_nt,
    avg_token_len >= 3.0 AND avg_token_len <= 12.0 AS ok_atl,
    punct_ratio < 0.3 AS ok_pr,
    stopword_ratio > 0.01 AS ok_sr
  FROM m
)
SELECT doc_id,
  ROUND(CASE WHEN ok_nt THEN 0.3 ELSE 0.0 END
      + CASE WHEN ok_atl THEN 0.3 ELSE 0.0 END
      + CASE WHEN ok_pr THEN 0.2 ELSE 0.0 END
      + CASE WHEN ok_sr THEN 0.2 ELSE 0.0 END, 6) AS quality_score,
  (CASE WHEN ok_nt THEN 0.3 ELSE 0.0 END
      + CASE WHEN ok_atl THEN 0.3 ELSE 0.0 END
      + CASE WHEN ok_pr THEN 0.2 ELSE 0.0 END
      + CASE WHEN ok_sr THEN 0.2 ELSE 0.0 END) >= 0.8 AS keep,
  COALESCE(array_to_string(list_filter([
    CASE WHEN NOT ok_nt THEN 'n_tokens' END,
    CASE WHEN NOT ok_atl THEN 'avg_token_len' END,
    CASE WHEN NOT ok_pr THEN 'punct_ratio' END,
    CASE WHEN NOT ok_sr THEN 'stopword_ratio' END
  ], x -> x IS NOT NULL), ','), '') AS fail_reasons
FROM g
""",
)
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style quality gate over every document: composite score,
    keep decision at 0.8, and the comma-joined tags of failed rules
    (text.quality_filter) — the tuning observability of a filtering
    pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    out = TX.quality_filter(docs, min_score=0.8)
    return out.select("doc_id", "quality_score", "keep", "fail_reasons")


# ---------------------------------------------------------------------------
# vocabulary — top word n-grams per lang
# ---------------------------------------------------------------------------

@query(
    "vocab_top_ngrams",
    oracle=f"""
WITH toks AS (
  SELECT lang, unnest({_TOKS}) AS ngram FROM documents
),
counts AS (
  SELECT lang, ngram, CAST(COUNT(*) AS BIGINT) AS n_occurrences
  FROM toks GROUP BY 1, 2
),
ranked AS (
  SELECT lang, ngram, n_occurrences,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_occurrences DESC, ngram) AS rk
  FROM counts
)
SELECT lang, ngram, n_occurrences, rk::INTEGER AS rank
FROM ranked WHERE rk <= 5
""",
)
def vocab_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 whitespace unigrams per lang, ties broken by token — explode
    → partial-agg count → vocabulary-sized window (operators/text.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.top_ngrams(docs, text_col="text", n=1, top_k=5, by_col="lang")


# ---------------------------------------------------------------------------
# the whole corpus-construction pipeline, composed as ONE plan
# ---------------------------------------------------------------------------

@query(
    "corpus_pipeline_e2e",
    oracle=f"""
WITH base AS (SELECT doc_id, lang, n_chars, text, {_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, lang, n_chars, text,
    len(toks) AS n_tokens,
    CASE WHEN len(toks) = 0 THEN 0.0
         ELSE list_sum(list_transform(toks, t -> length(t)))::DOUBLE / len(toks)
    END AS avg_token_len,
    CASE WHEN length(text) = 0 THEN 0.0
         ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9 \t\n\x0B\f\r]', '', 'g')))::DOUBLE
              / length(text) END AS punct_ratio,
    CASE WHEN len(toks) = 0 THEN 0.0
         ELSE len(list_filter(toks, t -> list_contains(
                ['the','a','an','and','or','of','to','in','is','are',
                 'for','on','with','as','by','at','from','that','this','it'], t)))::DOUBLE
              / len(toks) END AS stopword_ratio
  FROM base
),
kept AS (
  SELECT doc_id, lang, n_chars, text FROM m
  WHERE (CASE WHEN n_tokens >= 20 AND n_tokens <= 1000 THEN 0.3 ELSE 0.0 END
       + CASE WHEN avg_token_len >= 3.0 AND avg_token_len <= 12.0 THEN 0.3 ELSE 0.0 END
       + CASE WHEN punct_ratio < 0.3 THEN 0.2 ELSE 0.0 END
       + CASE WHEN stopword_ratio > 0.01 THEN 0.2 ELSE 0.0 END) >= 0.8
),
deduped AS (
  SELECT doc_id, lang, n_chars FROM (
    SELECT doc_id, lang, n_chars,
      ROW_NUMBER() OVER (
        PARTITION BY ('0x' || substr(md5(text), 1, 15))::BIGINT
        ORDER BY doc_id) AS rk
    FROM kept
  ) WHERE rk = 1
),
sampled AS (
  SELECT doc_id, lang, n_chars FROM deduped
  WHERE (('0x' || substr(md5('sample:7:' || doc_id), 1, 15))::BIGINT)::DOUBLE
        / 1152921504606846976.0 < 0.5
),
c AS (
  SELECT lang, n_chars,
    SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - n_chars AS start
  FROM sampled
),
bins AS (
  SELECT lang, CAST(FLOOR(start::DOUBLE / 4000.0) AS BIGINT) AS bin_id, n_chars
  FROM c
)
SELECT lang,
  CAST(COUNT(DISTINCT bin_id) AS BIGINT) AS n_bins,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_tokens
FROM bins GROUP BY 1
""",
)
def corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole corpus-construction pipeline composed as ONE lazy plan —
    quality gate → exact dedup (lowest-id survivor) → deterministic 50%
    hash sample → 4000-token packing per lang — reported as per-lang bin
    occupancy. Every stage is the operator the individual queries check;
    this is the integration proof that they compose (and that Catalyst
    plans the composition: map-side gate+sample, one dedup window, one
    packing window, one final agg)."""
    from vervectordb_spark.operators.dedup import drop_exact_dups
    from vervectordb_spark.operators.packing import pack_by_token_offset
    from vervectordb_spark.operators.sampling import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = TX.quality_filter(docs, min_score=0.8).filter("keep")
    deduped = drop_exact_dups(kept)
    sampled = hash_sample(deduped, "doc_id", 0.5, seed=7)
    packed = pack_by_token_offset(
        sampled, token_col="n_chars", budget=4000,
        order_col="doc_id", stream_col="lang",
    )
    return packed.groupBy("lang").agg(
        F.count_distinct("bin_id").alias("n_bins"),
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_tokens"),
    )


# ---------------------------------------------------------------------------
# text normalization — the canonical pre-dedup cleanup
# ---------------------------------------------------------------------------

@query(
    "text_normalize",
    oracle="""
SELECT doc_id,
  trim(regexp_replace(
    regexp_replace(
      regexp_replace(text, '<[^>]*>', ' ', 'g'),
      '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g'),
    '[ \t\n\x0B\f\r]+', ' ', 'g')) AS norm_text,
  length(trim(regexp_replace(
    regexp_replace(
      regexp_replace(text, '<[^>]*>', ' ', 'g'),
      '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g'),
    '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS norm_len
FROM documents
""",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical cleanup (tag strip, control-char drop, whitespace
    collapse, trim) — text.normalize_text_expr, value-replayed by the
    identical DuckDB regex chain."""
    docs = load_table(spark, sf_dir, "documents")
    norm = TX.normalize_text_expr("text")
    return docs.select(
        "doc_id", norm.alias("norm_text"), F.length(norm).alias("norm_len")
    )


# ---------------------------------------------------------------------------
# disjoint train/eval/test split — the band counts per stratum. Band widths
# are binary-exact (0.75/0.125/0.125) so the cumulative edges are identical
# floats on both engines.
# ---------------------------------------------------------------------------

_SPLIT_SEED = 7
_SPLITS = {"train": 0.75, "eval": 0.125, "test": 0.125}
_U_SQL = (
    f"(('0x' || substr(md5('sample:{_SPLIT_SEED}:' || doc_id), 1, 15))::BIGINT)"
    "::DOUBLE / 1152921504606846976.0"
)


@query(
    "sample_split_counts",
    oracle=f"""
WITH u AS (SELECT doc_id, lang, {_U_SQL} AS u FROM documents)
SELECT lang,
  CASE WHEN u >= 0.0 AND u < 0.125 THEN 'eval'
       WHEN u >= 0.125 AND u < 0.25 THEN 'test'
       WHEN u >= 0.25 AND u <= 1.0 THEN 'train'
  END AS split,
  COUNT(*) AS n_docs
FROM u GROUP BY lang, split
""",
)
def sample_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint hash-band train/eval/test assignment
    (operators/sampling.train_eval_split) counted per lang — membership is
    a pure function of the row id, so the same doc lands in the same split
    on every engine, run, and repartitioning; bands can never overlap by
    construction."""
    from vervectordb_spark.operators.sampling import train_eval_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        train_eval_split(docs, "doc_id", dict(_SPLITS), seed=_SPLIT_SEED)
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# packing efficiency — per-stream fill-rate rollup over the binned layout
# ---------------------------------------------------------------------------

@query(
    "pack_efficiency",
    oracle=f"""
WITH c AS (
  SELECT lang, doc_id, n_chars,
    SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - n_chars AS start
  FROM documents
),
bins AS (
  SELECT lang, CAST(FLOOR(start::DOUBLE / {_PACK_BUDGET}.0) AS BIGINT) AS bin_id,
         CAST(SUM(n_chars) AS BIGINT) AS sum_tokens
  FROM c GROUP BY 1, 2
)
SELECT lang, COUNT(*) AS n_bins,
  CAST(MAX(sum_tokens) AS BIGINT) AS max_bin_tokens,
  ROUND(CAST(SUM(sum_tokens) AS DOUBLE)
        / (COUNT(*) * {_PACK_BUDGET}.0), 6) AS fill_rate
FROM bins GROUP BY lang
""",
)
def pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How well the 4000-token bins fill per lang stream: bin count, the
    hottest bin, and the overall fill rate (token sum over bin capacity).
    The observability that tells a pipeline whether its packing order is
    wasting context-window budget. Integer sums, one double division."""
    docs = load_table(spark, sf_dir, "documents")
    bins = pack_summary(
        docs, token_col="n_chars", budget=_PACK_BUDGET,
        order_col="doc_id", stream_col="lang",
    )
    return bins.groupBy("lang").agg(
        F.count("*").alias("n_bins"),
        F.max("sum_tokens").cast("long").alias("max_bin_tokens"),
        F.round(
            F.sum("sum_tokens").cast("double")
            / (F.count("*") * float(_PACK_BUDGET)),
            6,
        ).alias("fill_rate"),
    )


# ---------------------------------------------------------------------------
# weighted sampling — Efraimidis–Spirakis A-ES as a deterministic top-k
# ---------------------------------------------------------------------------


@query(
    "sample_weighted",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         round(ln(((('0x' || substr(md5('sample:{_SAMPLE_SEED}:' || doc_id), 1, 15))::BIGINT)::DOUBLE + 1.0)
                  / 1152921504606846976.0) / n_chars::DOUBLE, 9) AS skey
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight, skey
FROM keyed
ORDER BY skey DESC, doc_id
LIMIT 50
""",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted random sample of 50 documents WITHOUT replacement
    (weight = n_chars — inclusion odds ∝ document length, the standard
    token-budget-aware curation draw). A-ES key ln(u)/w over the
    deterministic hash draw; global top-k runs as
    TakeOrderedAndProject, so the 100 TB cost is one scan + per-partition
    heaps — no global sort, no reservoir state, reproducible under any
    partitioning (operators/sampling.weighted_sample). Key rounded to
    9 dp for the cross-engine gate (ln() libm drift; see
    weighted_sample_key_expr docstring)."""
    from vervectordb_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_key_expr,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    keyed = docs.filter(F.col("n_chars") > 0).withColumn(
        "skey",
        F.round(
            weighted_sample_key_expr("doc_id", "n_chars", seed=_SAMPLE_SEED), 9
        ),
    )
    return (
        keyed.orderBy(F.desc("skey"), F.asc("doc_id"))
        .limit(50)
        .select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("long").alias("weight"),
            "skey",
        )
    )
