"""Corpus-curation query registrations — repetition gating, benchmark
decontamination, target-mix resampling, PII scrubbing.

The reference engine stores vectors + opaque metadata
(/root/reference/vervectordb/__init__.py:247-262) and has no corpus layer;
these are the curation stages a training-data pipeline runs upstream of
embedding, layered onto the documents/events tables. All follow the
queries.py portability contract (md5-60 hash family, int/int single
divisions, round-at-the-end) so every query is hash-checked against its
DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.operators import dedup as D
from vervectordb_spark.operators import pii as PII
from vervectordb_spark.operators import text as TX
from vervectordb_spark.operators.sampling import mix_to_target
from vervectordb_spark.queries import query
from vervectordb_spark.schema import load_table

# DuckDB twins of the token/repetition expressions (operators/text.py).
_TOKS = r"list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '')"
_FDW = "1.0 - len(list_distinct(toks))::DOUBLE / len(toks)"
_FD3 = (
    "1.0 - len(list_distinct(list_transform("
    "range(1, greatest(len(toks) - 2, 1) + 1), "
    "i -> array_to_string(list_slice(toks, i, i + 2), ' '))))::DOUBLE"
    " / greatest(len(toks) - 2, 1)"
)


# ---------------------------------------------------------------------------
# repetition profile — Gopher-style duplicate-word / duplicate-n-gram rates
# ---------------------------------------------------------------------------

@query(
    "text_repetition_profile",
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_words,
       ROUND({_FDW}, 6) AS frac_dup_words,
       ROUND({_FD3}, 6) AS frac_dup_3grams
FROM t
""",
)
def text_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals (duplicate-word fraction,
    duplicate-3-gram fraction — the Gopher boilerplate heuristics). Pure
    array expressions, map-only: profiling 100 TB is one scan projection
    (operators/text.repetition_profile)."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.repetition_profile(docs)


# ---------------------------------------------------------------------------
# repetition gate — per-source pass rates at the published-style cutoffs
# ---------------------------------------------------------------------------

@query(
    "repetition_gate_by_source",
    oracle=f"""
WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
p AS (SELECT source, {_FDW} AS fdw, {_FD3} AS fd3 FROM t)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN fdw <= 0.55 AND fd3 <= 0.05 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_pass,
  ROUND(SUM(CASE WHEN fdw <= 0.55 AND fd3 <= 0.05 THEN 1 ELSE 0 END)::DOUBLE
        / COUNT(*), 6) AS pass_rate
FROM p GROUP BY source
""",
)
def repetition_gate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of each source survives the repetition gate — the
    per-domain quality dashboard a curation run reads before deciding mix
    weights. The gate is the same map-side expression as the profile; the
    only shuffle carries (source, two counters)."""
    docs = load_table(spark, sf_dir, "documents")
    keep = TX.repetition_gate("text", max_dup_word_frac=0.55,
                              max_dup_3gram_frac=0.05)
    flagged = docs.select("source", keep.cast("int").alias("_pass"))
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("_pass").cast("long").alias("n_pass"),
        F.round(
            F.sum("_pass").cast("double") / F.count("*"), 6
        ).alias("pass_rate"),
    )


# ---------------------------------------------------------------------------
# decontamination — flag corpus docs sharing n-grams with a benchmark set
# ---------------------------------------------------------------------------

@query(
    "decontaminate_ngrams",
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS ng
  FROM t
),
bench AS (SELECT DISTINCT ng FROM s WHERE doc_id % 97 = 0)
SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
FROM s JOIN bench USING (ng)
WHERE s.doc_id % 97 <> 0
GROUP BY s.doc_id
ORDER BY n_shared_ngrams DESC, s.doc_id
""",
)
def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing any word
    n-gram with the held-out benchmark set (docs with doc_id % 97 == 0
    stand in for an eval suite), scored by how many distinct n-grams they
    share. Real pipelines use 13-grams (the public GPT-3/Llama recipe);
    n=3 is the proportional choice for these ~40-word fixtures.

    Scale posture: the benchmark side is an eval suite — bounded and tiny
    relative to the corpus — so its distinct n-gram set is broadcast; the
    corpus side is one explode + broadcast semi-structured join + one
    groupBy on doc_id. The corpus n-grams never shuffle (the join prunes
    non-matches map-side); only (doc_id, hit) pairs reach the aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_table(docs, shingle_n=3).select(
        "doc_id", F.explode("shingles").alias("ng")
    )
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0).select("ng").distinct()
    )
    return (
        sh.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), on="ng")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
        .orderBy(F.desc("n_shared_ngrams"), "doc_id")
    )


# ---------------------------------------------------------------------------
# target-mix resampling — rebalance the corpus to a target domain mix
# ---------------------------------------------------------------------------

_MIX_TARGETS = {"de": 0.15, "en": 0.40, "es": 0.15, "fr": 0.15, "zh": 0.15}
_MIX_TOTAL = 250


@query(
    "domain_mix_resample",
    oracle=f"""
WITH tgt(lang, share) AS (VALUES
  ('de', 0.15), ('en', 0.40), ('es', 0.15), ('fr', 0.15), ('zh', 0.15)),
counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
rates AS (
  SELECT c.lang, least(1.0, t.share * {_MIX_TOTAL}.0 / c.n) AS rate
  FROM counts c JOIN tgt t USING (lang)
),
kept AS (
  SELECT d.doc_id, d.lang FROM documents d JOIN rates r USING (lang)
  WHERE (r.rate >= 1.0 OR
         (('0x' || substr(md5('sample:42:' || d.doc_id), 1, 15))::BIGINT)::DOUBLE
         / 1152921504606846976.0 < r.rate)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept
FROM kept GROUP BY lang
""",
)
def domain_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus to a TARGET language mix (40% en, 15% each
    else, ~250 docs total at sf0.01) regardless of observed shares —
    per-stratum acceptance rates are derived from ONE tiny count aggregate
    broadcast back (no driver collect), membership is the pure-row hash
    draw (operators/sampling.mix_to_target), so the resample is stable
    under repartitioning and incremental ingest."""
    docs = load_table(spark, sf_dir, "documents")
    kept = mix_to_target(docs, "lang", _MIX_TARGETS, id_col="doc_id",
                         total=_MIX_TOTAL, seed=42)
    return kept.groupBy("lang").agg(F.count("*").alias("n_kept"))


# ---------------------------------------------------------------------------
# PII scrubbing — regex redaction with an audit count, on real columns
# ---------------------------------------------------------------------------

@query(
    "events_scrub_numeric_ids",
    oracle="""
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS n_scrubbed,
  CAST(COUNT(DISTINCT regexp_replace(props, '[0-9]+', '<NUM>', 'g'))
       AS BIGINT) AS n_distinct_shapes
FROM events GROUP BY event_type
""",
)
def events_scrub_numeric_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub numeric identifiers out of the event props payload and audit
    the result per event type (operators/pii — same regexp_replace /
    regexp_count machinery as the email/phone/IP/SSN patterns, exercised
    here on a column that actually matches). n_distinct_shapes counts the
    redacted payload shapes, proving the replacement text itself is
    identical across engines. Map-side projection + one small aggregate."""
    ev = load_table(spark, sf_dir, "events")
    pats = {"num": ("[0-9]+", "<NUM>")}
    red = ev.select(
        "event_type",
        PII.match_count_expr("props", "[0-9]+").alias("_n"),
        PII.redact_expr("props", pats).alias("_shape"),
    )
    return red.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("_n").cast("long").alias("n_scrubbed"),
        F.countDistinct("_shape").alias("n_distinct_shapes"),
    )


# ---------------------------------------------------------------------------
# curation pipeline e2e — the round-5 stages composed as ONE lazy plan
# ---------------------------------------------------------------------------

@query(
    "curation_pipeline_e2e",
    oracle=f"""
WITH t AS (SELECT doc_id, lang, n_chars, text, {_TOKS} AS toks
           FROM documents WHERE doc_id % 97 <> 0),
rep AS (
  SELECT doc_id, lang, n_chars, text, toks FROM t
  WHERE ({_FDW}) <= 0.55 AND ({_FD3}) <= 0.05
),
s AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS ng
  FROM t
),
bench AS (
  SELECT DISTINCT ng FROM (
    SELECT unnest(list_distinct(list_transform(
             range(1, greatest(len(toks) - 2, 1) + 1),
             i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS ng
    FROM (SELECT {_TOKS} AS toks FROM documents WHERE doc_id % 97 = 0)
  )
),
contaminated AS (SELECT DISTINCT s.doc_id FROM s JOIN bench USING (ng)),
clean AS (
  SELECT r.doc_id, r.lang, r.n_chars,
         len(regexp_extract_all(r.text, '[0-9]+')) AS n_scrubbed
  FROM rep r ANTI JOIN contaminated c ON r.doc_id = c.doc_id
),
tgt(lang, share) AS (VALUES
  ('de', 0.15), ('en', 0.40), ('es', 0.15), ('fr', 0.15), ('zh', 0.15)),
counts AS (SELECT lang, COUNT(*) AS n FROM clean GROUP BY lang),
rates AS (
  SELECT c.lang, least(1.0, t.share * 150.0 / c.n) AS rate
  FROM counts c JOIN tgt t USING (lang)
),
kept AS (
  SELECT d.* FROM clean d JOIN rates r USING (lang)
  WHERE (r.rate >= 1.0 OR
         (('0x' || substr(md5('sample:42:' || d.doc_id), 1, 15))::BIGINT)::DOUBLE
         / 1152921504606846976.0 < r.rate)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(n_scrubbed) AS BIGINT) AS n_scrubbed
FROM kept GROUP BY lang
""",
)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5 curation stages composed as ONE lazy plan — repetition
    gate → benchmark decontamination (broadcast anti-join on shared
    3-grams) → PII scrub audit → target-mix resample — reported as
    per-lang survivor counts. The integration proof that the individually
    oracle-checked operators compose, and that Catalyst plans the
    composition: map-side gate + scrub, one broadcast anti-join, one
    count aggregate for the mix rates, one final aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    gated = corpus.filter(
        TX.repetition_gate("text", max_dup_word_frac=0.55,
                           max_dup_3gram_frac=0.05)
    )
    bench_ngrams = (
        D.shingle_table(docs.filter(F.col("doc_id") % 97 == 0), shingle_n=3)
        .select(F.explode("shingles").alias("ng")).distinct()
    )
    corpus_ngrams = D.shingle_table(corpus, shingle_n=3).select(
        "doc_id", F.explode("shingles").alias("ng")
    )
    contaminated = (
        corpus_ngrams.join(F.broadcast(bench_ngrams), on="ng")
        .select("doc_id").distinct()
    )
    clean = gated.join(contaminated, on="doc_id", how="left_anti").select(
        "doc_id", "lang", "n_chars",
        PII.match_count_expr("text", "[0-9]+").alias("_n_scrubbed"),
    )
    kept = mix_to_target(clean, "lang", _MIX_TARGETS, id_col="doc_id",
                         total=150, seed=42)
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum("_n_scrubbed").cast("long").alias("n_scrubbed"),
    )


# ---------------------------------------------------------------------------
# decontamination, hashed variant — the wire-size-optimized 100 TB shape
# ---------------------------------------------------------------------------

@query(
    "decontaminate_ngrams_hashed",
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
         ('0x' || substr(md5(unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' '))))), 1, 15)
         )::BIGINT AS ngh
  FROM t
),
bench AS (SELECT DISTINCT ngh FROM s WHERE doc_id % 97 = 0)
SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
FROM s JOIN bench USING (ngh)
WHERE s.doc_id % 97 <> 0
GROUP BY s.doc_id
ORDER BY n_shared_ngrams DESC, s.doc_id
""",
)
def decontaminate_ngrams_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`decontaminate_ngrams` with the n-grams replaced by their 60-bit
    md5 hashes BEFORE anything moves — the wire-size optimization the
    string variant's docstring promises for 100 TB: the broadcast eval-set
    becomes fixed-width longs (8 bytes vs arbitrary-length shingle text)
    and the join compares integers. Same output contract; a false positive
    needs an md5-60 collision (~2⁻⁶⁰ per pair). The md5 family keeps it
    oracle-checkable (functions/hashing.py)."""
    from vervectordb_spark.functions.hashing import md5_long

    docs = load_table(spark, sf_dir, "documents")
    sh = (
        D.shingle_table(docs, shingle_n=3)
        .select("doc_id", F.explode("shingles").alias("_ng"))
        .select("doc_id", md5_long(F.col("_ng")).alias("ngh"))
    )
    bench = sh.filter(F.col("doc_id") % 97 == 0).select("ngh").distinct()
    return (
        sh.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), on="ngh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
        .orderBy(F.desc("n_shared_ngrams"), "doc_id")
    )


# ---------------------------------------------------------------------------
# bloom-filter decontamination — constant-size eval-set membership.
# The broadcast-set variants (decontaminate_ngrams[_hashed]) ship the eval
# suite's n-grams verbatim; at a 100 TB corpus vs a many-benchmark eval
# union (10^7+ n-grams) the practical filter is a CONSTANT-size Bloom:
# over-removal at the fpp rate is the conservative, accepted error mode
# (a contaminated doc is never missed — no false negatives).
#
# Oracle trick: a bloom bit being set ⇔ its position being in the bench
# position set, so DuckDB replays the md5-family filter EXACTLY as a
# distinct-position semi-join (no 1<<63 bit packing, which DuckDB's
# shift-overflow check rejects) while Spark runs the real packed-bits
# probe (functions/bloom.bloom_prune) — bit-identical pass/fail per
# n-gram, hence identical per-doc counts.
# ---------------------------------------------------------------------------

_BLOOM_M = 1 << 15  # fixed so the oracle SQL is a literal; prod sizes by count
_BLOOM_K = 4

from vervectordb_spark.functions.hashing import affine_hash_sql as _aff  # noqa: E402

_NG_H = "(('0x' || substr(md5(ng), 1, 15))::BIGINT)"
_POS_LIST = "[" + ", ".join(
    f"({_aff(_NG_H, i)} % {_BLOOM_M})" for i in range(_BLOOM_K)
) + "]"


@query(
    "decontaminate_bloom",
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS ng
  FROM t
),
bpos AS (
  SELECT DISTINCT unnest({_POS_LIST}) AS p
  FROM (SELECT DISTINCT ng FROM s WHERE doc_id % 97 = 0)
),
cp AS (
  SELECT doc_id, ng, unnest({_POS_LIST}) AS p
  FROM s WHERE doc_id % 97 <> 0
),
pass AS (
  SELECT cp.doc_id, cp.ng
  FROM cp JOIN bpos USING (p)
  GROUP BY cp.doc_id, cp.ng
  HAVING COUNT(*) = {_BLOOM_K}
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_suspected
FROM pass GROUP BY doc_id
ORDER BY n_suspected DESC, doc_id
""",
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document count of n-grams flagged by a Bloom filter of the
    eval suite's n-grams (docs with doc_id % 97 == 0 stand in). Compared
    with `decontaminate_ngrams`' exact broadcast set this is the
    constant-memory form: the filter is 32768 bits (2^15) REGARDLESS of
    eval-suite size, counts can only over-state (no false negatives —
    every truly shared n-gram is flagged), and the gate's sf1 replay
    exercises the saturated-filter regime where false positives are
    plentiful — both engines must agree bit-for-bit there too.

    Scale posture: bench side = one bounded build job; corpus side =
    map-side probe at the scan + one groupBy(doc_id) — the corpus
    n-grams that fail the probe never shuffle."""
    from vervectordb_spark.functions.bloom import bloom_build, bloom_prune

    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_table(docs, shingle_n=3).select(
        "doc_id", F.explode("shingles").alias("ng")
    )
    bench = sh.filter(F.col("doc_id") % 97 == 0).select("ng").distinct()
    bf = bloom_build(bench, "ng", num_bits=_BLOOM_M, num_hashes=_BLOOM_K,
                     hash_family="md5")
    return (
        bloom_prune(sh.filter(F.col("doc_id") % 97 != 0), "ng", bf)
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_suspected"))
        .orderBy(F.desc("n_suspected"), "doc_id")
    )


# ---------------------------------------------------------------------------
# unigram surprisal — CCNet-style cheap LM quality proxy
# ---------------------------------------------------------------------------

from vervectordb_spark.functions.words import words_sql as _words_sql
from vervectordb_spark.queries import _cos

#: the shared bit-exact cosine twin, instantiated for the topic assignment
_cos_frag = _cos("e.embedding::DOUBLE[]", "c.cv")


@query(
    "doc_unigram_surprisal",
    oracle=f"""
WITH dw AS (SELECT doc_id, word FROM {_words_sql('documents', id_col='doc_id')}),
counts AS (SELECT word, COUNT(*)::BIGINT AS cnt FROM dw GROUP BY word),
tot AS (SELECT SUM(cnt)::BIGINT AS total FROM counts),
uni AS (
  SELECT word,
         ROUND(-log2(cnt::DOUBLE / t.total), 9)::DECIMAL(24,9) AS bits
  FROM counts CROSS JOIN tot t
)
SELECT d.doc_id,
       COUNT(*)::BIGINT AS n_words,
       ROUND(SUM(u.bits)::DOUBLE / COUNT(*), 6) AS bits_per_word
FROM dw d JOIN uni u USING (word)
GROUP BY d.doc_id
""",
)
def doc_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap LM quality proxy (operators/text.unigram_surprisal): mean
    bits/word of each document under the corpus's own unigram model —
    the gibberish/boilerplate separator CCNet-class pipelines gate on.
    One corpus aggregate + broadcast unigram join + one groupBy; the
    surprisal terms round to 9dp before exact decimal summation (the ln
    libm-drift contract from the weighted-sampling oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.unigram_surprisal(docs)


# ---------------------------------------------------------------------------
# hard-negative mining — contrastive-training data from the vector store
# ---------------------------------------------------------------------------

@query(
    "hard_negatives_topk",
    oracle="""
WITH qs AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 4
),
scored AS (
  SELECT q.query_id, e.vec_id,
         (CASE WHEN list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0
                 OR list_dot_product(q.qv, q.qv) = 0 THEN 0.0
          ELSE list_dot_product(e.embedding::DOUBLE[], q.qv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qv, q.qv))) END) AS sim
  FROM embeddings e CROSS JOIN qs q
),
gated AS (
  SELECT * FROM scored WHERE sim < 0.95 AND vec_id <> query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, vec_id) AS rk
  FROM gated
)
SELECT query_id, vec_id, rk::INTEGER AS rank, ROUND(sim, 6) AS sim
FROM ranked WHERE rk <= 5
""",
)
def hard_negatives_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/search.hard_negatives): per anchor,
    the 5 most-similar non-duplicate corpus rows (sim < 0.95, self
    excluded) — contrastive training pairs straight off the store. The
    dup gate runs before the per-query rank so positives never displace
    negatives in the window."""
    from vervectordb_spark.operators.search import hard_negatives
    from vervectordb_spark.schema import load_table as _lt

    emb = _lt(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    out = hard_negatives(emb, queries, top_k=5, dup_threshold=0.95)
    return out.select("query_id", "vec_id", "rank",
                      F.round("sim", 6).alias("sim"))


# ---------------------------------------------------------------------------
# topic-balanced sampling — cluster-quota curation over the embedding space
# ---------------------------------------------------------------------------

_TB_TOTAL = 160
_TB_K = 16


@query(
    "topic_balanced_sample",
    oracle=f"""
WITH cent AS (
  SELECT vec_id::INTEGER AS cluster_id, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < {_TB_K}
),
assigned AS (
  SELECT vec_id, cluster_id FROM (
    SELECT e.vec_id, c.cluster_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_cos_frag} DESC, c.cluster_id
           ) AS rk
    FROM embeddings e CROSS JOIN cent c
  ) WHERE rk = 1
),
topics AS (
  SELECT d.doc_id, CAST(a.cluster_id AS VARCHAR) AS topic
  FROM documents d JOIN assigned a ON a.vec_id = d.doc_id
),
counts AS (SELECT topic, COUNT(*) AS n FROM topics GROUP BY topic),
rates AS (
  SELECT topic, least(1.0, ({_TB_TOTAL}.0 / {_TB_K}) / n) AS rate FROM counts
),
kept AS (
  SELECT t.doc_id, t.topic FROM topics t JOIN rates r USING (topic)
  WHERE (r.rate >= 1.0 OR
         (('0x' || substr(md5('sample:42:' || t.doc_id), 1, 15))::BIGINT)::DOUBLE
         / 1152921504606846976.0 < r.rate)
)
SELECT doc_id, topic FROM kept
""",
)
def topic_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced curation draw: assign every document to its
    embedding topic (frozen-centroid argmax — the oracle-replayable
    assignment every IVF query shares), then resample to a UNIFORM
    topic mix with per-topic quota total/k via the same deterministic
    hash draw as domain_mix_resample — the 'balance the training mix by
    SEMANTIC cluster, not by metadata label' recipe. Full kept
    membership (doc_id, topic) crosses the hash gate.

    Scale: broadcast assignment (k-row nested-loop + per-row window),
    one k-row count aggregate broadcast back, map-side hash-draw filter
    — no corpus-sized shuffle at any point."""
    from vervectordb_spark.operators.ivf import IVFIndex
    from vervectordb_spark.schema import load_table as _lt

    emb = _lt(spark, sf_dir, "embeddings")
    docs = _lt(spark, sf_dir, "documents")
    cent = emb.filter(F.col("vec_id") < _TB_K).select(
        F.col("vec_id").cast("int").alias("cluster_id"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    idx = IVFIndex.from_centroids(emb, cent)
    topics = docs.select("doc_id").join(
        idx.assigned.select(F.col("vec_id").alias("doc_id"),
                            F.col("cluster_id").cast("string").alias("topic")),
        on="doc_id",
    )
    targets = {str(c): 1.0 / _TB_K for c in range(_TB_K)}
    kept = mix_to_target(topics, "topic", targets, id_col="doc_id",
                         total=_TB_TOTAL, seed=42)
    return kept.select("doc_id", "topic")


@query("quality_classifier_filter")
def quality_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (operators/quality.py — the CCNet /
    GPT-3-style trained stage): train MLlib LogisticRegression on the
    BOUNDED 80% training split (deterministic hash-draw cap, the train_pq
    sample pattern — every LBFGS iteration scans <= cap rows at any
    corpus size) with weak labels derived map-only on the same frame,
    then score EVERY held-out doc with the learned weights as a
    fold+sigmoid codegen projection — scan → Arrow featurize → project →
    filter, 0 shuffles (plan pinned in tests/test_quality.py).

    Registered rows-only by design: LR training is iterative and its
    weights are data-fit driver state DuckDB cannot derive — the scoring
    fold's NumPy parity, held-out agreement >= 0.9, and determinism are
    pinned in tests/test_quality.py instead (the same split as the
    learned-rotation profile's invariant gate)."""
    from vervectordb_spark.operators import quality as Q

    docs = load_table(spark, sf_dir, "documents")
    train_feats = Q.training_frame(
        docs.filter(F.col("doc_id") % 5 != 0), dim=64, cap=100_000)
    w, b = Q.train_quality_classifier(train_feats)
    held = docs.filter(F.col("doc_id") % 5 == 0)
    kept = Q.quality_filter(held, w, b, threshold=0.5, dim=64)
    return kept.select("doc_id", "lang", "source",
                       F.round("quality", 4).alias("quality"))


# ---------------------------------------------------------------------------
# curation pipeline v2 — the trained quality stage composed into the full
# chain as ONE lazy plan (VERDICT r6 #5)
# ---------------------------------------------------------------------------

#: frozen classifier fit + CJK token / md5 fragments — single-sourced
#: from the leaf modules (operators/quality, functions/oracle_fragments)
#: so queries_pretrain can share them without a query-module cycle.
from vervectordb_spark.functions.oracle_fragments import (  # noqa: E402
    MD5T as _QP_MD5T, MIXED_TOKS as _QP_MIXED_TOKS)
from vervectordb_spark.operators.quality import (  # noqa: E402
    FROZEN_QPB as _QPB, FROZEN_QPW as _QPW, FROZEN_QPW_SQL as _QP_W_SQL)


@query(
    "curation_pipeline_trained",
    oracle=f"""
WITH base AS (SELECT doc_id, lang, n_chars, text, {_TOKS} AS toks
              FROM documents WHERE doc_id % 97 <> 0),
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
gated AS (
  SELECT doc_id, lang, n_chars, text FROM m
  WHERE (CASE WHEN n_tokens >= 20 AND n_tokens <= 1000 THEN 0.3 ELSE 0.0 END
       + CASE WHEN avg_token_len >= 3.0 AND avg_token_len <= 12.0 THEN 0.3 ELSE 0.0 END
       + CASE WHEN punct_ratio < 0.3 THEN 0.2 ELSE 0.0 END
       + CASE WHEN stopword_ratio > 0.01 THEN 0.2 ELSE 0.0 END) >= 0.8
),
emb AS (
  SELECT doc_id,
    list_transform(CASE WHEN nrm = 0 THEN counts
                        ELSE list_transform(counts, x -> x / nrm) END,
                   x -> x::FLOAT)::DOUBLE[] AS ne
  FROM (
    SELECT doc_id, counts, sqrt(list_dot_product(counts, counts)) AS nrm
    FROM (
      SELECT doc_id,
        list_transform(range(0, 32),
          i -> len(list_filter(bks, b -> b = i))::DOUBLE) AS counts
      FROM (
        SELECT doc_id,
          list_transform({_QP_MIXED_TOKS}, t -> {_QP_MD5T} % 32) AS bks
        FROM gated
      )
    )
  )
),
trained AS (
  SELECT g.doc_id, g.lang, g.n_chars, g.text
  FROM gated g JOIN emb e USING (doc_id)
  WHERE ({_QPB!r} + list_dot_product(e.ne, {_QP_W_SQL})) >= 0.0
),
deduped AS (
  SELECT doc_id, lang, n_chars FROM (
    SELECT doc_id, lang, n_chars,
      ROW_NUMBER() OVER (
        PARTITION BY ('0x' || substr(md5(text), 1, 15))::BIGINT
        ORDER BY doc_id) AS rk
    FROM trained
  ) WHERE rk = 1
),
s AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS ng
  FROM base
),
bench AS (
  SELECT DISTINCT ng FROM (
    SELECT unnest(list_distinct(list_transform(
             range(1, greatest(len(toks) - 2, 1) + 1),
             i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS ng
    FROM (SELECT {_TOKS} AS toks FROM documents WHERE doc_id % 97 = 0)
  )
),
contaminated AS (SELECT DISTINCT s.doc_id FROM s JOIN bench USING (ng)),
clean AS (
  SELECT d.doc_id, d.lang, d.n_chars
  FROM deduped d ANTI JOIN contaminated c ON d.doc_id = c.doc_id
),
tgt(lang, share) AS (VALUES
  ('de', 0.15), ('en', 0.40), ('es', 0.15), ('fr', 0.15), ('zh', 0.15)),
counts AS (SELECT lang, COUNT(*) AS n FROM clean GROUP BY lang),
rates AS (
  SELECT c.lang, least(1.0, t.share * 150.0 / c.n) AS rate
  FROM counts c JOIN tgt t USING (lang)
),
kept AS (
  SELECT d.* FROM clean d JOIN rates r USING (lang)
  WHERE (r.rate >= 1.0 OR
         (('0x' || substr(md5('sample:42:' || d.doc_id), 1, 15))::BIGINT)::DOUBLE
         / 1152921504606846976.0 < r.rate)
),
c AS (
  SELECT doc_id, lang, n_chars,
    SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - n_chars AS start
  FROM kept
),
packed AS (
  SELECT doc_id, lang, n_chars,
         CAST(FLOOR(start::DOUBLE / 4000.0) AS BIGINT) AS bin_id,
         (('0x' || substr(md5('42:' || doc_id), 1, 15))::BIGINT) % 8 AS shard
  FROM c
)
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT bin_id) AS BIGINT) AS n_bins,
  CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM packed GROUP BY 1
""",
)
def curation_pipeline_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation pipeline v2 — the v1 chains EXTENDED with the trained
    quality stage, composed as ONE lazy plan (VERDICT r6 #5):

        heuristic gate → TRAINED classifier filter (frozen weights as
        plan literals, linear-fold threshold) → exact dedup →
        benchmark decontamination (broadcast anti-join on shared
        3-grams) → target-mix resample → 4000-token packing →
        training-shard assignment (the write_training_shards membership
        expr, pinned n_shards=8)

    reported as per-lang (docs, bins, shards, chars). The DuckDB twin
    replays every stage including the classifier fold: the trained filter
    is z >= logit(0.5) = 0 over the hashed-BoW embedding — bit-exact
    cross-engine (the fold contract), where sigmoid+exp would drift by
    ulps. Plan shape vs v1: ONE extra map stage (Arrow featurize + fold
    projection, no shuffle) — audited in tests/test_plans.py."""
    from vervectordb_spark.functions.hashing import seeded_md5_long
    from vervectordb_spark.operators import quality as Q
    from vervectordb_spark.operators.dedup import drop_exact_dups
    from vervectordb_spark.operators.embed import embed_documents
    from vervectordb_spark.operators.packing import pack_by_token_offset

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    gated = TX.quality_filter(corpus, min_score=0.8).filter("keep").select(
        "doc_id", "lang", "n_chars", "text")
    feats = embed_documents(gated, dim=32, passthrough=True)
    trained = feats.filter(
        Q.classifier_logit_expr(F.col("embedding"), _QPW, _QPB) >= 0.0
    ).drop("embedding")
    deduped = drop_exact_dups(trained).select("doc_id", "lang", "n_chars")
    bench_ngrams = (
        D.shingle_table(docs.filter(F.col("doc_id") % 97 == 0), shingle_n=3)
        .select(F.explode("shingles").alias("ng")).distinct()
    )
    corpus_ngrams = D.shingle_table(corpus, shingle_n=3).select(
        "doc_id", F.explode("shingles").alias("ng"))
    contaminated = (
        corpus_ngrams.join(F.broadcast(bench_ngrams), on="ng")
        .select("doc_id").distinct()
    )
    clean = deduped.join(contaminated, on="doc_id", how="left_anti")
    kept = mix_to_target(clean, "lang", _MIX_TARGETS, id_col="doc_id",
                         total=150, seed=42)
    packed = pack_by_token_offset(kept, token_col="n_chars", budget=4000,
                                  order_col="doc_id", stream_col="lang")
    sharded = packed.withColumn(
        "shard",
        F.pmod(seeded_md5_long(F.col("doc_id").cast("string"), 42),
               F.lit(8)))
    return sharded.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("bin_id").alias("n_bins"),
        F.count_distinct("shard").alias("n_shards"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


# ---------------------------------------------------------------------------
# temperature-flattened mix — target shares computed IN-PLAN from n^alpha
# ---------------------------------------------------------------------------

_TEMP_TOTAL = 250


@query(
    "domain_mix_temperature",
    oracle=f"""
WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
run AS (
  SELECT lang, n, sqrt(n::DOUBLE) AS w,
         SUM(sqrt(n::DOUBLE)) OVER (
           ORDER BY lang
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM counts),
d AS (SELECT MAX(run) AS D FROM run),
rates AS (
  SELECT r.lang,
         least(1.0, ((r.w / d.D) * {_TEMP_TOTAL}.0) / r.n::DOUBLE) AS rate
  FROM run r CROSS JOIN d),
kept AS (
  SELECT doc.doc_id, doc.lang FROM documents doc JOIN rates r USING (lang)
  WHERE (r.rate >= 1.0 OR
         (('0x' || substr(md5('sample:42:' || doc.doc_id), 1, 15))::BIGINT)::DOUBLE
         / 1152921504606846976.0 < r.rate)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept
FROM kept GROUP BY lang
""",
)
def domain_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling at alpha = 0.5 (sampling.mix_by_temperature):
    target shares ∝ sqrt(n_lang), computed IN-PLAN — the multilingual
    upweight-the-tail mixing rule, with no hand-provided target table.
    The share denominator folds in sorted-stratum order (a running
    window sum over the 5-row count table) so the float value — and
    therefore every acceptance boundary — replays bit-exact on DuckDB;
    sqrt is exactly rounded where pow is not, which is why the gated
    temperature is 1/2."""
    from vervectordb_spark.operators.sampling import mix_by_temperature

    docs = load_table(spark, sf_dir, "documents")
    kept = mix_by_temperature(docs, "lang", id_col="doc_id",
                              total=_TEMP_TOTAL, alpha=0.5, seed=42)
    return kept.groupBy("lang").agg(F.count("*").alias("n_kept"))


# ---------------------------------------------------------------------------
# interpolated bigram surprisal — the word-order-aware LM quality proxy
# ---------------------------------------------------------------------------

@query(
    "doc_bigram_surprisal",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                     x -> x <> '' AND regexp_matches(x, '^[a-z]+$')) AS a
  FROM documents),
tr AS (
  SELECT doc_id, pr.w1 AS w1, pr.w2 AS w2 FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(a)),
                  i -> {{'w1': a[i], 'w2': a[i + 1]}})) AS pr
    FROM t WHERE len(a) >= 2) q(doc_id, pr)),
uni AS (SELECT x AS word, COUNT(*)::BIGINT AS cnt
        FROM (SELECT unnest(a) AS x FROM t) GROUP BY x),
tot AS (SELECT SUM(cnt)::BIGINT AS total FROM uni),
bi AS (SELECT w1, w2, COUNT(*)::BIGINT AS bcnt FROM tr GROUP BY w1, w2),
sc AS (
  SELECT tr.doc_id,
         ROUND(-log2(0.75 * (b.bcnt::DOUBLE / u1.cnt::DOUBLE)
               + 0.25 * (u2.cnt::DOUBLE / tt.total::DOUBLE)),
               9)::DECIMAL(24,9) AS bits
  FROM tr JOIN bi b USING (w1, w2)
  JOIN uni u1 ON u1.word = tr.w1
  JOIN uni u2 ON u2.word = tr.w2
  CROSS JOIN tot tt)
SELECT doc_id, COUNT(*)::BIGINT AS n_transitions,
       ROUND(SUM(bits)::DOUBLE / COUNT(*), 6) AS bits_per_transition
FROM sc GROUP BY doc_id
""",
)
def doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram LM surprisal (operators/text.bigram_surprisal,
    λ=0.75): mean bits per word transition under the corpus's own
    bigram/unigram mix — the word-order-aware upgrade of
    doc_unigram_surprisal on the path to CCNet's KenLM filter. The
    unigram table broadcasts; the bigram table joins key-partitioned
    (it outgrows broadcast on web corpora); surprisal terms round to
    9dp before exact decimal summation (the ln libm-drift contract)."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.bigram_surprisal(docs)


@query(
    "doc_trigram_surprisal",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                     x -> x <> '' AND regexp_matches(x, '^[a-z]+$')) AS a
  FROM documents),
tr AS MATERIALIZED (
  SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(a) - 1),
                  i -> {{'w1': a[i], 'w2': a[i + 1], 'w3': a[i + 2]}})) AS g
    FROM t WHERE len(a) >= 3) q(doc_id, g)),
pr AS MATERIALIZED (
  SELECT g.w1 AS w1, g.w2 AS w2 FROM (
    SELECT unnest(list_transform(range(1, len(a)),
                  i -> {{'w1': a[i], 'w2': a[i + 1]}})) AS g
    FROM t WHERE len(a) >= 2) q(g)),
uni AS MATERIALIZED (
  SELECT x AS word, COUNT(*)::BIGINT AS cnt
  FROM (SELECT unnest(a) AS x FROM t) GROUP BY x),
tot AS (SELECT SUM(cnt)::BIGINT AS total FROM uni),
bi AS MATERIALIZED (
  SELECT w1, w2, COUNT(*)::BIGINT AS bcnt FROM pr GROUP BY w1, w2),
tri AS (SELECT w1, w2, w3, COUNT(*)::BIGINT AS tcnt
        FROM tr GROUP BY w1, w2, w3),
sc AS (
  SELECT tr.doc_id,
         ROUND(-log2(0.5 * (g.tcnt::DOUBLE / b12.bcnt::DOUBLE)
               + 0.375 * (b23.bcnt::DOUBLE / u2.cnt::DOUBLE)
               + 0.125 * (u3.cnt::DOUBLE / tt.total::DOUBLE)),
               9)::DECIMAL(24,9) AS bits
  FROM tr
  JOIN tri g USING (w1, w2, w3)
  JOIN bi b12 ON b12.w1 = tr.w1 AND b12.w2 = tr.w2
  JOIN bi b23 ON b23.w1 = tr.w2 AND b23.w2 = tr.w3
  JOIN uni u2 ON u2.word = tr.w2
  JOIN uni u3 ON u3.word = tr.w3
  CROSS JOIN tot tt)
SELECT doc_id, COUNT(*)::BIGINT AS n_transitions,
       ROUND(SUM(bits)::DOUBLE / COUNT(*), 6) AS bits_per_transition
FROM sc GROUP BY doc_id
""",
)
def doc_trigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-trigram LM surprisal (operators/text.trigram_surprisal,
    dyadic λ = 1/2, 3/8, 1/8): mean bits per 3-word transition under the
    corpus's own trigram/bigram/unigram Jelinek–Mercer mix — the last
    rung of the LM-proxy ladder (the measured bigram-vs-trigram decision
    is recorded in SCALE.md round-9 notes). The bigram AND trigram
    tables join key-partitioned; only the unigram table broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.trigram_surprisal(docs)


@query(
    "surprisal_bucket_mix",
    oracle=f"""
WITH dw AS (SELECT doc_id, word FROM {_words_sql('documents', id_col='doc_id')}),
counts AS (SELECT word, COUNT(*)::BIGINT AS cnt FROM dw GROUP BY word),
tot AS (SELECT SUM(cnt)::BIGINT AS total FROM counts),
uni AS (
  SELECT word,
         ROUND(-log2(cnt::DOUBLE / t.total), 9)::DECIMAL(24,9) AS bits
  FROM counts CROSS JOIN tot t
),
sc AS (
  SELECT d.doc_id,
         ROUND(SUM(u.bits)::DOUBLE / COUNT(*), 6) AS bpw
  FROM dw d JOIN uni u USING (word)
  GROUP BY d.doc_id
),
bk AS (
  SELECT doc.lang, s.doc_id, s.bpw,
         NTILE(3) OVER (PARTITION BY doc.lang
                        ORDER BY s.bpw, s.doc_id) AS bucket
  FROM sc s JOIN documents doc USING (doc_id)
),
kept AS (
  SELECT lang, doc_id, bucket,
         CASE bucket WHEN 1 THEN 1.0 WHEN 2 THEN 0.5 ELSE 0.1 END AS rate
  FROM bk
)
SELECT lang, bucket,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM kept
WHERE (rate >= 1.0 OR
       (('0x' || substr(md5('sample:42:' || doc_id), 1, 15))::BIGINT)::DOUBLE
       / 1152921504606846976.0 < rate)
GROUP BY lang, bucket
""",
)
def surprisal_bucket_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet head/middle/tail recipe (sampling.ntile_bucket_sample):
    rank each language's documents by unigram surprisal, cut into
    terciles (1 = lowest bits = "head"), keep head whole, middle at 50%,
    tail at 10% — quality-weighted corpus thinning with the same
    pure-row hash draw as every mix. The 6dp-rounded surprisal is
    bit-exact cross-engine, NTILE ties collapse to doc_id order, and the
    rate-1.0 head bucket is exact-keep — so full membership replays on
    DuckDB. One corpus-key window over (score, id) + a map-side filter
    beyond the surprisal operator's own shuffles."""
    from vervectordb_spark.operators.sampling import ntile_bucket_sample

    docs = load_table(spark, sf_dir, "documents")
    scored = TX.unigram_surprisal(docs).select(
        F.col("doc_id"), F.col("bits_per_word").alias("bpw"))
    scored = scored.join(docs.select("doc_id", "lang"), on="doc_id")
    kept = ntile_bucket_sample(
        scored, score_col="bpw", id_col="doc_id",
        rates={1: 1.0, 2: 0.5, 3: 0.1}, strata_col="lang",
        n_buckets=3, seed=42)
    return kept.groupBy("lang", "bucket").agg(
        F.count("*").cast("long").alias("n_kept"))


# ---------------------------------------------------------------------------
# Kneser-Ney 5-gram surprisal — the KenLM-class rung, fully SQL-replayed
# ---------------------------------------------------------------------------

_KN_P1 = "(c1.cc::DOUBLE / tt.t2::DOUBLE)"
_KN_P2 = ("(greatest(c2.cc::DOUBLE - 0.75, 0.0) / x2.den::DOUBLE"
          f" + (0.75 * x2.n::DOUBLE / x2.den::DOUBLE) * {_KN_P1})")
_KN_P3 = ("(greatest(c3.cc::DOUBLE - 0.75, 0.0) / x3.den::DOUBLE"
          f" + (0.75 * x3.n::DOUBLE / x3.den::DOUBLE) * {_KN_P2})")
_KN_P4 = ("(greatest(c4.cc::DOUBLE - 0.75, 0.0) / x4.den::DOUBLE"
          f" + (0.75 * x4.n::DOUBLE / x4.den::DOUBLE) * {_KN_P3})")
_KN_P5 = ("(greatest(coalesce(g5.cnt, 0)::DOUBLE - 0.75, 0.0)"
          " / x5.den5::DOUBLE"
          f" + (0.75 * x5.n5::DOUBLE / x5.den5::DOUBLE) * {_KN_P4})")


@query(
    "doc_kn5_surprisal",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                     x -> x <> '' AND regexp_matches(x, '^[a-z]+$')) AS a
  FROM documents),
tr AS MATERIALIZED (
  SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3, g.w4 AS w4,
         g.w5 AS w5 FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(a) - 3),
                  i -> {{'w1': a[i], 'w2': a[i + 1], 'w3': a[i + 2],
                         'w4': a[i + 3], 'w5': a[i + 4]}})) AS g
    FROM t WHERE len(a) >= 5) q(doc_id, g)),
g5 AS MATERIALIZED (
  SELECT w1, w2, w3, w4, w5, COUNT(*)::BIGINT AS cnt
  FROM tr GROUP BY w1, w2, w3, w4, w5),
q4 AS MATERIALIZED (
  SELECT g.w1 AS w1, g.w2 AS w2, g.w3 AS w3, g.w4 AS w4 FROM (
    SELECT unnest(list_transform(range(1, len(a) - 2),
                  i -> {{'w1': a[i], 'w2': a[i + 1], 'w3': a[i + 2],
                         'w4': a[i + 3]}})) AS g
    FROM t WHERE len(a) >= 4) q(g)),
c4t AS MATERIALIZED (
  SELECT w1, w2, w3, w4 FROM q4 GROUP BY w1, w2, w3, w4),
q3 AS MATERIALIZED (
  SELECT g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM (
    SELECT unnest(list_transform(range(1, len(a) - 1),
                  i -> {{'w1': a[i], 'w2': a[i + 1], 'w3': a[i + 2]}})) AS g
    FROM t WHERE len(a) >= 3) q(g)),
c3t AS MATERIALIZED (
  SELECT w1, w2, w3 FROM q3 GROUP BY w1, w2, w3),
q2 AS MATERIALIZED (
  SELECT g.w1 AS w1, g.w2 AS w2 FROM (
    SELECT unnest(list_transform(range(1, len(a)),
                  i -> {{'w1': a[i], 'w2': a[i + 1]}})) AS g
    FROM t WHERE len(a) >= 2) q(g)),
c2t AS MATERIALIZED (SELECT w1, w2 FROM q2 GROUP BY w1, w2),
x5 AS MATERIALIZED (
  SELECT w1, w2, w3, w4, SUM(cnt)::BIGINT AS den5, COUNT(*)::BIGINT AS n5
  FROM g5 GROUP BY w1, w2, w3, w4),
cc4 AS MATERIALIZED (
  SELECT w2, w3, w4, w5, COUNT(*)::BIGINT AS cc
  FROM g5 GROUP BY w2, w3, w4, w5),
x4 AS MATERIALIZED (
  SELECT w2, w3, w4, SUM(cc)::BIGINT AS den, COUNT(*)::BIGINT AS n
  FROM cc4 GROUP BY w2, w3, w4),
cc3 AS MATERIALIZED (
  SELECT w2, w3, w4, COUNT(*)::BIGINT AS cc
  FROM c4t GROUP BY w2, w3, w4),
x3 AS MATERIALIZED (
  SELECT w2, w3, SUM(cc)::BIGINT AS den, COUNT(*)::BIGINT AS n
  FROM cc3 GROUP BY w2, w3),
cc2 AS MATERIALIZED (
  SELECT w2, w3, COUNT(*)::BIGINT AS cc FROM c3t GROUP BY w2, w3),
x2 AS MATERIALIZED (
  SELECT w2, SUM(cc)::BIGINT AS den, COUNT(*)::BIGINT AS n
  FROM cc2 GROUP BY w2),
cc1 AS MATERIALIZED (
  SELECT w2, COUNT(*)::BIGINT AS cc FROM c2t GROUP BY w2),
tt AS (SELECT COUNT(*)::BIGINT AS t2 FROM c2t),
sc AS (
  SELECT tr.doc_id,
         ROUND(-log2({_KN_P5}), 9)::DECIMAL(24,9) AS bits
  FROM tr
  LEFT JOIN g5 USING (w1, w2, w3, w4, w5)
  JOIN x5 USING (w1, w2, w3, w4)
  JOIN cc4 c4 USING (w2, w3, w4, w5)
  JOIN x4 ON x4.w2 = tr.w2 AND x4.w3 = tr.w3 AND x4.w4 = tr.w4
  JOIN cc3 c3 ON c3.w2 = tr.w3 AND c3.w3 = tr.w4 AND c3.w4 = tr.w5
  JOIN x3 ON x3.w2 = tr.w3 AND x3.w3 = tr.w4
  JOIN cc2 c2 ON c2.w2 = tr.w4 AND c2.w3 = tr.w5
  JOIN x2 ON x2.w2 = tr.w4
  JOIN cc1 c1 ON c1.w2 = tr.w5
  CROSS JOIN tt)
SELECT doc_id, COUNT(*)::BIGINT AS n_transitions,
       ROUND(SUM(bits)::DOUBLE / COUNT(*), 6) AS bits_per_transition
FROM sc GROUP BY doc_id
""",
)
def doc_kn5_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney 5-gram LM surprisal (operators/text.
    kn5_surprisal, D = 0.75 dyadic): the KenLM-class rung the ladder
    previously stopped below, with REAL continuation counts (distinct
    left-extensions from the raw type table one order above, Chen &
    Goodman 1999) and proper Σ-over-continuation denominators at every
    level. Seven key-partitioned joins of the transition stream — the
    measured ~3× shuffle-volume cost over trigram that SCALE.md finding
    #16 records; only vocabulary-sized tables broadcast. Count pruning
    (prune_min_count) is available on the operator for model-size
    control and is exercised in pytest; the gated query scores
    unpruned."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.kn5_surprisal(docs)
