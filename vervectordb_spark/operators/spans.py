"""Exact duplicate-SPAN detection and removal — substring-level dedup
(Lee et al., "Deduplicating Training Data Makes Language Models Better",
ACL 2022, the ExactSubstr variant at token-gram granularity).

Document-level dedup (operators/dedup.py) drops whole near-identical
documents; this operator finds the duplicated REGIONS inside otherwise
distinct documents (boilerplate headers, quoted passages, license
blocks) and cuts just those tokens. Beyond the reference's scope
(nev8rz/VerVectorDB has no text pipeline) — included because repeated
spans are the dominant residual duplication after doc-level dedup on
web-scale corpora.

Semantics: tokens = lowercase pinned-whitespace split (words.WS_REGEX)
with empties dropped (contiguous
0-based positions); an L-gram is duplicated when its exact token sequence
occurs >= 2 times in the corpus (across OR within documents); a document's
duplicate spans are the per-document merged maximal unions of [p, p+L)
over its duplicated-gram start positions p. Removal drops the tokens
inside those spans from the ORIGINAL-case token stream and rejoins with
single spaces (whitespace-canonical, the standard normalization).

Gram identity is the 120-bit md5 key (two 60-bit longs from ONE md5 —
functions/hashing.md5_long + md5_long_hi). Span removal DESTROYS the
matched tokens, so a hash false positive cuts unique content: at 60
bits the expected collisions at the measured sf100 volume (2.4e8 grams)
were ~0.02 — guaranteed in volume at 100 TB; at 120 bits they are
n²/2^121 ≈ 2e-20 (and ~5e-13 at a trillion grams), the documented
residual false-positive cut rate. Lee et al. verify real bytes; this
is the distributed-join analogue of that verification margin.

Spark shape — the 100 TB posture (suffix arrays are a single-machine
design; the gram table IS the distributed analogue):
  1. gram emit is MAP-ONLY: per doc, transform(range) over the token
     array -> (doc, p, md5_120(gram)) — one row per token position,
     ONE md5 evaluated per gram (the hex staged in the struct, both
     longs derived after the explode).
  2. dup-gram membership via a SKEW-IMMUNE count aggregate (map-side
     partials absorb hot boilerplate grams) + a shuffle-HASH join of the
     positions against the dup-key set — no sort of the gram stream
     anywhere; the dup-key side is sized by duplicated content, not the
     corpus (strategies + sf100 measurements in
     duplicate_gram_positions).
  4. span merge is the gaps-and-islands window — one doc-key shuffle,
     exact integer arithmetic (replays on any engine).
  5. removal joins the per-doc span list (bounded by the doc's own
     length) back on doc_id and rebuilds the text as a map-only
     array-filter projection.
Nothing is ever all-pairs; every stage is linear in corpus tokens or in
duplicated-content volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vervectordb_spark.functions.words import WS_REGEX
from vervectordb_spark.functions.identifiers import sql_ident

#: the two-column 120-bit gram identity every join/group in this module
#: keys on (rationale in the module docstring).
GRAM_KEY = ["gram_h", "gram_h2"]


def doc_token_array(text_col: Column | str) -> Column:
    """Original-case token array: WS_REGEX split, empties dropped — positions
    are contiguous 0-based indexes into THIS array; the lowercase gram
    stream below indexes the same positions (lower() never changes
    token boundaries)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, WS_REGEX), lambda t: t != F.lit(""))


def _gram_arrow_kernel(staged: DataFrame, gram_len: int,
                       id_col: str) -> DataFrame:
    """Arrow-batched gram emit over a (id, _toks) DataFrame (tokens are
    computed JVM-side by the SAME expression as the expr path, so
    tokenization parity is structural): per doc, one md5 per gram over
    the space-joined token slice, both 60-bit halves extracted from the
    raw digest (hex[0:15] = bits 127..68, hex[15:30] = bits 67..8 —
    exactly md5_long / md5_long_hi). Output is bit-identical to the expr
    path (pytest-pinned); map-only, rows explode Python-side."""
    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)

    id_type = staged.schema[id_col].dataType
    out_schema = StructType([
        StructField(id_col, id_type),
        StructField("p", IntegerType()),
        StructField("gram_h", LongType()),
        StructField("gram_h2", LongType()),
    ])
    L = int(gram_len)

    def kern(batches):
        import hashlib

        import pandas as pd

        M60 = (1 << 60) - 1
        md5 = hashlib.md5
        for pdf in batches:
            ids: list = []
            ps: list = []
            h1: list = []
            h2: list = []
            for did, toks in zip(pdf[id_col], pdf["_toks"]):
                ts = list(toks) if toks is not None else []
                n = len(ts) - L + 1
                for p in range(n if n > 0 else 0):
                    H = int.from_bytes(
                        md5(" ".join(ts[p:p + L]).encode()).digest(),
                        "big")
                    ids.append(did)
                    ps.append(p)
                    h1.append(H >> 68)
                    h2.append((H >> 8) & M60)
            yield pd.DataFrame({id_col: ids, "p": ps,
                                "gram_h": h1, "gram_h2": h2})

    return staged.mapInPandas(kern, out_schema)


def gram_positions(docs: DataFrame, gram_len: int,
                   text_col: str = "text",
                   id_col: str = "doc_id",
                   kernel: str = "arrow") -> DataFrame:
    """(id, p, gram_h, gram_h2) — every L-gram start position with the
    120-bit md5 of its space-joined lowercase token sequence as two
    60-bit longs (collision rationale in the module docstring). Docs
    shorter than L tokens emit nothing.

    kernel="arrow" (default — the dedup.py dual-kernel pattern): tokens
    JVM-side, grams + md5 in one Python pass per Arrow batch; measured
    3.3× faster at sf10 (11.9 → 3.6 s; the emit was 62% of sf100
    span-dedup cost), carrying remove_duplicate_spans from 31.0 → 10.4 s
    at sf10 (SCALE.md finding #11). kernel="expr" is the
    DuckDB-oracle-replayable spec the arrow kernel is pinned
    bit-identical to (tests/test_spans.py).

    Expr path STAGED like operators/embed.py: the token array
    materializes behind its own projection before the gram transform
    references it — inlined into the lambda, the filter∘split would
    re-tokenize once PER GRAM POSITION (O(tokens²) per doc; measured 6×
    slower at sf0.1). The hex digest is staged in the per-gram struct so
    md5 runs ONCE per gram; both longs derive after the explode."""
    from vervectordb_spark.functions.partitioning import widen_narrow_scan

    toks = F.expr(f"filter(split(lower({sql_ident(text_col)}), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), "
                  "t -> t != '')")
    # gram emit is the heavy stage (62% of sf100 span cost) — split a
    # narrow single-row-group scan across cores; no-op at real layouts
    staged = widen_narrow_scan(docs).select(F.col(id_col),
                                            toks.alias("_toks"))
    if kernel == "arrow":
        return _gram_arrow_kernel(staged, gram_len, id_col)
    if kernel != "expr":
        raise ValueError(f"unknown kernel {kernel!r}: use 'arrow' or 'expr'")
    tcol = F.col("_toks")
    grams = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest(F.size(tcol) - F.lit(gram_len), F.lit(-1)),
        ),
        lambda i: F.struct(
            i.cast("int").alias("p"),
            F.md5(F.concat_ws(
                " ", F.slice(tcol, i + 1, gram_len))).alias("m"),
        ),
    )
    # sequence(0, -1) DESCENDS in Spark — short docs must short-circuit
    grams = F.when(F.size(tcol) >= gram_len, grams).otherwise(
        F.array().cast("array<struct<p:int,m:string>>"))
    return (staged.select(F.col(id_col), F.explode(grams).alias("g"))
            .select(id_col, F.col("g.p").alias("p"),
                    F.conv(F.substring("g.m", 1, 15), 16, 10)
                    .cast("long").alias("gram_h"),
                    F.conv(F.substring("g.m", 16, 15), 16, 10)
                    .cast("long").alias("gram_h2")))


def duplicate_gram_positions(docs: DataFrame, gram_len: int,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             strategy: str = "count_join",
                             kernel: str = "arrow") -> DataFrame:
    """(id, p) start positions whose L-gram occurs >= 2 times in the
    corpus. Two executable shapes, measured at sf100 (5 M docs, 236 M
    grams, 10.7 M dup keys, local[32]):

    * "count_join" (default — the 100 TB shape): count aggregate over
      the 120-bit gram key (map-side partial combine makes it SKEW-IMMUNE: a
      boilerplate gram occurring 10^8 times still reduces to one count
      row) -> shuffle-HASH join of the re-emitted position stream
      against the dup-key set (hash, never sort-merge — sorting 236 M
      rows is what made the window variant >2x slower). Costs a second
      gram emit; 296 s at sf100.
    * "collect": ONE shuffle — collect_list of (id, p) per gram, filter
      size >= 2, explode. No re-emit, no sort; 191 s at sf100. The
      fastest shape, but a hot gram concentrates its whole occurrence
      list on one reducer — use on corpora already stop-gram-filtered
      or bounded (the dedup.py max_bucket_size rationale).

    (A count window over gram_h was measured dominated: same one-reducer
    hot-key hazard as "collect" PLUS a full sort of the gram stream —
    >590 s at sf100.)"""
    pos = gram_positions(docs, gram_len, text_col, id_col, kernel=kernel)
    if strategy == "collect":
        return (pos.groupBy(*GRAM_KEY)
                .agg(F.collect_list(F.struct(id_col, "p")).alias("_occ"))
                .filter(F.size("_occ") >= 2)
                .select(F.explode("_occ").alias("_o"))
                .select(F.col(f"_o.{id_col}").alias(id_col),
                        F.col("_o.p").alias("p")))
    if strategy != "count_join":
        raise ValueError(
            f"unknown strategy {strategy!r}: use 'count_join' or 'collect'")
    dup_keys = (pos.groupBy(*GRAM_KEY).agg(F.count("*").alias("_c"))
                .filter(F.col("_c") >= 2).select(*GRAM_KEY))
    return (pos.join(dup_keys.hint("shuffle_hash"), on=GRAM_KEY)
            .select(id_col, "p"))


def _merged_islands(marks: DataFrame, gram_len: int,
                    id_col: str) -> DataFrame:
    """Gaps-and-islands merge of duplicated-gram start positions
    (id, p) -> (id, span_start, span_end, n_grams): union of [p, p+L)
    merged where intervals touch (a new island starts where p exceeds
    the running max end). Exact integer arithmetic, one doc-key window
    — replays on any engine. span_end is exclusive."""
    L = int(gram_len)
    marks = marks.select(
        id_col, F.col("p").alias("s"), (F.col("p") + L).alias("e"))
    w = (Window.partitionBy(id_col).orderBy("s")
         .rowsBetween(Window.unboundedPreceding, -1))
    flagged = marks.withColumn(
        "_new",
        F.when(F.col("s") > F.coalesce(F.max("e").over(w), F.lit(-1)), 1)
        .otherwise(0))
    wid = (Window.partitionBy(id_col).orderBy("s")
           .rowsBetween(Window.unboundedPreceding, 0))
    islands = flagged.withColumn("_isl", F.sum("_new").over(wid))
    return (islands.groupBy(id_col, "_isl")
            .agg(F.min("s").alias("span_start"),
                 F.max("e").alias("span_end"),
                 F.count("*").alias("n_grams"))
            .drop("_isl"))


def duplicate_spans(docs: DataFrame, gram_len: int,
                    text_col: str = "text",
                    id_col: str = "doc_id",
                    strategy: str = "count_join",
                    kernel: str = "arrow") -> DataFrame:
    """(id, span_start, span_end, n_grams) merged maximal duplicated
    intervals per document (_merged_islands over the duplicated-gram
    start positions)."""
    marks = duplicate_gram_positions(docs, gram_len, text_col, id_col,
                                     strategy=strategy, kernel=kernel)
    return _merged_islands(marks, gram_len, id_col)


def remove_duplicate_spans(docs: DataFrame, gram_len: int,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           out_col: str = "clean_text",
                           strategy: str = "count_join",
                           kernel: str = "arrow") -> DataFrame:
    """Every input column + (out_col, n_tokens, n_tokens_removed): the
    document with its duplicated spans' tokens cut (original case,
    single-space rejoin). Documents with no duplicated span pass through
    with their canonical whitespace-rejoined text and
    n_tokens_removed = 0 (a left join against the span table — the
    no-span side never shuffles more than the one doc-key join).

    Fails fast (the featurize/embed_documents contract) when any output
    or internal staging column already exists on the input — withColumn
    would silently overwrite it."""
    spans = duplicate_spans(docs, gram_len, text_col, id_col,
                            strategy=strategy, kernel=kernel)
    return apply_span_cuts(docs, spans, text_col, id_col, out_col)


def apply_span_cuts(docs: DataFrame, spans: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    out_col: str = "clean_text") -> DataFrame:
    """Cut a (id, span_start, span_end) interval table out of the
    documents: the shared removal tail of remove_duplicate_spans and
    incremental_remove_duplicate_spans. Fails fast on output/staging
    column collisions (the featurize/embed_documents contract)."""
    reserved = {out_col, "n_tokens", "n_tokens_removed",
                "_spans", "_toks", "_kept"}
    clash = sorted(reserved & set(docs.columns))
    if clash:
        raise ValueError(
            f"apply_span_cuts would overwrite existing column(s) "
            f"{clash}; rename them (or pass a different out_col) first")
    spans = (spans
             .groupBy(id_col)
             .agg(F.collect_list(
                 F.struct(F.col("span_start").alias("s"),
                          F.col("span_end").alias("e"))).alias("_spans")))
    joined = docs.join(spans, on=id_col, how="left").withColumn(
        "_spans",
        F.coalesce(F.col("_spans"),
                   F.array().cast("array<struct<s:int,e:int>>")))
    # staged (the gram_positions rationale): token array and kept-token
    # array materialize once per row; out_col / the two counts reference
    # the staged columns instead of re-running split+filter per use
    staged = joined.withColumn("_toks", doc_token_array(text_col))
    indexed = F.transform(
        F.col("_toks"),
        lambda t, i: F.struct(t.alias("t"), i.cast("int").alias("i")))
    staged = staged.withColumn(
        "_kept",
        F.filter(
            indexed,
            lambda x: ~F.exists(
                F.col("_spans"),
                lambda sp: (x["i"] >= sp["s"]) & (x["i"] < sp["e"]))))
    return (staged
            .withColumn("n_tokens", F.size("_toks").cast("bigint"))
            .withColumn(
                out_col,
                F.concat_ws(" ", F.transform(F.col("_kept"),
                                             lambda x: x["t"])))
            .withColumn(
                "n_tokens_removed",
                (F.size("_toks") - F.size("_kept")).cast("bigint"))
            .drop("_spans", "_toks", "_kept"))


# ---------------------------------------------------------------------------
# incremental span dedup — the daily-crawl shape for ExactSubstr
# ---------------------------------------------------------------------------

def gram_history(docs: DataFrame, gram_len: int,
                 text_col: str = "text", id_col: str = "doc_id",
                 kernel: str = "arrow") -> DataFrame:
    """(gram_h, gram_h2, n_occurrences) — the persisted gram-state table
    an incremental ExactSubstr pipeline carries between batches: the
    distinct 120-bit gram keys of the accepted corpus with their
    occurrence counts (counts feed the stop-gram cap; the table is sized
    by DISTINCT grams, not occurrences). At scale persist it BUCKETED on
    gram_h so each batch's dup-key join co-locates without reshuffling
    history (the incremental_duplicate_spans contract)."""
    return (gram_positions(docs, gram_len, text_col, id_col, kernel=kernel)
            .groupBy(*GRAM_KEY)
            .agg(F.count("*").cast("bigint").alias("n_occurrences")))


def update_gram_history(history: DataFrame,
                        batch_grams: DataFrame) -> DataFrame:
    """Merged history after accepting a batch: counts sum per gram key
    (both inputs in the gram_history shape). One key-partitioned
    aggregate; with both sides bucketed on gram_h it is shuffle-free."""
    return (history.unionByName(batch_grams)
            .groupBy(*GRAM_KEY)
            .agg(F.sum("n_occurrences").cast("bigint")
                 .alias("n_occurrences")))


def incremental_duplicate_spans(new_df: DataFrame, history: DataFrame,
                                gram_len: int,
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                stop_gram_count: int | None = None,
                                kernel: str = "arrow") -> DataFrame:
    """(id, span_start, span_end, n_grams) duplicated spans of the NEW
    batch only — the daily-crawl ExactSubstr shape (the span twin of
    dedup.incremental_near_dup_pairs): a new-batch gram is duplicated
    when it occurs in the persisted HISTORY gram table (gram_history
    shape) or >= 2 times within the batch itself. History positions are
    never re-derived and history never self-pairs — grams duplicated
    only inside history produce no marks (marks come from new-batch
    positions alone), so each increment costs |new| gram work + one
    key join against the state table, not a full-corpus recompute.

    stop_gram_count: history grams above this occurrence count are
    dropped from matching (stop-grams — at small L, ubiquitous
    function-word grams would cut real content; the
    max_bucket_size/winnow cap rationale). None matches everything.

    Join shape: the dup-key side is history keys ∪ the batch's own
    dup keys — shuffle-HASH joined against the batch positions (never a
    sort). History is corpus-sized: persist it BUCKETED on gram_h so
    the per-batch join co-locates instead of reshuffling state (measured
    cost ∝ |new| with history fixed — SCALE.md round-9 table)."""
    pos = gram_positions(new_df, gram_len, text_col, id_col, kernel=kernel)
    hist_keys = history
    if stop_gram_count is not None:
        hist_keys = hist_keys.filter(
            F.col("n_occurrences") <= int(stop_gram_count))
    hist_keys = hist_keys.select(*GRAM_KEY)
    batch_dups = (pos.groupBy(*GRAM_KEY).agg(F.count("*").alias("_c"))
                  .filter(F.col("_c") >= 2).select(*GRAM_KEY))
    # history and batch dup-keys are joined SEPARATELY and the marks
    # unioned (distinct on batch-sized (id, p), not on corpus-sized gram
    # keys): a union+distinct of the key sides would force a full
    # reshuffle of the history keys every batch even when the state is
    # persisted bucketed on the gram key (operators/span_state) —
    # keeping the history branch join-only is what lets the bucketed
    # layout drop the per-batch history shuffle (SCALE.md finding #12).
    hist_marks = (pos.join(hist_keys.hint("shuffle_hash"), on=GRAM_KEY)
                  .select(id_col, "p"))
    batch_marks = (pos.join(batch_dups.hint("shuffle_hash"), on=GRAM_KEY)
                   .select(id_col, "p"))
    marks = hist_marks.unionByName(batch_marks).distinct()
    return _merged_islands(marks, gram_len, id_col)


def incremental_remove_duplicate_spans(new_df: DataFrame,
                                       history: DataFrame,
                                       gram_len: int,
                                       text_col: str = "text",
                                       id_col: str = "doc_id",
                                       out_col: str = "clean_text",
                                       stop_gram_count: int | None = None,
                                       kernel: str = "arrow") -> DataFrame:
    """incremental_duplicate_spans applied: every NEW-batch column +
    (out_col, n_tokens, n_tokens_removed), spans cut only in the new
    batch. The operational form of span dedup on a growing corpus —
    history text is immutable; only its gram-key state participates."""
    spans = incremental_duplicate_spans(
        new_df, history, gram_len, text_col, id_col,
        stop_gram_count=stop_gram_count, kernel=kernel)
    return apply_span_cuts(new_df, spans, text_col, id_col, out_col)
