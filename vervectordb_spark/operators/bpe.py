"""Distributed BPE vocabulary training (Sennrich et al., ACL 2016) — the
canonical tokenizer-training pass of an LLM data pipeline.

Beyond the reference's scope (nev8rz/VerVectorDB has no text pipeline,
vervectordb/__init__.py:247-262); included because a training-data engine
that scores/dedups/packs token sequences needs the merge table those
token counts come from.

Spark shape — the part that matters at 100 TB:
  1. ONE corpus-sized job: lowercase/split/explode words -> groupBy(word)
     count. The shuffle carries (word, partial count); the result is the
     DISTINCT-WORD table, whose size is a property of the language
     (~1e5..1e7 rows), NOT of the corpus. 100 TB of text reduces to a
     vocabulary that fits on one executor.
  2. Every merge iteration then runs on that small table only:
     pair-count aggregate (explode adjacent symbol pairs weighted by the
     word count, groupBy pair) -> deterministic argmax (count desc, pair
     asc) -> greedy left-to-right merge applied as ONE F.aggregate fold
     per row. The corpus is never rescanned.
  3. Lineage is cut once per iteration (localCheckpoint on the KB..MB
     vocab table): k chained fold stages + the pair-explode Generate
     would otherwise trip the InferFiltersFromGenerate substitution
     blowup documented in operators/rotation._stage_expr, and iterative
     lineage growth is the standard thing to truncate in iterative Spark
     algorithms regardless.

Cross-engine contract (the DuckDB oracle replays training bit-for-bit):
  - symbols = per-codepoint split of the word, no end-of-word marker
    (merges never cross word boundaries by construction; documented
    variant of Sennrich's </w> scheme).
  - pair counts weight each adjacent pair by the word's corpus count and
    count OVERLAPPING occurrences ('aaa' contributes (a,a) twice) — both
    engines enumerate positions i, i+1.
  - the winning pair is max by (count desc, left asc, right asc).
  - merge application is the greedy left-to-right non-overlapping fold:
    acc = (out, pending); (pending==left AND x==right) emits left||right,
    else pending flushes and x becomes pending. DuckDB replays it with
    list_reduce over an init-prepended list (see queries_bpe.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vervectordb_spark.functions.checkpoint import eager_checkpoint
from vervectordb_spark.functions.words import ASCII_WORDS, WS_REGEX, words


@dataclass(frozen=True)
class Merge:
    step: int
    left: str
    right: str
    count: int

    @property
    def symbol(self) -> str:
        return self.left + self.right


def word_counts(df: DataFrame, text_col: str = "text",
                word_pattern: str | None = ASCII_WORDS) -> DataFrame:
    """(word, n) distinct-word counts — the one corpus-sized job. Word
    extraction is the shared functions/words contract."""
    return (words(df, text_col, word_pattern=word_pattern)
            .groupBy("word").agg(F.count("*").cast("bigint").alias("n")))


def with_symbols(vocab: DataFrame, word_col: str = "word",
                 out_col: str = "symbols") -> DataFrame:
    """Initial symbol sequences: one codepoint per symbol."""
    return vocab.withColumn(out_col, F.split(F.col(word_col), ""))


def pair_counts(vocab: DataFrame, symbols_col: str = "symbols",
                weight_col: str = "n") -> DataFrame:
    """(left, right, cnt) adjacent-pair counts weighted by word count.
    Guard: F.sequence(1, 0) DESCENDS in Spark, so single-symbol words
    must short-circuit to an empty pair list (plain explode then drops
    them). Map-side partials reduce each task to |pairs| rows."""
    s = F.col(symbols_col)
    pairs = F.when(
        F.size(s) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(s) - 1),
            lambda i: F.struct(
                F.element_at(s, i).alias("left"),
                F.element_at(s, i + 1).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
    return (
        vocab.select(F.col(weight_col).alias("_w"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("_w").cast("bigint").alias("cnt"))
    )


def top_pair(pairs: DataFrame) -> Merge | None:
    """Deterministic argmax: count desc, then (left, right) asc —
    TakeOrderedAndProject of ONE row."""
    rows = (pairs.orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1).collect())
    if not rows:
        return None
    r = rows[0]
    return Merge(step=0, left=r["left"], right=r["right"], count=r["cnt"])


def merge_fold_expr(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of (left, right) ->
    left||right as one F.aggregate fold with a (out, pending) struct
    accumulator; the finish lambda flushes the trailing pending symbol.
    The exact fold the DuckDB oracle replays with list_reduce."""
    merged = left + right
    return F.aggregate(
        symbols,
        F.struct(F.array().cast("array<string>").alias("out"),
                 F.lit(None).cast("string").alias("pending")),
        lambda acc, x: F.when(
            (acc["pending"] == F.lit(left)) & (x == F.lit(right)),
            F.struct(F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                     F.lit(None).cast("string").alias("pending")),
        ).when(
            acc["pending"].isNull(),
            F.struct(acc["out"].alias("out"), x.alias("pending")),
        ).otherwise(
            F.struct(F.concat(acc["out"], F.array(acc["pending"])).alias("out"),
                     x.alias("pending")),
        ),
        lambda acc: F.when(acc["pending"].isNull(), acc["out"])
                     .otherwise(F.concat(acc["out"], F.array(acc["pending"]))),
    )


def apply_merge(vocab: DataFrame, left: str, right: str,
                symbols_col: str = "symbols") -> DataFrame:
    return vocab.withColumn(
        symbols_col, merge_fold_expr(F.col(symbols_col), left, right)
    )


def train_bpe(df: DataFrame, n_merges: int, text_col: str = "text",
              word_pattern: str | None = ASCII_WORDS,
              ) -> tuple[list[Merge], DataFrame]:
    """Learn n_merges BPE merges. Returns (merges, final vocab frame with
    the merged symbol sequences). One corpus job, then n_merges rounds
    over the distinct-word table with lineage cut per round."""
    vocab = with_symbols(word_counts(df, text_col, word_pattern))
    vocab, ckpt = eager_checkpoint(vocab)
    merges: list[Merge] = []
    for step in range(1, n_merges + 1):
        best = top_pair(pair_counts(vocab))
        if best is None or best.count <= 0:
            break
        best = Merge(step=step, left=best.left, right=best.right,
                     count=best.count)
        merges.append(best)
        vocab = apply_merge(vocab, best.left, best.right)
        # cut lineage: k chained folds + the next pair-explode Generate
        # is exactly the rotation.py substitution hazard, and the table
        # is vocabulary-sized (KB..MB), so the checkpoint is ~free.
        # eager_checkpoint RELEASES the previous round's blocks — the
        # per-round leak bench's state-hygiene gate caught (finding #15).
        vocab, ckpt = eager_checkpoint(vocab, release=ckpt)
    # callers free the final round with release_checkpoint(vocab)
    # (vocab._ckpt_ids is set); DataFrame.unpersist() would be a no-op.
    return merges, vocab


def segment_word(word: str, merges: list[Merge]) -> list[str]:
    """Driver-side reference segmentation (tests + single-word use):
    apply the learned merges in order with the same greedy fold."""
    syms = list(word)
    for m in merges:
        out: list[str] = []
        pending: str | None = None
        for x in syms:
            if pending == m.left and x == m.right:
                out.append(m.symbol)
                pending = None
            elif pending is None:
                pending = x
            else:
                out.append(pending)
                pending = x
        if pending is not None:
            out.append(pending)
        syms = out
    return syms


def words_with_pos(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   word_pattern: str | None = ASCII_WORDS) -> DataFrame:
    """(id, wpos, word) positional word stream — map-only posexplode of
    the SAME lowercase/WS_REGEX split words() uses. wpos is the 0-based index
    into the RAW split array (filtered empties/out-of-scope words leave
    gaps), so positions are a pure function of the text on any engine."""
    from vervectordb_spark.functions.partitioning import widen_narrow_scan

    out = widen_narrow_scan(df).select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), WS_REGEX))
        .alias("wpos", "word"),
    ).filter(F.col("word") != "")
    if word_pattern is not None:
        out = out.filter(F.col("word").rlike(word_pattern))
    return out


#: broadcast gate for vocabulary-side joins (the bounded-dims-only rule,
#: SCALE.md finding #6): a 1e6-row segmentation table is ~100 MB serialized
#: — still broadcastable; a 1e7-row web vocabulary (Heaps' law at corpus
#: scale) is not, and a forced hint would also strip AQE's ability to
#: demote. Above the gate the join is left unhinted so AQE picks the
#: strategy (shuffle-hash on the word key).
BROADCAST_VOCAB_MAX_ROWS = 1_000_000


def maybe_broadcast_vocab(vocab_side: DataFrame,
                          max_rows: int = BROADCAST_VOCAB_MAX_ROWS,
                          known_rows: int | None = None) -> DataFrame:
    """Hint broadcast only when the vocab side is proven <= max_rows.
    Callers that already know the row count pass known_rows and the
    probe is skipped entirely (no Spark job at plan-construction time).
    Otherwise the probe is a plain .count() — a partial-agg that
    shuffles one long per partition, NOT a global limit that funnels up
    to max_rows+1 rows into a single partition (train_bpe's vocab is
    lineage-cut so the scan is cheap either way). Returns the frame
    unhinted above the gate."""
    n = vocab_side.count() if known_rows is None else known_rows
    if n <= max_rows:
        return F.broadcast(vocab_side)
    return vocab_side


def segmentation_table(vocab: DataFrame, word_col: str = "word",
                       symbols_col: str = "symbols") -> DataFrame:
    """(word, symbols) — the trained vocab IS the segmentation table for
    in-vocabulary words (train_bpe's merge folds already segmented every
    distinct corpus word; no per-document re-folding ever needed)."""
    return vocab.select(word_col, symbols_col)


def symbol_ids(vocab: DataFrame, symbols_col: str = "symbols") -> DataFrame:
    """(symbol, token_id) dense contiguous ids, 0-based, ordered by the
    symbol string — the deterministic id assignment any engine replays
    (row_number over a vocabulary-sized distinct; KB-class shuffle)."""
    from pyspark.sql import Window

    return (
        vocab.select(F.explode(F.col(symbols_col)).alias("symbol"))
        .distinct()
        .select(
            "symbol",
            (F.row_number().over(Window.orderBy("symbol")) - 1)
            .cast("int").alias("token_id"),
        )
    )


def encode_documents(docs: DataFrame, vocab: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     word_pattern: str | None = ASCII_WORDS,
                     broadcast_max_rows: int = BROADCAST_VOCAB_MAX_ROWS,
                     vocab_rows: int | None = None) -> DataFrame:
    """Tokenize the corpus under a trained BPE vocabulary: (id, wpos,
    spos, symbol, token_id), one row per token. The output carries NO
    ordering guarantee (it ends in two joins); a document's token
    sequence is RECOVERED by sorting on (id, wpos, spos) — which is why
    the columns are there. Exporters that need ordered sequences should
    collect_list(struct(wpos, spos, token_id)) + array_sort per doc, or
    orderBy at the sink. This IS the corpus → token-id-sequence step
    every training-data export ends with.

    100 TB shape: the corpus side is MAP-ONLY end to end — positional
    word explode, join against the vocabulary's segmentation table
    (language-sized, ~1e5..1e7 rows; broadcast-hinted only under the
    maybe_broadcast_vocab gate — a 1e7-row web vocabulary falls back to
    AQE's choice, shuffle-hash on the word key), symbol posexplode,
    join against the (symbol, token_id) map under the same gate. With
    the broadcasts taken, zero corpus shuffles; the only other shuffle
    is the KB-class row_number inside symbol_ids.
    Out-of-vocabulary words (absent from the training corpus / outside
    the scope pattern) drop via the inner join — encode with a vocab
    trained on a superset corpus, or segment stragglers driver-side with
    segment_word.

    The broadcast gate probes the vocab ONCE (or not at all when the
    caller passes vocab_rows) and reuses the decision for both joins —
    the symbol-id table's rows are the distinct subword units
    (alphabet + merges), bounded well under the word-vocabulary size,
    so one decision covers both sides."""
    if vocab_rows is None:
        vocab_rows = vocab.count()
    seg = maybe_broadcast_vocab(segmentation_table(vocab),
                                broadcast_max_rows, known_rows=vocab_rows)
    ids = maybe_broadcast_vocab(symbol_ids(vocab), broadcast_max_rows,
                                known_rows=vocab_rows)
    toks = (
        words_with_pos(docs, text_col, id_col, word_pattern)
        .join(seg, on="word")
        .select(
            id_col, "wpos",
            F.posexplode("symbols").alias("spos", "symbol"),
        )
    )
    return toks.join(ids, on="symbol").select(
        id_col, "wpos", "spos", "symbol", "token_id")
