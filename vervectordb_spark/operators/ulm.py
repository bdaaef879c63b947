"""Distributed unigram-LM tokenizer (Kudo 2018, the SentencePiece family)
— the second canonical subword tokenizer of LLM data pipelines, beside
BPE (operators/bpe.py).

Beyond the reference's scope (no text pipeline there); included for the
same reason BPE is: a training-data engine that counts/packs/scores
token sequences needs BOTH dominant tokenizer families, and ULM is what
Llama/T5-class vocabularies ship.

Model: a piece inventory with log-probabilities; segmentation of a word
is the Viterbi argmax over all piece covers. Training here is HARD-EM
(Viterbi E-step), the standard practical simplification: seed with
frequent substrings, iterate (segment under current scores → re-count
pieces along best paths → re-estimate scores), prune pieces that win no
path. All arithmetic that decides ANYTHING is integer:

  - piece scores are quantized log2-probs, `round(log2(cnt/total)*2^16)`
    — Viterbi sums and comparisons are exact int64, so the best path is
    engine-deterministic (tie-break: higher total; then the path whose
    LAST piece starts earlier, i.e. the longest final piece — applied
    recursively this makes the argmax unique);
  - the oracle replays the ENTIRE Viterbi DP in SQL (recursive CTE over
    the carried best-score list) from the committed model artifact —
    see queries_ulm.py — which is what int quantization buys.

Spark shape at 100 TB (the BPE shape): ONE corpus job builds the
distinct-word table (vocabulary-sized, a property of the language, not
the corpus); EM iterations and segmentation run on that table only via
an Arrow-batched kernel with the piece inventory broadcast (the
inventory is KB..MB — centroid-class state). Corpus encode is then a
map-only join against the segmentation table (maybe_broadcast gate),
identical to bpe.encode_documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vervectordb_spark.functions.checkpoint import (
    eager_checkpoint, release_blocks)
from vervectordb_spark.functions.words import ASCII_WORDS
from vervectordb_spark.operators.bpe import (
    BROADCAST_VOCAB_MAX_ROWS, maybe_broadcast_vocab, word_counts,
    words_with_pos)

#: log2-prob quantization: scores are round(log2(p) * 2^SCORE_SHIFT)
SCORE_SHIFT = 16
#: seed inventory: substrings up to this length
MAX_PIECE_LEN = 6
DEFAULT_SEED_SIZE = 512
DEFAULT_EM_ITERS = 3


def viterbi_segment(word: str, scores: dict[str, int],
                    max_len: int = MAX_PIECE_LEN) -> list[str] | None:
    """Integer Viterbi: best piece cover of `word` by total quantized
    score. Tie-break at each DP cell: higher score wins; equal score →
    the candidate with the SMALLER start index wins (longest piece).
    Returns None when no cover exists (some char not in inventory)."""
    n = len(word)
    NEG = None
    best: list[int | None] = [0] + [NEG] * n
    back: list[int] = [0] * (n + 1)
    for j in range(1, n + 1):
        b, bi = None, -1
        for i in range(max(0, j - max_len), j):
            if best[i] is None:
                continue
            s = scores.get(word[i:j])
            if s is None:
                continue
            cand = best[i] + s
            if b is None or cand > b:      # strict: first (smallest) i
                b, bi = cand, i            # wins ties among later i
        if b is not None:
            best[j], back[j] = b, bi
    if best[n] is None:
        return None
    out: list[str] = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    return out[::-1]


def _segment_kernel(scores: dict[str, int], max_len: int):
    """mapInPandas kernel: (word, cnt) -> (word, cnt, pieces array)."""
    def kern(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["pieces"] = [viterbi_segment(w, scores, max_len)
                             for w in pdf["word"]]
            yield pdf

    return kern


def seed_pieces(vocab: DataFrame, seed_size: int = DEFAULT_SEED_SIZE,
                max_len: int = MAX_PIECE_LEN) -> DataFrame:
    """(piece, cnt) seed inventory: every substring of length 1..max_len
    of every distinct word, weighted by the word's corpus count
    (overlapping occurrences all count), top seed_size by
    (cnt DESC, piece ASC) — PLUS every single character (so every word
    stays coverable). One vocabulary-sized explode, never corpus-sized."""
    sub = vocab.select(
        F.explode(F.expr(
            "flatten(transform(sequence(1, length(word)), "
            f"i -> transform(sequence(1, least({int(max_len)}, "
            "length(word) - i + 1)), "
            "L -> substring(word, i, L))))")).alias("piece"),
        F.col("cnt"),
    ).groupBy("piece").agg(F.sum("cnt").cast("bigint").alias("cnt"))
    singles = sub.filter(F.length("piece") == 1)
    top = (sub.filter(F.length("piece") > 1)
           .orderBy(F.desc("cnt"), F.asc("piece"))
           .limit(int(seed_size)))
    return singles.unionByName(top).dropDuplicates(["piece"])


def _scores_of(pieces: DataFrame) -> dict[str, int]:
    """Driver-side quantized log2-prob table from a (piece, cnt) frame.
    KB..MB state (inventory-sized) — the centroid-class collect."""
    import math

    rows = pieces.select("piece", "cnt").collect()
    total = sum(r["cnt"] for r in rows)
    return {r["piece"]: round(math.log2(r["cnt"] / total) * (1 << SCORE_SHIFT))
            for r in rows if r["cnt"] > 0}


def train_unigram_lm(df: DataFrame, text_col: str = "text",
                     word_pattern: str | None = ASCII_WORDS,
                     seed_size: int = DEFAULT_SEED_SIZE,
                     em_iters: int = DEFAULT_EM_ITERS,
                     max_len: int = MAX_PIECE_LEN) -> DataFrame:
    """Hard-EM unigram-LM training. Returns (piece, cnt, score) — the
    final inventory with Viterbi-path counts and quantized log2-prob
    scores. Single-character pieces are never pruned (coverability).

    Each iteration: segment every DISTINCT word under the current scores
    (Arrow kernel, inventory broadcast via closure), re-count pieces
    along best paths weighted by word count (vocabulary-sized explode +
    groupBy), re-quantize. The corpus is scanned exactly once, by
    word_counts."""
    vocab, _vocab_ids = eager_checkpoint(
        word_counts(df, text_col, word_pattern)
        .withColumnRenamed("n", "cnt"))
    pieces = seed_pieces(vocab, seed_size, max_len)
    scores = _scores_of(pieces)
    spark = df.sparkSession
    for _ in range(int(em_iters)):
        seg = vocab.mapInPandas(
            _segment_kernel(scores, max_len),
            schema="word string, cnt bigint, pieces array<string>")
        counts = (seg.filter(F.col("pieces").isNotNull())
                  .select(F.col("cnt"), F.explode("pieces").alias("piece"))
                  .groupBy("piece").agg(F.sum("cnt").cast("bigint")
                                        .alias("cnt")))
        # prune: pieces on no best path vanish; single chars survive
        # with their seed counts (coverability floor)
        singles = pieces.filter(F.length("piece") == 1).select(
            "piece", F.lit(0).cast("bigint").alias("_floor"))
        pieces = (counts.join(singles, on="piece", how="full_outer")
                  .select("piece",
                          F.coalesce(F.col("cnt"), F.lit(1))
                          .cast("bigint").alias("cnt"))
                  .filter(F.col("cnt") > 0))
        scores = _scores_of(pieces)
    rows = [(p, int(c)) for p, c in
            ((r["piece"], r["cnt"]) for r in pieces.collect())]
    total = sum(c for _, c in rows)
    import math

    out = [(p, c, round(math.log2(c / total) * (1 << SCORE_SHIFT)))
           for p, c in sorted(rows)]
    # the result is an independent local frame: the distinct-word
    # checkpoint blocks can be freed NOW (finding #15 — a leaked blocks-set
    # per train call otherwise)
    release_blocks(spark.sparkContext, _vocab_ids)
    return spark.createDataFrame(
        out, "piece string, cnt bigint, score bigint")


def segmentation_table(vocab: DataFrame, scores: dict[str, int],
                       max_len: int = MAX_PIECE_LEN) -> DataFrame:
    """(word, pieces) Viterbi segmentation of every distinct word under a
    frozen score table — the ULM twin of bpe.segmentation_table. Words
    with no cover (characters outside the inventory) get NULL pieces and
    are dropped by the encode join (OOV contract: encode with a model
    whose alphabet covers the corpus, same as BPE's superset rule)."""
    return (vocab.mapInPandas(
        _segment_kernel(scores, max_len),
        schema="word string, cnt bigint, pieces array<string>")
        .filter(F.col("pieces").isNotNull())
        .select("word", "pieces"))


def piece_ids(pieces_df: DataFrame) -> DataFrame:
    """(piece, token_id): dense 0-based ids ordered by the piece string
    — the bpe.symbol_ids convention."""
    from pyspark.sql import Window

    w = Window.orderBy("piece")
    return pieces_df.select("piece").distinct().select(
        "piece", (F.row_number().over(w) - 1).cast("bigint")
        .alias("token_id"))


def load_ulm_model(model_dir: str | None = None):
    """(scores dict, max_len) from the committed artifact
    (tools/train_tiny_ulm.py): pieces.parquet (piece, cnt, score)."""
    import json
    import os

    import pyarrow.parquet as pq_mod

    d = model_dir or os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "..", "models", "tiny_ulm"))
    tbl = pq_mod.read_table(os.path.join(d, "pieces.parquet"))
    scores = dict(zip(tbl.column("piece").to_pylist(),
                      (int(s) for s in tbl.column("score").to_pylist())))
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    return scores, int(meta["max_piece_len"])


def encode_documents(docs: DataFrame, pieces_df: DataFrame | None = None,
                     scores: dict[str, int] | None = None,
                     text_col: str = "text", id_col: str = "doc_id",
                     word_pattern: str | None = ASCII_WORDS,
                     max_len: int = MAX_PIECE_LEN,
                     broadcast_max_rows: int = BROADCAST_VOCAB_MAX_ROWS,
                     ) -> DataFrame:
    """Corpus → (id, wpos, spos, piece, token_id) under a trained
    unigram LM — the bpe.encode_documents shape exactly: the corpus side
    is MAP-ONLY (positional word explode → join the vocabulary-sized
    segmentation table under the broadcast gate → posexplode → id join);
    the only non-corpus shuffles are vocabulary-sized. Pass either a
    (piece, cnt, score) frame or a prebuilt scores dict (the committed
    artifact)."""
    if scores is None:
        if pieces_df is None:
            raise ValueError("need pieces_df or scores")
        scores = {r["piece"]: int(r["score"])
                  for r in pieces_df.select("piece", "score").collect()}
    spark = docs.sparkSession
    vocab, _vocab_ids = eager_checkpoint(
        word_counts(docs, text_col, word_pattern)
        .withColumnRenamed("n", "cnt"))
    # the checkpoint makes vocab.count() a metadata-cheap scan; threading
    # known_rows through means the broadcast gate never EXECUTES the
    # Viterbi segmentation job just to size it (the double-work
    # bpe.encode_documents already eliminated)
    n_vocab = vocab.count()
    seg = maybe_broadcast_vocab(
        segmentation_table(vocab, scores, max_len), broadcast_max_rows,
        known_rows=n_vocab)
    ids_df = spark.createDataFrame(
        sorted(scores), "string").toDF("piece")
    ids = maybe_broadcast_vocab(
        piece_ids(ids_df), broadcast_max_rows, known_rows=len(scores))
    toks = (words_with_pos(docs, text_col, id_col, word_pattern)
            .join(seg, on="word")
            .select(id_col, "wpos",
                    F.posexplode("pieces").alias("spos", "piece")))
    out = toks.join(ids, on="piece").select(
        id_col, "wpos", "spos", "piece", "token_id")
    # the result consumes the vocab checkpoint lazily: hand its blocks to
    # the caller (release_checkpoint(out) when done)
    out._ckpt_ids = _vocab_ids
    return out
