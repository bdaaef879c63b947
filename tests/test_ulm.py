"""Unigram-LM tokenizer tests (operators/ulm.py).

Training is the registry's rows-only member — its arithmetic is pinned
HERE against an independent pure-Python hard-EM reference; encode is
hash-gated by the SQL Viterbi replay in queries_ulm."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from vervectordb_spark.operators import ulm
from vervectordb_spark.functions.words import ws_tokens_py


# ---------------------------------------------------------------------------
# independent reference implementation (no shared code with the operator)
# ---------------------------------------------------------------------------


def _ref_viterbi(word, scores, max_len):
    n = len(word)
    best = [0] + [None] * n
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        cands = []
        for i in range(max(0, j - max_len), j):
            if best[i] is None or word[i:j] not in scores:
                continue
            cands.append((best[i] + scores[word[i:j]], -i, i))
        if cands:
            s, _, i = max(cands)
            best[j], back[j] = s, i
    if best[n] is None:
        return None
    out, j = [], n
    while j > 0:
        out.append(word[back[j]:j])
        j = back[j]
    return out[::-1]


def _ref_train(texts, seed_size=ulm.DEFAULT_SEED_SIZE,
               iters=ulm.DEFAULT_EM_ITERS, max_len=ulm.MAX_PIECE_LEN):
    words = Counter()
    for t in texts:
        for w in ws_tokens_py(t):
            if re.fullmatch(r"[a-z]+", w):
                words[w] += 1
    subs = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for L in range(1, min(max_len, len(w) - i) + 1):
                subs[w[i:i + L]] += c
    singles = {p: c for p, c in subs.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in subs.items() if len(p) > 1),
                   key=lambda x: (-x[1], x[0]))[:seed_size]
    pieces = dict(singles)
    pieces.update(dict(multi))

    def quant(cnts):
        total = sum(cnts.values())
        return {p: round(math.log2(c / total) * (1 << ulm.SCORE_SHIFT))
                for p, c in cnts.items() if c > 0}

    scores = quant(pieces)
    for _ in range(iters):
        counts = Counter()
        for w, c in words.items():
            seg = _ref_viterbi(w, scores, max_len)
            if seg:
                for p in seg:
                    counts[p] += c
        for p in {p for p in pieces if len(p) == 1}:
            if counts[p] == 0:
                counts[p] = 1
        pieces = {p: c for p, c in counts.items() if c > 0}
        scores = quant(pieces)
    return pieces, scores


# ---------------------------------------------------------------------------


def test_viterbi_prefers_high_probability_pieces():
    scores = {"a": -10, "b": -10, "ab": -5, "abc": -30, "c": -10}
    assert ulm.viterbi_segment("abc", scores, 6) == ["ab", "c"]
    assert ulm.viterbi_segment("ab", scores, 6) == ["ab"]
    assert ulm.viterbi_segment("ba", scores, 6) == ["b", "a"]
    assert ulm.viterbi_segment("abd", scores, 6) is None   # no 'd'


def test_viterbi_tiebreak_longest_piece():
    # "ab"+"c" and "a"+"bc" tie on score; smaller start index for the
    # last piece means the LONGER last piece ("bc") wins: back[3]=1
    scores = {"a": -10, "b": -10, "c": -10, "ab": -20, "bc": -20}
    assert ulm.viterbi_segment("abc", scores, 6) == ["a", "bc"]


def test_train_matches_independent_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog and a mat",
        "sat sat sat the the the",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["piece"]: (r["cnt"], r["score"])
           for r in ulm.train_unigram_lm(df, seed_size=64).collect()}
    ref_pieces, ref_scores = _ref_train(texts, seed_size=64)
    assert set(got) == set(ref_pieces)
    for p in ref_pieces:
        assert got[p][0] == ref_pieces[p], p
        assert got[p][1] == ref_scores[p], p


def test_encode_positions_recover_token_sequence(spark):
    df = spark.createDataFrame(
        [(1, "the cat 99bad cat")], "doc_id long, text string")
    pieces = ulm.train_unigram_lm(df, seed_size=32)
    enc = ulm.encode_documents(df, pieces_df=pieces)
    rows = sorted((r["wpos"], r["spos"], r["piece"])
                  for r in enc.collect())
    joined = "".join(p for _, _, p in rows)
    assert joined == "thecatcat"          # 99bad dropped (word scope)
    wpos = {w for w, _, _ in rows}
    assert wpos == {0, 1, 3}              # raw-split positions, gap at 2


def test_encode_under_committed_artifact_matches_kernel(spark):
    scores, max_len = ulm.load_ulm_model()
    df = spark.createDataFrame(
        [(1, "the customer batch window join")], "doc_id long, text string")
    enc = {(r["wpos"], r["spos"]): r["piece"]
           for r in ulm.encode_documents(df, scores=scores,
                                         max_len=max_len).collect()}
    words = "the customer batch window join".split()
    for w_i, w in enumerate(words):
        seg = ulm.viterbi_segment(w, scores, max_len)
        assert seg is not None
        for s_i, p in enumerate(seg):
            assert enc[(w_i, s_i)] == p


def test_artifact_reproducible_from_spark_trainer(spark):
    """The committed models/tiny_ulm artifact IS the distributed
    trainer's output on the sf0.01 fixture — retraining reproduces it
    bit-for-bit (the vendored-model provenance check)."""
    import duckdb

    from vervectordb_spark.schema import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    got = sorted((r["piece"], r["cnt"], r["score"])
                 for r in ulm.train_unigram_lm(docs).collect())
    exp = sorted(map(tuple, duckdb.sql(
        "SELECT piece, cnt, score FROM "
        f"'{__import__('vervectordb_spark.queries_ulm', fromlist=['x'])._ulm_pieces_path()}'"
    ).fetchall()))
    assert got == exp
