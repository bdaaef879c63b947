"""Distributed BPE training (operators/bpe.py): the merge-fold contract
against an independent scalar reference, deterministic argmax
tie-breaks, overlap greediness (runs of the same symbol), end-to-end
training parity with a pure-Python BPE, and the corpus-size-independent
shape (iterations never rescan the corpus table)."""

import collections
import re

import pytest

from pyspark.sql import functions as F

from vervectordb_spark.operators import bpe
from vervectordb_spark.schema import load_table
from vervectordb_spark.functions.words import ws_tokens_py

SF_DIR = "/root/testdata/sf0.001"


def _py_train(texts, k):
    """Independent reference BPE (no shared code with the operator)."""
    wc = collections.Counter()
    for t in texts:
        for w in ws_tokens_py(t):
            if w and re.fullmatch(r"[a-z]+", w):
                wc[w] += 1
    vocab = {w: list(w) for w in wc}
    merges = []
    for step in range(1, k + 1):
        pc = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        bestcnt = max(pc.values())
        a, b = sorted(p for p, c in pc.items() if c == bestcnt)[0]
        merges.append((step, a, b, bestcnt))
        for w, syms in vocab.items():
            out, pending = [], None
            for x in syms:
                if pending == a and x == b:
                    out.append(a + b)
                    pending = None
                elif pending is None:
                    pending = x
                else:
                    out.append(pending)
                    pending = x
            if pending is not None:
                out.append(pending)
            vocab[w] = out
    return merges, vocab


def test_merge_fold_matches_scalar_reference(spark):
    cases = [
        (["a", "b", "a", "b"], "a", "b", ["ab", "ab"]),
        (["a", "a", "a"], "a", "a", ["aa", "a"]),          # greedy run
        (["a", "a", "a", "a"], "a", "a", ["aa", "aa"]),
        (["x"], "a", "b", ["x"]),
        ([], "a", "b", []),
        (["a", "b", "c", "a", "b"], "a", "b", ["ab", "c", "ab"]),
        (["b", "a", "b", "b"], "a", "b", ["b", "ab", "b"]),
    ]
    df = spark.createDataFrame([(i, s) for i, (s, *_r) in enumerate(cases)],
                               "i int, syms array<string>")
    for i, (s, a, b, want) in enumerate(cases):
        got = (df.filter(F.col("i") == i)
               .select(bpe.merge_fold_expr(F.col("syms"), a, b).alias("m"))
               .collect()[0]["m"])
        assert got == want, (s, a, b, got)
        assert bpe.segment_word("".join(s), [bpe.Merge(1, a, b, 0)]) == want \
            if s and all(len(c) == 1 for c in s) else True


def test_train_matches_python_reference(spark):
    docs = load_table(spark, SF_DIR, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    want_merges, want_vocab = _py_train(texts, 4)
    merges, vocab = bpe.train_bpe(docs, n_merges=4)
    got = [(m.step, m.left, m.right, m.count) for m in merges]
    assert got == want_merges
    got_syms = {r["word"]: r["symbols"]
                for r in vocab.select("word", "symbols").collect()}
    assert got_syms == {w: s for w, s in want_vocab.items()}


def test_segment_word_applies_merges_in_order():
    merges = [bpe.Merge(1, "e", "r", 0), bpe.Merge(2, "er", "s", 0)]
    assert bpe.segment_word("servers", merges) == ["s", "er", "v", "ers"]
    assert bpe.segment_word("x", merges) == ["x"]
    assert bpe.segment_word("", merges) == []


def test_word_counts_scope_filter(spark):
    df = spark.createDataFrame(
        [("Foo foo BAR2 文档 baz baz baz",)], "text string")
    got = {r["word"]: r["n"] for r in bpe.word_counts(df).collect()}
    assert got == {"foo": 2, "baz": 3}  # bar2 and 文档 excluded by pattern
    got_all = {r["word"]: r["n"]
               for r in bpe.word_counts(df, word_pattern=None).collect()}
    assert got_all["bar2"] == 1 and got_all["文档"] == 1


def test_train_stops_when_no_pairs(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    merges, vocab = bpe.train_bpe(df, n_merges=5)
    assert merges == []  # all words are single symbols: no pairs at all
    assert vocab.count() == 3


def test_pair_counts_overlapping_runs(spark):
    # 'aaaa' (count 1): pairs (a,a) at 3 positions — overlapping counted
    df = spark.createDataFrame([("aaaa",)], "text string")
    vocab = bpe.with_symbols(bpe.word_counts(df))
    rows = bpe.pair_counts(vocab).collect()
    assert len(rows) == 1
    assert (rows[0]["left"], rows[0]["right"], rows[0]["cnt"]) == ("a", "a", 3)


def test_train_empty_corpus(spark):
    df = spark.createDataFrame([("文档 123",)], "text string")  # all filtered
    merges, vocab = bpe.train_bpe(df, n_merges=3)
    assert merges == [] and vocab.count() == 0


def test_encode_documents_matches_segment_word(spark):
    """encode_documents reassembles, per document, exactly the token
    sequence segment_word produces word-by-word (same merges, same
    greedy fold), ordered by (wpos, spos)."""
    docs = spark.createDataFrame(
        [(1, "aa ab aa"), (2, "b aa ZZZ ab"), (3, "")],
        "doc_id long, text string")
    merges, vocab = bpe.train_bpe(docs, n_merges=2)
    out = (bpe.encode_documents(docs, vocab)
           .orderBy("doc_id", "wpos", "spos").collect())
    got = collections.defaultdict(list)
    for r in out:
        got[r["doc_id"]].append(r["symbol"])
    for did, text in [(1, "aa ab aa"), (2, "b aa ZZZ ab")]:
        want = []
        for w in ws_tokens_py(text):
            if re.fullmatch("[a-z]+", w):  # ASCII_WORDS scope: ZZZ→zzz kept
                want += bpe.segment_word(w, merges)
        assert got[did] == want, (did, got[did], want)
    assert 3 not in got  # empty text → no tokens


def test_encode_documents_token_ids_dense_and_stable(spark):
    """token_id is the dense 0-based rank of the symbol string — stable
    across partitionings and runs."""
    docs = spark.createDataFrame(
        [(i, "x yy x zzz yy") for i in range(8)], "doc_id long, text string")
    _m, vocab = bpe.train_bpe(docs, n_merges=1)
    ids = {r["symbol"]: r["token_id"]
           for r in bpe.symbol_ids(vocab).collect()}
    assert sorted(ids.values()) == list(range(len(ids)))
    assert ids == {r["symbol"]: r["token_id"]
                   for r in bpe.symbol_ids(vocab.repartition(5)).collect()}
    enc = bpe.encode_documents(docs, vocab).collect()
    assert all(ids[r["symbol"]] == r["token_id"] for r in enc)


def test_encode_documents_corpus_side_has_no_shuffle(spark):
    """The 100 TB contract: both vocab joins broadcast, so the corpus
    side of the encode plan carries no Exchange (the only shuffle is
    inside the vocabulary-sized symbol_ids row_number)."""
    docs = spark.createDataFrame(
        [(1, "aa ab"), (2, "ab aa aa")], "doc_id long, text string")
    _m, vocab = bpe.train_bpe(docs, n_merges=1)
    plan = bpe.encode_documents(docs, vocab)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2, plan
    # every Exchange in the plan is on the broadcast (vocab) side or the
    # tiny window; the corpus scan reaches the joins without an exchange
    assert "SortMergeJoin" not in plan, plan


def test_encode_vocab_broadcast_gated_by_bounded_probe(spark):
    """The bounded-dims-only broadcast rule (SCALE.md finding #6) on the
    BPE vocabulary joins: under the gate the segmentation join is hinted
    broadcast; above it (threshold forced to 0, auto-broadcast disabled)
    the hint is absent and AQE is free to pick a shuffle join — a 1e7-row
    Heaps-law web vocabulary must not be forced executor-resident."""
    from vervectordb_spark.operators.bpe import encode_documents, train_bpe
    from vervectordb_spark.plans import audit as A

    docs = spark.createDataFrame(
        [(1, "aa ab aa ab ba"), (2, "ab aa ba ba aa")],
        "doc_id long, text string")
    _m, vocab = train_bpe(docs, n_merges=2)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = A.physical_plan(encode_documents(docs, vocab))
        A.assert_operator(hinted, "BroadcastHashJoin")
        unhinted = A.physical_plan(
            encode_documents(docs, vocab, broadcast_max_rows=0))
        A.assert_not_operator(unhinted, "BroadcastHashJoin")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    # results identical either side of the gate
    a = sorted(map(tuple, encode_documents(docs, vocab).collect()))
    b = sorted(map(tuple,
                   encode_documents(docs, vocab,
                                    broadcast_max_rows=0).collect()))
    assert a == b and len(a) > 0
