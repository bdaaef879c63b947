"""Exact duplicate-span detection/removal (operators/spans.py — the
ExactSubstr variant of Lee et al. 2022 at token-gram granularity)."""

import pytest
from pyspark.sql import functions as F

from vervectordb_spark.operators import spans as S

L = 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_duplicate_span_detected_and_merged(spark):
    """A 5-token passage shared by two docs yields, in each, ONE merged
    span covering all 3 of its 3-gram starts: [p, p+5)."""
    shared = "alpha beta gamma delta epsilon"
    docs = _docs(spark, [
        (1, f"one two {shared} three"),
        (2, f"{shared} four five six"),
        (3, "totally different words here now"),
    ])
    got = {r["doc_id"]: (r["span_start"], r["span_end"], r["n_grams"])
           for r in S.duplicate_spans(docs, L).collect()}
    assert got[1] == (2, 7, 3)   # shared starts at token 2 in doc 1
    assert got[2] == (0, 5, 3)
    assert 3 not in got


def test_within_doc_repeat_counts_as_duplicate(spark):
    """count >= 2 includes within-document repeats (both occurrences
    marked)."""
    docs = _docs(spark, [(1, "a b c x y a b c")])
    rows = sorted((r["span_start"], r["span_end"])
                  for r in S.duplicate_spans(docs, L).collect())
    assert rows == [(0, 3), (5, 8)]


def test_adjacent_grams_merge_into_one_island(spark):
    """Overlapping [p, p+L) unions merge: a 4-token duplicate = 2 grams,
    ONE span."""
    docs = _docs(spark, [(1, "p q r s tail1"), (2, "head p q r s")])
    got = {r["doc_id"]: (r["span_start"], r["span_end"], r["n_grams"])
           for r in S.duplicate_spans(docs, L).collect()}
    assert got[1] == (0, 4, 2) and got[2] == (1, 5, 2)


def test_short_docs_emit_nothing(spark):
    docs = _docs(spark, [(1, "a b"), (2, "a b"), (3, "")])
    assert S.duplicate_spans(docs, L).count() == 0


def test_removal_cuts_span_tokens_keeps_case_and_counts(spark):
    shared = "Alpha Beta Gamma"  # matching is lowercase, rebuild keeps case
    docs = _docs(spark, [
        (1, f"KEEP1 {shared} KEEP2"),
        (2, f"{shared} other words"),
        (3, "no duplicates at all here"),
    ])
    # lowercase gram match, original-case text
    got = {r["doc_id"]: r for r in S.remove_duplicate_spans(
        docs, L, out_col="clean_text").collect()}
    assert got[1]["clean_text"] == "KEEP1 KEEP2"
    assert got[1]["n_tokens"] == 5 and got[1]["n_tokens_removed"] == 3
    assert got[2]["clean_text"] == "other words"
    assert got[3]["clean_text"] == "no duplicates at all here"
    assert got[3]["n_tokens_removed"] == 0


def test_removal_preserves_input_columns(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d", "web"), (2, "a b c e", "book")],
        "doc_id long, text string, source string")
    out = S.remove_duplicate_spans(docs, L)
    assert {"doc_id", "text", "source", "clean_text", "n_tokens",
            "n_tokens_removed"} <= set(out.columns)
    assert out.count() == 2


def test_gram_positions_partitioning_independent(spark):
    """Gram keys/positions are pure row functions: identical under any
    physical partitioning."""
    docs = _docs(spark, [(i, "w x y z " * 3) for i in range(20)])
    a = sorted(map(tuple, S.gram_positions(docs, L).collect()))
    b = sorted(map(tuple, S.gram_positions(docs.repartition(7), L).collect()))
    assert a == b


def test_gram_key_is_full_120_bit_md5(spark):
    """Both gram-key longs match hashlib's md5 of the space-joined
    lowercase gram (hex digits 1..15 and 16..30) — the widened key that
    makes a collision-driven false CUT astronomically unlikely (span
    removal destroys tokens; rationale in operators/spans.py)."""
    import hashlib

    docs = _docs(spark, [(1, "Alpha beta GAMMA delta")])
    rows = {r["p"]: (r["gram_h"], r["gram_h2"])
            for r in S.gram_positions(docs, L).collect()}
    toks = "alpha beta gamma delta".split()
    for p in range(len(toks) - L + 1):
        hx = hashlib.md5(" ".join(toks[p:p + L]).encode()).hexdigest()
        assert rows[p] == (int(hx[0:15], 16), int(hx[15:30], 16))


def test_sixty_bit_collision_would_not_cut(spark, monkeypatch):
    """Grams that collide on gram_h alone (different gram_h2) must NOT
    be marked duplicated — every group/join keys on BOTH halves. A real
    60-bit collision is unconstructible, so the gram stream is planted."""
    planted = spark.createDataFrame(
        [(1, 0, 7, 100), (2, 0, 7, 200),   # gram_h collides, h2 differs
         (1, 5, 9, 300), (2, 3, 9, 300)],  # a TRUE duplicate
        "doc_id long, p int, gram_h long, gram_h2 long")
    monkeypatch.setattr(S, "gram_positions", lambda *a, **k: planted)
    for strategy in ("count_join", "collect"):
        got = sorted(map(tuple, S.duplicate_gram_positions(
            None, L, strategy=strategy).collect()))
        assert got == [(1, 5), (2, 3)], strategy


def test_remove_spans_fails_fast_on_column_collision(spark):
    """Output / staging names already on the input raise instead of being
    silently overwritten (the featurize/embed_documents contract)."""
    docs = spark.createDataFrame(
        [(1, "a b c", 9)], "doc_id long, text string, n_tokens long")
    with pytest.raises(ValueError, match="n_tokens"):
        S.remove_duplicate_spans(docs, L)
    docs2 = spark.createDataFrame(
        [(1, "a b c", "x")], "doc_id long, text string, clean_text string")
    with pytest.raises(ValueError, match="clean_text"):
        S.remove_duplicate_spans(docs2, L)


def test_gram_arrow_kernel_bit_identical_to_expr(spark):
    """The dual-kernel contract (the minhash/simhash/embed pattern): the
    Arrow gram emit equals the expr spec row for row — including CJK
    text, null text, multi-whitespace runs, and short docs."""
    docs = spark.createDataFrame(
        [(1, "Alpha  beta\tGAMMA delta epsilon"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, None), (4, "one two"), (5, "深度 学习 模型 训练 数据 管道"),
         (6, "x " * 40)],
        "doc_id long, text string")
    a = sorted(map(tuple, S.gram_positions(docs, L, kernel="arrow").collect()))
    e = sorted(map(tuple, S.gram_positions(docs, L, kernel="expr").collect()))
    assert a == e and len(a) > 0


def test_incremental_spans_history_never_self_pairs(spark):
    """A duplicate that lives ONLY inside history produces no spans (the
    batch's positions are the only mark source); a new doc sharing a
    gram with history — even a single history occurrence — is cut; a
    within-batch repeat is cut with no history at all."""
    hist_docs = _docs(spark, [
        (100, "dup dup dup boiler plate text here"),   # within-history
        (101, "dup dup dup other words entirely now"),  # duplicate only
        (102, "alpha beta gamma tail"),
    ])
    hist = S.gram_history(hist_docs, L)
    new = _docs(spark, [
        (1, "head alpha beta gamma end"),    # 1 history occurrence -> cut
        (2, "fresh unique content nothing shared"),
        (3, "x y z mid x y z"),              # within-batch repeat
    ])
    got = {r["doc_id"]: r for r in S.incremental_remove_duplicate_spans(
        new, hist, L).collect()}
    assert got[1]["clean_text"] == "head end"
    assert got[2]["n_tokens_removed"] == 0
    assert got[3]["clean_text"] == "mid"
    # nothing about history docs 100/101 appears anywhere
    assert set(got) == {1, 2, 3}


def test_incremental_spans_stop_gram_cap(spark):
    """History grams above stop_gram_count are stop-grams: dropped from
    matching (ubiquitous boilerplate), while rarer grams still cut."""
    hist_docs = _docs(spark, [(i, "the same hot boiler gram") for i in
                              range(5)] + [(10, "rare cold unique gram")])
    hist = S.gram_history(hist_docs, L)
    new = _docs(spark, [(1, "xx the same hot yy"),
                        (2, "xx rare cold unique yy")])
    cut_all = {r["doc_id"]: r["n_tokens_removed"] for r in
               S.incremental_remove_duplicate_spans(new, hist, L).collect()}
    assert cut_all == {1: 3, 2: 3}
    capped = {r["doc_id"]: r["n_tokens_removed"] for r in
              S.incremental_remove_duplicate_spans(
                  new, hist, L, stop_gram_count=3).collect()}
    assert capped == {1: 0, 2: 3}  # hot gram (5 occurrences) stopped


def test_update_gram_history_sums_counts(spark):
    """State maintenance: merging a batch's gram table into history sums
    occurrence counts per 120-bit key."""
    a = _docs(spark, [(1, "p q r s")])
    b = _docs(spark, [(2, "p q r t"), (3, "p q r u")])
    h1 = S.gram_history(a, L)
    merged = S.update_gram_history(h1, S.gram_history(b, L))
    counts = {tuple(r[k] for k in ("gram_h", "gram_h2")): r["n_occurrences"]
              for r in merged.collect()}
    pqr = [r for r in S.gram_positions(a, L).collect() if r["p"] == 0][0]
    assert counts[(pqr["gram_h"], pqr["gram_h2"])] == 3  # p q r in all
    assert sum(counts.values()) == 2 + 2 + 2  # 2 grams per 4-token doc


# ---------------------------------------------------------------------------
# bucketed persistent gram history (round-10: SCALE finding #12 constant)
# ---------------------------------------------------------------------------


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bucketed_state_cuts_match_inmemory_history(spark, tmp_path):
    from vervectordb_spark.operators.span_state import GramHistoryState

    L = 3
    boiler = "shared boiler plate block here"
    day0 = _mk_docs(spark, [(1, f"{boiler} first tail"),
                            (2, "clean words only now")])
    day1 = _mk_docs(spark, [(3, f"second doc with {boiler} inside"),
                            (4, "rep rep rep x rep rep rep")])
    day2 = _mk_docs(spark, [(5, f"third time {boiler} appears")])

    st = GramHistoryState.create(spark, str(tmp_path / "st"),
                                 S.gram_history(day0, L), n_buckets=4)
    mem_hist = S.gram_history(day0, L).localCheckpoint(eager=True)

    for batch in (day1, day2):
        got = {r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
               for r in S.incremental_remove_duplicate_spans(
                   batch, st.read(), L).collect()}
        exp = {r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
               for r in S.incremental_remove_duplicate_spans(
                   batch, mem_hist, L).collect()}
        assert got == exp
        g = S.gram_history(batch, L)
        st.update(g)
        mem_hist = S.update_gram_history(
            mem_hist, g).localCheckpoint(eager=True)
    assert got[5][1] > 0                   # boilerplate kept cutting


def test_bucketed_state_reload_across_catalog(spark, tmp_path):
    from vervectordb_spark.operators.span_state import GramHistoryState

    L = 3
    day0 = _mk_docs(spark, [(1, "a b c d e f g h")])
    st = GramHistoryState.create(spark, str(tmp_path / "st"),
                                 S.gram_history(day0, L), n_buckets=4)
    st.update(S.gram_history(
        _mk_docs(spark, [(2, "a b c d x y z w")]), L))
    # wipe the session catalog entry, reload purely from disk
    spark.sql(f"DROP TABLE IF EXISTS {st.table}")
    st2 = GramHistoryState.load(spark, str(tmp_path / "st"))
    rows = {(r["gram_h"], r["gram_h2"]): r["n_occurrences"]
            for r in st2.read().collect()}
    exp = {(r["gram_h"], r["gram_h2"]): r["n_occurrences"]
           for r in S.update_gram_history(
               S.gram_history(day0, L),
               S.gram_history(_mk_docs(spark, [(2, "a b c d x y z w")]),
                              L)).collect()}
    assert rows == exp


def test_bucketed_history_join_saves_a_shuffle(spark, tmp_path):
    """The whole point of the layout: with history read through the
    bucketed table, the dup-key join plan has strictly FEWER exchanges
    than with the same history as a plain (unbucketed) frame, and the
    bucketed scan reports its bucket count."""
    from vervectordb_spark.operators.span_state import GramHistoryState
    from vervectordb_spark.plans.audit import count_shuffles, physical_plan

    L = 3
    hist_docs = _mk_docs(spark, [(i, f"w{i} x{i} y{i} z{i} common gram tail")
                                 for i in range(20)])
    st = GramHistoryState.create(spark, str(tmp_path / "st"),
                                 S.gram_history(hist_docs, L), n_buckets=4)
    new = _mk_docs(spark, [(100, "common gram tail and fresh words")])

    plain = S.incremental_duplicate_spans(
        new, st.read().sparkSession.read.parquet(
            str(tmp_path / "st" / "v0")), L)
    bucketed = S.incremental_duplicate_spans(new, st.read(), L)
    p_plain = physical_plan(plain)
    p_bucket = physical_plan(bucketed)
    assert "Bucketed: true" in p_bucket
    assert count_shuffles(p_bucket) < count_shuffles(p_plain)
    # and identical answers
    assert sorted(map(tuple, bucketed.collect())) \
        == sorted(map(tuple, plain.collect()))
