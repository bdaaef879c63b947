"""Hybrid keyword+vector retrieval (operators/hybrid.py).

BM25 is pinned against an independent NumPy computation (its ln() can't
cross the DuckDB hash gate bit-exact); the RRF pipeline's oracle parity is
covered by test_oracle_parity via the hybrid_search_rrf /
keyword_topk_tf registrations.
"""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vervectordb_spark.operators import hybrid as H
from vervectordb_spark.plans import audit as A
from vervectordb_spark.schema import load_table
from vervectordb_spark.functions.words import ws_tokens_py

TERMS = ["spark", "window", "join"]


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_bm25_matches_numpy(spark, docs):
    """Okapi BM25 (k1=1.2, b=0.75) against a from-scratch Python
    computation over the same tokenization."""
    rows = docs.select("doc_id", "text").collect()
    corpus = {r.doc_id: ws_tokens_py(r.text) for r in rows}
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    k1, b = 1.2, 0.75
    df_t = {
        t: sum(1 for toks in corpus.values() if t in toks) for t in TERMS
    }
    expected = {}
    for doc_id, toks in corpus.items():
        s = 0.0
        for t in TERMS:
            tf = toks.count(t)
            idf = math.log((n - df_t[t] + 0.5) / (df_t[t] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(toks) / avgdl)
            )
        if s > 0.0:
            expected[doc_id] = s
    exp_top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:15]

    got = H.bm25_topk(docs, TERMS, top_k=15, k1=k1, b=b).collect()
    assert [r.doc_id for r in got] == [d for d, _ in exp_top]
    for r, (_, s) in zip(got, exp_top):
        assert r.bm25 == pytest.approx(s, rel=1e-9)


def test_keyword_topk_is_integer_and_positive(spark, docs):
    out = H.keyword_topk(docs, TERMS, top_k=25).collect()
    assert 0 < len(out) <= 25
    assert all(isinstance(r.kw_score, int) and r.kw_score > 0 for r in out)
    # descending, ties by id
    keys = [(-r.kw_score, r.doc_id) for r in out]
    assert keys == sorted(keys)


def test_rrf_single_modality_docs_still_rank(spark, docs):
    """A doc present in only one candidate list gets exactly that side's
    1/(k+rank) and -1 rank / -2.0 sim sentinels for the other side."""
    emb = load_table(spark, SF_DIR, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    qv = [float(x) for x in qrow[0][0]]
    out = H.hybrid_search(docs, emb, TERMS, qv, n_candidates=20, top_k=40).collect()
    assert out
    for r in out:
        terms = []
        if r.kw_rank != -1:
            terms.append(1.0 / (60 + r.kw_rank))
        else:
            assert r.kw_score == -1
        if r.vec_rank != -1:
            terms.append(1.0 / (60 + r.vec_rank))
        else:
            assert r.sim == -2.0
        assert terms, "doc in neither candidate list leaked into the fusion"
        assert r.rrf_score == pytest.approx(sum(terms), abs=0.0)


def test_hybrid_candidate_sides_are_take_ordered(spark, docs):
    """Both candidate generators must be TakeOrderedAndProject over their
    scans; the only Window ops run on the bounded candidate sets."""
    emb = load_table(spark, SF_DIR, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    qv = [float(x) for x in qrow[0][0]]
    plan = A.physical_plan(H.hybrid_search(docs, emb, TERMS, qv))
    assert plan.count("TakeOrderedAndProject") >= 2, plan[:3000]
    # windows exist (rank over candidates) but no corpus-sized exchange
    # feeds them: each window's input is a TakeOrderedAndProject limit
    A.assert_not_operator(plan, "CartesianProduct")


def test_bm25_stats_arrive_broadcast(spark, docs):
    plan = A.physical_plan(H.bm25_topk(docs, TERMS, top_k=10))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    A.assert_operator(plan, "TakeOrderedAndProject")


def test_hybrid_empty_terms_degrades_to_vector_only(spark, docs):
    """No lexical terms: the keyword side is empty and fusion returns pure
    vector ranking with -1 keyword sentinels."""
    emb = load_table(spark, SF_DIR, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    qv = [float(x) for x in qrow[0][0]]
    out = H.hybrid_search(docs, emb, [], qv, n_candidates=10, top_k=5).collect()
    assert len(out) == 5
    assert all(r.kw_rank == -1 and r.kw_score == -1 for r in out)
    assert [r.vec_rank for r in out] == [1, 2, 3, 4, 5]


def test_hybrid_batch_gemm_matches_fold(spark, docs):
    """The GEMM serving kernel and the fold oracle kernel must produce the
    same fused result sets (sim values can differ in the last ulp, so
    compare ids and integer ranks, not floats)."""
    from pyspark.sql import functions as F2

    emb = load_table(spark, SF_DIR, "embeddings")
    term_table = spark.createDataFrame(
        [(0, "spark"), (0, "window"), (1, "join"), (2, "batch")],
        "query_id long, term string",
    )
    queries = emb.filter(F2.col("vec_id") < 3).select(
        F2.col("vec_id").alias("query_id"),
        F2.col("embedding").alias("q_embedding"),
    )

    def key(rows):
        return sorted(
            (r["query_id"], r["doc_id"], r["rank"], r["kw_rank"], r["vec_rank"])
            for r in rows
        )

    fold = H.hybrid_search_batch(
        docs, emb, term_table, queries, n_candidates=20, top_k=5, kernel="fold"
    ).collect()
    gemm = H.hybrid_search_batch(
        docs, emb, term_table, queries, n_candidates=20, top_k=5, kernel="gemm"
    ).collect()
    assert key(fold) == key(gemm)
    assert len({r["query_id"] for r in fold}) == 3


def test_hybrid_batch_windows_partition_by_query(spark, docs):
    from pyspark.sql import functions as F2

    emb = load_table(spark, SF_DIR, "embeddings")
    term_table = spark.createDataFrame(
        [(0, "spark")], "query_id long, term string"
    )
    queries = emb.filter(F2.col("vec_id") < 2).select(
        F2.col("vec_id").alias("query_id"),
        F2.col("embedding").alias("q_embedding"),
    )
    plan = A.physical_plan(
        H.hybrid_search_batch(docs, emb, term_table, queries, kernel="fold")
    )
    # the tiny term relation broadcasts; no unpartitioned window exists
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    import re

    for m in re.finditer(r"Window \[", plan):
        seg = plan[m.start():m.start() + 400]
        assert "partitionBy" not in seg or "query_id" in seg


def test_cross_encoder_tier_raises_without_model_stack(spark, docs):
    import pytest as _pytest

    cands = docs.limit(20)
    try:
        import sentence_transformers  # noqa: F401
        _pytest.skip("model stack present; slot is live")
    except ImportError:
        pass
    with _pytest.raises(NotImplementedError):
        H.rerank_cross_encoder(cands, "query text")


def test_rerank_scored_fake_orders_by_density(spark, docs):
    """The deterministic rerank fake: higher query-term density ranks
    first; contract matches the model tier (id, ce_score)."""
    cands = docs.limit(200)
    out = H.rerank_scored(cands, ["spark", "join"], top_k=10).collect()
    assert 0 < len(out) <= 10
    scores = [r.ce_score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert out[0].ce_score > 0


def test_keyword_batch_lowercases_terms(spark):
    """User-cased batch terms must match the lower-cased token stream,
    same as the single-query path."""
    from vervectordb_spark.operators.hybrid import keyword_topk_batch

    docs = spark.createDataFrame([(1, "Spark is Great")],
                                 "doc_id long, text string")
    terms = spark.createDataFrame([(0, "Spark"), (0, "GREAT")],
                                  "query_id long, term string")
    got = keyword_topk_batch(docs, terms).collect()
    assert len(got) == 1 and got[0]["kw_score"] == 2


# ---------------------------------------------------------------------------
# REAL trained cross-encoder tier (round-10)
# ---------------------------------------------------------------------------


def test_ce_rerank_prefers_doc_containing_query_phrase(spark):
    from vervectordb_spark.operators.hybrid import rerank_checkpoint_ce

    rows = [
        (1, "spark table scan fast spark table scan fast query plan"),
        (2, "row group filter merge sort window batch stream value"),
        (3, "table fast spark data key the a line column order"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = rerank_checkpoint_ce(df, "spark table scan fast", top_k=3).collect()
    assert got[0]["doc_id"] == 1
    assert got[0]["ce_score"] > got[-1]["ce_score"]


def test_ce_rerank_contract_matches_fake_tier(spark):
    """Same bounded-candidates contract and output schema as the
    deterministic rerank_scored stand-in."""
    from vervectordb_spark.operators.hybrid import (
        rerank_checkpoint_ce,
        rerank_scored,
    )

    df = spark.createDataFrame(
        [(1, "spark table scan"), (2, "window group agg")],
        "doc_id long, text string")
    real = rerank_checkpoint_ce(df, "spark table", top_k=2)
    fake = rerank_scored(df, ["spark", "table"], top_k=2)
    assert [f.name for f in real.schema.fields] \
        == [f.name for f in fake.schema.fields]
    assert real.count() == fake.count() == 2


def test_ce_rerank_deterministic_and_null_safe(spark):
    from vervectordb_spark.operators.hybrid import rerank_checkpoint_ce

    df = spark.createDataFrame(
        [(1, "spark table scan"), (2, None), (3, "")],
        "doc_id long, text string")
    a = rerank_checkpoint_ce(df, "spark table", top_k=3).collect()
    b = rerank_checkpoint_ce(df, "spark table", top_k=3).collect()
    assert a == b and len(a) == 3
    assert a[0]["doc_id"] == 1


def test_ce_weights_are_exactly_representable(spark):
    """The n/2^shift quantization contract: reconstructing a weight in
    float64 is exact, so Spark literals and SQL integer-division
    literals are the same double."""
    from vervectordb_spark.operators.hybrid import load_ce_weights

    wj = load_ce_weights()
    denom = 1 << wj["denom_shift"]
    for n in [*wj["w_num"], wj["b_num"]]:
        assert float(n) / denom == n / denom  # exact dyadic rational


def test_ce_batch_matches_single(spark, docs):
    """rerank_checkpoint_ce_batch == rerank_checkpoint_ce row-for-row
    per query (ids, scores, order) — the batch==single convention every
    other serving path pins."""
    from vervectordb_spark.operators import hybrid as H

    queries = [(0, "spark table scan fast"),
               (1, "window join revenue"),
               (2, "the customer batch")]
    cand = docs.select("doc_id", "text").limit(40)
    batched = H.rerank_checkpoint_ce_batch(
        cand.crossJoin(spark.createDataFrame(
            [(q,) for q, _ in queries], "query_id long")),
        queries, top_k=7)
    got = {}
    for r in batched.collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["ce_score"]))
    for qid, qtext in queries:
        single = [(r["doc_id"], r["ce_score"]) for r in
                  H.rerank_checkpoint_ce(cand, qtext, top_k=7).collect()]
        assert sorted(got[qid], key=lambda x: (-x[1], x[0])) == single, qid
        # and the window emitted them already in rank order
        assert got[qid] == single, qid


def test_ce_batch_rejects_tokenless_query(spark, docs):
    import pytest as _pt

    from vervectordb_spark.operators import hybrid as H

    cand = docs.select("doc_id", "text").limit(5).withColumn(
        "query_id", __import__("pyspark.sql.functions",
                               fromlist=["lit"]).lit(0))
    with _pt.raises(ValueError, match="no tokens"):
        H.rerank_checkpoint_ce_batch(cand, [(0, " \t\x0b ")])
