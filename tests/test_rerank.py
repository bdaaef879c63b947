"""MMR re-ranking (operators/rerank.py): greedy-core semantics,
multi-query grouping, diversity effect, and edge cases."""

import pytest

from pyspark.sql import functions as F

from vervectordb_spark.operators.rerank import _cos, mmr_rerank, mmr_select


def test_core_first_pick_is_argmax_rel():
    ids = [10, 11, 12]
    rels = [0.5, 0.9, 0.7]
    embs = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    out = mmr_select(ids, rels, embs, k=3, lam=0.7)
    assert out[0][1] == 1  # index of rel=0.9


def test_core_demotes_near_duplicate():
    """Two near-identical top candidates: MMR picks one, then prefers the
    distinct third over the duplicate twin."""
    ids = [1, 2, 3]
    rels = [0.95, 0.94, 0.80]
    embs = [[1.0, 0.0], [0.9999, 0.01], [0.0, 1.0]]
    out = mmr_select(ids, rels, embs, k=2, lam=0.5)
    picked = [ids[i] for _, i, *_ in out]
    assert picked == [1, 3]
    # raw top-2 would have been [1, 2]


def test_core_lam_one_is_plain_topk():
    ids = [1, 2, 3]
    rels = [0.3, 0.9, 0.6]
    embs = [[1.0, 0.0]] * 3
    out = mmr_select(ids, rels, embs, k=3, lam=1.0)
    assert [ids[i] for _, i, *_ in out] == [2, 3, 1]


def test_core_tie_breaks_on_id():
    ids = [7, 3]
    rels = [0.5, 0.5]
    embs = [[1.0, 0.0], [0.0, 1.0]]
    out = mmr_select(ids, rels, embs, k=1, lam=0.7)
    assert ids[out[0][1]] == 3


def test_core_k_exceeding_candidates():
    out = mmr_select([1], [0.5], [[1.0]], k=5, lam=0.7)
    assert len(out) == 1


def test_zero_norm_candidate_contributes_zero_redundancy():
    assert _cos([0.0, 0.0], [1.0, 0.0]) == 0.0


def test_dataframe_groups_are_independent(spark):
    """Two queries with disjoint candidate pools diversify independently;
    redundancy never leaks across query_id groups."""
    rows = []
    for q in (0, 1):
        rows += [
            (q, q * 100 + 1, 0.95, [1.0, 0.0]),
            (q, q * 100 + 2, 0.94, [1.0, 0.001]),
            (q, q * 100 + 3, 0.60, [0.0, 1.0]),
        ]
    cands = spark.createDataFrame(
        rows, "query_id int, vec_id long, rel double, embedding array<double>"
    )
    out = mmr_rerank(cands, k=2, lam=0.5).collect()
    by_q = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert by_q == {0: [1, 3], 1: [101, 103]}
    ranks1 = [r for r in out if r["query_id"] == 1 and r["rank"] == 1]
    assert ranks1[0]["redundancy"] == 0.0


def test_dataframe_matches_core(spark):
    """The distributed path returns exactly what the plain-Python core
    computes for the same candidate list."""
    ids = [5, 6, 7, 8]
    rels = [0.9, 0.85, 0.8, 0.1]
    embs = [[1.0, 0.0, 0.0], [0.99, 0.1, 0.0], [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0]]
    expect = mmr_select(ids, rels, embs, k=3, lam=0.7)
    cands = spark.createDataFrame(
        [(0, i, r, e) for i, r, e in zip(ids, rels, embs)],
        "query_id int, vec_id long, rel double, embedding array<double>",
    )
    got = {
        r["rank"]: (r["vec_id"], r["rel"], r["redundancy"], r["mmr"])
        for r in mmr_rerank(cands, k=3, lam=0.7).collect()
    }
    for rank, i, rel, red, score in expect:
        assert got[rank] == (ids[i], rel, red, score)


def test_store_mmr_search_diversifies(spark):
    """Facade path: near-duplicate top candidates, MMR keeps one of the
    twins and promotes the distinct vector; plain search returns both twins."""
    from vervectordb_spark.store import VectorStore

    st = VectorStore(spark, vector_dim=3)
    # NOTE the first vector must NOT be the query itself: if pick1 == q,
    # then redundancy(c, pick1) == relevance(c) for every candidate and
    # at lam=0.5 ALL scores tie at exactly 0 — the winner degenerates to
    # the random-uuid tie-break (a real flake this test once had). With
    # pick1 off the query axis, the twin's redundancy (~0.999999) exceeds
    # its relevance (~0.99875) and the margins are ~1e-3, far above
    # float noise.
    ids_in = st.batch_insert(
        [[1.0, 0.05, 0.0], [1.0, 0.0501, 0.0], [0.8, 0.6, 0.0],
         [0.0, 0.0, 1.0]],
        [{} for _ in range(4)],
    )
    q = [1.0, 0.0, 0.0]
    plain = [r["vector_id"] for r in st.brute_force_search(q, top_k=2)]
    assert plain == ids_in[:2]  # the twins dominate plain top-2
    diverse = st.mmr_search(q, top_k=2, pool=4, lam=0.5)
    picked = [r["vector_id"] for r in diverse]
    assert len(picked) == 2
    # MMR keeps the best twin, then promotes the orthogonal vector over
    # both the near-duplicate twin and the mid-similarity vector
    assert picked[0] == plain[0]
    assert picked[1] == ids_in[3]
    assert diverse[0]["redundancy"] == 0.0


def test_string_ids_supported(spark):
    cands = spark.createDataFrame(
        [(0, "b", 0.9, [1.0, 0.0]), (0, "a", 0.9, [0.0, 1.0])],
        "query_id int, vec_id string, rel double, embedding array<double>",
    )
    out = mmr_rerank(cands, k=1, lam=0.7).collect()
    assert out[0]["vec_id"] == "a"  # tie -> id ASC
