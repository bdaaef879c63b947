"""Result diversification: Maximal Marginal Relevance re-ranking
(Carbonell & Goldstein, SIGIR 1998) over bounded candidate lists.

The reference returns raw top-k by cosine (vervectordb/__init__.py:344-358)
— near-duplicate corpus rows produce near-duplicate result lists. MMR is
the standard fix every serving stack bolts onto a vector store: greedily
re-pick k results from a top-R candidate pool, trading relevance against
redundancy with what's already picked:

    mmr(c) = lam * rel(q, c) - (1 - lam) * max_{s in selected} sim(c, s)

Spark-first shape: the greedy is inherently sequential PER QUERY, but each
query's state is its own bounded candidate list (R rows from any retriever
— exact, IVF, LSH, SQ8). So the operator is applyInPandas over query_id
groups: queries parallelize across the cluster, each group does O(R*k)
similarity evaluations over R rows already in memory. The corpus is never
touched — candidates arrive from the retriever's top-R, the only scan.

Numeric contract (bit-exact vs DuckDB): candidate-pair cosines are
computed here in Python with the SAME sequential double fold as
functions.similarity.cosine_expr / DuckDB list_dot_product (elements
widened to float64 FIRST, then multiplied and accumulated left-to-right),
`1 - lam` is evaluated as written (never pre-simplified: 1.0 - 0.7 is
0.30000000000000004 in IEEE, and both engines must use it), and ties break
(mmr DESC, id ASC). With identical doubles in, every greedy pick replays
exactly — queries_rerank.py gates this against an UNROLLED greedy in SQL.

100 TB posture: zero shuffles beyond the groupBy(query_id) that collects
each candidate list (R rows per key); state per task is R embeddings;
all-pairs work is R*k per query with R,k in the tens — driver never sees
data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers' convenience)
from pyspark.sql import types as T


def _dot(a: list[float], b: list[float]) -> float:
    """Sequential left-to-right double fold — the cosine_expr /
    list_dot_product contract."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _cos(a: list[float], b: list[float]) -> float:
    da, db = _dot(a, a), _dot(b, b)
    if da == 0.0 or db == 0.0:
        return 0.0
    return _dot(a, b) / (math.sqrt(da) * math.sqrt(db))


def mmr_select(ids: list, rels: list[float], embs: list[list[float]],
               k: int, lam: float) -> list[tuple]:
    """The greedy core over ONE candidate list (plain Python so tests can
    pin it directly). Returns [(rank, idx, rel, redundancy, mmr)].

    redundancy(c) = max cosine to the already-selected set (0.0 for the
    first pick, so pick 1 is argmax rel); running max is updated
    incrementally — O(R) sims per pick, O(R*k) total."""
    n = len(ids)
    one_m_lam = 1.0 - lam
    red = [0.0] * n
    remaining = list(range(n))
    out = []
    for rank in range(1, min(k, n) + 1):
        best = None
        for i in remaining:
            score = lam * rels[i] - one_m_lam * red[i]
            key = (-score, ids[i])
            if best is None or key < best[0]:
                best = (key, i, score)
        _, pick, score = best
        out.append((rank, pick, rels[pick], red[pick], score))
        remaining.remove(pick)
        for i in remaining:
            s = _cos(embs[i], embs[pick])
            if s > red[i]:
                red[i] = s
    return out


def mmr_rerank(cands: DataFrame, k: int, lam: float = 0.7,
               query_col: str = "query_id", id_col: str = "vec_id",
               rel_col: str = "rel", emb_col: str = "embedding") -> DataFrame:
    """Diversify each query's candidate list down to k rows.

    `cands`: (query_col, id_col, rel_col, emb_col) — the retriever's
    top-R per query. Returns (query_col, rank, id_col, rel, redundancy,
    mmr); redundancy is the max cosine to earlier picks."""
    id_type = cands.schema[id_col].dataType
    schema = T.StructType([
        cands.schema[query_col],
        T.StructField("rank", T.IntegerType()),
        T.StructField(id_col, id_type),
        T.StructField(rel_col, T.DoubleType()),
        T.StructField("redundancy", T.DoubleType()),
        T.StructField("mmr", T.DoubleType()),
    ])

    def per_query(pdf):
        import pandas as pd

        ids = pdf[id_col].tolist()
        rels = [float(r) for r in pdf[rel_col]]
        # widen float32 -> float64 BEFORE any arithmetic (exact; keeps the
        # fold bit-identical to embedding::DOUBLE[] on the oracle side)
        embs = [[float(x) for x in e] for e in pdf[emb_col]]
        picks = mmr_select(ids, rels, embs, k, lam)
        qv = pdf[query_col].iloc[0]
        return pd.DataFrame(
            [(qv, rank, ids[i], rel, red, score)
             for rank, i, rel, red, score in picks],
            columns=[query_col, "rank", id_col, rel_col, "redundancy", "mmr"],
        )

    return (
        cands.select(query_col, id_col, rel_col, emb_col)
        .groupBy(query_col)
        .applyInPandas(per_query, schema=schema)
    )
