"""Distributed many-query top-k via broadcast-GEMM candidate generation.

The throughput kernel behind batch search (reference Q6) and the kNN
self-join. The naive shape — materialize Q×N scored pairs, then rank — is
what the fold kernel does, and it is the bottleneck at scale: the pair
relation itself is the cost (Q×N rows through a window shuffle).

This kernel never materializes pairs:

  1. the query side (id, embedding) is collected and broadcast as ONE
     numpy matrix (queries ≪ corpus — the reference holds the same
     asymmetry: queries are arguments, the corpus is the store);
  2. `mapInPandas` over the corpus scores each Arrow batch against all
     queries with a single BLAS GEMM (the distributed analogue of the
     reference's one-vectorized-kernel-per-query,
     vervectordb/__init__.py:344, amortized over all queries at once);
  3. each batch emits only its per-query top-k candidates (a row that is
     in the global top-k is necessarily in its batch's top-k), so the
     shuffle input shrinks from Q×N to Q×k×num_batches;
  4. one window ranks the shrunken candidate set.

Scale math at 100 TB: corpus rows stream through executors (map-side only,
no pair shuffle); the query side is broadcast in blocks of
DEFAULT_QUERY_BLOCK rows (≈64 MB each at dim=128) with per-block candidate
sets unioned before the final window — driver/executor memory stays
bounded even when the query side is the whole corpus (kNN self-join). Each
block costs one corpus scan; prune with IVF/LSH first when block count
grows, which is the real 100 TB answer.

Numeric note: GEMM sums in a different order than the sequential fold, so
this kernel is NOT bit-identical to the DuckDB oracle contract — it agrees
to ~1e-12 relative. Oracle-gated queries therefore pin `kernel="fold"`;
equivalence of the two kernels is pytest-checked with tolerance.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return np.where(norms == 0.0, mat, mat / np.where(norms == 0.0, 1.0, norms))


#: Queries per broadcast block: 64k rows × 128 dims × 8 B ≈ 64 MB per
#: broadcast — bounded DRIVER and executor memory no matter how large the
#: query side is (a kNN self-join passes the whole corpus as queries).
DEFAULT_QUERY_BLOCK = 65_536


def gemm_topk(
    corpus: DataFrame,
    queries: DataFrame,
    top_k: int = 5,
    corpus_emb: str = "embedding",
    query_emb: str = "q_embedding",
    query_id: str = "query_id",
    id_col: str = "vec_id",
    exclude_self: bool = False,
    block_size: int = DEFAULT_QUERY_BLOCK,
) -> DataFrame:
    """Cosine top-k of every query against the corpus.

    Returns (query_id, id_col, rank, sim) with rank 1..top_k per query,
    ties broken by id. `exclude_self` drops query_id == id_col matches
    (self-join mode).

    The query side is processed in blocks of `block_size`: each block is
    broadcast and scored against the corpus in its own map-only pass, and
    the per-block candidate sets union before the final per-query window.
    Small query sets (≤ block_size — the overwhelmingly common case) take
    a single-collect fast path; large ones stream through
    `toLocalIterator`, so driver memory is bounded by ONE block even when
    the query side is the full corpus. The price of B blocks is B corpus
    scans — cache the corpus for multi-block self-joins, or prune with
    IVF/LSH first (the real 100 TB answer).
    """
    spark = corpus.sparkSession
    q_slim = queries.select(query_id, query_emb)

    qid_type = queries.schema[query_id].dataType.simpleString()
    vid_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"{query_id} {qid_type}, {id_col} {vid_type}, sim double"
    # one extra candidate per batch so self-exclusion can't starve a query
    fetch_k = top_k + 1 if exclude_self else top_k

    def score_block(qrows) -> DataFrame:
        qids = np.array([r[0] for r in qrows], dtype=object)
        qmat = _normalize_rows(
            np.array([list(r[1]) for r in qrows], dtype=np.float64)
        )
        bc = spark.sparkContext.broadcast((qids, qmat))

        def score(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
            import pandas as pd

            b_qids, b_qmat = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = _normalize_rows(
                    np.array(pdf[corpus_emb].tolist(), dtype=np.float64)
                )
                vids = pdf[id_col].to_numpy()
                kk = min(fetch_k, len(vids))
                # chunk the query axis so the score matrix stays ~8 MB.
                # Two regimes matter: (a) without chunking, a corpus-sized
                # query side allocates Q×batch×8 B per batch per task (sf1
                # self-join: 1.6 GB/batch); (b) even a bounded-but-large
                # chunk is slow — every ≳32 MB numpy temp is a fresh
                # mmap/munmap, and 16 workers churning 268 MB maps threw
                # the kernel into page-compaction (khugepaged/kcompactd)
                # storms: measured 27.7 s (2^25 elems) → 2.3 s (2^21) for
                # the identical sf1 GEMM, ~30% of ALL cpu in sys time.
                # Small chunks reuse the allocator's heap instead.
                # Chunking keeps ONE corpus scan, unlike shrinking the
                # broadcast block, which multiplies scans.
                q_chunk = max(256, (1 << 20) // max(1, len(vids)))
                out_q, out_v, out_s = [], [], []
                for lo in range(0, len(b_qids), q_chunk):
                    sims = b_qmat[lo : lo + q_chunk] @ mat.T  # (chunk, batch)
                    idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
                    out_q.append(np.repeat(b_qids[lo : lo + q_chunk], kk))
                    out_v.append(vids[idx].ravel())
                    out_s.append(np.take_along_axis(sims, idx, 1).ravel())
                yield pd.DataFrame(
                    {
                        query_id: np.concatenate(out_q),
                        id_col: np.concatenate(out_v),
                        "sim": np.concatenate(out_s),
                    }
                )

        return corpus.select(id_col, corpus_emb).mapInPandas(score, out_schema)

    # fast path probe: one collect bounded at block_size + 1 rows
    probe = q_slim.limit(block_size + 1).collect()
    if not probe:
        # reuse the derived id types: the hardcoded longs returned a
        # mismatched schema for string-keyed corpora on the empty branch
        schema = (f"{query_id} {qid_type}, {id_col} {vid_type}, "
                  "sim double, rank int")
        return spark.createDataFrame([], schema)
    if len(probe) <= block_size:
        cand = score_block(probe)
    else:
        # stream the query side block-wise; the driver holds one block
        block_cands: list[DataFrame] = []
        block: list = []
        for row in q_slim.toLocalIterator(prefetchPartitions=True):
            block.append(row)
            if len(block) == block_size:
                block_cands.append(score_block(block))
                block = []
        if block:
            block_cands.append(score_block(block))
        cand = block_cands[0]
        for extra in block_cands[1:]:
            cand = cand.unionByName(extra)

    if exclude_self:
        cand = cand.filter(F.col(query_id) != F.col(id_col))
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(id_col))
    return cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_k
    )
