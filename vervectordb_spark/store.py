"""VectorStore — the engine facade, mirroring the reference's `VerVectorDB`
class surface (vervectordb/__init__.py:221-594) on Spark DataFrames.

A user of the reference can switch 1:1:

    reference                      → vervectordb_spark.VectorStore
    ---------------------------------------------------------------
    VerVectorDB(dim, path)         → VectorStore(spark, dim, path)
    insert / batch_insert          → insert / batch_insert        (S2, S3)
    get_by_id                      → get_by_id                    (P1)
    update / delete                → update / delete              (P2, P3)
    brute_force_search             → brute_force_search           (Q1)
    hnsw_search                    → ann_search (LSH/IVF-backed)  (Q2 intent;
                                      the reference's HNSW is broken — B1)
    build_ivf_index / ivf_search   → build_ivf_index / ivf_search (Q4, Q5)
    batch_search                   → batch_search                 (Q6)
    filtered_search                → filtered_search              (Q7)
    train_pq / compress/decompress → train_pq / compress / decompress (C1-C5)
    save / load                    → save / load (parquet + model artifacts,
                                      not a pickle blob — S4, S5)

Mutability: the reference mutates the matrix in place; DataFrames are
immutable, so update/delete are copy-on-write rewrites. Unlike the
reference (which leaves HNSW stale after update/delete —
vervectordb/__init__.py:311-335), derived indexes here are invalidated on
every mutation and rebuilt on demand, so they can never dangle.

Scale: vectors never visit the driver. Only query vectors, centroids
(k×dim) and PQ codebooks (8×256×(dim/8)) are driver/broadcast state.
"""

from __future__ import annotations

import uuid
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vervectordb_spark.operators import search as _search

_ROW_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType(), False), False),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


class DimensionError(ValueError):
    """Analogue of the reference's dim-check ValueError
    (vervectordb/__init__.py:243-245)."""


class VectorStore:
    def __init__(self, spark: SparkSession, vector_dim: int, db_path: str | None = None):
        self.spark = spark
        self.vector_dim = int(vector_dim)
        self.db_path = db_path
        self.df: DataFrame = spark.createDataFrame([], _ROW_SCHEMA)
        # Derived indexes are cleared (not flagged) on mutation: a shared
        # validity flag lets building ONE index mark the OTHER valid and
        # serve stale results. None == "rebuild before use" — per-index,
        # unambiguous. The PQ codec is NOT an index: its codebooks are a
        # sample-trained lossy codec, still valid for encoding new rows
        # (the reference likewise trains once, vervectordb/__init__.py:493).
        #: blocks backing the CURRENT localCheckpoint of self.df /
        #: ivf.assigned, released when a newer checkpoint replaces them
        #: (finding #15 — DataFrame.unpersist() is a silent no-op here)
        self._df_ckpt_ids: set[int] = set()
        self._ivf_ckpt_ids: set[int] = set()
        self._ivf = None
        self._ann = None
        self._imi = None
        self._pq = None
        # residual codec (FAISS-style IVF-PQ): tied to the IVF centroids it
        # was fitted against, so it IS index-like — cleared on mutation
        # together with the IVF index; the encoded table is a cache.
        self._pq_res = None
        self._res_encoded = None
        # SQ8 scalar-quantization stats: per-dimension min/max, dim rows of
        # driver state (centroid-class). A codec like PQ — kept across
        # mutations; rows ingested outside the fitted range CLAMP to it
        # (standard SQ behavior; refit to re-tighten).
        self._sq_stats_pdf = None
        # BQ binary-quantization thresholds: per-dimension midrange, the
        # same centroid-class driver state and clamp-free semantics (a
        # threshold is a comparison; out-of-range rows just encode as
        # all-0/all-1 bits on the drifted dims — refit to re-center).
        self._bq_thr_pdf = None
        # rotated-BQ codec: (seed, thresholds fit on the ROTATED
        # coordinates) — same centroid-class semantics as _bq_thr_pdf,
        # plus the rotation's (dim, seed) which IS the whole transform
        self._rotbq: tuple[int, object] | None = None
        # provenance for same-path save-after-load (see save())
        self._loaded_from: str | None = None
        self._ivf_from_disk = False
        # True only while self.df IS the persisted id-clustered layout
        # (set on load, cleared by any mutation): gates the file-skipping
        # get_by_id path — stats may only prune files the frame still reads
        self._base_pristine = False

    # ------------------------------------------------------------------ DML
    def _check_rows(self, vectors: Sequence[Sequence[float]]) -> None:
        for v in vectors:
            if len(v) != self.vector_dim:
                raise DimensionError(
                    f"vector dim {len(v)} != store dim {self.vector_dim}"
                )

    def insert(self, vector: Sequence[float], metadata: dict | None = None) -> str:
        """S2: single-row append. Returns the assigned uuid id."""
        return self.batch_insert([vector], [metadata] if metadata else None)[0]

    def batch_insert(
        self,
        vectors: Sequence[Sequence[float]],
        metadatas: Sequence[dict | None] | None = None,
    ) -> list[str]:
        """S3: bulk append. Dim-checked before any write; ids assigned here
        (uuid4, like vervectordb/__init__.py:251). Append-only union — the
        100 TB shape is `write.mode('append')` on a partitioned table."""
        self._check_rows(vectors)
        ids = [str(uuid.uuid4()) for _ in vectors]
        metas = metadatas or [None] * len(vectors)
        rows = [
            (i, [float(x) for x in v], {str(k): str(val) for k, val in (m or {}).items()})
            for i, v, m in zip(ids, vectors, metas)
        ]
        new = self.spark.createDataFrame(rows, _ROW_SCHEMA)
        # allowMissingColumns: after compress() the store carries pq_code;
        # new rows land with NULL codes (encode again to fill them)
        self.df = self.df.unionByName(new, allowMissingColumns=True)
        self._invalidate()
        return ids

    def ingest(self, df: DataFrame, emb_col: str = "embedding") -> None:
        """Bulk ingest an existing DataFrame (the real 100 TB entry point).
        Dim constraint enforced as a plan-level filter + fail-fast count."""
        bad = df.filter(F.size(F.col(emb_col)) != self.vector_dim).limit(1).count()
        if bad:
            raise DimensionError(f"ingest contains rows with dim != {self.vector_dim}")
        cols = [F.col(c) for c in ("vec_id", "embedding", "metadata") if c in df.columns]
        base = df.select(*cols)
        if "vec_id" not in df.columns:
            # uuid() is nondeterministic: a task retry or AQE re-plan
            # between two actions would re-draw every id, so ids handed
            # out by one query could vanish from the next. localCheckpoint
            # (lazy) pins the batch at its first materialization.
            base = base.withColumn("vec_id", F.expr("uuid()")).localCheckpoint(
                eager=False
            )
        if "metadata" not in df.columns:
            base = base.withColumn(
                "metadata", F.lit(None).cast("map<string,string>")
            )
        self.df = self.df.unionByName(
            base.select(
                F.col("vec_id").cast("string"),
                F.col("embedding").cast("array<float>").alias("embedding"),
                "metadata",
            ),
            allowMissingColumns=True,
        )
        self._invalidate()

    # --------------------------------------------------------- point lookup
    def _point_frame(self, vec_id: str) -> DataFrame:
        """The frame an id probe scans: when this store still serves the
        persisted id-clustered layout (load() set _base_pristine; save()
        recorded per-file vec_id min/max stats), read ONLY the files whose
        id envelope can hold the key — driver-side metadata skipping, the
        primary-key story a 100 TB table needs (proof via executed scan
        metrics in tests/test_layout.py). Any in-memory mutation falls
        back to the live frame, where the equality predicate still
        row-group-skips via pushdown."""
        import os as _os

        from vervectordb_spark.sources.layout import STATS_FILE, pruned_scan

        if self._base_pristine and self._loaded_from:
            vectors_dir = _os.path.join(self._loaded_from, "vectors")
            if _os.path.exists(_os.path.join(vectors_dir, STATS_FILE)):
                return pruned_scan(self.spark, vectors_dir,
                                   {"vec_id": (vec_id, vec_id)})
        return self.df

    def get_by_id(self, vec_id: str) -> dict:
        """P1: id → {vector_id, vector, metadata}; KeyError if absent
        (reference vervectordb/__init__.py:301-309)."""
        rows = _search.point_lookup(self._point_frame(vec_id), vec_id).collect()
        if not rows:
            raise KeyError(vec_id)
        r = rows[0]
        return {
            "vector_id": r["vec_id"],
            "vector": list(r["embedding"]),
            "metadata": dict(r["metadata"] or {}),
        }

    # ------------------------------------------------------------- mutation
    def update(
        self,
        vec_id: str,
        new_vector: Sequence[float] | None = None,
        new_metadata: dict | None = None,
    ) -> None:
        """P2: copy-on-write row replacement. Unlike the reference, derived
        indexes are invalidated (fixes the stale-HNSW quirk, SURVEY §1.3)."""
        if new_vector is not None:
            self._check_rows([new_vector])
        old = self.get_by_id(vec_id)  # KeyError if absent, like the reference
        vec = [float(x) for x in (new_vector if new_vector is not None else old["vector"])]
        meta = {str(k): str(v) for k, v in (new_metadata if new_metadata is not None else old["metadata"]).items()}
        replacement = self.spark.createDataFrame([(vec_id, vec, meta)], _ROW_SCHEMA)
        self.df = self.df.filter(F.col("vec_id") != vec_id).unionByName(
            replacement, allowMissingColumns=True
        )
        self._invalidate()

    def delete(self, vec_id: str) -> None:
        """P3: anti-filter rewrite (Delta DELETE when available)."""
        self.df = self.df.filter(F.col("vec_id") != vec_id)
        self._invalidate()

    def merge(self, source: DataFrame) -> None:
        """Bulk upsert: rows in `source` (store schema: vec_id, embedding,
        metadata) REPLACE same-id rows and append otherwise — the batch
        analogue of update()/insert() (operators/merge.merge_upsert), one
        anti-join instead of a per-row loop of plan rewrites. Dim
        constraint enforced as a plan-level fail-fast, like ingest()."""
        from vervectordb_spark.operators.merge import merge_upsert

        bad = source.filter(
            F.size(F.col("embedding")) != self.vector_dim
        ).limit(1).count()
        if bad:
            raise DimensionError(f"merge contains rows with dim != {self.vector_dim}")
        src = source.select(
            F.col("vec_id").cast("string"),
            F.col("embedding").cast("array<float>").alias("embedding"),
            (F.col("metadata") if "metadata" in source.columns
             else F.lit(None)).cast("map<string,string>").alias("metadata"),
        )
        self.df = merge_upsert(self.df, src, "vec_id")
        self._invalidate()

    # --------------------------------------------------------------- search
    def brute_force_search(
        self,
        query_vector: Sequence[float],
        top_k: int = 5,
        pre_filter: Column | None = None,
        metric: str = "cosine",
    ) -> list[dict]:
        """Q1: exact top-k. Filter runs BEFORE ranking (D1). `metric`:
        cosine (reference) | dot (MIPS) | l2 (nearest-first; the returned
        `similarity` is a distance)."""
        self._check_rows([query_vector])
        out = _search.brute_force_topk(
            self.df, query_vector, top_k, pre_filter=pre_filter,
            extra_cols=("metadata",), metric=metric,
        )
        return [
            {"vector_id": r["vec_id"], "similarity": r["sim"], "metadata": dict(r["metadata"] or {})}
            for r in out.collect()
        ]

    def filtered_search(
        self,
        query_vector: Sequence[float],
        top_k: int = 5,
        keywords: Sequence[str] | None = None,
        metadata_filter: Column | None = None,
    ) -> list[dict]:
        """Q7: keyword OR-containment over metadata['text'] AND a predicate,
        both pushed below ranking. `metadata_filter` accepts either a
        Column (pushdown-eligible) or the reference's raw callable form
        `fn(meta: dict) -> bool` (vervectordb/__init__.py:538-546) —
        routed through search.callable_predicate over this store's
        metadata map; same rows, no scan pushdown (the documented slow
        path for ported closures)."""
        pred = None
        if keywords:
            pred = _search.keyword_filter(F.element_at(F.col("metadata"), "text"), keywords)
        if metadata_filter is not None and not isinstance(metadata_filter, Column):
            if not callable(metadata_filter):
                raise TypeError(
                    f"metadata_filter must be a Column or a callable, got "
                    f"{type(metadata_filter).__name__}")
            metadata_filter = _search.callable_predicate(
                metadata_filter, F.col("metadata"))
        if metadata_filter is not None:
            pred = metadata_filter if pred is None else (pred & metadata_filter)
        return self.brute_force_search(query_vector, top_k, pre_filter=pred)

    def chunk_ingest(self, docs: DataFrame, chunk_tokens: int = 100,
                     overlap: int = 20, text_col: str = "text",
                     id_col: str = "doc_id") -> int:
        """RAG-style corpus ingest in one call: chunk each document into
        overlapping token windows (text.chunk_documents — map-only), embed
        every chunk (embed.embed_documents hashing trick; swap in the
        model slot for production), and ingest (chunk vectors carry
        metadata {doc_id, chunk_id, text}). Returns the number of chunks
        ingested. The whole chain is scan-side projections — the only
        shuffle is none; ingest appends lazily."""
        from vervectordb_spark.operators.embed import embed_documents
        from vervectordb_spark.operators.text import chunk_documents

        chunks = chunk_documents(
            docs, chunk_tokens=chunk_tokens, overlap=overlap,
            text_col=text_col, id_col=id_col,
        ).withColumn(
            "_chunk_key",
            F.concat_ws("#", F.col(id_col).cast("string"),
                        F.col("chunk_id").cast("string")),
        )
        # widen=False: ingest's output file layout would otherwise vary
        # with the session core count, and the stored vectors feed
        # IVFIndex.build (MLlib KMeans) downstream — fit inputs stay
        # partition-stable (partitioning.py's rule; ADVICE r11)
        emb = embed_documents(
            chunks, dim=self.vector_dim, text_col="chunk_text",
            id_col="_chunk_key", widen=False,
        )
        meta = chunks.select(
            F.col("_chunk_key").alias("vec_id"),
            F.map_from_arrays(
                F.array(F.lit("doc_id"), F.lit("chunk_id"), F.lit("text")),
                F.array(F.col(id_col).cast("string"),
                        F.col("chunk_id").cast("string"),
                        F.col("chunk_text")),
            ).alias("metadata"),
        )
        self.ingest(emb.join(meta, on="vec_id"))
        return emb.count()

    def hybrid_search(
        self,
        query_vector: Sequence[float],
        terms: Sequence[str],
        top_k: int = 5,
        n_candidates: int = 50,
        rrf_k: int = 60,
    ) -> list[dict]:
        """Hybrid retrieval over the store: reciprocal-rank fusion of the
        lexical top-R (total term frequency over metadata['text']) and the
        dense top-R (exact cosine) — the upgrade of Q7's binary keyword
        filter (reference vervectordb/__init__.py:540-544) from a
        pre-filter to a ranked modality. Each side is one bounded
        TakeOrderedAndProject; fusion touches 2·R rows."""
        from vervectordb_spark.operators import hybrid as _hybrid

        self._check_rows([query_vector])
        docs = self.df.select(
            F.col("vec_id").alias("doc_id"),
            F.element_at(F.col("metadata"), "text").alias("text"),
        )
        out = _hybrid.hybrid_search(
            docs, self.df, list(terms), list(query_vector),
            n_candidates=n_candidates, top_k=top_k, rrf_k=rrf_k,
        )
        return [
            {
                "vector_id": r["doc_id"],
                "rrf_score": r["rrf_score"],
                "kw_rank": r["kw_rank"],
                "vec_rank": r["vec_rank"],
                "similarity": r["sim"],
            }
            for r in out.collect()
        ]

    def batch_search(
        self, query_vectors: Sequence[Sequence[float]], top_k: int = 5
    ) -> list[list[dict]]:
        """Q6, actually batched: one broadcast-join + window job for ALL
        queries (the reference loops queries serially despite its
        batch_size arg, vervectordb/__init__.py:524-534)."""
        self._check_rows(query_vectors)
        qdf = self.spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(query_vectors)],
            T.StructType([
                T.StructField("query_id", T.IntegerType(), False),
                T.StructField("q_embedding", T.ArrayType(T.FloatType(), False), False),
            ]),
        )
        out = _search.batch_topk(self.df, qdf, top_k).orderBy("query_id", "rank").collect()
        results: list[list[dict]] = [[] for _ in query_vectors]
        for r in out:
            results[r["query_id"]].append(
                {"vector_id": r["vec_id"], "similarity": r["sim"]}
            )
        return results

    # ----------------------------------------------------- derived indexes
    def _invalidate(self) -> None:
        self._ivf = None
        self._ann = None
        self._imi = None
        self._ivf_from_disk = False
        self._pq_res = None
        self._res_encoded = None
        self._base_pristine = False  # df no longer == the persisted layout

    def build_ivf_index(self, n_clusters: int = 16, seed: int = 42):
        from vervectordb_spark.operators.ivf import IVFIndex

        self._ivf = IVFIndex.build(self.df, n_clusters=n_clusters, seed=seed)
        self._ivf_from_disk = False
        # the residual codec is fitted against the PREVIOUS centroids --
        # combining it with a rebuilt IVF silently mis-scores ADC
        self._pq_res = None
        self._res_encoded = None
        return self._ivf

    def ivf_search(self, query_vector, top_k: int = 5, nprobe: int | None = None,
                   pre_filter: Column | None = None) -> list[dict]:
        """Q5: probe nprobe clusters (reference default max(k//2, 8),
        vervectordb/__init__.py:441), rescore exactly inside them."""
        if self._ivf is None:
            self.build_ivf_index()
        out = self._ivf.search(query_vector, top_k=top_k, nprobe=nprobe, pre_filter=pre_filter)
        return [
            {"vector_id": r["vec_id"], "similarity": r["sim"], "cluster_id": r["cluster_id"]}
            for r in out.collect()
        ]

    def build_imi_index(self, k1: int = 8, k2: int = 8, seed: int = 42):
        """Two-level coarse quantizer over the store (operators/imi.py —
        beyond the reference's index set): k1*k2 cells from k1+k2 trained
        half-centroids. The cell-count answer when a flat IVF's k would
        have to be impractically large; cleared on mutation like every
        other index (None == rebuild before use)."""
        from vervectordb_spark.operators.imi import IMIIndex

        self._imi = IMIIndex.build(self.df, k1=k1, k2=k2,
                                   dim=self.vector_dim, seed=seed)
        return self._imi

    def imi_search(self, query_vector: Sequence[float], top_k: int = 5,
                   a: int = 2, b: int = 2) -> list[dict]:
        """Rectangle-probe serving over the store's IMI layout: the a*b
        best-cell rectangle, exact cosine rescore inside it (builds the
        index first if absent)."""
        if self._imi is None:
            self.build_imi_index()
        out = self._imi.search(query_vector, top_k=top_k, a=a, b=b)
        return [
            {"vector_id": r["vec_id"], "similarity": r["sim"],
             "cell": (r["cell1"], r["cell2"])}
            for r in out.collect()
        ]

    def build_ann_index(self, bucket_length: float = 2.0, num_hash_tables: int = 3, seed: int = 42):
        from vervectordb_spark.operators.ann import LSHAnnIndex

        self._ann = LSHAnnIndex.build(
            self.df, bucket_length=bucket_length, num_hash_tables=num_hash_tables, seed=seed
        )
        return self._ann

    def ann_search(self, query_vector, top_k: int = 5,
                   n_probes: int = 1) -> list[dict]:
        """Q2 intent (the reference's HNSW contract — its implementation
        returns ≤1 row due to bug B1 and is deliberately NOT reproduced).
        n_probes > 1 = multi-probe LSH: probe the n_probes lowest-margin
        neighbor buckets per table — recall without more tables."""
        if self._ann is None:
            self.build_ann_index()
        if n_probes > 1:
            # multi-probe is a sign-LSH feature; MLlib BRP-LSH has no
            # margin-ranked neighbor buckets to probe
            from vervectordb_spark.operators.ann import SignLSHIndex

            if not isinstance(self._ann, SignLSHIndex):
                raise ValueError(
                    "n_probes > 1 requires the sign-LSH index "
                    "(build_ann_index(kind='signlsh'))")
            out = self._ann.search(query_vector, top_k=top_k,
                                   n_probes=n_probes)
        else:
            out = self._ann.search(query_vector, top_k=top_k)
        return [{"vector_id": r["vec_id"], "similarity": r["sim"]} for r in out.collect()]

    # hnsw_search kept as an alias so reference callers can switch 1:1.
    hnsw_search = ann_search

    def train_pq(self, n_subquantizers: int = 8, n_bits: int = 8,
                 sample_size: int = 10_000, seed: int = 42):
        from vervectordb_spark.operators.pq import PQCodec

        if self.vector_dim % n_subquantizers:
            raise DimensionError(
                f"dim {self.vector_dim} not divisible by {n_subquantizers}"
            )  # reference check: vervectordb/__init__.py:163-164
        self._pq = PQCodec.fit(
            self.df, dim=self.vector_dim, n_subquantizers=n_subquantizers,
            codebook_size=2 ** n_bits, sample_size=sample_size, seed=seed,
        )
        return self._pq

    def mmr_search(self, query_vector: Sequence[float], top_k: int = 5,
                   pool: int | None = None, lam: float = 0.7) -> list[dict]:
        """Diversified search: exact top-`pool` candidates (default
        4*top_k), then MMR greedy down to top_k (operators/rerank.py —
        near-duplicate corpus rows stop monopolizing the result list).
        Returns [{vector_id, similarity, redundancy, mmr}] in pick order."""
        from vervectordb_spark.operators.rerank import mmr_rerank

        self._check_rows([query_vector])
        pool = pool if pool is not None else 4 * top_k
        cand = _search.brute_force_topk(
            self.df, query_vector, pool, extra_cols=("embedding",),
        ).withColumnRenamed("sim", "rel").withColumn("_q", F.lit(0))
        out = mmr_rerank(cand, k=top_k, lam=lam, query_col="_q",
                         rel_col="rel").orderBy("rank")
        return [
            {"vector_id": r["vec_id"], "similarity": r["rel"],
             "redundancy": r["redundancy"], "mmr": r["mmr"]}
            for r in out.collect()
        ]

    def train_sq(self):
        """SQ8 scalar-quantization codec (operators/sq.py) — the 4x
        storage/scan reducer next to PQ's 32x: ONE distributed min/max
        aggregate, stats pinned driver-side at fit time so later
        mutations can't silently shift the code mapping."""
        from vervectordb_spark.operators import sq

        stats_pdf = sq.fit_sq_stats(self.df).toPandas()
        if len(stats_pdf) == 0:
            raise ValueError("train_sq on an empty store")
        self._sq_stats_pdf = stats_pdf
        return self._sq_stats_pdf

    def _sq_stats(self) -> DataFrame:
        if self._sq_stats_pdf is None:
            self.train_sq()
        return self.spark.createDataFrame(self._sq_stats_pdf)

    def sq_compress(self) -> DataFrame:
        """Adds sq_code ARRAY<SMALLINT> (uint8 values, 4x over float32).
        Storage-only like compress(); sq_search reads the codes."""
        from vervectordb_spark.operators import sq

        self.df = sq.with_codes(self.df, self._sq_stats())
        return self.df

    def sq_search(self, query_vector: Sequence[float], top_k: int = 5,
                  rerank_factor: int = 3) -> list[dict]:
        """Asymmetric SQ8 search: full-precision query scored against
        uint8-code reconstructions (1/4 the scan bytes), top
        rerank_factor*top_k via TakeOrderedAndProject, exact cosine rerank
        on the raw vectors of those candidates only (the 3x over-fetch
        ratio shared with the LSH rerank, SURVEY.md §2.5). Rows ingested
        after sq_compress carry NULL codes — adc_search encodes them on
        the fly, so they are searchable immediately."""
        from vervectordb_spark.operators import sq

        out = sq.adc_search(
            self.df, self._sq_stats(), query_vector, top_k=top_k,
            rerank_factor=rerank_factor, scorer="expr",
        )
        return [{"vector_id": r["vec_id"], "similarity": r["sim"]} for r in out.collect()]

    def ivfsq_search(self, query_vector: Sequence[float], top_k: int = 5,
                     nprobe: int | None = None,
                     rerank_factor: int = 3) -> list[dict]:
        """IVF-SQ8 composed serving (FAISS IVF_SQ8): probe the IVF
        clusters (building the index if absent), then the asymmetric SQ8
        scan + exact rerank over ONLY the probed clusters — the
        partition-pruned 1/4-byte scan. Completes the index x codec
        matrix next to ivf_search (flat), ivfpq / ivfpq_residual."""
        from vervectordb_spark.operators import sq

        if self._ivf is None:
            self.build_ivf_index()
        probes = self._ivf.probe_clusters(query_vector, nprobe)
        probed = self._ivf.assigned.filter(F.col("cluster_id").isin(probes))
        out = sq.adc_search(probed, self._sq_stats(), query_vector,
                            top_k=top_k, rerank_factor=rerank_factor,
                            scorer="expr")
        return [{"vector_id": r["vec_id"], "similarity": r["sim"]}
                for r in out.collect()]

    def ivfbq_search(self, query_vector: Sequence[float], top_k: int = 5,
                     nprobe: int | None = None,
                     rerank_factor: int = 3) -> list[dict]:
        """IVF-BQ composed serving — the last cell of the index x codec
        matrix: probe the IVF clusters (building the index if absent),
        then the integer Hamming scan + exact rerank over ONLY the
        probed clusters' packed sign words. Thresholds come from the
        full-corpus fit (codec state is probe-independent)."""
        from vervectordb_spark.operators import bq

        if self._ivf is None:
            self.build_ivf_index()
        probes = self._ivf.probe_clusters(query_vector, nprobe)
        probed = self._ivf.assigned.filter(F.col("cluster_id").isin(probes))
        out = bq.hamming_search(probed, self._bq_thresholds(), query_vector,
                                top_k=top_k, rerank_factor=rerank_factor)
        return [{"vector_id": r["vec_id"], "similarity": r["sim"],
                 "hamming": r["hamming"]} for r in out.collect()]

    def train_bq(self):
        """Binary-quantization codec (operators/bq.py) — the 16x
        storage/scan reducer next to SQ8's 4x and PQ's 32x: one bit per
        dimension at per-dim midrange thresholds, from the same ONE
        min/max aggregate as SQ8. Thresholds pinned driver-side at fit
        time (dim floats — centroid-class state)."""
        from vervectordb_spark.operators import bq

        thr_pdf = bq.fit_bq_thresholds(self.df).toPandas()
        if len(thr_pdf) == 0:
            raise ValueError("train_bq on an empty store")
        self._bq_thr_pdf = thr_pdf
        return self._bq_thr_pdf

    def _bq_thresholds(self) -> DataFrame:
        if self._bq_thr_pdf is None:
            self.train_bq()
        return self.spark.createDataFrame(self._bq_thr_pdf)

    def bq_compress(self) -> DataFrame:
        """Adds bq_code ARRAY<BIGINT> — ceil(dim/60) packed sign words
        (16x over float32 at dim=64). Storage-only like compress();
        bq_search scans the words."""
        from vervectordb_spark.operators import bq

        self.df = bq.with_codes(self.df, self._bq_thresholds(),
                                self.vector_dim)
        return self.df

    def bq_search(self, query_vector: Sequence[float], top_k: int = 5,
                  rerank_factor: int = 3) -> list[dict]:
        """Hamming-candidate search: the corpus is scanned as packed sign
        words with bit_count(xor) distances in pure integer codegen, top
        rerank_factor*top_k by (hamming ASC, id ASC) via
        TakeOrderedAndProject, exact cosine rerank on the raw vectors of
        those candidates only (the shared 3x over-fetch ratio,
        SURVEY.md §2.5). Rows ingested after bq_compress carry NULL codes
        — hamming_search encodes them on the fly."""
        from vervectordb_spark.operators import bq

        out = bq.hamming_search(
            self.df, self._bq_thresholds(), query_vector, top_k=top_k,
            rerank_factor=rerank_factor,
        )
        return [{"vector_id": r["vec_id"], "similarity": r["sim"],
                 "hamming": r["hamming"]} for r in out.collect()]

    def train_rotated_bq(self, seed: int = 42):
        """Rotated-BQ codec: HD-rotate (operators/rotation.py — balances
        skewed per-dimension distributions so the sign bits carry more
        signal; see RECALL.md for when it wins) and fit the midrange
        thresholds on the ROTATED coordinates. State is (seed, dim-row
        thresholds) — centroid-class, kept across mutations like the
        other codecs."""
        from vervectordb_spark.operators import bq, rotation

        d2 = rotation.next_pow2(self.vector_dim)
        rotated = rotation.with_rotation(self.df, self.vector_dim, seed,
                                         pad=d2 != self.vector_dim)
        thr_pdf = bq.fit_bq_thresholds(rotated, emb_col="emb_rot",
                                       dim=d2).toPandas()
        if len(thr_pdf) == 0:
            raise ValueError("train_rotated_bq on an empty store")
        self._rotbq = (seed, thr_pdf)
        return thr_pdf

    def _rotbq_state(self, seed: int):
        if self._rotbq is None or self._rotbq[0] != seed:
            self.train_rotated_bq(seed)
        return self.spark.createDataFrame(self._rotbq[1])

    def rotated_bq_compress(self, seed: int = 42) -> DataFrame:
        """Adds bq_rot_code ARRAY<BIGINT> — the packed sign words of the
        ROTATED coordinates (trains the codec first if needed). Rows
        ingested afterwards carry NULL codes and are encoded on the fly
        at search time (the with_codes coalesce contract)."""
        from vervectordb_spark.operators import bq, rotation

        thr = self._rotbq_state(seed)
        d2 = rotation.next_pow2(self.vector_dim)
        rotated = rotation.with_rotation(self.df, self.vector_dim, seed,
                                         pad=d2 != self.vector_dim)
        self.df = bq.with_codes(rotated, thr, d2, emb_col="emb_rot",
                                out_col="bq_rot_code").drop("emb_rot")
        return self.df

    def rotated_bq_search(self, query_vector: Sequence[float],
                          top_k: int = 5, rerank_factor: int = 3,
                          seed: int = 42) -> list[dict]:
        """Rotated-BQ serving: Hamming scan in the rotated coordinate
        system, exact cosine rerank on the RAW vectors (rotation is
        metric-preserving, so the reported sim is the same one every
        other path reports). Uses stored bq_rot_code words when
        rotated_bq_compress ran (NULL-code rows encoded on the fly);
        otherwise rotates + encodes in-line."""
        from vervectordb_spark.operators import bq, rotation

        thr = self._rotbq_state(seed)
        d2 = rotation.next_pow2(self.vector_dim)
        # ONE path either way: the store's trained thresholds plus a
        # codes frame that reuses stored bq_rot_code words when compress
        # ran (with_codes coalesces NULL-code rows) and encodes lazily
        # when it didn't — never a silent inline refit.
        rotated = rotation.with_rotation(
            self.df, self.vector_dim, seed, pad=d2 != self.vector_dim)
        codes = bq.with_codes(rotated, thr, d2, emb_col="emb_rot",
                              out_col="bq_rot_code").select(
            "vec_id", F.col("bq_rot_code").alias("bq_code"))
        out = rotation.rotated_bq_search(
            self.df, query_vector, self.vector_dim, top_k=top_k,
            rerank_factor=rerank_factor, seed=seed,
            thresholds=thr, codes=codes,
        )
        return [{"vector_id": r["vec_id"], "similarity": r["sim"],
                 "hamming": r["hamming"]} for r in out.collect()]

    def train_residual_pq(self, n_subquantizers: int = 8, n_bits: int = 8,
                          sample_size: int = 10_000, seed: int = 42):
        """Residual IVF-PQ codec (FAISS-style; beyond the reference's
        raw-vector PQ): fit on (embedding − assigned centroid). Builds the
        IVF index first if absent — the codec is tied to those centroids."""
        from vervectordb_spark.operators.pq import PQCodec  # noqa: F401

        if self.vector_dim % n_subquantizers:
            raise DimensionError(
                f"dim {self.vector_dim} not divisible by {n_subquantizers}"
            )
        if self._ivf is None:
            self.build_ivf_index()
        self._pq_res = self._ivf.fit_residual_codec(
            n_subquantizers=n_subquantizers, codebook_size=2 ** n_bits,
            sample_size=sample_size, seed=seed,
        )
        self._res_encoded = None
        return self._pq_res

    def ivfpq_residual_search(self, query_vector, top_k: int = 5,
                              nprobe: int | None = None) -> list[dict]:
        """Serving path over residual codes: probe → fused-LUT ADC →
        exact rerank. The residual-encoded table is built lazily once and
        cached (at scale: persisted partitionBy(cluster_id) like the plain
        codes table, so the probe partition-prunes)."""
        if self._pq_res is None:
            self.train_residual_pq()
        if self._res_encoded is None:
            self._res_encoded = self._ivf.encode_residual(self._pq_res).select(
                "vec_id", "cluster_id", "pq_code"
            ).cache()
        out = self._ivf.search_residual_pq(
            self._pq_res, self._res_encoded, query_vector, top_k=top_k,
            nprobe=nprobe, rerank=self.df.select("vec_id", "embedding"),
        )
        return [
            {"vector_id": r["vec_id"], "similarity": r["sim"]}
            for r in out.collect()
        ]

    def semdedup(self, threshold: float = 0.95,
                 n_clusters: int = 16) -> DataFrame:
        """Cluster-bounded semantic near-dup pairs over the store — the
        SemDeDup shape riding the store's OWN IVF layout: the fitted
        index's cluster assignment is reused directly (no second
        assignment pass), so dedup cost is Σ|cluster|² ≈ N²/k, and the
        clusters are the same ones search probes. Returns (cluster_id,
        src_id, dst_id, sim) with sim >= threshold, src_id < dst_id."""
        from vervectordb_spark.operators.dedup import within_cluster_pairs

        if self._ivf is None:
            self.build_ivf_index(n_clusters=n_clusters)
        return within_cluster_pairs(self._ivf.assigned, threshold=threshold)

    def compress(self) -> DataFrame:
        """C4: adds pq_code ARRAY<TINYINT>; storage-only codec, like the
        reference (search never reads codes, vervectordb/__init__.py:344)."""
        if self._pq is None:
            self.train_pq()
        self.df = self._pq.encode(self.df)
        return self.df

    def decompress(self) -> DataFrame:
        if self._pq is None:
            raise RuntimeError("train_pq first")
        return self._pq.decode(self.df)

    def checkpoint(self, path: str | None = None,
                   versioned: bool = False) -> None:
        """Collapse the copy-on-write lineage. Every insert/update/delete
        extends the logical plan (union/filter chain); after a mutation
        burst the plan itself becomes the cost (the reference's analogue
        is np.vstack doubling peak memory per batch,
        vervectordb/__init__.py:256,284). Writing and re-reading resets the
        plan to one scan — at scale this is the compaction job.

        versioned=True commits the snapshot to a VersionedTable at
        `{db_path}/_versions` instead of rewriting one directory: each
        checkpoint is an immutable manifest commit, so repeated
        checkpoints never write over the files the current plan reads,
        prior states stay readable (`version_history`), and
        `restore_version` rolls the store back without data loss."""
        if versioned:
            from vervectordb_spark.sources.versioned import VersionedTable

            vpath = path or (self.db_path and f"{self.db_path}/_versions")
            if not vpath:
                raise ValueError("no db_path for checkpoint")
            vt = VersionedTable.create(self.spark, vpath)  # open-if-exists
            vt.overwrite(self.df)
            self.df = vt.read()
            self._versions = vt
            return
        path = path or (self.db_path and f"{self.db_path}/_checkpoint")
        if not path:
            raise ValueError("no db_path for checkpoint")
        # a SECOND checkpoint reads the very path it overwrites -- Spark
        # rejects overwrite-while-reading, so break the lineage first
        from vervectordb_spark.functions.checkpoint import (
            eager_checkpoint, release_blocks)

        self.df, ids = eager_checkpoint(self.df,
                                        release=self._df_ckpt_ids)
        self._df_ckpt_ids = ids
        self.df.write.mode("overwrite").parquet(path)
        self.df = self.spark.read.parquet(path)
        # df now scans the parquet it just wrote: the bridge checkpoint's
        # blocks are garbage — free them (one leaked set per checkpoint()
        # call otherwise)
        release_blocks(self.spark.sparkContext, ids)
        self._df_ckpt_ids = set()

    def version_history(self) -> list[dict]:
        """Manifests of the versioned-checkpoint log, newest first."""
        if getattr(self, "_versions", None) is None:
            raise ValueError("no versioned checkpoint yet")
        return self._versions.history()

    def restore_version(self, version: int) -> None:
        """Roll the store's vectors back to a prior checkpoint — published
        as a NEW version (append-only log; nothing is destroyed). Derived
        indexes are invalidated and rebuild lazily."""
        if getattr(self, "_versions", None) is None:
            raise ValueError("no versioned checkpoint yet")
        self._versions.rollback(version)
        self.df = self._versions.read()
        self._invalidate()

    # ---------------------------------------------------------- persistence
    def save(self, path: str | None = None,
             id_files: int | None = None) -> None:
        """S4: per-component parquet tables instead of one pickle blob —
        scan-able, partition-able, schema-evolvable.

        The whole artifact tree is written under `{path}.__tmp__` and
        rename-swapped in (sources/atomic.py) — an interrupted save leaves
        the previous complete store, never the half-written artifacts the
        load guards detect (the reference's pickle save truncates in
        place, vervectordb/__init__.py:556-573).

        Save-after-load to the SAME path is supported: the in-flight
        DataFrames are materialized (localCheckpoint) first, because the
        swap retires the very files their lineage reads. At 100 TB prefer
        versioned destination dirs or a table format; the same-path
        rewrite is the small-store convenience.

        `id_files` sizes the id-clustered vectors layout (default: the
        frame's current partition count) — more files ⇒ tighter per-file
        id envelopes ⇒ fewer files read per get_by_id."""
        from vervectordb_spark.sources.atomic import atomic_save

        path = path or self.db_path
        if not path:
            raise ValueError("no db_path")
        import os as _os

        if _os.path.isdir(f"{path}/_versions"):
            # the atomic swap would DELETE the versioned log nested under
            # this path -- that history is the durable store; refuse loudly
            raise ValueError(
                f"{path} holds a versioned checkpoint log (_versions); "
                "use checkpoint(versioned=True) for persistence there, or "
                "save() to a different path"
            )
        # materialize whenever the target is this store's own directory:
        # the swap retires _checkpoint files the current plan may read
        # (the old loaded_from==path guard missed the
        # fresh-store-then-checkpoint() case)
        same = self._loaded_from == path or path == self.db_path
        if same:
            from vervectordb_spark.functions.checkpoint import (
                eager_checkpoint)

            # release the PREVIOUS save's checkpoint blocks as the new
            # one replaces them — repeated save() calls leaked one
            # blocks-set each otherwise (finding #15)
            self.df, self._df_ckpt_ids = eager_checkpoint(
                self.df, release=self._df_ckpt_ids)
            if self._ivf is not None:
                self._ivf.assigned, self._ivf_ckpt_ids = eager_checkpoint(
                    self._ivf.assigned, release=self._ivf_ckpt_ids)
        with atomic_save(path) as tmp:
            # id-clustered base layout: range-partition + sort by vec_id
            # and record per-file min/max id stats (sources/layout.py) so
            # a loaded store serves get_by_id by reading ONLY the file(s)
            # whose id envelope can hold the key — at 100 TB a primary-key
            # fetch must be metadata-driven file skipping, not a full scan
            # with pushdown (VERDICT r6 #7). The clustered write is the
            # standard one-shuffle layout job every table format runs on
            # OPTIMIZE; stats are #files rows of driver-side metadata.
            from vervectordb_spark.sources.layout import collect_file_stats

            n_files = id_files or max(1, self.df.rdd.getNumPartitions())
            (self.df.repartitionByRange(n_files, F.col("vec_id"))
             .sortWithinPartitions("vec_id")
             .write.mode("overwrite").parquet(f"{tmp}/vectors"))
            collect_file_stats(self.spark, f"{tmp}/vectors", ["vec_id"])
            if self._pq is not None:
                self._pq.save(f"{tmp}/pq", self.spark)
            if self._sq_stats_pdf is not None:
                self.spark.createDataFrame(self._sq_stats_pdf).coalesce(
                    1
                ).write.parquet(f"{tmp}/sq")
            if self._bq_thr_pdf is not None:
                self.spark.createDataFrame(self._bq_thr_pdf).coalesce(
                    1
                ).write.parquet(f"{tmp}/bq")
            if self._rotbq is not None:
                # rotated-BQ state is (seed, thresholds-on-rotated-coords);
                # the persisted bq_rot_code words were packed under THESE
                # thresholds — reloading without them would let
                # _rotbq_state silently refit on post-compress rows and
                # disagree with the stored code words (ADVICE r5)
                seed, thr_pdf = self._rotbq
                self.spark.createDataFrame(
                    thr_pdf.assign(rot_seed=seed)
                ).coalesce(1).write.parquet(f"{tmp}/bq_rot")
            if self._pq_res is not None and self._ivf is not None:
                # valid only with the centroids it was fitted against — the
                # IVF artifacts saved below carry them
                self._pq_res.save(f"{tmp}/pq_residual", self.spark)
            if self._ivf is not None:
                self._ivf.save(f"{tmp}/ivf")
            if self._ann is not None:
                # MLlib writer; model state is tiny (the random planes), the
                # featurized table re-derives from vectors at load
                self._ann.save(f"{tmp}/ann_model")
            if self._imi is not None:
                self._imi.save(f"{tmp}/imi")

    @classmethod
    def load(cls, spark: SparkSession, path: str, vector_dim: int | None = None) -> "VectorStore":
        """S5: reconstruct from parquet (+ model artifacts: PQ codebooks and
        the IVF layout are restored when present)."""
        from pyspark.errors import AnalysisException

        df = spark.read.parquet(f"{path}/vectors")
        if vector_dim is None:
            row = df.select(F.size("embedding").alias("d")).limit(1).collect()
            vector_dim = row[0]["d"] if row else 0
        store = cls(spark, vector_dim, db_path=path)
        store.df = df
        store._loaded_from = path
        store._base_pristine = True  # df IS the persisted layout right now
        from vervectordb_spark.operators.pq import PQCodec

        try:
            store._pq = PQCodec.load(spark, f"{path}/pq")
        except AnalysisException:
            pass  # no PQ artifacts saved
        except ValueError as e:  # empty/corrupt artifacts (interrupted save)
            import warnings

            warnings.warn(f"ignoring corrupt PQ artifacts: {e}")
        try:
            store._sq_stats_pdf = spark.read.parquet(f"{path}/sq").toPandas()
        except AnalysisException:
            pass  # no SQ stats saved
        try:
            store._bq_thr_pdf = spark.read.parquet(f"{path}/bq").toPandas()
        except AnalysisException:
            pass  # no BQ thresholds saved
        try:
            rot_pdf = spark.read.parquet(f"{path}/bq_rot").toPandas()
            if len(rot_pdf):
                seed = int(rot_pdf["rot_seed"].iloc[0])
                store._rotbq = (seed, rot_pdf.drop(columns=["rot_seed"]))
        except AnalysisException:
            # no persisted rotated thresholds: any bq_rot_code column in
            # the vectors table was packed under thresholds we no longer
            # have — drop it so search re-encodes consistently instead of
            # silently mixing refit query bits with stale corpus bits
            if "bq_rot_code" in df.columns:
                store.df = store.df.drop("bq_rot_code")
        from vervectordb_spark.operators.ivf import IVFIndex

        try:
            store._ivf = IVFIndex.load(spark, f"{path}/ivf")
            store._ivf_from_disk = True
        except AnalysisException:
            pass  # no IVF artifacts saved
        except ValueError as e:
            import warnings

            warnings.warn(f"ignoring corrupt IVF artifacts: {e}")
        try:
            store._pq_res = PQCodec.load(spark, f"{path}/pq_residual")
        except AnalysisException:
            pass  # no residual codec saved
        except ValueError as e:
            import warnings

            warnings.warn(f"ignoring corrupt residual-PQ artifacts: {e}")
        if store._pq_res is not None and store._ivf is None:
            import warnings

            warnings.warn(
                "residual-PQ codec found without IVF centroids — dropping it"
            )
            store._pq_res = None
        from vervectordb_spark.operators.imi import IMIIndex as _IMI

        try:
            store._imi = _IMI.load(spark, f"{path}/imi")
        except AnalysisException:
            pass  # no IMI artifacts saved
        except ValueError as e:
            import warnings

            warnings.warn(f"ignoring corrupt IMI artifacts: {e}")
        from vervectordb_spark.operators.ann import LSHAnnIndex

        try:
            store._ann = LSHAnnIndex.load(spark, f"{path}/ann_model", df)
        except Exception as e:  # MLlib load raises broadly on absent/corrupt
            if "ann_model" not in str(e) and "Path does not exist" not in str(e):
                import warnings

                warnings.warn(f"ignoring corrupt ANN artifacts: {e}")
        return store
