"""VectorStore facade: the reference's VerVectorDB API surface on Spark
(CRUD semantics from vervectordb/__init__.py:247-335, search :337-365)."""

import math

import pytest

from vervectordb_spark.store import DimensionError, VectorStore


@pytest.fixture()
def store(spark):
    st = VectorStore(spark, vector_dim=4)
    st.batch_insert(
        [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.9, 0.1, 0.0, 0.0]],
        [{"text": "alpha doc"}, {"text": "beta doc"}, {"text": "alpha beta"}],
    )
    return st


def test_insert_and_get(store):
    vid = store.insert([0.5, 0.5, 0.0, 0.0], {"text": "gamma"})
    got = store.get_by_id(vid)
    assert got["vector"] == [0.5, 0.5, 0.0, 0.0]
    assert got["metadata"] == {"text": "gamma"}


def test_dim_check(store):
    with pytest.raises(DimensionError):
        store.insert([1.0, 2.0])


def test_get_missing_raises(store):
    with pytest.raises(KeyError):
        store.get_by_id("nope")


def test_brute_force_search_order(store):
    res = store.brute_force_search([1.0, 0.0, 0.0, 0.0], top_k=2)
    sims = [r["similarity"] for r in res]
    assert sims == sorted(sims, reverse=True)
    assert math.isclose(res[0]["similarity"], 1.0, abs_tol=1e-9)
    # second hit is the [0.9, 0.1, ...] vector
    assert res[1]["metadata"]["text"] == "alpha beta"


def test_zero_norm_query_guard(store):
    res = store.brute_force_search([0.0, 0.0, 0.0, 0.0], top_k=3)
    assert all(r["similarity"] == 0.0 for r in res)


def test_update_reflected_in_search(store):
    vid = store.insert([0.0, 0.0, 1.0, 0.0], {"text": "victim"})
    store.update(vid, new_vector=[0.0, 0.0, 0.0, 1.0])
    got = store.get_by_id(vid)
    assert got["vector"] == [0.0, 0.0, 0.0, 1.0]
    # searches see the new vector (the reference leaves indexes stale; we must not)
    res = store.brute_force_search([0.0, 0.0, 0.0, 1.0], top_k=1)
    assert res[0]["vector_id"] == vid


def test_delete_removes_row(store):
    vid = store.insert([0.0, 0.0, 1.0, 0.0], {})
    store.delete(vid)
    with pytest.raises(KeyError):
        store.get_by_id(vid)


def test_filtered_search_keywords(store):
    res = store.filtered_search([1.0, 0.0, 0.0, 0.0], top_k=5, keywords=["beta"])
    texts = {r["metadata"]["text"] for r in res}
    assert texts == {"beta doc", "alpha beta"}


def test_hybrid_search_via_store(store):
    """RRF fusion over the store: the doc matching both the query terms and
    the query vector must outrank single-modality docs."""
    res = store.hybrid_search([1.0, 0.0, 0.0, 0.0], ["alpha", "beta"], top_k=3)
    assert res
    # "alpha beta" matches 2 terms AND is cosine-close to the query
    top = res[0]
    assert top["kw_rank"] != -1 and top["vec_rank"] != -1
    scores = [r["rrf_score"] for r in res]
    assert scores == sorted(scores, reverse=True)
    for r in res:
        got = 0.0
        if r["kw_rank"] != -1:
            got += 1.0 / (60 + r["kw_rank"])
        if r["vec_rank"] != -1:
            got += 1.0 / (60 + r["vec_rank"])
        assert abs(r["rrf_score"] - got) < 1e-12


def test_batch_search_batched(store):
    res = store.batch_search([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]], top_k=2)
    assert len(res) == 2 and all(len(r) == 2 for r in res)
    assert math.isclose(res[0][0]["similarity"], 1.0, abs_tol=1e-9)
    assert math.isclose(res[1][0]["similarity"], 1.0, abs_tol=1e-9)


def test_save_load_roundtrip(store, spark, tmp_path):
    path = str(tmp_path / "db")
    store.save(path)
    loaded = VectorStore.load(spark, path)
    assert loaded.vector_dim == 4
    assert loaded.df.count() == store.df.count()


def test_save_load_roundtrip_with_pq_and_ivf(spark, tmp_path):
    """Artifacts round-trip: PQ codebooks and the IVF layout are saved and
    restored (ADVICE r1: save() passed no spark arg -> TypeError; load()
    never restored PQ)."""
    import numpy as np

    st = VectorStore(spark, vector_dim=8)
    st.batch_insert([[float(i == j) for j in range(8)] for i in range(8)] * 4)
    st.train_pq(n_subquantizers=4, n_bits=2, sample_size=32)
    st.build_ivf_index(n_clusters=2)
    path = str(tmp_path / "db")
    st.save(path)
    loaded = VectorStore.load(spark, path)
    assert loaded._pq is not None
    assert np.allclose(loaded._pq.codebooks, st._pq.codebooks)
    assert loaded._ivf is not None
    assert np.allclose(loaded._ivf.centroids, st._ivf.centroids)
    # restored codec encodes identically
    a = st._pq.encode(st.df).select("vec_id", "pq_code").collect()
    b = loaded._pq.encode(loaded.df).select("vec_id", "pq_code").collect()
    assert {r["vec_id"]: list(r["pq_code"]) for r in a} == {
        r["vec_id"]: list(r["pq_code"]) for r in b
    }


def test_ivf_search_via_store(store):
    res = store.ivf_search([1.0, 0.0, 0.0, 0.0], top_k=2, nprobe=3)
    assert res and res[0]["similarity"] >= res[-1]["similarity"]
    assert all("cluster_id" in r for r in res)


def test_ann_search_via_store(store):
    res = store.ann_search([1.0, 0.0, 0.0, 0.0], top_k=2)
    assert res
    assert math.isclose(res[0]["similarity"], 1.0, abs_tol=1e-9)
    # hnsw_search is the 1:1 alias for reference callers (intent, not B1)
    assert store.hnsw_search([1.0, 0.0, 0.0, 0.0], top_k=2)[0] == res[0]


def test_pq_via_store(spark):
    st = VectorStore(spark, vector_dim=8)
    st.batch_insert([[float(i == j) for j in range(8)] for i in range(8)] * 4)
    st.train_pq(n_subquantizers=4, n_bits=2, sample_size=32)
    df = st.compress()
    assert "pq_code" in df.columns
    rec = st.decompress()
    assert "embedding_hat" in rec.columns
    assert rec.count() == 32


def test_mutation_invalidates_index(store):
    store.build_ivf_index(n_clusters=2)
    assert store._ivf is not None
    store.insert([0.2, 0.2, 0.2, 0.2], {})
    assert store._ivf is None  # stale-index bug (SURVEY §1.3) fixed


def test_index_validity_is_per_index(store):
    """ADVICE r1 (medium): building ANN after a mutation must NOT mark the
    IVF index valid — a shared flag served a stale pre-mutation IVF."""
    store.build_ivf_index(n_clusters=2)
    store.insert([0.2, 0.2, 0.2, 0.2], {"text": "new row"})
    store.build_ann_index()  # building one index...
    assert store._ivf is None  # ...must not resurrect the other
    # and a subsequent ivf_search sees the new row (rebuild happened)
    res = store.ivf_search([0.2, 0.2, 0.2, 0.2], top_k=1, nprobe=2)
    assert abs(res[0]["similarity"] - 1.0) < 1e-9


def test_compress_idempotent(spark):
    """ADVICE r1 (low): a second compress() must replace pq_code, not
    duplicate the column."""
    st = VectorStore(spark, vector_dim=8)
    st.batch_insert([[float(i == j) for j in range(8)] for i in range(8)] * 4)
    st.train_pq(n_subquantizers=4, n_bits=2, sample_size=32)
    st.compress()
    st.compress()
    assert st.df.columns.count("pq_code") == 1
    assert st.df.count() == 32


def test_checkpoint_collapses_lineage(store, tmp_path):
    for i in range(5):
        store.insert([0.1 * i, 0.2, 0.3, 0.4], {"i": str(i)})
    n_before = store.df.count()
    store.checkpoint(str(tmp_path / "ckpt"))
    assert store.df.count() == n_before
    # post-checkpoint plan is a single scan, not a union chain
    plan = store.df._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan


def test_save_after_load_same_path(spark, tmp_path):
    """load(path) then save(path) must roundtrip: the overwrite targets the
    path the lineage reads from, which save() breaks via localCheckpoint
    (and by not rewriting disk-loaded IVF artifacts)."""
    from vervectordb_spark.store import VectorStore

    path = str(tmp_path / "db")
    st = VectorStore(spark, 4, db_path=path)
    st.batch_insert([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
                     [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]])
    st.build_ivf_index(n_clusters=2)
    st.train_pq(n_subquantizers=2, sample_size=4)
    st.save()

    st2 = VectorStore.load(spark, path)
    assert st2._ivf is not None and st2._pq is not None
    st2.save()  # same path: must not raise
    # and after a mutation (index invalidated), still saves fine
    st2.insert([0.5, 0.5, 0.0, 0.0])
    st2.save()
    st3 = VectorStore.load(spark, path)
    assert st3.df.count() == 5


def test_load_ignores_empty_pq_artifacts(spark, tmp_path):
    """An interrupted save leaving an empty pq/ dir must not crash load."""
    import os
    import warnings

    from vervectordb_spark.operators.pq import PQCodec
    from vervectordb_spark.store import VectorStore

    path = str(tmp_path / "db2")
    st = VectorStore(spark, 4, db_path=path)
    st.batch_insert([[1.0, 0.0, 0.0, 0.0]])
    st.save()
    # simulate interrupted PQ save: schema-only parquet (zero rows)
    spark.createDataFrame(
        [], "subspace int, code int, centroid array<double>"
    ).write.mode("overwrite").parquet(f"{path}/pq")
    with pytest.raises(ValueError, match="empty"):
        PQCodec.load(spark, f"{path}/pq")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        st2 = VectorStore.load(spark, path)
    assert st2._pq is None
    assert any("PQ artifacts" in str(x.message) for x in w)


def test_merge_bulk_upsert(store, spark):
    """Bulk replace-or-insert by vec_id: updated rows replaced in place,
    new ids appended, untouched rows intact, indexes invalidated."""
    ids = [r["vec_id"] for r in store.df.select("vec_id").collect()]
    src = spark.createDataFrame(
        [
            (ids[0], [0.0, 0.0, 1.0, 0.0], {"text": "replaced"}),
            ("brand-new", [0.0, 0.0, 0.0, 1.0], {"text": "inserted"}),
        ],
        "vec_id string, embedding array<float>, metadata map<string,string>",
    )
    store.build_ivf_index(n_clusters=2)
    store.merge(src)
    assert store._ivf is None  # mutation invalidated the index
    assert store.df.count() == 4
    got = store.get_by_id(ids[0])
    assert got["vector"] == [0.0, 0.0, 1.0, 0.0]
    assert got["metadata"] == {"text": "replaced"}
    assert store.get_by_id("brand-new")["metadata"] == {"text": "inserted"}
    # untouched row survives with its original payload
    assert store.get_by_id(ids[1])["vector"] == [0.0, 1.0, 0.0, 0.0]


def test_merge_dim_check(store, spark):
    src = spark.createDataFrame(
        [("x", [1.0, 2.0], None)],
        "vec_id string, embedding array<float>, metadata map<string,string>",
    )
    with pytest.raises(DimensionError):
        store.merge(src)


def test_save_load_restores_ann_index(spark, tmp_path):
    """The MLlib ANN model rides save/load like IVF/PQ: a loaded store
    serves ann_search without rebuilding, with the same results."""
    st = VectorStore(spark, vector_dim=4)
    st.batch_insert([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
                     [0.9, 0.1, 0.0, 0.0], [0.5, 0.5, 0.0, 0.0]])
    st.build_ann_index(num_hash_tables=2, seed=42)
    before = st.ann_search([1.0, 0.0, 0.0, 0.0], top_k=2)
    path = str(tmp_path / "store_with_ann")
    st.save(path)

    loaded = VectorStore.load(spark, path)
    assert loaded._ann is not None  # restored, not rebuilt
    after = loaded.ann_search([1.0, 0.0, 0.0, 0.0], top_k=2)
    assert [(r["vector_id"], round(r["similarity"], 9)) for r in before] == \
           [(r["vector_id"], round(r["similarity"], 9)) for r in after]


def test_atomic_save_on_exception_keeps_previous(tmp_path):
    """A save that dies mid-write must leave the previous complete
    artifact in place, not a torn one."""
    import os

    from vervectordb_spark.sources.atomic import atomic_save

    p = str(tmp_path / "artifact")
    with atomic_save(p) as tmp:
        os.makedirs(tmp, exist_ok=True)
        with open(f"{tmp}/data", "w") as f:
            f.write("v1")
    with pytest.raises(RuntimeError):
        with atomic_save(p) as tmp:
            os.makedirs(tmp, exist_ok=True)
            with open(f"{tmp}/data", "w") as f:
                f.write("v2-partial")
            raise RuntimeError("killed mid-save")
    with open(f"{p}/data") as f:
        assert f.read() == "v1"
    assert not os.path.exists(p + ".__tmp__")


def test_store_save_interrupted_keeps_previous_loadable(spark, tmp_path, monkeypatch):
    """Kill-mid-save at the store level: the interrupted save raises, and
    load still serves the previous complete store (vectors AND index)."""
    from vervectordb_spark.operators.ivf import IVFIndex

    path = str(tmp_path / "db_atomic")
    st = VectorStore(spark, vector_dim=4)
    st.batch_insert([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])
    st.build_ivf_index(n_clusters=2)
    st.save(path)

    st.batch_insert([[0.5, 0.5, 0.0, 0.0]])
    st.build_ivf_index(n_clusters=2)

    def boom(self, p):
        raise RuntimeError("killed mid-save")

    monkeypatch.setattr(IVFIndex, "save", boom)
    with pytest.raises(RuntimeError):
        st.save(path)

    loaded = VectorStore.load(spark, path)
    assert loaded.df.count() == 2  # previous version, complete
    hits = loaded.ivf_search([1.0, 0.0, 0.0, 0.0], top_k=2, nprobe=2)
    assert len(hits) == 2


def test_versioned_checkpoint_history_and_restore(spark, tmp_path):
    """checkpoint(versioned=True) commits snapshots to an append-only
    manifest log: repeated checkpoints never overwrite what the current
    plan reads, old states stay readable, restore_version rolls back."""
    from vervectordb_spark.store import VectorStore

    store = VectorStore(spark, 4, db_path=str(tmp_path / "vs"))
    store.batch_insert([[0.1, 0.2, 0.3, 0.4], [0.5, 0.6, 0.7, 0.8]])
    store.checkpoint(versioned=True)          # v1: 2 rows
    n_v1 = store.df.count()
    store.insert([0.9, 0.9, 0.9, 0.9])
    store.checkpoint(versioned=True)          # v2: 3 rows
    assert store.df.count() == n_v1 + 1
    ops = [m["op"] for m in store.version_history()]
    assert ops[0] == "overwrite" and ops[-1] == "create"
    store.restore_version(1)                  # publish v3 = v1's files
    assert store.df.count() == n_v1
    # rollback is append-only: v2's 3-row state is still in the log
    assert store._versions.read(version=2).count() == n_v1 + 1


def test_versioned_checkpoint_requires_path(spark):
    from vervectordb_spark.store import VectorStore

    store = VectorStore(spark, 4)
    store.insert([0.1, 0.2, 0.3, 0.4])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="db_path"):
        store.checkpoint(versioned=True)
    with _pytest.raises(ValueError, match="versioned"):
        store.version_history()


def test_residual_pq_search_and_roundtrip(spark, tmp_path):
    """Residual IVF-PQ through the store facade: self query is top-1;
    save/load restores the codec WITH its centroids and still serves."""
    import numpy as np

    rng = np.random.RandomState(7)
    st = VectorStore(spark, vector_dim=8)
    vecs = rng.randn(40, 8).astype(float).tolist()
    ids = st.batch_insert(vecs)
    st.build_ivf_index(n_clusters=4)
    st.train_residual_pq(n_subquantizers=4, n_bits=3)
    got = st.ivfpq_residual_search(vecs[5], top_k=3, nprobe=4)
    assert got[0]["vector_id"] == ids[5]

    path = str(tmp_path / "res_store")
    st.save(path)
    loaded = VectorStore.load(spark, path)
    assert loaded._pq_res is not None and loaded._ivf is not None
    got2 = loaded.ivfpq_residual_search(vecs[5], top_k=3, nprobe=4)
    assert got2[0]["vector_id"] == ids[5]
    assert [g["vector_id"] for g in got] == [g["vector_id"] for g in got2]


def test_chunk_ingest_end_to_end(spark):
    """chunk_ingest: documents become searchable chunk vectors with
    doc/chunk provenance in metadata; hybrid search over the chunk store
    returns the ingested chunks."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from vervectordb_spark.schema import load_table

    st = VectorStore(spark, vector_dim=32)
    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 30)
    n = st.chunk_ingest(docs, chunk_tokens=40, overlap=10)
    assert n > 30  # at least one chunk per doc, some docs multi-chunk
    assert st.df.count() == n
    row = st.df.limit(1).collect()[0]
    md = dict(row["metadata"])
    assert {"doc_id", "chunk_id", "text"} <= set(md)
    assert row["vec_id"] == f"{md['doc_id']}#{md['chunk_id']}"
    # chunk store is searchable end-to-end
    qv = [float(x) for x in row["embedding"]]
    res = st.brute_force_search(qv, top_k=3)
    assert res and res[0]["vector_id"] == row["vec_id"]


def test_store_semdedup_reuses_ivf_assignment(spark):
    from vervectordb_spark.store import VectorStore

    store = VectorStore(spark, vector_dim=4)
    vecs = [
        [1.0, 0.0, 0.0, 0.0], [0.999, 0.001, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0], [0.0, 0.999, 0.001, 0.0],
        [0.0, 0.0, 1.0, 0.0], [0.5, 0.5, 0.0, 0.0],
    ]
    store.batch_insert(vecs)
    pairs = store.semdedup(threshold=0.99, n_clusters=3).collect()
    # near-identical pairs surface; every pair is within one cluster
    assert len(pairs) >= 2
    assert all(r["sim"] >= 0.99 for r in pairs)
    # and the fitted index is the one the pair stage used
    assert store._ivf is not None


def _small_store(spark, db_path=None):
    st = VectorStore(spark, vector_dim=4, db_path=db_path)
    st.batch_insert(
        [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
         [0.9, 0.1, 0.0, 0.0], [0.2, 0.8, 0.0, 0.0]],
    )
    return st


def test_insert_after_compress_and_double_checkpoint(spark, tmp_path):
    """compress() adds pq_code; later inserts must still union (NULL
    codes), and checkpoint() must be repeatable (the second call
    overwrites the path the plan reads — requires the lineage break)."""
    store = _small_store(spark, db_path=str(tmp_path / "s1"))
    store.train_pq(n_subquantizers=2, n_bits=2, sample_size=4)
    store.compress()
    ids = store.batch_insert([[0.5, 0.5, 0.5, 0.5]])
    assert store.get_by_id(ids[0]) is not None
    store.checkpoint()
    store.batch_insert([[0.1, 0.2, 0.3, 0.4]])
    store.checkpoint()  # second compaction over the same path
    assert store.df.count() >= 6


def test_save_refuses_versioned_path(spark, tmp_path):
    """save()'s atomic swap would delete a nested _versions log — the
    durable history; it must refuse instead."""
    store = _small_store(spark, db_path=str(tmp_path / "s2"))
    store.checkpoint(versioned=True)
    with pytest.raises(ValueError, match="_versions"):
        store.save()


def test_build_ivf_clears_stale_residual_codec(spark):
    """A rebuilt IVF must not be combined with a residual codec fitted
    against the previous centroids."""
    store = _small_store(spark)
    store.train_residual_pq(n_subquantizers=2, n_bits=2, sample_size=4)
    assert store._pq_res is not None
    store.build_ivf_index(n_clusters=2)
    assert store._pq_res is None and store._res_encoded is None


def test_store_imi_facade_and_persistence(spark, tmp_path):
    """IMI via the store: build/search facade, mutation invalidation,
    and save/load of the cell layout + centroids."""
    import numpy as np

    from vervectordb_spark.store import VectorStore

    rng = np.random.default_rng(31)
    st = VectorStore(spark, vector_dim=8)
    ids = st.batch_insert(rng.normal(size=(80, 8)).tolist())
    qv = st.get_by_id(ids[7])["vector"]
    hits = st.imi_search(qv, top_k=3, a=2, b=2)
    assert hits[0]["vector_id"] == ids[7]
    assert abs(hits[0]["similarity"] - 1.0) < 1e-9
    assert st._imi is not None
    st.insert(rng.normal(size=8).tolist())
    assert st._imi is None  # mutation invalidates
    path = str(tmp_path / "imistore")
    st.build_imi_index(k1=4, k2=4)
    st.save(path)
    loaded = VectorStore.load(spark, path)
    assert loaded._imi is not None
    again = loaded.imi_search(qv, top_k=3, a=2, b=2)
    assert again[0]["vector_id"] == ids[7]
