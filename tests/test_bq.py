"""Binary-quantization codec (operators/bq.py): NumPy pack parity, the
expr/Arrow kernel bit-identity contract, Hamming-distance laws, search
sanity (self is its own nearest code), store facade + persistence, and
post-compress ingest searchability."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from vervectordb_spark.operators import bq
from vervectordb_spark.schema import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def thr(spark, emb):
    return bq.fit_bq_thresholds(emb).cache()


def _np_pack(X, thr_arr):
    """Reference NumPy pack — independent of both Spark kernels."""
    bits = (X > thr_arr).astype(np.int64)
    words = []
    for w in range(bq.n_words(X.shape[1])):
        chunk = bits[:, w * bq.BITS_PER_WORD:(w + 1) * bq.BITS_PER_WORD]
        words.append(
            chunk @ (np.int64(1) << np.arange(chunk.shape[1], dtype=np.int64))
        )
    return np.stack(words, axis=1)


def test_thresholds_are_midrange(emb, thr):
    X = np.asarray(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    got = {r["pos"]: r["thr"] for r in thr.collect()}
    assert len(got) == X.shape[1]
    for i in range(X.shape[1]):
        assert got[i] == (X[:, i].min() + X[:, i].max()) / 2.0


def test_expr_pack_matches_numpy(emb, thr):
    rows = bq.with_codes(emb, thr, 64).select("vec_id", "embedding",
                                              "bq_code").collect()
    thr_pdf = thr.toPandas()
    order = np.argsort(thr_pdf["pos"].to_numpy())
    thr_arr = thr_pdf["thr"].to_numpy(dtype=np.float64)[order]
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    expect = _np_pack(X, thr_arr)
    got = np.asarray([r["bq_code"] for r in rows], dtype=np.int64)
    assert got.shape == (len(rows), 2)  # dim 64 -> 60 + 4 bit words
    assert (got == expect).all()
    assert (got >= 0).all()  # 60-bit words never touch the sign bit


def test_arrow_kernel_bit_identical_to_expr(spark, emb, thr):
    via_expr = {
        r["vec_id"]: list(r["bq_code"])
        for r in bq.with_codes(emb, thr, 64).select("vec_id",
                                                    "bq_code").collect()
    }
    out_schema = "vec_id long, embedding array<float>, bq_code array<bigint>"
    via_kernel = {
        r["vec_id"]: list(r["bq_code"])
        for r in emb.select("vec_id", "embedding")
        .mapInPandas(bq.encode_batches(thr.toPandas(), 64), schema=out_schema)
        .collect()
    }
    assert via_expr == via_kernel


def test_query_pack_matches_expr(spark, emb, thr):
    """encode_query (driver-side) packs a fixture row to the same words
    the distributed expr kernel produced for that row."""
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qwords = bq.encode_query([float(v) for v in row["embedding"]],
                             thr.toPandas())
    via_expr = (
        bq.with_codes(emb.filter(F.col("vec_id") == 0), thr, 64)
        .select("bq_code").first()["bq_code"]
    )
    assert qwords == list(via_expr)


def test_hamming_laws(spark):
    """d(x,x)=0, symmetry, and agreement with NumPy popcount over random
    packed pairs — the integer-codegen fold is the only Hamming kernel."""
    rng = np.random.default_rng(42)
    A = rng.integers(0, 1 << 60, size=(32, 2), dtype=np.int64)
    B = rng.integers(0, 1 << 60, size=(32, 2), dtype=np.int64)
    df = spark.createDataFrame(
        [(int(i), [int(a) for a in A[i]], [int(b) for b in B[i]])
         for i in range(32)],
        "i long, a array<bigint>, b array<bigint>",
    )
    out = df.select(
        "i",
        bq.hamming_words_expr(F.col("a"), F.col("b")).alias("hab"),
        bq.hamming_words_expr(F.col("b"), F.col("a")).alias("hba"),
        bq.hamming_words_expr(F.col("a"), F.col("a")).alias("haa"),
    ).collect()
    expect = [
        int(sum(bin(int(a) ^ int(b)).count("1") for a, b in zip(A[i], B[i])))
        for i in range(32)
    ]
    for r in out:
        assert r["haa"] == 0
        assert r["hab"] == r["hba"] == expect[r["i"]]


def test_search_returns_self_and_reasonable_neighbors(spark, emb, thr):
    """The query row itself has Hamming 0 and cosine 1 — it must be the
    top hit; and the Hamming pool + exact rerank recovers a majority of
    the exact top-10 on the fixture (sign codes are coarse; 16x
    compression buys recall via the rerank pool, pinned in RECALL.md)."""
    from vervectordb_spark.functions.similarity import cosine_expr

    qv = [float(v) for v in emb.filter(F.col("vec_id") == 0)
          .select("embedding").first()["embedding"]]
    out = bq.hamming_search(emb, thr, qv, top_k=10, rerank_factor=10).collect()
    assert out[0]["vec_id"] == 0
    assert out[0]["hamming"] == 0
    assert out[0]["sim"] == pytest.approx(1.0)
    exact = [
        r["vec_id"]
        for r in emb.select("vec_id", cosine_expr("embedding", qv).alias("s"))
        .orderBy(F.desc("s"), "vec_id").limit(10).collect()
    ]
    got = {r["vec_id"] for r in out}
    assert len(got & set(exact)) >= 5


def test_store_bq_search_and_persistence(spark, tmp_path):
    from vervectordb_spark.store import VectorStore

    rng = np.random.default_rng(7)
    store = VectorStore(spark, vector_dim=8, db_path=str(tmp_path / "db"))
    vecs = rng.normal(size=(64, 8)).astype(np.float32)
    ids = store.batch_insert(vecs.tolist())
    store.train_bq()
    store.bq_compress()
    hits = store.bq_search(vecs[5].tolist(), top_k=3)
    assert hits[0]["vector_id"] == ids[5]
    assert hits[0]["hamming"] == 0
    store.save()
    loaded = VectorStore.load(spark, str(tmp_path / "db"))
    assert loaded._bq_thr_pdf is not None
    hits2 = loaded.bq_search(vecs[5].tolist(), top_k=3)
    assert [h["vector_id"] for h in hits2] == [h["vector_id"] for h in hits]


def test_rows_ingested_after_compress_are_searchable(spark):
    from vervectordb_spark.store import VectorStore

    rng = np.random.default_rng(11)
    store = VectorStore(spark, vector_dim=8)
    store.batch_insert(rng.normal(size=(32, 8)).astype(np.float32).tolist())
    store.train_bq()
    store.bq_compress()
    new_vec = rng.normal(size=8).astype(np.float32).tolist()
    (new_id,) = store.batch_insert([new_vec])
    hits = store.bq_search(new_vec, top_k=1)
    assert hits[0]["vector_id"] == new_id
    assert hits[0]["hamming"] == 0


def test_streaming_encode_parity(spark, emb, thr, tmp_path):
    """The encode map is stateless (broadcast thresholds), so it applies
    to a readStream unchanged and codes streamed rows byte-identically to
    batch — the SQ8 streaming-parity contract (tests/test_sq.py twin)."""
    src = str(tmp_path / "src")
    emb.select("vec_id", "embedding").write.parquet(src)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).parquet(src)
    coded_stream = bq.with_codes(stream, thr, 64)
    out = str(tmp_path / "out")
    q = (
        coded_stream.writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["vec_id"]: list(r["bq_code"])
        for r in spark.read.parquet(out).select("vec_id", "bq_code").collect()
    }
    batch = {
        r["vec_id"]: list(r["bq_code"])
        for r in bq.with_codes(emb, thr, 64).select("vec_id",
                                                    "bq_code").collect()
    }
    assert streamed == batch


def test_batch_matches_single_query_paths(spark, emb, thr):
    """Batch-vs-single parity (SURVEY §5.9): the one-job batched path
    returns row-for-row the per-query results — ids, hamming, AND sims."""
    qrows = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    batched = bq.batch_hamming_search(emb, thr, qrows, top_k=5,
                                      rerank_factor=3).collect()
    by_q = {}
    for r in batched:
        by_q.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["hamming"], r["sim"]))
    for qid in range(4):
        qv = [float(v) for v in emb.filter(F.col("vec_id") == qid)
              .select("embedding").first()["embedding"]]
        single = [
            (r["vec_id"], r["hamming"], r["sim"])
            for r in bq.hamming_search(emb, thr, qv, top_k=5,
                                       rerank_factor=3).collect()
        ]
        assert by_q[qid] == single


def test_batch_query_side_guard(spark, emb, thr):
    """The 64k-class driver-collect guard (the ivf.py contract)."""
    qrows = emb.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_embedding"))
    with pytest.raises(ValueError, match="max_queries"):
        bq.batch_hamming_search(emb, thr, qrows, top_k=2, max_queries=3)


def test_store_ivfbq_search(spark):
    """IVF-BQ facade: probe + packed-word Hamming scan + exact rerank
    returns the query row first (hamming 0, cosine 1); results bounded
    by top_k and ordered by similarity."""
    import numpy as np

    from vervectordb_spark.store import VectorStore

    rng = np.random.default_rng(9)
    store = VectorStore(spark, vector_dim=8)
    vecs = rng.normal(size=(128, 8)).astype(np.float32)
    ids = store.batch_insert(vecs.tolist())
    store.build_ivf_index(n_clusters=4)
    hits = store.ivfbq_search(vecs[11].tolist(), top_k=3, nprobe=2)
    assert hits[0]["vector_id"] == ids[11]
    assert hits[0]["similarity"] == pytest.approx(1.0)
    assert hits[0]["hamming"] == 0
    assert len(hits) == 3
    sims = [h["similarity"] for h in hits]
    assert sims == sorted(sims, reverse=True)


def test_codes_only_without_rerank_fails_fast(spark, emb, thr):
    """ADVICE r5: a codes-only corpus with rerank=None (or a rerank frame
    missing the embedding column) raises the module's ValueError up
    front, not a late unresolved-column AnalysisException."""
    coded = bq.with_codes(emb, thr, 64).select("vec_id", "bq_code")
    qv = [float(x) for x in emb.first()["embedding"]]
    with pytest.raises(ValueError, match="rerank"):
        bq.hamming_search(coded, thr, qv, top_k=3)
    with pytest.raises(ValueError, match="missing"):
        bq.hamming_search(coded, thr, qv, top_k=3,
                          rerank=coded.select("vec_id"))
    queries = emb.limit(2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"))
    with pytest.raises(ValueError, match="rerank"):
        bq.batch_hamming_search(coded, thr, queries, top_k=3)
