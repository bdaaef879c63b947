"""S6 text→embedding pipeline tests (the reference's implied RAG pipeline,
SURVEY.md §2.1 S6 — declared deps never called in its code)."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vervectordb_spark.operators import embed as E
from vervectordb_spark.schema import load_table


def test_mixed_tokens_cjk_chars_are_tokens(spark):
    df = spark.createDataFrame([(1, "hello 世界 world")], "id long, text string")
    toks = df.select(E.mixed_tokens_expr("text").alias("t")).collect()[0]["t"]
    assert toks == ["hello", "世", "界", "world"]


def test_embedding_unit_norm(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    emb = E.embed_documents(docs, dim=32)
    rows = emb.collect()
    assert all(len(r["embedding"]) == 32 for r in rows)
    for r in rows:
        n = math.sqrt(sum(x * x for x in r["embedding"]))
        assert n == 0.0 or abs(n - 1.0) < 1e-3  # float32 rounding


def test_empty_text_zero_vector(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    row = E.embed_documents(df, dim=8).collect()[0]
    assert list(row["embedding"]) == [0.0] * 8


def test_embedding_deterministic(spark):
    df = spark.createDataFrame([(1, "spark window agg")], "doc_id long, text string")
    a = E.embed_documents(df, dim=16).collect()[0]["embedding"]
    b = E.embed_documents(df, dim=16).collect()[0]["embedding"]
    assert list(a) == list(b)


def test_pipeline_into_store(spark):
    """Full S6: text → embed → VectorStore.ingest → search returns the
    source doc as its own nearest neighbor."""
    from vervectordb_spark.store import VectorStore

    docs = load_table(spark, SF_DIR, "documents").limit(30)
    emb = E.embed_documents(docs, dim=32)
    store = VectorStore(spark, vector_dim=32)
    store.ingest(emb)
    q = emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
    res = store.brute_force_search([float(x) for x in q], top_k=3)
    assert res[0]["vector_id"] == "3" or res[0]["similarity"] >= res[-1]["similarity"]
    assert math.isclose(res[0]["similarity"], 1.0, abs_tol=1e-6)


def test_model_embedding_stubbed(spark):
    try:
        import sentence_transformers  # noqa: F401
        pytest.skip("model stack present")
    except ImportError:
        pass
    docs = load_table(spark, SF_DIR, "documents").limit(2)
    with pytest.raises(NotImplementedError, match="sentence-transformers"):
        E.model_embedding(docs)


def test_embed_kernels_bit_identical(spark):
    from vervectordb_spark.operators.embed import embed_documents
    from vervectordb_spark.schema import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    key = lambda r: r["vec_id"]  # noqa: E731
    e = sorted(embed_documents(docs, dim=32, kernel="expr").collect(), key=key)
    a = sorted(embed_documents(docs, dim=32, kernel="arrow").collect(), key=key)
    assert len(e) == len(a) > 0
    for re_, ra in zip(e, a):
        assert re_["vec_id"] == ra["vec_id"]
        assert re_["embedding"] == ra["embedding"]  # bit-exact float32


def test_expr_kernel_null_text_matches_arrow_zero_vector(spark):
    """NULL text must embed to the ZERO vector on BOTH kernels (the expr
    path used to emit an all-NULL-element array, breaking the non-null
    store schema and cosine)."""
    from vervectordb_spark.operators.embed import embed_documents

    df = spark.createDataFrame([(1, None), (2, "hello world")],
                               "doc_id long, text string")
    for kernel in ("expr", "arrow"):
        rows = {r["vec_id"]: list(r["embedding"])
                for r in embed_documents(df, dim=8, kernel=kernel).collect()}
        assert rows[1] == [0.0] * 8, kernel
        assert all(x is not None for x in rows[2]), kernel


def test_passthrough_embedding_name_collision_fails_fast(spark):
    """passthrough=True fails with the contract error when the input
    already has an 'embedding' column — not a later opaque
    duplicate-column AnalysisException (ADVICE r7)."""
    df = spark.createDataFrame(
        [(1, "hello", [0.0])],
        "doc_id long, text string, embedding array<float>")
    for kernel in ("arrow", "expr"):
        with pytest.raises(ValueError, match="already has one"):
            E.embed_documents(df, dim=8, kernel=kernel, passthrough=True)


# ---------------------------------------------------------------------------
# real-model tier: the vendored int8 SGNS checkpoint (round-10 task #3)
# ---------------------------------------------------------------------------


def test_checkpoint_embedding_end_to_end(spark):
    """The REAL model path (weights loaded from the committed artifact,
    broadcast, batched mapInPandas inference) runs on the fixture corpus
    and produces unit-norm (or zero) vectors of the checkpoint's dim."""
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    out = E.checkpoint_embedding(docs).collect()
    _, _, dim = E.load_checkpoint()
    assert len(out) == 50
    for r in out:
        assert len(r["embedding"]) == dim
        n = math.sqrt(sum(x * x for x in r["embedding"]))
        assert n == 0.0 or math.isclose(n, 1.0, rel_tol=1e-5)


def test_checkpoint_embedding_matches_hand_computation(spark):
    """Pin the inference arithmetic: normalized int sum of the tokens'
    int8 rows, float32 rounding — computed independently here."""
    import numpy as np

    words, mat, dim = E.load_checkpoint()
    w0, w1 = words[0], words[1]
    df = spark.createDataFrame(
        [(1, f"{w0} {w1} {w0}"), (2, "zzzunknownzzz qqq"), (3, None)],
        "doc_id long, text string",
    )
    got = {r["vec_id"]: list(r["embedding"])
           for r in E.checkpoint_embedding(df).collect()}
    s = 2 * mat[0] + mat[1]
    exp = (s / math.sqrt(float((s * s).sum()))).astype(np.float32)
    assert got[1] == [float(x) for x in exp]
    assert got[2] == [0.0] * dim     # all tokens OOV -> zero vector
    assert got[3] == [0.0] * dim     # NULL text -> zero vector


def test_checkpoint_embedding_schema_parity_with_fake(spark):
    """The real tier is a drop-in for the hashed-BoW fake: same output
    schema (vec_id, embedding array<float>), same id passthrough."""
    docs = load_table(spark, SF_DIR, "documents").limit(3)
    real = E.checkpoint_embedding(docs)
    fake = E.embed_documents(docs, dim=16)
    assert [(f.name, f.dataType.simpleString()) for f in real.schema.fields] \
        == [(f.name, f.dataType.simpleString()) for f in fake.schema.fields]


def test_checkpoint_embedding_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    a = sorted(map(tuple, ((r["vec_id"], tuple(r["embedding"])) for r in
                           E.checkpoint_embedding(docs).collect())))
    b = sorted(map(tuple, ((r["vec_id"], tuple(r["embedding"])) for r in
                           E.checkpoint_embedding(docs).collect())))
    assert a == b
