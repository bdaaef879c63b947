"""SQ8 scalar-quantization codec (operators/sq.py): the expr/kernel
bit-identity contract, the half-step error bound, degenerate dims, code
range, and search recall of the quantized-domain + rerank path."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from vervectordb_spark.operators import sq
from vervectordb_spark.schema import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def stats(spark, emb):
    return sq.fit_sq_stats(emb).cache()


def test_fit_stats_match_numpy(emb, stats):
    X = np.asarray(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    got = {r["pos"]: (r["mn"], r["mx"]) for r in stats.collect()}
    assert len(got) == X.shape[1]
    for i in range(X.shape[1]):
        assert got[i] == (X[:, i].min(), X[:, i].max())


def test_wide_fit_bit_identical_to_explode_fit(emb, stats):
    """fit_sq_stats_wide (the Generate-free fit for computed columns)
    must produce the exact same (pos, mn, mx) rows as the posexplode
    fit — same comparisons over the same doubles, different plan."""
    wide = sq.fit_sq_stats_wide(emb, "embedding", 64).collect()
    base = {r["pos"]: (r["mn"], r["mx"]) for r in stats.collect()}
    assert len(wide) == len(base)
    for r in wide:
        assert (r["mn"], r["mx"]) == base[r["pos"]], r["pos"]


def test_codes_in_uint8_range_and_reconstruction_bound(emb, stats):
    coded = sq.with_codes(emb, stats)
    recon = sq.with_reconstruction(coded, stats)
    rows = recon.select("embedding", "sq_code", "sq_recon").collect()
    st = {r["pos"]: (r["mn"], r["mx"]) for r in stats.collect()}
    scale = np.array(
        [(st[i][1] - st[i][0]) / 255.0 for i in range(len(st))]
    )
    for r in rows:
        codes = np.asarray(r["sq_code"])
        assert codes.min() >= 0 and codes.max() <= 255
        err = np.abs(
            np.asarray(r["embedding"], dtype=np.float64)
            - np.asarray(r["sq_recon"])
        )
        assert (err <= scale * 0.5 + 1e-12).all()


def test_arrow_kernel_bit_identical_to_expr(spark, emb, stats):
    """The mapInPandas encode kernel is the throughput path — it must
    produce byte-identical codes to the Catalyst expression spec."""
    via_expr = {
        r["vec_id"]: list(r["sq_code"])
        for r in sq.with_codes(emb, stats).select("vec_id", "sq_code").collect()
    }
    stats_pdf = stats.toPandas()
    out_schema = "vec_id long, embedding array<float>, sq_code array<smallint>"
    via_kernel = {
        r["vec_id"]: list(r["sq_code"])
        for r in emb.select("vec_id", "embedding")
        .mapInPandas(sq.encode_batches(stats_pdf), schema=out_schema)
        .collect()
    }
    assert via_expr == via_kernel


def test_degenerate_dim_roundtrips_exactly(spark):
    """A constant dimension has scale 0: codes are 0 and decode returns
    the constant EXACTLY (not NaN from a 0/0)."""
    df = spark.createDataFrame(
        [(i, [float(i), 7.25]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    st = sq.fit_sq_stats(df)
    rec = sq.with_reconstruction(sq.with_codes(df, st), st)
    for r in rec.collect():
        assert r["sq_code"][1] == 0
        assert r["sq_recon"][1] == 7.25


def test_quantized_search_recall(spark, emb):
    """Top-10 by quantized-domain cosine + exact rerank recovers the exact
    top-10 (SQ8 at half-step error is near-lossless at this dim)."""
    from vervectordb_spark.functions.similarity import cosine_expr

    qv = [float(v) for v in emb.filter(F.col("vec_id") == 0)
          .select("embedding").first()["embedding"]]
    exact = [
        r["vec_id"]
        for r in emb.select("vec_id", cosine_expr("embedding", qv).alias("s"))
        .orderBy(F.desc("s"), "vec_id").limit(10).collect()
    ]
    st = sq.fit_sq_stats(emb)
    rec = sq.with_reconstruction(sq.with_codes(emb, st), st)
    cand = (
        rec.select("vec_id", cosine_expr(F.col("sq_recon"), qv).alias("sq"))
        .orderBy(F.desc("sq"), "vec_id").limit(30).select("vec_id")
    )
    got = [
        r["vec_id"]
        for r in emb.join(cand, "vec_id")
        .select("vec_id", cosine_expr("embedding", qv).alias("s"))
        .orderBy(F.desc("s"), "vec_id").limit(10).collect()
    ]
    assert len(set(exact) & set(got)) >= 9


def test_adc_kernel_matches_expr_scores(spark, emb, stats):
    """The Arrow ADC scorer tracks the expr-path (decode + cosine fold)
    scores to BLAS-vs-fold rounding (~1e-12) and picks the same top-30."""
    from vervectordb_spark.functions.similarity import cosine_expr

    qv = [float(v) for v in emb.filter(F.col("vec_id") == 0)
          .select("embedding").first()["embedding"]]
    coded = sq.with_codes(emb, stats).select("vec_id", "sq_code")
    via_expr = {
        r["vec_id"]: r["s"]
        for r in sq.with_reconstruction(coded, stats)
        .select("vec_id", cosine_expr(F.col("sq_recon"), qv).alias("s"))
        .collect()
    }
    via_kernel = {
        r["vec_id"]: r["sim"]
        for r in coded.mapInPandas(
            sq.adc_scores_batch(qv, stats.toPandas()),
            schema="vec_id long, sq_code array<smallint>, sim double",
        ).collect()
    }
    assert set(via_expr) == set(via_kernel)
    for vid, s in via_expr.items():
        assert abs(s - via_kernel[vid]) < 1e-12
    top = lambda d: [v for v, _ in sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[:30]]  # noqa: E731
    assert top(via_expr) == top(via_kernel)


def test_store_sq_search_and_persistence(spark, tmp_path):
    """Facade path: train_sq -> sq_compress -> sq_search matches exact
    brute force on a separable corpus, and the stats survive save/load."""
    from vervectordb_spark.store import VectorStore

    st = VectorStore(spark, vector_dim=4)
    vecs = [[1.0, 0.0, 0.0, 0.0], [0.9, 0.1, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0],
            [0.5, 0.5, 0.0, 0.0]]
    st.batch_insert(vecs, [{} for _ in vecs])
    st.train_sq()
    st.sq_compress()
    assert "sq_code" in st.df.columns
    got = st.sq_search([1.0, 0.0, 0.0, 0.0], top_k=2)
    exact = st.brute_force_search([1.0, 0.0, 0.0, 0.0], top_k=2)
    assert [r["vector_id"] for r in got] == [r["vector_id"] for r in exact]
    path = str(tmp_path / "st")
    st.save(path)
    st2 = VectorStore.load(spark, path)
    assert st2._sq_stats_pdf is not None
    got2 = st2.sq_search([1.0, 0.0, 0.0, 0.0], top_k=2)
    assert [r["vector_id"] for r in got2] == [r["vector_id"] for r in exact]


def test_rows_ingested_after_compress_are_searchable(spark):
    """Post-compress inserts union in with NULL sq_code — adc_search must
    encode them on the fly, not silently drop them (NULL sim sorts last)."""
    from vervectordb_spark.store import VectorStore

    st = VectorStore(spark, vector_dim=4)
    st.batch_insert(
        [[0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]], [{}, {}]
    )
    st.train_sq()
    st.sq_compress()
    vid = st.insert([1.0, 0.0, 0.0, 0.0], {})  # exact query match, no code
    got = st.sq_search([1.0, 0.0, 0.0, 0.0], top_k=1)
    assert got[0]["vector_id"] == vid
    assert got[0]["similarity"] == pytest.approx(1.0)


def test_compression_ratio_accounting():
    """float32 dim=64 -> 256 B raw; uint8 codes -> 64 B: 4x."""
    raw = 64 * 4
    coded = 64 * 1
    assert raw / coded == 4.0


def test_store_ivfsq_search(spark):
    """IVF-SQ8 facade: probes + quantized scan + rerank returns the query
    row first; results are a subset of the probed clusters."""
    import numpy as np

    from vervectordb_spark.store import VectorStore

    rng = np.random.default_rng(3)
    store = VectorStore(spark, vector_dim=8)
    vecs = rng.normal(size=(128, 8)).astype(np.float32)
    ids = store.batch_insert(vecs.tolist())
    store.build_ivf_index(n_clusters=4)
    hits = store.ivfsq_search(vecs[7].tolist(), top_k=3, nprobe=2)
    assert hits[0]["vector_id"] == ids[7]
    assert hits[0]["similarity"] == pytest.approx(1.0)
    assert len(hits) == 3


def test_arrow_fit_bit_identical_to_wide_fit(emb, stats):
    """The Arrow partial-agg fit (the production-dim path) produces the
    exact same (pos, mn, mx) rows as the expr fits at dim=64."""
    arrow = sq.fit_sq_stats_arrow(emb, "embedding", 64).collect()
    base = {r["pos"]: (r["mn"], r["mx"]) for r in stats.collect()}
    assert len(arrow) == len(base)
    for r in arrow:
        assert (r["mn"], r["mx"]) == base[r["pos"]], r["pos"]


def test_arrow_fit_dim2048_matches_numpy(spark):
    """Production-dim smoke: dim=2048 compiles (no 4096-expression
    aggregate for codegen to choke on) and matches NumPy exactly."""
    rng = np.random.default_rng(11)
    X = rng.normal(size=(200, 2048))
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)],
        "vec_id bigint, embedding array<double>").repartition(8)
    got = {r["pos"]: (r["mn"], r["mx"])
           for r in sq.fit_sq_stats_arrow(df, "embedding", 2048).collect()}
    assert len(got) == 2048
    mns, mxs = X.min(axis=0), X.max(axis=0)
    for j in (0, 1, 777, 2047):
        assert got[j] == (mns[j], mxs[j])
    assert all(got[j] == (mns[j], mxs[j]) for j in range(2048))
    # auto-dispatch: expr at dim<=256, arrow beyond
    assert sq.fit_sq_stats_auto(df, "embedding", 2048).count() == 2048
