"""ANN tests — the reference's HNSW contract (Q2/Q3) graded the way its own
harness grades ANN: recall@k vs the brute-force oracle
(examples/datawhale.py:142-148). The broken reference measures recall 0.0
(bug B1); our contract targets are SURVEY.md §5."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vervectordb_spark.operators import search as S
from vervectordb_spark.operators.ann import LSHAnnIndex, SignLSHIndex, rademacher_planes
from vervectordb_spark.schema import load_table


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def _qv(emb, vec_id=0):
    row = emb.filter(F.col("vec_id") == vec_id).select("embedding").collect()
    return [float(x) for x in row[0][0]]


def test_planes_deterministic():
    a = rademacher_planes(4, 8)
    b = rademacher_planes(4, 8)
    assert a == b
    assert all(x in (1.0, -1.0) for row in a for x in row)


def test_zero_bits_probe_is_exact(emb):
    """bits=0 ⇒ every row in bucket 0 ⇒ probe is a full scan ⇒ recall 1.0."""
    idx = SignLSHIndex.build(emb, n_tables=1, bits=0)
    qv = _qv(emb, 3)
    assert idx.recall_at_k(emb, qv, k=10) == 1.0


def test_signlsh_bucket_range(emb):
    idx = SignLSHIndex.build(emb, n_tables=2, bits=4)
    stats = idx.signed.agg(
        F.min("bucket_0"), F.max("bucket_0"), F.min("bucket_1"), F.max("bucket_1")
    ).collect()[0]
    assert 0 <= stats[0] and stats[1] < 16
    assert 0 <= stats[2] and stats[3] < 16


def test_signlsh_query_buckets_match_column_exprs(emb):
    """Driver-side Python fold must agree with the Catalyst fold on the
    same vector (a corpus row used as the query)."""
    idx = SignLSHIndex.build(emb, n_tables=2, bits=6)
    row = idx.signed.filter(F.col("vec_id") == 7).select(
        "embedding", "bucket_0", "bucket_1"
    ).collect()[0]
    qb = idx.query_buckets([float(x) for x in row["embedding"]])
    assert qb == [row["bucket_0"], row["bucket_1"]]


def test_signlsh_gemm_fold_signatures_identical(emb):
    """The GEMM (mapInPandas BLAS) and fold (Catalyst expression) signature
    kernels must produce identical bucket columns — they differ only in
    float summation order, which can flip a sign bit only when a plane dot
    is within rounding of zero (never on the fixture)."""
    gemm = SignLSHIndex.build(emb, n_tables=2, bits=6, kernel="gemm")
    fold = SignLSHIndex.build(emb, n_tables=2, bits=6, kernel="fold")
    cols = ["vec_id", "bucket_0", "bucket_1"]
    diff = (
        gemm.signed.select(cols)
        .exceptAll(fold.signed.select(cols))
        .count()
    )
    assert diff == 0
    assert gemm.signed.count() == fold.signed.count()


def test_signlsh_gemm_preserves_passthrough_columns(emb):
    """GEMM kernel must not disturb non-embedding columns (full row
    pass-through via mapInPandas)."""
    gemm = SignLSHIndex.build(emb, n_tables=1, bits=4, kernel="gemm")
    assert set(emb.columns).issubset(set(gemm.signed.columns))
    orig = emb.select("vec_id").exceptAll(gemm.signed.select("vec_id")).count()
    assert orig == 0


def test_signlsh_recall(emb):
    """8 tables × 4 bits: mean recall@10 over 5 queries clears 0.5 (tunable
    to ~1.0 with more tables — the contract knob, not a fixed constant)."""
    idx = SignLSHIndex.build(emb, n_tables=8, bits=4)
    recalls = [idx.recall_at_k(emb, _qv(emb, i), k=10) for i in range(5)]
    assert sum(recalls) / len(recalls) >= 0.5


def test_signlsh_candidates_subset_shrinks(emb):
    idx = SignLSHIndex.build(emb, n_tables=2, bits=8)
    n_cand = idx.candidates(_qv(emb, 2)).count()
    assert 0 < n_cand < emb.count()


def test_mllib_lsh_recall(emb):
    """Stock MLlib BRP-LSH path behind ann_search: recall@10 ≥ 0.9 with
    3×k over-fetch on the fixture."""
    idx = LSHAnnIndex.build(emb, bucket_length=2.0, num_hash_tables=3, seed=42)
    qv = _qv(emb, 0)
    truth = {r["vec_id"] for r in S.brute_force_topk(emb, qv, 10).collect()}
    got = {r["vec_id"] for r in idx.search(qv, top_k=10).collect()}
    assert len(truth & got) / 10 >= 0.9


def test_signlsh_batch_search_matches_per_query(emb):
    """batch_search (one job, first-match dedup-free candidates) must
    return exactly the per-query search() results for every query."""
    idx = SignLSHIndex.build(emb, n_tables=4, bits=6)
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    batched = {
        (r["query_id"], r["rank"]): (r["vec_id"], round(r["sim"], 9))
        for r in idx.batch_search(queries, top_k=5).collect()
    }
    for q in range(6):
        qv = _qv(emb, q)
        for rank, r in enumerate(idx.search(qv, top_k=5).collect(), 1):
            assert batched[(q, rank)] == (r["vec_id"], round(r["sim"], 9))
    assert len(batched) == 30


def test_signlsh_batch_search_empty_queries(emb, spark):
    idx = SignLSHIndex.build(emb, n_tables=2, bits=4)
    empty = spark.createDataFrame([], "query_id long, q_embedding array<float>")
    assert idx.batch_search(empty, top_k=5).count() == 0


def test_signlsh_batch_search_oversized_query_side_raises(emb, spark):
    """A corpus-sized query side must trip the driver guard (same 64k bound
    as IVFIndex.batch_search), not silently collect onto the driver."""
    idx = SignLSHIndex.build(emb, n_tables=1, bits=2)
    big = spark.range(65_537).select(
        F.col("id").alias("query_id"),
        F.array(F.lit(1.0), F.lit(0.0)).cast("array<float>").alias("q_embedding"),
    )
    with pytest.raises(ValueError, match="exceeds"):
        idx.batch_search(big, top_k=5)


def test_signlsh_save_load_roundtrip(emb, spark, tmp_path):
    """Loaded index must search identically to the built one; planes
    re-derive from md5, so only data is persisted."""
    idx = SignLSHIndex.build(emb, n_tables=4, bits=6)
    path = str(tmp_path / "signlsh_store")
    idx.save(path)
    loaded = SignLSHIndex.load(spark, path)
    assert (loaded.n_tables, loaded.bits) == (4, 6)
    assert loaded.planes == idx.planes
    qv = _qv(emb, 5)
    a = [(r["vec_id"], round(r["sim"], 9)) for r in idx.search(qv, top_k=5).collect()]
    b = [(r["vec_id"], round(r["sim"], 9)) for r in loaded.search(qv, top_k=5).collect()]
    assert a == b


def test_signlsh_load_empty_meta_raises(spark, tmp_path, emb):
    import pytest as _pytest

    path = str(tmp_path / "signlsh_broken")
    emb.limit(0).write.mode("overwrite").parquet(f"{path}/signed")
    spark.createDataFrame([], "n_tables int, bits int, dim int, id_col string, emb_col string"
                          ).write.mode("overwrite").parquet(f"{path}/meta")
    with _pytest.raises(ValueError, match="meta"):
        SignLSHIndex.load(spark, path)


def test_lsh_self_join_arrow_matches_fold(spark):
    """The einsum rescore must produce the same ranking as the bit-exact
    fold path (agreement to float tolerance; identical id sets)."""
    from vervectordb_spark.operators.ann import SignLSHIndex
    from vervectordb_spark.schema import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").limit(200).cache()
    idx = SignLSHIndex.build(emb, n_tables=4, bits=6, kernel="fold")
    a = {(r["query_id"], r["rank"]): (r["vec_id"], round(r["sim"], 9))
         for r in idx.self_join(top_k=3, rescore="arrow").collect()}
    f = {(r["query_id"], r["rank"]): (r["vec_id"], round(r["sim"], 9))
         for r in idx.self_join(top_k=3, rescore="fold").collect()}
    assert set(a) == set(f)
    for k in f:
        assert a[k][0] == f[k][0]
        assert abs(a[k][1] - f[k][1]) < 1e-9


def test_signlsh_auto_bits_tracks_corpus_size(emb):
    """bits="auto" holds expected bucket occupancy ~constant: width is
    log2(n / target_occupancy) clamped to [4, 24] — the knob that keeps
    self_join's pair volume t·N·c (linear) instead of t·N²/2^bits."""
    import math

    n = emb.count()
    idx = SignLSHIndex.build(emb, n_tables=2, bits="auto", target_occupancy=16)
    assert idx.bits == max(4, min(24, math.ceil(math.log2(n / 16))))
    # tiny corpus clamps at the floor instead of going to 0/negative
    tiny = SignLSHIndex.build(emb.limit(8), n_tables=1, bits="auto")
    assert tiny.bits == 4
    # the auto-built index serves the same contract as a fixed-width one
    out = idx.self_join(top_k=3)
    assert out.columns == ["query_id", "vec_id", "sim", "rank"]
    assert out.count() <= n * 3


def test_multiprobe_buckets_ranked_and_prefixed(emb):
    """Probe list: base bucket first, then lowest-margin flips; n_probes=1
    degenerates to the single-probe path."""
    idx = SignLSHIndex.build(emb, n_tables=2, bits=6)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    single = idx.query_buckets(qv)
    multi = idx.query_buckets_multiprobe(qv, n_probes=4)
    assert [b[0] for b in multi] == single
    for probes in multi:
        assert len(probes) == 4 and len(set(probes)) == 4


def test_multiprobe_recall_at_least_single(emb):
    """Multi-probe must expand the candidate set (superset of the single
    probe) and never lose recall; with few tables the fixture shows a
    strict gain."""
    from vervectordb_spark.operators.search import brute_force_topk

    idx = SignLSHIndex.build(emb, n_tables=2, bits=6)
    probes = [3, 77, 201]
    gain = 0.0
    for vid in probes:
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == vid).collect()[0]["embedding"]]
        truth = {r["vec_id"] for r in brute_force_topk(emb, qv, 10).collect()}
        c1 = {r["vec_id"] for r in idx.candidates(qv).select("vec_id").collect()}
        c4 = {r["vec_id"] for r in
              idx.candidates_multiprobe(qv, 4).select("vec_id").collect()}
        assert c1 <= c4
        r1 = len(truth & c1) / 10.0
        r4 = len(truth & c4) / 10.0
        assert r4 >= r1
        gain += r4 - r1
    assert gain > 0.0  # strictly better somewhere on this fixture


def test_wide_hash_save_uses_prefix_partitioning(spark, emb, tmp_path):
    """bits > MAX_PARTITION_BITS must NOT partition by raw bucket_0 (a
    2^bits-directory layout — 16.7M dirs at bits=24); the prefix layout
    caps fan-out, loads back with the shift, and probes return the same
    candidates as the in-memory index."""
    import glob

    idx = SignLSHIndex.build(emb, n_tables=2, bits=16)
    qv = _qv(emb)
    before = {r["vec_id"] for r in idx.search(qv, top_k=5).collect()}
    path = str(tmp_path / "wide")
    idx.save(path)
    assert glob.glob(f"{path}/signed/bucket_p0=*")
    assert not glob.glob(f"{path}/signed/bucket_0=*")
    assert len(glob.glob(f"{path}/signed/bucket_p0=*")) <= 4096
    loaded = SignLSHIndex.load(spark, path)
    assert loaded.prefix_shift == 4
    after = {r["vec_id"] for r in loaded.search(qv, top_k=5).collect()}
    assert after == before
    # the probe predicate carries the prunable prefix conjunct
    plan = loaded.candidates(qv)._jdf.queryExecution().toString()
    assert "bucket_p0" in plan


def test_narrow_hash_save_layout_unchanged(spark, emb, tmp_path):
    """bits <= 12 keeps the plain bucket_0 layout (and old artifacts
    without prefix_shift still load — covered by the meta fallback)."""
    import glob

    idx = SignLSHIndex.build(emb, n_tables=2, bits=4)
    path = str(tmp_path / "narrow")
    idx.save(path)
    assert glob.glob(f"{path}/signed/bucket_0=*")
    assert SignLSHIndex.load(spark, path).prefix_shift == 0


def test_batch_search_string_query_ids(spark, emb):
    """FIXTURES.md: uuid string keys are supported — the batch path must
    carry string query ids end-to-end (it used to int64-cast and crash)."""
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.concat(F.lit("q-"), F.col("vec_id").cast("string")).alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    idx = SignLSHIndex.build(emb, n_tables=2, bits=4)
    got = idx.batch_search(queries, top_k=3).collect()
    qids = {r["query_id"] for r in got}
    assert qids == {"q-0", "q-1", "q-2"}


def test_batch_search_empty_schema_matches_nonempty(spark, emb):
    idx = SignLSHIndex.build(emb, n_tables=2, bits=4)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    nonempty = idx.batch_search(queries, top_k=2)
    empty = idx.batch_search(queries.filter(F.lit(False)), top_k=2)
    assert [f.name for f in empty.schema.fields] == \
        [f.name for f in nonempty.schema.fields]


def test_signlsh_batch_multiprobe_matches_per_query(emb):
    """n_probes>1 batch == per-query search(n_probes) row-for-row, and
    multi-probe recall dominates single-probe on the same index."""
    idx = SignLSHIndex.build(emb, n_tables=2, bits=8)
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    batched = {
        (r["query_id"], r["rank"]): (r["vec_id"], round(r["sim"], 9))
        for r in idx.batch_search(queries, top_k=5, n_probes=4).collect()
    }
    for q in range(6):
        qv = _qv(emb, q)
        rows = idx.search(qv, top_k=5, n_probes=4).collect()
        for rank, r in enumerate(rows, 1):
            assert batched[(q, rank)] == (r["vec_id"], round(r["sim"], 9))
    # recall: multi-probe candidates are a superset per construction
    q0 = _qv(emb, 0)
    single = {r["vec_id"] for r in idx.candidates(q0).select("vec_id").collect()}
    multi = {r["vec_id"]
             for r in idx.candidates_multiprobe(q0, 4).select("vec_id").collect()}
    assert single <= multi and len(multi) >= len(single)
