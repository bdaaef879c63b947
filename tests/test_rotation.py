"""HD structured rotation (operators/rotation.py): the butterfly
association contract across all three kernels (expr / Arrow / driver
numpy), orthonormality, determinism, the sign-balance effect the
rotation exists for, and the rotated-BQ serving chain."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from vervectordb_spark.operators import rotation as R
from vervectordb_spark.schema import load_table

SF_DIR = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def _scalar_rotate(x, signs):
    """Scalar reference of the association contract — independent of
    every production kernel."""
    d = len(x)
    h = [float(x[i]) * signs[i] for i in range(d)]
    b = 1
    while b < d:
        nh = [0.0] * d
        for i in range(d):
            if (i & b) == 0:
                nh[i] = h[i] + h[i | b]
            else:
                nh[i] = h[i ^ b] - h[i]
        h = nh
        b <<= 1
    s = 1.0 / np.sqrt(d)
    return [v * s for v in h]


def test_signs_deterministic_pm1():
    s1, s2 = R.hd_signs(DIM), R.hd_signs(DIM)
    assert s1 == s2
    assert set(s1) == {-1, 1}
    assert R.hd_signs(DIM, seed=7) != s1  # seed actually enters the hash


def test_numpy_matches_scalar_contract():
    rng = np.random.default_rng(11)
    X = rng.normal(size=(8, DIM))
    signs = R.hd_signs(DIM)
    Y = R.rotate_np(X, signs)
    for r in range(len(X)):
        ref = _scalar_rotate(X[r], signs)
        assert all(Y[r][i] == ref[i] for i in range(DIM)), r


def test_expr_arrow_query_kernels_bit_identical(emb):
    a = (R.with_rotation(emb, DIM, kernel="expr")
         .select("vec_id", "emb_rot").orderBy("vec_id").limit(100).collect())
    b = (R.with_rotation(emb, DIM, kernel="arrow")
         .select("vec_id", "emb_rot").orderBy("vec_id").limit(100).collect())
    assert [r.emb_rot for r in a] == [r.emb_rot for r in b]
    # the driver-side query rotation is the same bits as the column kernel
    signs = R.hd_signs(DIM)
    row0 = emb.orderBy("vec_id").first()
    q = R.rotate_query([float(v) for v in row0.embedding], signs)
    assert q == [float(v) for v in a[0].emb_rot]


def test_orthonormal_norms_and_cosines_preserved():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(32, DIM))
    Y = R.rotate_np(X, R.hd_signs(DIM))
    n_x = np.linalg.norm(X, axis=1)
    n_y = np.linalg.norm(Y, axis=1)
    assert np.allclose(n_x, n_y, rtol=1e-12)
    cx = (X[:16] * X[16:]).sum(axis=1) / (n_x[:16] * n_x[16:])
    cy = (Y[:16] * Y[16:]).sum(axis=1) / (n_y[:16] * n_y[16:])
    assert np.allclose(cx, cy, atol=1e-12)


def test_hadamard_alone_is_an_involution():
    # signs=+1 leaves pure normalized H, which is symmetric orthogonal:
    # H(Hx) == x up to float rounding
    rng = np.random.default_rng(5)
    X = rng.normal(size=(4, DIM))
    ones = [1] * DIM
    back = R.rotate_np(R.rotate_np(X, ones), ones)
    assert np.allclose(back, X, rtol=1e-12, atol=1e-12)


def test_non_power_of_two_dim_rejected():
    with pytest.raises(ValueError, match="power-of-two"):
        R.hd_signs(48)
    rng = np.random.default_rng(1)
    with pytest.raises(ValueError, match="power-of-two"):
        R.rotate_np(rng.normal(size=(2, 48)), [1] * 48)


def test_rotation_balances_sign_bits():
    """The reason the operator exists: midrange-threshold bits on heavily
    skewed per-dimension distributions are unbalanced (midrange sits far
    from the mass); rotated coordinates are +-weighted sums of all dims,
    so their distributions symmetrize and bit rates move toward 1/2."""
    rng = np.random.default_rng(19)
    X = np.exp(rng.normal(size=(4096, DIM)))  # log-normal: skew ~ e^sigma
    Y = R.rotate_np(X, R.hd_signs(DIM))

    def imbalance(M):
        thr = (M.min(axis=0) + M.max(axis=0)) / 2.0
        rates = (M > thr).mean(axis=0)
        return np.abs(rates - 0.5).mean()

    assert imbalance(Y) < imbalance(X) / 2


def test_rotated_bq_search_contract(spark, emb):
    row0 = emb.orderBy("vec_id").first()
    qv = [float(v) for v in row0.embedding]
    out = R.rotated_bq_search(emb, qv, DIM, top_k=5).collect()
    assert len(out) == 5
    assert out[0].vec_id == row0.vec_id  # self wins: hamming 0, cosine 1
    assert out[0].hamming == 0
    assert abs(out[0].sim - 1.0) < 1e-9
    sims = [r.sim for r in out]
    assert sims == sorted(sims, reverse=True)


def test_pad_to_pow2_rotation(spark):
    """Non-power-of-two dims via pad=True: output has next_pow2(dim)
    elements, expr and Arrow kernels stay bit-identical, and norms
    relative to the RAW vectors are preserved (pad is exact zeros)."""
    rng = np.random.default_rng(23)
    rows = [(i, rng.normal(size=48).tolist()) for i in range(32)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    a = (R.with_rotation(df, 48, kernel="expr", pad=True)
         .select("vec_id", "emb_rot").orderBy("vec_id").collect())
    b = (R.with_rotation(df, 48, kernel="arrow", pad=True)
         .select("vec_id", "emb_rot").orderBy("vec_id").collect())
    assert [r.emb_rot for r in a] == [r.emb_rot for r in b]
    assert all(len(r.emb_rot) == 64 for r in a)
    raw = {i: np.asarray(v) for i, v in rows}
    for r in a:
        assert abs(np.linalg.norm(r.emb_rot)
                   - np.linalg.norm(raw[r.vec_id])) < 1e-9


def test_pad_rejected_without_flag():
    with pytest.raises(ValueError, match="power-of-two"):
        R.hd_signs(48)
    assert R.next_pow2(48) == 64 and R.next_pow2(64) == 64
    assert R.next_pow2(1) == 1


def test_rotated_bq_search_non_pow2(spark):
    rng = np.random.default_rng(31)
    rows = [(i, rng.normal(size=24).tolist()) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    qv = rows[5][1]
    out = R.rotated_bq_search(df, qv, 24, top_k=3).collect()
    assert out[0].vec_id == 5 and out[0].hamming == 0
    assert abs(out[0].sim - 1.0) < 1e-9


def test_rotated_batch_matches_single(spark, emb):
    """batch_hamming_search with the rotation q_pretransform must return
    row-for-row what rotated_bq_search returns per query."""
    from pyspark.sql import functions as F

    from vervectordb_spark.operators import bq

    signs = R.hd_signs(DIM)
    rotated = R.with_rotation(emb, DIM)
    thr = bq.fit_bq_thresholds(rotated, emb_col="emb_rot", dim=DIM)
    coded = bq.with_codes(rotated, thr, DIM, emb_col="emb_rot").select(
        "vec_id", "bq_code")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    batch = bq.batch_hamming_search(
        coded, thr, queries, top_k=5, rerank_factor=3,
        rerank=emb.select("vec_id", "embedding"),
        q_pretransform=lambda v: R.rotate_query(v, signs),
    ).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["hamming"], round(r["sim"], 9)))
    qrows = {r["vec_id"]: [float(x) for x in r["embedding"]]
             for r in emb.filter(F.col("vec_id") < 3).collect()}
    for qid, qv in qrows.items():
        single = [(r["vec_id"], r["hamming"], round(r["sim"], 9))
                  for r in R.rotated_bq_search(emb, qv, DIM, top_k=5).collect()]
        assert by_q[qid] == single, qid


def test_store_rotated_bq_facade(spark):
    """train/compress/search facade: the query row wins (hamming 0,
    cosine 1), compressed serving matches uncompressed serving
    row-for-row, and a post-compress insert is still searchable (NULL
    codes encoded on the fly)."""
    from vervectordb_spark.store import VectorStore

    rng = np.random.default_rng(17)
    store = VectorStore(spark, vector_dim=8)
    vecs = np.exp(rng.normal(size=(96, 8))).astype(np.float64)  # skewed
    ids = store.batch_insert(vecs.tolist())
    before = store.rotated_bq_search(vecs[9].tolist(), top_k=4)
    store.rotated_bq_compress()
    assert "bq_rot_code" in store.df.columns
    after = store.rotated_bq_search(vecs[9].tolist(), top_k=4)
    assert before == after
    assert after[0]["vector_id"] == ids[9]
    assert after[0]["hamming"] == 0
    assert abs(after[0]["similarity"] - 1.0) < 1e-9
    new_vec = np.exp(rng.normal(size=8)).tolist()
    new_id = store.insert(new_vec)
    hits = store.rotated_bq_search(new_vec, top_k=2)
    assert hits[0]["vector_id"] == new_id and hits[0]["hamming"] == 0


def test_rotated_bq_state_survives_save_load(spark, tmp_path):
    """ADVICE r5 (medium): save() persists (seed, rotated thresholds) to
    {path}/bq_rot and load() restores them — so after an insert-then-load,
    rotated_bq_search scores the persisted bq_rot_code words under the
    SAME thresholds they were packed with (no silent refit drift)."""
    from vervectordb_spark.store import VectorStore

    rng = np.random.default_rng(23)
    store = VectorStore(spark, vector_dim=8)
    vecs = np.exp(rng.normal(size=(64, 8))).astype(np.float64)
    store.batch_insert(vecs.tolist())
    store.rotated_bq_compress(seed=7)
    # insert AFTER compress: the exact flow where a post-load refit would
    # produce different thresholds than the packed corpus words
    new_vec = np.exp(rng.normal(size=8)).tolist()
    store.insert(new_vec)
    before = store.rotated_bq_search(vecs[3].tolist(), top_k=5, seed=7)
    path = str(tmp_path / "rotstore")
    store.save(path)

    loaded = VectorStore.load(spark, path)
    assert loaded._rotbq is not None
    assert loaded._rotbq[0] == 7
    # thresholds bit-equal to the in-session state
    import pandas as pd
    pd.testing.assert_frame_equal(
        loaded._rotbq[1].sort_values("pos").reset_index(drop=True),
        store._rotbq[1].sort_values("pos").reset_index(drop=True),
    )
    after = VectorStore.load(spark, path).rotated_bq_search(
        vecs[3].tolist(), top_k=5, seed=7)
    assert before == after


def test_load_drops_orphan_rot_codes(spark, tmp_path):
    """A vectors table carrying bq_rot_code WITHOUT persisted rotated
    thresholds (legacy artifact) loads with the code column dropped —
    search re-encodes consistently instead of mixing refit query bits
    with stale corpus bits."""
    import shutil

    from vervectordb_spark.store import VectorStore

    rng = np.random.default_rng(29)
    store = VectorStore(spark, vector_dim=8)
    store.batch_insert(np.exp(rng.normal(size=(32, 8))).tolist())
    store.rotated_bq_compress(seed=3)
    path = str(tmp_path / "legacy")
    store.save(path)
    shutil.rmtree(f"{path}/bq_rot")  # simulate the pre-fix artifact
    loaded = VectorStore.load(spark, path)
    assert loaded._rotbq is None
    assert "bq_rot_code" not in loaded.df.columns
    # search still works (trains fresh, encodes in-line)
    hits = loaded.rotated_bq_search(
        [float(x) for x in loaded.df.first()["embedding"]], top_k=2, seed=3)
    assert hits[0]["hamming"] == 0
