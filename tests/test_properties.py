"""Property-based tests (hypothesis) for the numeric core.

The cosine fold is the contract every search operator and every DuckDB
oracle rests on; these pin its mathematical properties over adversarial
inputs (zeros, denormals, huge/tiny magnitudes, mixed signs) — cases the
fixture data never hits. Vectors are evaluated through the REAL Catalyst
expressions on a local session, batched per example set to keep job count
sane."""

import math

import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from vervectordb_spark.functions import similarity as sim
from vervectordb_spark.functions.words import ws_tokens_py

FINITE = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False,
    width=32,
)
VEC = st.lists(FINITE, min_size=4, max_size=4)


def _cos(spark, a, b):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    return df.select(
        sim.cosine_expr(F.col("a"), F.col("b")).alias("c")
    ).collect()[0]["c"]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=VEC, b=VEC)
def test_cosine_bounded_and_symmetric(spark, a, b):
    c1 = _cos(spark, a, b)
    c2 = _cos(spark, b, a)
    assert -1.0 - 1e-9 <= c1 <= 1.0 + 1e-9
    assert math.isclose(c1, c2, rel_tol=0, abs_tol=0) or (c1 == c2)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=VEC)
def test_cosine_self_is_one_or_zero(spark, a):
    c = _cos(spark, a, a)
    if all(x == 0.0 for x in a):
        assert c == 0.0  # zero-norm guard (reference contract)
    else:
        assert math.isclose(c, 1.0, abs_tol=1e-9)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=VEC, b=VEC, scale=st.floats(min_value=0.0009765625, max_value=1024.0,
                                     allow_nan=False, width=32))
def test_cosine_scale_invariant(spark, a, b, scale):
    import numpy as np

    # Scale invariance holds only while scaling preserves the float32
    # zero-pattern: a subnormal component (e.g. 1.4e-45) times 0.5
    # underflows to exactly 0.0 in the stored array<float>, and a vector
    # that becomes all-zero correctly trips the zero-norm guard instead.
    scaled = [x * scale for x in a]
    assume(all(
        (np.float32(x) == 0.0) == (np.float32(y) == 0.0)
        for x, y in zip(a, scaled)
    ))
    c1 = _cos(spark, a, b)
    c2 = _cos(spark, scaled, b)
    assert math.isclose(c1, c2, abs_tol=1e-6)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=VEC)
def test_normalize_idempotent_unit_norm(spark, a):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(a,)], "a array<float>")
    row = df.select(
        sim.norm_expr(sim.normalize_expr(F.col("a"))).alias("n")
    ).collect()[0]
    if all(x == 0.0 for x in a):
        assert row["n"] == 0.0
    else:
        assert math.isclose(row["n"], 1.0, abs_tol=1e-9)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=6))
def test_md5_hash_family_distinct_and_stable(spark, vals):
    """Portable hash family: deterministic, non-negative, 60-bit."""
    from pyspark.sql import functions as F

    from vervectordb_spark.functions.hashing import HASH_BITS, md5_long

    df = spark.createDataFrame([(v,) for v in vals], "s string")
    out1 = [r["h"] for r in df.select(md5_long(F.col("s")).alias("h")).collect()]
    out2 = [r["h"] for r in df.select(md5_long(F.col("s")).alias("h")).collect()]
    assert out1 == out2
    assert all(0 <= h < 2 ** HASH_BITS for h in out1)
    # distinct inputs -> distinct hashes (collision prob ~ 2^-60)
    assert len(set(out1)) == len(set(vals))


# ---------------------------------------------------------------------------
# sketch-kernel parity fuzz: Arrow (mapInPandas) vs expression kernels must
# agree on arbitrary unicode text, including null/empty/whitespace-only
# ---------------------------------------------------------------------------

# Fuzz alphabet: plain words + the FULL \x00-\x1f control range + the
# Unicode whitespace that Python str.split()/default-\s treat as
# separators but the pinned Java-ASCII contract does NOT (\x1c-\x1f,
# NEL \x85, NBSP \xa0, ideographic space) — the exact divergence class
# hypothesis caught in round 10 ('\x1f').
_CTRL_AND_WS = [chr(c) for c in range(0x00, 0x20)] + [
    "\x7f", "\x85", "\xa0", " ", "　", " ", "\t"]
_NASTY_TEXT = st.text(
    alphabet=st.one_of(st.sampled_from(list("abcxyz") + _CTRL_AND_WS),
                       st.characters()),
    max_size=50)
_TEXTS = st.lists(
    st.one_of(st.none(), _NASTY_TEXT), min_size=1, max_size=4
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_TEXTS)
def test_minhash_kernels_agree_on_fuzzed_text(spark, texts):
    from vervectordb_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    key = lambda r: r["doc_id"]  # noqa: E731
    a = sorted(D.minhash_signatures(df, kernel="arrow").collect(), key=key)
    e = sorted(D.minhash_signatures(df, kernel="expr").collect(), key=key)
    assert [(r["doc_id"], r["shingles"], r["signature"]) for r in a] == [
        (r["doc_id"], r["shingles"], r["signature"]) for r in e
    ]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_TEXTS)
def test_simhash_kernels_agree_on_fuzzed_text(spark, texts):
    from vervectordb_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = sorted(D.simhash_fingerprints(df, kernel="arrow").collect())
    e = sorted(D.simhash_fingerprints(df, kernel="expr").collect())
    assert a == e


# ---------------------------------------------------------------------------
# sampling: threshold-hash membership is MONOTONE in the fraction — the
# sample at a lower rate is always a subset of the sample at a higher rate
# (the property that makes nested training mixes consistent)
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9),
                 min_size=1, max_size=20, unique=True),
    f1=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    f2=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_hash_sample_monotone_in_fraction(spark, ids, f1, f2):
    from vervectordb_spark.operators.sampling import hash_sample

    lo, hi = min(f1, f2), max(f1, f2)
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    small = {r["doc_id"] for r in hash_sample(df, "doc_id", lo).collect()}
    big = {r["doc_id"] for r in hash_sample(df, "doc_id", hi).collect()}
    assert small <= big


# ---------------------------------------------------------------------------
# merge: result keys are exactly target ∪ source; source wins intersections
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    tkeys=st.lists(st.integers(0, 50), min_size=1, max_size=10, unique=True),
    skeys=st.lists(st.integers(0, 50), min_size=1, max_size=10, unique=True),
)
def test_merge_upsert_key_algebra(spark, tkeys, skeys):
    from pyspark.sql import functions as F

    from vervectordb_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(k, "t") for k in tkeys], "k long, side string")
    source = spark.createDataFrame(
        [(k, "s") for k in skeys], "k long, side string")
    out = {r["k"]: r["side"] for r in merge_upsert(target, source, "k").collect()}
    assert set(out) == set(tkeys) | set(skeys)
    for k in skeys:
        assert out[k] == "s"  # source wins
    for k in set(tkeys) - set(skeys):
        assert out[k] == "t"


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_TEXTS,
       chunk=st.integers(min_value=3, max_value=40),
       overlap=st.integers(min_value=0, max_value=10))
def test_chunking_conserves_tokens(spark, texts, chunk, overlap):
    """For arbitrary unicode text and window geometry: stitching chunks
    back together (dropping each chunk's leading overlap) reproduces the
    exact token stream, and every chunk except possibly the last is
    full-width."""
    from vervectordb_spark.operators.text import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    texts = [t or "" for t in texts]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        toks = ws_tokens_py(t)
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_id"])
        if not toks:
            # empty text: a single empty chunk
            assert len(chunks) == 1 and chunks[0]["chunk_text"] == ""
            continue
        rebuilt = ws_tokens_py(chunks[0]["chunk_text"])
        for c in chunks[1:]:
            rebuilt.extend(ws_tokens_py(c["chunk_text"])[overlap:])
        assert rebuilt == toks
        for c in chunks[:-1]:
            assert c["n_chunk_tokens"] == chunk
        # no spurious trailing chunk: the last chunk starts within bounds
        assert (len(chunks) - 1) * stride < max(len(toks), 1)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_TEXTS, terms=st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=4), min_size=1,
    max_size=3))
def test_term_tf_matches_python_count(spark, texts, terms):
    """The map-only lexical scorer == a plain Python count over the same
    tokenization, for arbitrary text/terms."""
    from vervectordb_spark.operators.hybrid import term_tf_expr

    texts = [t or "" for t in texts]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", term_tf_expr("text", terms).alias("s")
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = ws_tokens_py(t)
        want = sum(toks.count(term.lower()) for term in terms)
        assert got[i] == want


WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=3)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    run=st.lists(WORD, min_size=6, max_size=6),      # w+k-1 = 4+3-1 tokens
    pre=st.lists(WORD, min_size=0, max_size=8),
    post=st.lists(WORD, min_size=0, max_size=8),
)
def test_winnow_guarantee_on_fuzzed_token_runs(spark, run, pre, post):
    """Schleimer et al.'s winnowing guarantee, fuzzed: ANY two documents
    sharing a contiguous run of w+k-1 tokens share at least one
    fingerprint — the shared run contains a full hash window in both
    docs, and that window's minimum is selected in both regardless of
    the surrounding text."""
    from vervectordb_spark.operators import dedup as D

    doc_a = " ".join(pre + run)
    doc_b = " ".join(run + post)
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    fps = D.winnow_table(df, kernel="arrow").collect()
    a = {r["fp"] for r in fps if r["doc_id"] == 1}
    b = {r["fp"] for r in fps if r["doc_id"] == 2}
    assert a & b, f"no shared fingerprint for run={run!r}"


# ---------------------------------------------------------------------------
# SQ8 codec laws (pure-arithmetic mirror of operators/sq — no Spark jobs)
# ---------------------------------------------------------------------------

@settings(max_examples=50, deadline=None)
@given(
    xs=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=2, max_size=32),
)
def test_sq8_roundtrip_bound_fuzzed(xs):
    """For any corpus column, every reconstruction sits within half a
    quantization step of the original — the codec's defining guarantee,
    checked with the exact arithmetic the Spark exprs use (one dimension;
    per-dimension independence makes this the general case)."""
    mn, mx = min(xs), max(xs)
    scale = (mx - mn) / 255.0
    for x in xs:
        if scale == 0.0:
            # constant dim OR a subnormal range whose scale underflows
            # to exactly 0.0 (hypothesis found xs=[0.0, 5e-324]) — the
            # kernels guard on scale, not mx == mn, for this reason
            code, recon = 0, mn
        else:
            code = min(255.0, max(0.0, math.floor((x - mn) / scale + 0.5)))
            recon = mn + code * scale
        assert 0 <= code <= 255
        assert abs(x - recon) <= scale * 0.5 + 1e-9 * max(abs(mn), abs(mx), 1.0)


# ---------------------------------------------------------------------------
# MMR greedy laws (pure-Python core, operators/rerank.mmr_select)
# ---------------------------------------------------------------------------

_REL = st.floats(min_value=-1.0, max_value=1.0,
                 allow_nan=False, allow_infinity=False)
_EMB = st.lists(st.floats(min_value=-10, max_value=10,
                          allow_nan=False, allow_infinity=False),
                min_size=3, max_size=3)


@settings(max_examples=40, deadline=None)
@given(
    rels=st.lists(_REL, min_size=1, max_size=10),
    embs=st.lists(_EMB, min_size=10, max_size=10),
    lam=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    k=st.integers(min_value=1, max_value=10),
)
def test_mmr_select_laws_fuzzed(rels, embs, lam, k):
    """Invariants of the greedy for any pool: unique picks, ranks dense
    from 1, first pick is argmax rel (id tie-break), lam=1.0 reduces to
    plain top-k, redundancy nonnegative and nondecreasing in rank only
    when ... (redundancy is vs the growing selected set, so each row's
    recorded redundancy is the max AT PICK TIME — bounded by 1 in cosine
    terms scaled by the embeddings)."""
    from vervectordb_spark.operators.rerank import mmr_select

    n = len(rels)
    embs = embs[:n]
    ids = list(range(100, 100 + n))
    out = mmr_select(ids, rels, embs, k=k, lam=lam)
    assert len(out) == min(k, n)
    picked = [ids[i] for _, i, *_ in out]
    assert len(set(picked)) == len(picked)
    assert [r for r, *_ in out] == list(range(1, len(out) + 1))
    # first pick maximizes lam*rel (empty selected set => redundancy 0)
    # with id tie-break; at lam=0 every first-pick score is 0 so the id
    # tie-break alone decides — argmax-rel only holds when lam*rel
    # actually separates candidates
    best = min(range(n), key=lambda i: (-(lam * rels[i]), ids[i]))
    assert out[0][1] == best
    if lam == 1.0:
        want = sorted(range(n), key=lambda i: (-rels[i], ids[i]))[:min(k, n)]
        assert [i for _, i, *_ in out] == want


# ---------------------------------------------------------------------------
# round-11 control-char fuzz across the remaining dual-kernel parity pairs
# (VERDICT r10 task #1): embed arrow-vs-expr, profile arrow-vs-expr, and
# the BPE trainer vs its independent Python reference, all over _TEXTS
# (whose alphabet is loaded with \x00-\x1f and Unicode whitespace)
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_TEXTS)
def test_embed_kernels_agree_on_fuzzed_text(spark, texts):
    from vervectordb_spark.operators.embed import embed_documents

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    a = {r["vec_id"]: list(r["embedding"]) for r in
         embed_documents(df, dim=16, kernel="arrow").collect()}
    e = {r["vec_id"]: list(r["embedding"]) for r in
         embed_documents(df, dim=16, kernel="expr").collect()}
    assert a == e


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_TEXTS)
def test_profile_kernels_agree_on_fuzzed_text(spark, texts):
    from vervectordb_spark.operators import text as TX

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    key = lambda r: r["doc_id"]  # noqa: E731
    a = sorted(TX.profile(df, kernel="arrow").collect(), key=key)
    e = sorted(TX.profile(df, kernel="expr").collect(), key=key)
    assert [r.asDict() for r in a] == [r.asDict() for r in e]


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_NASTY_TEXT, min_size=2, max_size=4))
def test_bpe_trainer_matches_python_reference_on_fuzzed_text(spark, texts):
    """train_bpe's merge sequence == the independent Python reference
    (tests/test_bpe._py_train) under the pinned tokenization, for
    arbitrary control-char-laden text."""
    from vervectordb_spark.functions.checkpoint import release_checkpoint
    from vervectordb_spark.operators.bpe import train_bpe

    from tests.test_bpe import _py_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges, vocab = train_bpe(df, n_merges=3)
    release_checkpoint(vocab)
    got = [(m.left, m.right, m.count) for m in merges]
    ref_merges, _ref_vocab = _py_train(texts, 3)
    exp = [(a, b, c) for _step, a, b, c in ref_merges]
    assert got == exp
