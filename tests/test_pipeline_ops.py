"""Training-pipeline operator tests: MERGE/CDC, deterministic sampling,
sequence packing, vocabulary. The oracle gate (queries_pipeline.py) checks
value parity with DuckDB; these tests pin the operator INVARIANTS —
determinism under repartitioning, disjointness, conservation."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vervectordb_spark.operators.merge import apply_changes, merge_upsert
from vervectordb_spark.operators.packing import pack_by_token_offset, pack_summary
from vervectordb_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
    train_eval_split,
)
from vervectordb_spark.operators.text import top_ngrams
from vervectordb_spark.schema import load_table


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


# ------------------------------------------------------------------- merge

def test_merge_upsert_counts_and_replacement(emb):
    n = emb.count()
    updates = emb.filter(F.col("vec_id") < 10).select(
        "vec_id", "embedding", (F.col("label") + 1000).alias("label")
    )
    inserts = emb.filter(F.col("vec_id") < 4).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding",
        F.lit(7).alias("label"),
    )
    merged = merge_upsert(emb, updates.unionByName(inserts), "vec_id")
    assert merged.count() == n + 4
    # keys stay unique
    assert merged.select("vec_id").distinct().count() == n + 4
    # matched rows were REPLACED, not duplicated
    got = {r["vec_id"]: r["label"] for r in
           merged.filter(F.col("vec_id") < 10).select("vec_id", "label").collect()}
    orig = {r["vec_id"]: r["label"] for r in
            emb.filter(F.col("vec_id") < 10).select("vec_id", "label").collect()}
    assert got == {k: v + 1000 for k, v in orig.items()}


def test_apply_changes_latest_version_wins_and_tombstones(emb):
    base = emb.filter(F.col("vec_id") < 20)

    def delta(pred, label_expr, version, is_delete):
        return base.filter(pred).select(
            "vec_id", "embedding", label_expr.alias("label"),
            F.lit(version).alias("version"), F.lit(is_delete).alias("is_delete"),
        )

    changes = (
        delta(F.col("vec_id") < 6, F.col("label") + 10, 1, False)
        .unionByName(delta(F.col("vec_id") < 3, F.col("label") + 20, 2, False))
        .unionByName(delta(F.col("vec_id").isin(4, 5), F.col("label"), 3, True))
    )
    out = apply_changes(base, changes, "vec_id")
    got = {r["vec_id"]: r["label"] for r in out.select("vec_id", "label").collect()}
    orig = {r["vec_id"]: r["label"] for r in base.select("vec_id", "label").collect()}
    assert 4 not in got and 5 not in got  # tombstoned
    for k in (0, 1, 2):
        assert got[k] == orig[k] + 20  # v2 beat v1
    assert got[3] == orig[3] + 10
    for k in range(6, 20):
        assert got[k] == orig[k]  # untouched rows survive
    assert len(got) == 18


# ---------------------------------------------------------------- sampling

def test_hash_sample_deterministic_under_repartition(docs):
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).select("doc_id").collect()}
    b = {r["doc_id"] for r in
         hash_sample(docs.repartition(7), "doc_id", 0.3).select("doc_id").collect()}
    assert a == b
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n  # ~binomial(500, .3)


def test_stratified_rates_respected(docs):
    out = stratified_hash_sample(
        docs, "lang", {"en": 1.0, "zh": 0.0}, id_col="doc_id",
        default_fraction=0.5,
    )
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] == totals["en"]  # fraction 1.0 keeps everything
    assert "zh" not in counts  # fraction 0.0 drops everything
    for lang in ("de", "es", "fr"):
        assert 0.25 * totals[lang] < counts[lang] < 0.75 * totals[lang]


def test_split_bands_are_disjoint_and_exhaustive(docs):
    out = train_eval_split(docs, "doc_id", {"train": 0.8, "eval": 0.1, "test": 0.1})
    n = docs.count()
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # bands sum to 1.0 -> no NULLs
    assert set(counts) == {"train", "eval", "test"}
    assert counts["train"] > counts["eval"] and counts["train"] > counts["test"]
    # one row -> exactly one split, stable across recomputation
    again = {r["split"]: r["n"] for r in
             train_eval_split(docs.repartition(5), "doc_id",
                              {"train": 0.8, "eval": 0.1, "test": 0.1})
             .groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert again == counts


def test_split_overcommit_raises(docs):
    with pytest.raises(ValueError):
        train_eval_split(docs, "doc_id", {"a": 0.9, "b": 0.2}).collect()


# ----------------------------------------------------------------- packing

def test_pack_matches_pandas_reference(docs):
    budget = 2000
    got = pack_by_token_offset(
        docs, token_col="n_chars", budget=budget,
        order_col="doc_id", stream_col="lang",
    ).select("lang", "doc_id", "bin_id").toPandas()

    pdf = docs.select("lang", "doc_id", "n_chars").toPandas().sort_values(
        ["lang", "doc_id"]).reset_index(drop=True)
    pdf["start"] = pdf.groupby("lang")["n_chars"].cumsum() - pdf["n_chars"]
    pdf["expect"] = (pdf["start"] / budget).astype(int)
    merged = got.merge(pdf[["lang", "doc_id", "expect"]], on=["lang", "doc_id"])
    assert (merged["bin_id"] == merged["expect"]).all()


def test_pack_summary_conserves_tokens(docs):
    s = pack_summary(docs, token_col="n_chars", budget=3000,
                     order_col="doc_id", stream_col="lang")
    total = s.agg(F.sum("sum_tokens").alias("t")).collect()[0]["t"]
    assert total == docs.agg(F.sum("n_chars").alias("t")).collect()[0]["t"]
    # bins are contiguous from 0 per stream
    per = s.groupBy("lang").agg(
        F.min("bin_id").alias("lo"), F.max("bin_id").alias("hi"),
        F.count("*").alias("n"),
    ).collect()
    for r in per:
        assert r["lo"] == 0 and r["n"] == r["hi"] + 1


def test_pack_rejects_bad_budget(docs):
    with pytest.raises(ValueError):
        pack_by_token_offset(docs, "n_chars", 0, "doc_id")


# ------------------------------------------------------------------- vocab

def test_top_ngrams_matches_pandas_counter(docs):
    got = top_ngrams(docs, text_col="text", n=1, top_k=3, by_col="lang").toPandas()

    import re

    from vervectordb_spark.functions.words import WS_REGEX
    ws = re.compile(WS_REGEX)  # the pinned whitespace contract
    pdf = docs.select("lang", "text").toPandas()
    rows = []
    for lang, grp in pdf.groupby("lang"):
        counts: dict[str, int] = {}
        for text in grp["text"]:
            for tok in ws.split((text or "").lower()):
                if tok:
                    counts[tok] = counts.get(tok, 0) + 1
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rank, (tok, n) in enumerate(best, 1):
            rows.append((lang, tok, n, rank))
    expect = pd.DataFrame(rows, columns=["lang", "ngram", "n_occurrences", "rank"])
    cmp = got.merge(expect, on=["lang", "rank"], suffixes=("_got", "_exp"))
    assert len(cmp) == len(expect) == len(got)
    assert (cmp["ngram_got"] == cmp["ngram_exp"]).all()
    assert (cmp["n_occurrences_got"].to_numpy()
            == cmp["n_occurrences_exp"].to_numpy()).all()


def test_top_ngrams_global_mode(docs):
    out = top_ngrams(docs, text_col="text", n=2, top_k=5).collect()
    assert len(out) == 5
    assert [r["rank"] for r in out] in ([1, 2, 3, 4, 5],
                                        sorted(r["rank"] for r in out))


# ----------------------------------------------------------------- plans

def test_sampling_is_map_only(docs):
    from vervectordb_spark.plans import audit as A

    plan = A.physical_plan(hash_sample(docs, "doc_id", 0.5))
    A.assert_no_shuffle(plan)


def test_quality_filter_reasons(spark):
    from vervectordb_spark.operators.text import quality_filter

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and then keeps "
            "running through the field for a while longer today"),  # passes all
        (2, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),             # fails most
        (3, ""),                                                     # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in quality_filter(df).collect()}
    assert got[1]["keep"] and got[1]["fail_reasons"] == ""
    assert not got[2]["keep"]
    assert "stopword_ratio" in got[2]["fail_reasons"]
    assert "punct_ratio" in got[2]["fail_reasons"]
    assert not got[3]["keep"]
    assert "n_tokens" in got[3]["fail_reasons"]


def test_normalize_text_semantics(spark):
    from vervectordb_spark.operators.text import normalize_text_expr

    rows = [
        (1, "<p>Hello   <b>world</b></p>"),
        (2, "tab\there\nand\r\nnewlines"),
        (3, "ctrl\x01chars\x1fdropped"),
        (4, "  UPPER Case  "),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", normalize_text_expr("text").alias("n")).collect()}
    assert got[1] == "Hello world"
    assert got[2] == "tab here and newlines"
    assert got[3] == "ctrlcharsdropped"
    assert got[4] == "UPPER Case"
    assert got[5] is None
    low = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", normalize_text_expr("text", lowercase=True).alias("n")).collect()}
    assert low[4] == "upper case"


# ---------------------------------------------------------------------------
# weighted sampling (Efraimidis–Spirakis A-ES top-k)
# ---------------------------------------------------------------------------


def test_weighted_sample_biases_toward_heavy_rows(spark):
    """Two weight classes, 10:1 — the heavy class must win a clear
    majority of sample slots (expected share 10/11 ≈ 0.91; deterministic
    given the fixed seed)."""
    from vervectordb_spark.operators.sampling import weighted_sample

    rows = [(i, 10.0 if i < 500 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample(df, "id", "w", k=200, seed=7).collect()
    assert len(got) == 200
    heavy = sum(1 for r in got if r["id"] < 500)
    assert heavy > 160, f"heavy rows got only {heavy}/200 slots"


def test_weighted_sample_deterministic_under_repartition(spark):
    from vervectordb_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w double")
    a = {r["id"] for r in weighted_sample(df, "id", "w", k=50).collect()}
    b = {r["id"] for r in
         weighted_sample(df.repartition(13), "id", "w", k=50).collect()}
    assert a == b


def test_weighted_sample_excludes_nonpositive_and_null_weights(spark):
    from vervectordb_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -2.0), (4, None), (5, 5.0)],
        "id long, w double",
    )
    got = {r["id"] for r in weighted_sample(df, "id", "w", k=10).collect()}
    assert got == {1, 5}


def test_weighted_sample_per_stratum(spark):
    from vervectordb_spark.operators.sampling import weighted_sample

    rows = [(i, "a" if i % 2 == 0 else "b", 1.0 + i % 3) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, s string, w double")
    got = weighted_sample(df, "id", "w", k=10, strata_col="s").collect()
    from collections import Counter

    c = Counter(r["s"] for r in got)
    assert c == {"a": 10, "b": 10}


def test_weighted_sample_plan_is_take_ordered(spark):
    """Global k must compile to TakeOrderedAndProject, not a full sort."""
    from vervectordb_spark.operators.sampling import weighted_sample
    from vervectordb_spark.plans import audit as A
    from vervectordb_spark.schema import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = A.physical_plan(
        weighted_sample(docs.filter(F.col("n_chars") > 0),
                        "doc_id", "n_chars", k=50)
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_top_ngrams_counts_occurrences_for_bigrams(spark):
    """n>1 must count OCCURRENCES, not document frequency: one doc
    repeating a bigram beats many docs containing it once."""
    rows = [(1, "foo bar " * 10)] + [(i, "baz qux etc") for i in range(2, 6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = top_ngrams(df, text_col="text", n=2, top_k=1).collect()
    assert out[0]["ngram"] == "foo bar"
    assert out[0]["n_occurrences"] == 10


def test_pack_tiebreak_makes_tied_order_deterministic(spark):
    """Equal order_col values: the layout must not depend on shuffle
    order once a tiebreak column is supplied."""
    from vervectordb_spark.operators.packing import pack_by_token_offset

    rows = [(i, 30, 7) for i in range(40)]  # ALL order values tie
    df = spark.createDataFrame(rows, "doc_id long, n_tok long, ord long")
    a = {r["doc_id"]: r["bin_id"] for r in pack_by_token_offset(
        df, "n_tok", 100, "ord", tiebreak_col="doc_id").collect()}
    b = {r["doc_id"]: r["bin_id"] for r in pack_by_token_offset(
        df.repartition(7), "n_tok", 100, "ord",
        tiebreak_col="doc_id").collect()}
    assert a == b
    assert a[0] == 0 and a[39] == (39 * 30) // 100


def test_hash_sample_fraction_one_keeps_everything(spark):
    from vervectordb_spark.operators.sampling import hash_sample

    df = spark.range(1000).select(F.col("id").alias("k"))
    assert hash_sample(df, "k", 1.0).count() == 1000


def test_split_full_coverage_last_band_closed(spark):
    """Widths summing to 1.0 must assign EVERY row (the top ~128 hash
    values round to u == 1.0; an open last band would leave them NULL)."""
    from vervectordb_spark.operators.sampling import train_eval_split

    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    out = train_eval_split(df, "k", {"a": 0.5, "b": 0.5})
    assert out.filter(F.col("split").isNull()).count() == 0


def test_apply_changes_duplicate_version_deterministic(spark):
    """Two change rows with the same (key, version) but different
    payloads (replayed CDC feed) must resolve to the SAME winner under
    any partitioning."""
    from vervectordb_spark.operators.merge import apply_changes

    target = spark.createDataFrame([(1, "old")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "payload-a", 5, False), (1, "payload-b", 5, False)],
        "k long, v string, version long, is_delete boolean",
    )
    a = apply_changes(target, changes, "k").collect()
    b = apply_changes(target, changes.repartition(5), "k").collect()
    assert len(a) == len(b) == 1
    assert a[0]["v"] == b[0]["v"]


# ---------------------------------------------------------------------------
# temperature mixing (mix_by_temperature)
# ---------------------------------------------------------------------------

def _skewed(spark):
    rows = [(i, "big") for i in range(900)] + \
           [(1000 + i, "small") for i in range(100)]
    return spark.createDataFrame(rows, "doc_id long, stratum string")


def test_mix_by_temperature_upweights_tail(spark):
    """alpha=0.5 flattens: the tail stratum's kept SHARE rises above its
    natural 10%, the head's falls below 90% — while the total stays near
    the budget."""
    from vervectordb_spark.operators.sampling import mix_by_temperature

    kept = mix_by_temperature(_skewed(spark), "stratum", "doc_id",
                              total=200, alpha=0.5).groupBy("stratum") \
        .agg(F.count("*").alias("n")).collect()
    n = {r["stratum"]: r["n"] for r in kept}
    tot = sum(n.values())
    assert 140 <= tot <= 260
    assert n["small"] / tot > 0.15          # natural share was 0.10
    assert n["big"] / tot < 0.85            # natural share was 0.90
    # sqrt targets: 30/(30+10) vs 10/40 => expected ~0.75/0.25 split
    assert abs(n["small"] / tot - 0.25) < 0.08


def test_mix_by_temperature_deterministic_across_partitionings(spark):
    from vervectordb_spark.operators.sampling import mix_by_temperature

    df = _skewed(spark)
    a = {r["doc_id"] for r in mix_by_temperature(
        df, "stratum", "doc_id", total=200).select("doc_id").collect()}
    b = {r["doc_id"] for r in mix_by_temperature(
        df.repartition(13), "stratum", "doc_id",
        total=200).select("doc_id").collect()}
    assert a == b and len(a) > 0


def test_mix_by_temperature_alpha_one_is_natural_mix(spark):
    """alpha=1 keeps shares ∝ n: every stratum's acceptance rate is the
    SAME total/N, so kept shares track the natural mix."""
    from vervectordb_spark.operators.sampling import mix_by_temperature

    kept = mix_by_temperature(_skewed(spark), "stratum", "doc_id",
                              total=400, alpha=1.0).groupBy("stratum") \
        .agg(F.count("*").alias("n")).collect()
    n = {r["stratum"]: r["n"] for r in kept}
    tot = sum(n.values())
    assert abs(n["big"] / tot - 0.9) < 0.06
