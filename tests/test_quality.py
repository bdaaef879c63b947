"""Model-based quality classifier (operators/quality.py): weak-label
bootstrap, MLlib LR training, fold-expr scoring parity with NumPy,
held-out agreement with the labels, determinism, and the filter shape."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from vervectordb_spark.operators import quality as Q
from vervectordb_spark.schema import load_table

SF_DIR = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def fitted(spark, docs):
    labels = Q.weak_labels_from_gate(docs)
    train_docs = docs.filter(F.col("doc_id") % 5 != 0)  # 80/20 split
    feats = Q.featurize(train_docs, dim=DIM).join(labels, on="doc_id")
    w, b = Q.train_quality_classifier(feats)
    return w, b, labels


def test_weak_labels_are_binary_and_mixed(docs):
    rows = Q.weak_labels_from_gate(docs).groupBy("label").count().collect()
    got = {r["label"]: r["count"] for r in rows}
    assert set(got) == {0, 1}          # both classes present
    assert min(got.values()) > 5       # enough of each to train


def test_classifier_agrees_with_gate_on_heldout(spark, docs, fitted):
    w, b, labels = fitted
    held = docs.filter(F.col("doc_id") % 5 == 0)
    scored = Q.score_quality(held, w, b, dim=DIM).join(labels, on="doc_id")
    rows = scored.select("quality", "label").collect()
    acc = sum(1 for r in rows
              if (r["quality"] >= 0.5) == (r["label"] == 1)) / len(rows)
    assert acc >= 0.9, acc             # generalizes off the training split


def test_fold_scoring_matches_numpy(spark, docs, fitted):
    w, b, _ = fitted
    feats = Q.featurize(docs.limit(20), dim=DIM)
    rows = feats.select(
        "features",
        Q.classifier_score_expr(F.col("features"), w, b).alias("p"),
    ).collect()
    for r in rows:
        acc = 0.0
        for x, c in zip(r["features"], w):
            acc = acc + float(x) * c   # the fold's exact order
        expect = 1.0 / (1.0 + math.exp(-(b + acc)))
        assert abs(r["p"] - expect) < 1e-12


def test_training_is_deterministic(spark, docs):
    labels = Q.weak_labels_from_gate(docs)
    feats = Q.featurize(docs, dim=DIM).join(labels, on="doc_id")
    w1, b1 = Q.train_quality_classifier(feats)
    w2, b2 = Q.train_quality_classifier(feats)
    assert np.allclose(w1, w2, atol=1e-9) and abs(b1 - b2) < 1e-9


def test_quality_filter_keeps_high_scores_only(spark, docs, fitted):
    w, b, _ = fitted
    kept = Q.quality_filter(docs, w, b, threshold=0.5, dim=DIM)
    assert kept.count() > 0
    assert kept.filter(F.col("quality") < 0.5).count() == 0
    scores = Q.score_quality(docs, w, b, dim=DIM)
    assert scores.filter((F.col("quality") < 0.0)
                         | (F.col("quality") > 1.0)).count() == 0
    with pytest.raises(ValueError, match="weights len"):
        Q.score_quality(docs, w, b, dim=DIM + 1)
