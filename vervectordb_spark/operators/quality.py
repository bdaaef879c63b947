"""Model-based quality filtering — the CCNet / GPT-3-style trained
classifier stage (Wenzek et al., "CCNet", LREC 2020; Brown et al. §2.2):
train a linear classifier on hashed bag-of-words features against weak
labels (a high-precision heuristic gate, or a trusted-corpus sample) and
score the WHOLE corpus with it, keeping docs above a threshold.

Reference scope: beyond nev8rz/VerVectorDB (no text pipeline exists
there); included because every production pretraining pipeline pairs the
heuristic gates (operators/text.py) with a trained scorer — heuristics
catch structure (repetition, length, symbols), the classifier catches
DISTRIBUTION (does this read like the reference corpus?).

Spark-first shape:
  * features = the existing hashed-BoW embedding kernel
    (operators/embed.py, Arrow path) at a wider dim — one map-only pass;
  * training = MLlib LogisticRegression on a BOUNDED labeled sample
    (the fit is iterative and sample-sized, like every codec fit here);
  * serving = the learned (dim+1) weights broadcast as plan literals and
    applied as a FIXED fold + sigmoid column expression — whole-stage
    codegen, zero Python, zero MLlib vector conversion at scan time.
    At 100 TB scoring is a map-only projection over the corpus scan.

The trained weights are data-fit driver state (KB-class, like IVF
centroids); training is iterative and therefore NOT DuckDB-replayable —
the registered query is a rows-only entry by design, with the scoring
fold's parity against NumPy and the classifier's held-out quality pinned
in pytest (tests/test_quality.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: frozen dim-32 classifier fit (training_frame at sf0.001, cap=100k —
#: regenerate with tools/train_frozen_quality.py). Frozen literals keep
#: composed pipelines DuckDB-replayable: trained stages threshold on the
#: LINEAR fold z >= logit(0.5) = 0 (classifier_logit_expr — sigmoid is
#: monotone, and exp() differs by ulps across engines while the fold is
#: bit-exact by contract). Lives HERE (a leaf) so query modules never
#: import weights from each other — the oracle_fragments circularity
#: rationale.
FROZEN_QPW = [3.6962531261217983, 2.914322827031814, 6.936414432953646, 0.0,
              6.7205299109584615, 0.0, 0.0, 2.479778967061197, 0.0,
              7.598455521850792, 6.544311721880588, 0.0, 5.987562683028639,
              3.836514993023476, 3.977681445784043, 0.0, 0.0,
              5.514481423554149, 5.106974138566822, 4.933011139070464,
              7.0687020165042345, 0.0, 0.0, 7.310361398326666,
              4.68653684813062, 3.24360251576791, 6.088338546082627, 0.0,
              0.0, 2.1361529059184328, 0.9675356039672738, 4.74780468999861]
FROZEN_QPB = -16.344886719576053
FROZEN_QPW_SQL = "[" + ", ".join(repr(w) for w in FROZEN_QPW) + "]"


def featurize(docs: DataFrame, dim: int = 256, text_col: str = "text",
              id_col: str = "doc_id", passthrough: bool = False,
              kernel: str = "arrow", widen: bool = True) -> DataFrame:
    """(id, features array<float>) — the hashed-BoW kernel at classifier
    width (L2-normalized counts; map-only Arrow pass). passthrough=True
    keeps EVERY doc column and appends `features` — the shape scoring
    needs to stay a projection on the same frame (no join back)."""
    from vervectordb_spark.operators.embed import embed_documents

    if passthrough and "features" in docs.columns:
        raise ValueError(
            "featurize(passthrough=True) appends a 'features' column but "
            "the input already has one; drop or rename it first")
    out = embed_documents(docs, dim=dim, text_col=text_col, id_col=id_col,
                          kernel=kernel, passthrough=passthrough,
                          widen=widen)
    if passthrough:
        return out.withColumnRenamed("embedding", "features")
    return out.select(F.col("vec_id").alias(id_col),
                      F.col("embedding").alias("features"))


def bounded_split(df: DataFrame, id_col: str = "doc_id",
                  cap: int = 100_000, seed: int = 42) -> DataFrame:
    """Deterministic hash-draw cap for a training split (the train_pq
    sample-cap shape, operators/pq.py — reference bounds its fit sample
    the same way, vervectordb/__init__.py:493-494). Under-cap frames pass
    through IDENTICALLY (the returned object IS df — weights unchanged at
    fixture scale); over-cap corpora keep a ~cap-row subset selected by
    ROW IDENTITY (xxhash64 of the id), so the chosen rows are independent
    of partitioning/run — never sample()+limit(), whose row set is
    partitioning-dependent."""
    if df.limit(cap + 1).count() <= cap:
        return df
    n = df.count()
    denom = 1_000_000
    thr = max(1, int(denom * min(1.0, cap / n)))
    return df.filter(
        F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(denom))
        < F.lit(thr))


def training_frame(docs: DataFrame, dim: int = 256, text_col: str = "text",
                   id_col: str = "doc_id", cut: float = 0.8,
                   cap: int = 100_000, seed: int = 42) -> DataFrame:
    """Bounded (features, label) frame for train_quality_classifier — the
    whole weak-label bootstrap as ONE map-only pass over a hash-draw-capped
    split: cap the split (bounded_split), featurize with passthrough, and
    derive the weak label from the heuristic gate ON THE SAME FRAME — no
    corpus join anywhere, and every LBFGS iteration scans <= cap rows
    regardless of corpus size (at 100 TB the unbounded 80% split would
    make each iteration an ~80 TB pass)."""
    from vervectordb_spark.operators.text import quality_score_expr

    bounded = bounded_split(docs, id_col=id_col, cap=cap, seed=seed)
    # widen=False: this frame feeds MLlib LBFGS (treeAggregate) — its
    # partitioning must not depend on the session's core count, or the
    # trained weights drift by ulps between environments and can flip
    # logit>=0 gates (partitioning.py's fit-input rule; ADVICE r11)
    feats = featurize(bounded, dim=dim, text_col=text_col, id_col=id_col,
                      passthrough=True, widen=False)
    return feats.select(
        F.col("features"),
        (quality_score_expr(text_col) >= float(cut)).cast("int")
        .alias("label"),
    )


def train_quality_classifier(feats: DataFrame, label_col: str = "label",
                             features_col: str = "features",
                             max_iter: int = 50, reg: float = 1e-4,
                             seed: int = 42) -> tuple[list[float], float]:
    """Fit MLlib LogisticRegression on (features array<float>, label) —
    the caller bounds the labeled sample (weak labels are cheap; a few
    10k rows train this). Returns (weights, intercept) — the KB-class
    driver state serving broadcasts. Deterministic for a fixed sample
    (LBFGS from a fixed init; seed kept for API symmetry)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    train = feats.select(
        array_to_vector(F.col(features_col).cast("array<double>"))
        .alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )
    lr = LogisticRegression(maxIter=max_iter, regParam=reg,
                            standardization=False)
    model = lr.fit(train)
    return ([float(w) for w in model.coefficients], float(model.intercept))


def classifier_logit_expr(features: Column, weights: list[float],
                          intercept: float) -> Column:
    """z = b + Σ w_i·x_i as the house FIXED left fold — bit-identical to
    DuckDB `b + list_dot_product(...)` under the cross-engine fold
    contract. Oracle-gated pipelines threshold on THIS (z >= logit(t) ⇔
    sigmoid(z) >= t, sigmoid is monotone): exp() differs by ulps between
    JVM and libm, the fold does not."""
    w = F.array(*[F.lit(float(v)) for v in weights])
    dot = F.aggregate(
        F.zip_with(features.cast("array<double>"), w, lambda x, c: x * c),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    return F.lit(float(intercept)) + dot


def classifier_score_expr(features: Column, weights: list[float],
                          intercept: float) -> Column:
    """sigmoid(b + Σ w_i·x_i) as a FIXED fold column expression — the
    serving path: weights ship as plan literals, the fold runs in
    whole-stage codegen (NumPy-parity pinned in pytest)."""
    z = classifier_logit_expr(features, weights, intercept)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_quality(docs: DataFrame, weights: list[float], intercept: float,
                  dim: int | None = None, text_col: str = "text",
                  id_col: str = "doc_id",
                  out_col: str = "quality") -> DataFrame:
    """Append out_col = the classifier probability for every doc — ONE
    map-only pass: featurize with passthrough (docs.* + features on the
    same frame) then the fold/sigmoid projection. No join, no shuffle —
    plan shape pinned in tests/test_quality.py (0 Exchange)."""
    dim = dim if dim is not None else len(weights)
    if len(weights) != dim:
        raise ValueError(f"weights len {len(weights)} != dim {dim}")
    feats = featurize(docs, dim=dim, text_col=text_col, id_col=id_col,
                      passthrough=True)
    return feats.withColumn(
        out_col,
        classifier_score_expr(F.col("features"), weights, intercept),
    ).drop("features")


def quality_filter(docs: DataFrame, weights: list[float], intercept: float,
                   threshold: float = 0.5, dim: int | None = None,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Keep docs the trained classifier scores >= threshold (the CCNet
    keep-side). Plan shape: scan → featurize (Arrow map) → fold/sigmoid
    projection → filter — no shuffle, no driver-side corpus state."""
    return score_quality(docs, weights, intercept, dim=dim,
                         text_col=text_col, id_col=id_col).filter(
        F.col("quality") >= float(threshold))


def weak_labels_from_gate(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          cut: float = 0.8) -> DataFrame:
    """Weak labels from the repo's own heuristic quality score
    (operators/text.quality_score_expr, the Gopher/C4-style composite) —
    the standard bootstrap when no trusted-corpus sample exists:
    label 1 = score >= cut (conservative pass), 0 = otherwise. High
    precision on the extremes is all the classifier needs; it
    generalizes to the middle."""
    from vervectordb_spark.operators.text import quality_score_expr

    return docs.select(
        id_col,
        (quality_score_expr(text_col) >= float(cut)).cast("int")
        .alias("label"),
    )
