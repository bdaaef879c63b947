"""Deterministic hash-based sampling — training-mix construction.

`df.sample()` is seed-stable only for a fixed partitioning; repartition the
corpus and the sample changes. A training pipeline needs sampling that is a
PURE FUNCTION OF THE ROW (reproducible across runs, engines, partitionings,
and incremental additions), so these operators derive a uniform [0,1) draw
from the portable md5-60-bit family (functions/hashing.py):

    u(row) = md5_60("sample:<seed>:" || id) / 2^60

Membership is then `u < fraction` — per-stratum fractions give weighted
training mixes, disjoint [lo, hi) bands give train/eval/test splits that
can never leak rows into each other.

Scale posture: pure map-side column expressions (whole-stage codegen, no
UDF, no shuffle, no state). Filters push into the scan. Adding documents
never changes the membership of existing ones — incremental-crawl safe.
DuckDB twin: ('0x' || substr(md5(s),1,15))::BIGINT / 2^60, bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vervectordb_spark.functions.hashing import HASH_BITS, md5_long

#: 2^60 as an exact double. NB: a 60-bit hash exceeds double's 53-bit
#: mantissa, so h/2^60 is the correctly-ROUNDED draw (identical rounding
#: on every IEEE engine — still bit-stable cross-engine) and can round up
#: to exactly 1.0 for the top ~128 hash values; the split/sample
#: operators treat the unit interval as closed above for that corner.
_HASH_SPACE = float(1 << HASH_BITS)


def hash_uniform_expr(id_col: Column | str, seed: int = 42) -> Column:
    """Deterministic uniform [0,1) draw per row: md5_60 of the seeded id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = md5_long(F.concat(F.lit(f"sample:{seed}:"), c.cast("string")))
    return h.cast("double") / F.lit(_HASH_SPACE)


def hash_sample(df: DataFrame, id_col: str, fraction: float,
                seed: int = 42) -> DataFrame:
    """Keep ~fraction of rows, chosen by the row's own hash draw.

    fraction >= 1.0 keeps EVERYTHING: the double cast of a 60-bit hash
    rounds the top ~128 values up to exactly 1.0 (53-bit mantissa), so a
    strict `u < 1.0` filter would drop ~1e-16 of rows."""
    if fraction >= 1.0:
        return df
    return df.filter(hash_uniform_expr(id_col, seed) < float(fraction))


def stratified_hash_sample(df: DataFrame, strata_col: str,
                           fractions: dict[str, float], id_col: str,
                           seed: int = 42,
                           default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum sampling rates — the training-mix operator ("50% of en,
    20% of zh, drop the rest"). The rate lookup is a literal CASE chain
    (strata counts are small); membership stays a pure row function."""
    rate = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        rate = F.when(F.col(strata_col) == value, float(frac)).otherwise(rate)
    # a stratum at fraction >= 1.0 is exact-keep (the hash_sample corner:
    # the top ~128 hash values round to exactly 1.0 in the double cast)
    return df.filter((rate >= F.lit(1.0))
                     | (hash_uniform_expr(id_col, seed) < rate))


def split_column_expr(id_col: Column | str, splits: dict[str, float],
                      seed: int = 42) -> Column:
    """Assign each row to a named split by disjoint [lo, hi) hash bands,
    e.g. {"train": 0.98, "eval": 0.01, "test": 0.01} (must sum to ≤1;
    remainder maps to NULL). Bands are cumulative in sorted-name order, so
    the assignment is stable and splits can never overlap."""
    u = hash_uniform_expr(id_col, seed)
    expr = F.lit(None).cast("string")
    lo = 0.0
    names = sorted(splits.items())
    for i, (name, width) in enumerate(names):
        hi = lo + float(width)
        # when the bands cover the whole unit interval, the LAST band is
        # closed above: u can be exactly 1.0 (60-bit hash rounded up in
        # the double cast), and [lo, 1.0) would leave those rows NULL
        closed = i == len(names) - 1 and hi >= 1.0 - 1e-12
        upper = (u <= hi) if closed else (u < hi)
        expr = F.when((u >= lo) & upper, F.lit(name)).otherwise(expr)
        lo = hi
    if lo > 1.0 + 1e-9:
        raise ValueError(f"split widths sum to {lo} > 1")
    return expr


def train_eval_split(df: DataFrame, id_col: str,
                     splits: dict[str, float], seed: int = 42,
                     split_col: str = "split") -> DataFrame:
    """Add a `split` column from disjoint hash bands (rows beyond the
    bands' total mass get NULL — "unassigned")."""
    return df.withColumn(split_col, split_column_expr(id_col, splits, seed))


def mix_to_target(df: DataFrame, strata_col: str, targets: dict[str, float],
                  id_col: str, total: int, seed: int = 42) -> DataFrame:
    """Resample to a TARGET domain mix: keep ≈ total·targets[s] rows of
    stratum s, whatever its observed share is (the "rebalance the training
    mix to 40% en / 15% each else" operator).

    Per-stratum acceptance rates are target_count / observed_count,
    clamped to 1 (an under-represented stratum is kept whole — this
    operator never upsamples). The observed counts come from ONE small
    aggregate joined back by broadcast — no driver collect, so the plan
    composes lazily — and membership stays the same pure-row hash draw as
    hash_sample: reproducible across runs, engines, and partitionings.

    Scale posture: one groupBy on the stratum key (#strata rows out),
    broadcast join of that tiny table, then a map-side filter. At 100 TB
    this is a scan + one metadata-sized shuffle.
    """
    rate_rows = [(s, float(share)) for s, share in sorted(targets.items())]
    tgt = df.sparkSession.createDataFrame(
        rate_rows, f"{strata_col} string, _target_share double"
    )
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n_stratum"))
    rates = counts.join(tgt, on=strata_col, how="inner").select(
        strata_col,
        F.least(
            F.lit(1.0),
            (F.col("_target_share") * F.lit(float(total)))
            / F.col("_n_stratum").cast("double"),
        ).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), on=strata_col, how="inner")
        .filter(_keep_at_rate(id_col, seed))
        .drop("_rate")
    )


def _keep_at_rate(id_col: str, seed: int) -> Column:
    """Keep predicate for a broadcast `_rate` column: a stratum whose
    rate clamps to exactly 1.0 is EXACT-KEEP (never loses the ~128 hash
    values whose 60-bit draw rounds up to 1.0 in the double cast — the
    hash_sample docstring corner); everything else is the strict
    `u < rate` draw. Mirrored verbatim in every mix oracle SQL."""
    return (F.col("_rate") >= F.lit(1.0)) | (
        hash_uniform_expr(id_col, seed) < F.col("_rate"))


def weighted_sample_key_expr(id_col: Column | str, weight_col: Column | str,
                             seed: int = 42) -> Column:
    """Efraimidis–Spirakis (2006) A-ES sampling key: ln(u)/w with the
    deterministic hash draw u ∈ (0, 1] (the +1 keeps ln finite at the
    2^-60 corner). Taking the k LARGEST keys is a weighted random sample
    without replacement — P(row drawn next) ∝ w among the remaining —
    but as a pure row function it is distributed-friendly: a global
    top-k (TakeOrderedAndProject) or a per-stratum window rank, no
    sequential reservoir state.

    Float caveat (same as BM25's, operators/hybrid.py): ln() is not
    bit-portable across libm implementations, so callers that cross the
    oracle gate ROUND the key (9 dp) and tie-break on id — order is
    preserved wherever keys differ meaningfully, and sub-rounding ties
    collapse to the deterministic id order on both engines."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = md5_long(F.concat(F.lit(f"sample:{seed}:"), c.cast("string")))
    u = (h.cast("double") + F.lit(1.0)) / F.lit(_HASH_SPACE)
    return F.log(u) / w.cast("double")


def weighted_sample(df: DataFrame, id_col: str, weight_col: str, k: int,
                    seed: int = 42, strata_col: str | None = None,
                    key_col: str = "skey") -> DataFrame:
    """Top-k weighted sample: global (orderBy().limit() →
    TakeOrderedAndProject, never a full sort) or per-stratum (window
    rank over the stratum key — parallel across strata). Weights must be
    > 0; rows with NULL/non-positive weight are excluded (a zero weight
    means "never sample")."""
    w = F.col(weight_col).cast("double")
    keyed = df.filter(w.isNotNull() & (w > 0.0)).withColumn(
        key_col, weighted_sample_key_expr(id_col, weight_col, seed)
    )
    if strata_col is None:
        return keyed.orderBy(F.desc(key_col), F.asc(id_col)).limit(k)
    from pyspark.sql import Window

    win = Window.partitionBy(strata_col).orderBy(
        F.desc(key_col), F.asc(id_col)
    )
    return (
        keyed.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def mix_by_temperature(df: DataFrame, strata_col: str, id_col: str,
                       total: int, alpha: float = 0.5,
                       seed: int = 42) -> DataFrame:
    """Temperature-flattened domain mix: target shares ∝ n_s^alpha
    (alpha < 1 upweights tail domains, alpha = 1 keeps the natural mix —
    the multilingual/multi-source sampling rule of mBERT/XLM-R-style
    training mixes), realized with the same pure-row hash draw as
    mix_to_target. Never upsamples (rates clamp to 1).

    Float contract (the queries.py rules): the share denominator
    D = Σ n_s^alpha accumulates in SORTED-stratum order via a running
    window sum over the strata-sized count table — a deterministic
    sequential fold both engines replay bit-identically, where a plain
    SUM's addend order is engine-internal. alpha = 0.5 evaluates as
    sqrt() — an exactly-rounded IEEE op on every engine, unlike pow —
    so the default temperature gates bit-exact; other alphas ride
    Math.pow parity (pinned at fixture scale, not contractual).

    Scale posture: one groupBy on the stratum key (#strata rows), a
    #strata-row window, broadcast rate join, map-side filter — the
    mix_to_target shape with the targets computed in-plan."""
    from pyspark.sql import Window

    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    nd = F.col("_n").cast("double")
    wcol = F.sqrt(nd) if alpha == 0.5 else F.pow(nd, F.lit(float(alpha)))
    w = (Window.orderBy(strata_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    run = counts.withColumn("_w", wcol).withColumn(
        "_run", F.sum("_w").over(w))
    # running sums of positive weights are increasing: MAX(_run) is the
    # last prefix value == the sequential-fold total D
    d = run.agg(F.max("_run").alias("_D"))
    rates = run.crossJoin(F.broadcast(d)).select(
        strata_col,
        F.least(
            F.lit(1.0),
            ((F.col("_w") / F.col("_D")) * F.lit(float(total))) / nd,
        ).alias("_rate"))
    return (df.join(F.broadcast(rates), on=strata_col, how="inner")
            .filter(_keep_at_rate(id_col, seed))
            .drop("_rate"))


def ntile_bucket_sample(df: DataFrame, score_col: str, id_col: str,
                        rates: dict[int, float],
                        strata_col: str | None = None,
                        n_buckets: int = 3, seed: int = 42,
                        bucket_col: str = "bucket") -> DataFrame:
    """Score-bucketed sampling — the CCNet recipe: rank rows by a quality
    score (LM surprisal) within each stratum, cut into n_buckets NTILE
    bands (1 = best/lowest score = "head"), keep each band at its own
    rate via the pure-row hash draw. CCNet keeps head+middle and thins
    the tail; the band rates are the caller's policy knob.

    Determinism: the NTILE orders by (score, id) — ties collapse to id
    order, so band membership is a pure function of the data (replays on
    any engine). Rates >= 1.0 are exact-keep (the hash_sample corner).

    Scale posture: ONE stratum-key window over (score, id) — the only
    corpus-sized shuffle — then a map-side CASE rate + hash-draw filter.
    The score column itself is typically a surprisal operator's output
    (its own shuffles are accounted there)."""
    from pyspark.sql import Window

    w = (Window.partitionBy(strata_col) if strata_col is not None
         else Window.partitionBy(F.lit(0))).orderBy(score_col, id_col)
    out = df.withColumn(bucket_col, F.ntile(n_buckets).over(w))
    rate = F.lit(0.0)
    for b, r in sorted(rates.items()):
        rate = F.when(F.col(bucket_col) == int(b), float(r)).otherwise(rate)
    return out.filter((rate >= F.lit(1.0))
                      | (hash_uniform_expr(id_col, seed) < rate))
