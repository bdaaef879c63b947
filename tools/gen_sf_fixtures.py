#!/usr/bin/env python
"""Generate larger-sf fixtures by deterministic upscale of an existing sf dir.

Usage: python tools/gen_sf_fixtures.py [--factor 10] [--src /root/testdata/sf0.1]
                                       [--dest /root/repo/fixtures/sf1]

The driver's fixtures stop at sf0.1; the scale story ("would this plan
survive 10-100x?") needs a bigger measured point. Rather than re-deriving
the driver's generator, each table is replicated `factor` times with all
keys shifted by a per-replica stride (max_key+1), so:

  * every distribution (value ranges, category frequencies, text shape,
    timestamps) is preserved EXACTLY by construction;
  * join fanouts (orders per customer, lineitems per order, events per
    user) are preserved exactly — replicas never cross-join;
  * the dup-cluster-size distribution is preserved: replica 1 keeps an
    exact copy (constant dedup load — one dup pair per source doc at any
    factor) while replicas >= 2 are strongly mutated (documents) or
    re-drawn (embeddings) into DISTINCT content. Cluster sizes must not
    scale with the factor: pair-emitting dedup/ANN queries output
    Σ|cluster|² rows, so factor-sized clusters make them quadratic in sf
    by construction — a fixture artifact that masks real engine scaling;
  * region/nation stay fixed (dimension tables don't scale — same as TPC-H).

Fully distributed: one crossJoin(range(factor)) + column exprs per table,
no driver-side data. Deterministic: no RNG — perturbations are
xxhash64-derived.

IMPORTANT: generate every scale in ONE step from the driver base
(--factor 100 for sf10), never by chaining upscales (sf0.1 -> sf1 ->
sf10). The "replica 1 = exact copy" rule composes under chaining: a
two-step sf10 gives each source doc a 4-clique of exact copies (orig,
step-1 copy, step-2 copies of both) — 6 dup pairs per source instead of
1 — which inflates every pair-emitting dedup/winnow query ~6x with a
fixture artifact, not engine load (measured: winnow_overlap 8.5 s ->
58 s at sf10 from exactly this).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

#: key columns shifted by (replica * stride) — stride = max(key)+1 of the
#: column's OWNING table, reused for foreign keys so joins stay intra-replica
KEYED = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

#: where each stride key is owned (table, column)
STRIDE_SOURCE = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def upscale(df: DataFrame, table: str, factor: int, strides: dict) -> DataFrame:
    rep = df.sparkSession.range(factor).select(F.col("id").alias("_rep"))
    out = df.crossJoin(rep)
    for col, skey in KEYED.get(table, {}).items():
        dtype = df.schema[col].dataType.simpleString()
        out = out.withColumn(
            col, (F.col(col) + F.col("_rep") * F.lit(strides[skey])).cast(dtype)
        )
    if table == "documents":
        # replica 0 = original, 1 = exact copy (dedup load), >=2 = every 3rd
        # word replaced with a replica-unique token. The heavy mutation is
        # deliberate: the upscale must hold the DUP-CLUSTER-SIZE distribution
        # constant (more clusters, not bigger ones). A light mutation leaves
        # every replica a near-dup of its source, so cluster size grows with
        # the factor and pair-emitting dedup queries (output Σ|cluster|²)
        # go quadratic in sf by construction — measured 42-68x per 10x sf
        # before this change, a fixture artifact, not engine scaling.
        # Every-3rd-word replacement drops shingle Jaccard to ~0.17 between
        # any two replicas (and replica vs source) — below band-collision
        # range — while preserving text length/shape.
        out = out.withColumn(
            "text",
            F.when(F.col("_rep") <= 1, F.col("text")).otherwise(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w, i: F.when(
                            (i + F.col("_rep")) % 3 == 0,
                            F.concat(
                                F.lit("w"), F.col("_rep").cast("string"),
                                F.lit("x"), i.cast("string"),
                            ),
                        ).otherwise(w),
                    ),
                )
            ),
        ).withColumn("n_chars", F.length("text").cast(df.schema["n_chars"].dataType.simpleString()))
    if table == "embeddings":
        # replica 0 = original; replica 1 = tiny perturbation (cosine
        # ~1-1e-4 to the source — the near-dup dedup load, not bit-equal);
        # replicas >= 2 are RE-DRAWN vectors: each element is an
        # Irwin-Hall sum of three xxhash uniforms, i.e. ~N(0, 0.15) like
        # the source distribution but INDEPENDENT of it. Same cluster-size
        # rationale as documents: tiny-perturbing every replica gives each
        # source vector `factor` near-identical copies that no LSH width
        # can separate (identical signatures), so self-join pair volume
        # grows quadratically in sf — fixture artifact, not engine scaling.
        def _u(i, j):
            return (
                F.pmod(
                    F.xxhash64(F.col("vec_id"), i, F.col("_rep"), F.lit(j)),
                    F.lit(1000),
                ).cast("double")
                / F.lit(1000.0)
            )

        out = out.withColumn(
            "embedding",
            F.when(F.col("_rep") == 0, F.col("embedding"))
            .when(
                F.col("_rep") == 1,
                F.transform(
                    F.col("embedding"),
                    lambda x, i: (
                        x
                        + (
                            F.pmod(
                                F.xxhash64(F.col("vec_id"), i, F.col("_rep")),
                                F.lit(1000),
                            )
                            - F.lit(500)
                        ).cast("float")
                        * F.lit(1e-6)
                    ).cast("float"),
                ),
            )
            .otherwise(
                F.transform(
                    F.col("embedding"),
                    lambda x, i: (
                        (_u(i, 1) + _u(i, 2) + _u(i, 3) - F.lit(1.5))
                        * F.lit(0.3)
                    ).cast("float"),
                )
            ),
        )
    if table == "events":
        # shift replica timestamps by a few minutes so hourly buckets don't
        # collapse onto identical (bucket, type) keys 10x deep
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":  # epoch-nanos generation
            out = out.withColumn(
                "ts", F.col("ts") + F.col("_rep") * F.lit(137_000_000_000)
            )
        else:
            out = out.withColumn(
                "ts",
                (F.col("ts").cast("timestamp")
                 + F.make_interval(secs=F.col("_rep") * F.lit(137))
                 ).cast(ts_type),
            )
    return out.drop("_rep")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default="/root/repo/fixtures/sf1")
    ap.add_argument("--min-files", type=int, default=16,
                    help="minimum output files per fact table")
    ap.add_argument("--tables", default=None,
                    help="space-separated subset to generate (default all) "
                         "— e.g. 'documents embeddings' for a huge-factor "
                         "probe of just the text/vector paths")
    args = ap.parse_args()

    from vervectordb_spark.session import get_spark

    spark = get_spark("gen-sf-fixtures")
    spark.sparkContext.setLogLevel("ERROR")

    wanted = (args.tables.split() if args.tables else
              ("region nation customer supplier part orders lineitem events "
               "documents embeddings").split())
    tables = {}
    for t in wanted:
        tables[t] = spark.read.parquet(f"{args.src}/{t}.parquet")

    strides = {
        key: tables[t].agg(F.max(col)).collect()[0][0] + 1
        for key, (t, col) in STRIDE_SOURCE.items()
        if t in tables
    }
    print(f"strides: {strides}")

    os.makedirs(args.dest, exist_ok=True)
    for t, df in tables.items():
        if t in ("region", "nation"):
            out = df
        else:
            out = upscale(df, t, args.factor, strides)
            # spread output over enough files that scans parallelize the way
            # a real deployment's would (the upscale crossJoin preserves the
            # source's partition count, so a 10x table would otherwise land
            # in 2-3 files and every downstream scan gets 2-3 tasks)
            out = out.repartition(max(args.min_files, args.factor))
        # single parquet prefix per table (the loaders read a path, dirs ok)
        out.write.mode("overwrite").parquet(f"{args.dest}/{t}.parquet")
        n = spark.read.parquet(f"{args.dest}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    print(f"done -> {args.dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
