"""SparkSession factory with scale-oriented defaults.

Tests and bench run on local[N]; the same config flags are the ones that
matter on a 1000-executor cluster: AQE (runtime coalesce + skew-join),
Arrow for the few pandas_udf paths, and a shuffle-partition count sized to
the parallelism actually available.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vervectordb-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime partition coalescing + skew-join splitting. At 100 TB
        # these replace hand-tuned shuffle-partition counts per stage.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transfer for pandas_udf / mapInPandas (PQ codec, multimodal).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # r12: the r11 session-wide shuffled-hash-join preference
        # (preferSortMergeJoin=false + AQE SHJ local-map threshold 128m)
        # is REVERTED on paired interleaved A/B evidence — no net win at
        # either scale (off/on totals: sf0.1 c32 1.00:1.01, sf1 1.00:1.02)
        # and the worst per-entry effects were on the surprisal type
        # joins (bigram +18% sf0.1 / +27% sf1, trigram +29% sf0.1) and
        # tpch_q18 (+34% sf1), vs only mild wins elsewhere; the SHJ build
        # side also cannot spill (OOM envelope at 100 TB, ADVICE r11).
        # Sort-merge + AQE defaults stay the posture.
        # guard-limits (limit(cap+1).collect()) otherwise escalate through
        # up to 5 sequential mini-jobs (1, 4, 16, ... partitions); start at
        # the session's parallelism — parameterized by cores, not a local
        # constant, and bounded extra scan work for point limits
        .config("spark.sql.limit.initialNumPartitions",
                str(int(cpus) if str(cpus).isdigit() else 32))
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or (int(cpus) if str(cpus).isdigit() else 32)),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    # Pin BLAS to one thread PER PYTHON WORKER: parallelism comes from Spark
    # tasks (local[N] runs N workers), so letting every worker's
    # OpenBLAS/MKL spawn N more threads oversubscribes the box N× — measured
    # on the sf1 kNN self-join GEMM: 47 s → 8 s warm once pinned (the kernel
    # was spending ~30% of all CPU in the scheduler). On a real cluster the
    # same flags keep one task = one core.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "NUMEXPR_NUM_THREADS"):
        builder = builder.config(
            f"spark.executorEnv.{var}", os.environ.get(var, "1")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
