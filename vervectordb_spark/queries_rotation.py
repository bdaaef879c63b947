"""Structured-rotation query registrations (operators/rotation.py): the
HD (Hadamard x deterministic signs) pre-transform and BQ serving behind
it.

Oracle pattern: the rotation's only inexact ops are float64 butterfly
adds in a FIXED association (the module contract), so DuckDB replays the
rotation itself — one chained list_transform stage per butterfly, the
exact arithmetic in the exact order — with the +-1 sign diagonal shipped
as a 64-literal array (KB-class frozen state, like IVF centroids). The
query vector is fixture row 0, so the "rotated query" in the serving
oracle is just the rotated corpus row 0: nothing crosses engines except
the seed-derived signs.

  hd_rotate_profile   pins rotated coordinates + the preserved norm for
                      every vector (orthonormality is gated, not assumed)
  bq_search_rotated   end-to-end rotated-BQ serving: midrange thresholds
                      on ROTATED coordinates -> 60-bit packed words ->
                      integer Hamming scan -> exact raw-cosine rerank
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.operators.rotation import hd_signs
from vervectordb_spark.queries import _cos, _query_vec, query
from vervectordb_spark.schema import load_table

_DIM = 64
_W = 60
_SIGNS = hd_signs(_DIM)  # deterministic, md5-derived (seed 42)


def _rotate_ctes(src: str = "embeddings", emb: str = "embedding") -> str:
    """WITH-fragment computing rot(vec_id, h): the module's association
    contract as chained list_transform stages. Branch selection uses
    (i // b) % 2 (no engine-specific bitwise ops); for a single bit b,
    i|b == i+b on the unset branch and i^b == i-b on the set branch."""
    signs_sql = "[" + ", ".join(f"{s:.1f}" for s in _SIGNS) + "]::DOUBLE[]"
    parts = [
        f"h0 AS (SELECT vec_id, list_transform(range(0, {_DIM}), "
        f"i -> ({emb}::DOUBLE[])[i + 1] * ({signs_sql})[i + 1]) AS h "
        f"FROM {src})"
    ]
    n = 0
    b = 1
    while b < _DIM:
        n += 1
        parts.append(
            f"h{n} AS (SELECT vec_id, list_transform(range(0, {_DIM}), "
            f"i -> CASE WHEN (i // {b}) % 2 = 0 "
            f"THEN h[i + 1] + h[i + {b} + 1] "
            f"ELSE h[i - {b} + 1] - h[i + 1] END) AS h FROM h{n - 1})"
        )
        b <<= 1
    scale = 1.0 / float(_DIM) ** 0.5
    parts.append(
        f"rot AS (SELECT vec_id, list_transform(h, v -> v * {scale!r}) "
        f"AS h FROM h{n})"
    )
    return ",\n".join(parts)


@query(
    "hd_rotate_profile",
    oracle=f"""
WITH {_rotate_ctes()}
SELECT vec_id,
       ROUND(h[1], 6) + 0.0 AS r0,
       ROUND(h[32], 6) + 0.0 AS r31,
       ROUND(h[64], 6) + 0.0 AS r63,
       ROUND(sqrt(list_dot_product(h, h)), 6) AS nrm
FROM rot
""",
)
def hd_rotate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HD-rotate the whole embeddings fixture with the expr kernel
    (sign-flip + log2(64)=6 butterfly projections + exact 1/8 scale, all
    codegen, map-only) and pin three rotated coordinates plus the vector
    norm for EVERY row — coordinates gate the butterflies bit-for-bit
    (after round-6), the norm gates orthonormality."""
    from vervectordb_spark.functions.similarity import dot_expr
    from vervectordb_spark.operators.rotation import with_rotation

    emb = load_table(spark, sf_dir, "embeddings")
    rot = with_rotation(emb, _DIM, kernel="expr")
    h = F.col("emb_rot")
    # + 0.0 canonicalizes the rounded coordinates' zero sign: duckdb's
    # ROUND of a tiny negative yields -0.0 where Spark's yields +0.0, and
    # the hash gate compares reprs (IEEE: -0.0 + 0.0 == +0.0 in both).
    # Applies to any rounded SIGNED near-zero output column.
    return rot.select(
        "vec_id",
        (F.round(F.element_at(h, 1), 6) + 0.0).alias("r0"),
        (F.round(F.element_at(h, 32), 6) + 0.0).alias("r31"),
        (F.round(F.element_at(h, 64), 6) + 0.0).alias("r63"),
        F.round(F.sqrt(dot_expr(h, h)), 6).alias("nrm"),
    )


@query(
    "bq_search_rotated",
    oracle=f"""
WITH {_rotate_ctes()},
thr AS (
  SELECT t.pos::INT AS pos,
         (MIN(r.h[t.pos + 1]) + MAX(r.h[t.pos + 1])) / 2.0 AS thr
  FROM rot r CROSS JOIN range({_DIM}) t(pos)
  GROUP BY 1
),
words AS (
  SELECT r.vec_id, (s.pos // {_W})::INT AS w,
         CAST(SUM(CASE WHEN r.h[s.pos + 1] > s.thr
                       THEN 1::BIGINT << (s.pos % {_W}) ELSE 0 END)
              AS BIGINT) AS word
  FROM rot r CROSS JOIN thr s
  GROUP BY 1, 2
),
qwords AS (SELECT w, word FROM words WHERE vec_id = 0),
ham AS (
  SELECT wo.vec_id,
         CAST(SUM(bit_count(xor(wo.word, qw.word))) AS BIGINT) AS hamming
  FROM words wo JOIN qwords qw USING (w)
  GROUP BY wo.vec_id
),
cand AS (SELECT vec_id, hamming FROM ham ORDER BY hamming, vec_id LIMIT 30),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, hamming, ROUND(sim, 6) AS sim FROM (
  SELECT e.vec_id, c.hamming,
         {_cos('e.embedding::DOUBLE[]', 'q.qv')} AS sim
  FROM embeddings e JOIN cand c USING (vec_id) CROSS JOIN q
  ORDER BY sim DESC, e.vec_id LIMIT 10
)
""",
)
def bq_search_rotated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rotated-BQ end-to-end serving (operators/rotation.rotated_bq_search):
    HD-rotate corpus AND query with the same (dim, seed), midrange
    thresholds + 60-bit packing in the ROTATED coordinate system, integer
    Hamming scan (2 BIGINTs/row), exact cosine rerank of the top-30 on
    the RAW vectors (rotation preserves cosine, so the final metric is
    the same one every other serving path reports). Hamming distances and
    final sims both cross the hash gate — the rotation, fit, pack, scan,
    and rerank all replay in DuckDB."""
    from vervectordb_spark.operators.rotation import rotated_bq_search

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    out = rotated_bq_search(emb, qv, _DIM, top_k=10, rerank_factor=3)
    return out.select("vec_id", "hamming", F.round("sim", 6).alias("sim"))


@query(
    "opq_rotate_profile",
    oracle=f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       ROUND(sqrt(list_dot_product(e.embedding::DOUBLE[],
                                   e.embedding::DOUBLE[])), 4) + 0.0 AS nrm,
       ROUND({_cos('e.embedding::DOUBLE[]', 'q.qv')}, 4) + 0.0 AS csim
FROM embeddings e CROSS JOIN q
""",
)
def opq_rotate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARNED-rotation profile (operators/opq.py): fit the OPQ-lite
    orthonormal R on the fixture (deterministic vec_id-ordered sample),
    rotate every vector with the EXPR kernel (per-output-dim FIXED folds
    — the oracle-replayable spec), and return per row the rotated norm
    and the rotated cosine to the rotated query row 0.

    The gate is the ORTHONORMALITY INVARIANT, computed independently by
    each engine: R never crosses engines (it is data-fit state DuckDB
    cannot derive) — instead DuckDB computes the same norms and cosines
    from the RAW vectors, which a genuine rotation must preserve. Rounded
    to 4 decimals: float64 rotation drift is ~1e-12 relative, seven
    orders below the gate's resolution (vs round-6 for the frozen-state
    queries whose two sides run IDENTICAL arithmetic)."""
    from vervectordb_spark.functions.similarity import cosine_expr, dot_expr
    from vervectordb_spark.operators.opq import (
        fit_learned_rotation,
        rotate_query_learned,
        with_learned_rotation,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    R = fit_learned_rotation(emb, _DIM, seed=42, order_col="vec_id")
    qv = _query_vec(spark, sf_dir, 0)
    q_rot = rotate_query_learned(qv, R)
    rot = with_learned_rotation(emb, R, _DIM, kernel="expr")
    h = F.col("emb_lrot")
    return rot.select(
        "vec_id",
        (F.round(F.sqrt(dot_expr(h, h)), 4) + 0.0).alias("nrm"),
        (F.round(cosine_expr(h, q_rot), 4) + 0.0).alias("csim"),
    )
