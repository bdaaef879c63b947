"""Shared PQ oracle-SQL fragments — a LEAF module (the
functions/oracle_fragments rationale: queries_imi composes queries_pq's
frozen-codebook / ADC fragments, and importing them across query modules
breaks under direct-entry import order)."""

from __future__ import annotations

SUB_DIM = 8
N_SUB = 8
N_CODES = 16
NPROBE = 8
RERANK_FETCH = 50  # rerank_factor 5 x top_k 10

#: DuckDB twin of the frozen codebook construction
CB_SQL = f"""
  SELECT t.s::INT AS subspace, e.vec_id::INT AS code,
         list_slice(e.embedding::DOUBLE[], t.s*{SUB_DIM}+1, t.s*{SUB_DIM}+{SUB_DIM}) AS centroid
  FROM embeddings e, range({N_SUB}) t(s)
  WHERE e.vec_id < {N_CODES}
"""

CODE_DIFF = f"list_transform(range(1, {SUB_DIM}+1), i -> sl[i] - centroid[i])"

COS = (
    "(CASE WHEN list_dot_product({a}, {a}) = 0 OR list_dot_product({b}, {b}) = 0 "
    "THEN 0.0 ELSE list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))) END)"
)


def seq_sum(col: str) -> str:
    """Left-associative m-term sum lut[1]+...+lut[m] — the oracle twin of
    the ADC kernel's subspace-ordered accumulation."""
    out = f"{col}[1]"
    for i in range(2, N_SUB + 1):
        out = f"({out} + {col}[{i}])"
    return out
