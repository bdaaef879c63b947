from vervectordb_spark.functions.similarity import (
    cosine_expr,
    dot_expr,
    norm_expr,
    query_lit,
    to_double,
)

__all__ = ["cosine_expr", "dot_expr", "norm_expr", "query_lit", "to_double"]
