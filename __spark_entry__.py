"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — every implemented operator from SURVEY.md §2 + extensions.
oracle_sql()  — DuckDB twins, hash-compared at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vervectordb_spark import queries as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 milestone 0): filtered exact top-k —
    top-10 cosine neighbors of embeddings[vec_id=0] among rows whose joined
    document matches a keyword filter. Exercises scan → join → similarity
    expression → filter → distributed top-k in one plan."""
    return _registry.QUERIES["topk_keyword_filter"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_registry.ORACLES)
