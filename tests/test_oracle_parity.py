"""Every registered query must hash-match its DuckDB oracle at sf0.001
(the driver repeats this at sf0.01 — same contract, bigger data)."""

import math

import pytest

from tests.conftest import SF_DIR
from vervectordb_spark import queries as registry


def canon(pdf):
    cols = sorted(pdf.columns)
    rows = []
    for _, r in pdf[cols].iterrows():
        cells = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                cells.append("nan" if math.isnan(v) else repr(float(v)))
            else:
                cells.append(repr(v))
        rows.append("|".join(cells))
    return cols, sorted(rows)


ORACLE_QUERIES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, duck):
    sdf = registry.QUERIES[name](spark, SF_DIR).toPandas()
    ddf = duck.sql(registry.ORACLES[name]).df()
    assert canon(sdf) == canon(ddf), f"{name} diverges from oracle"


ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(name, spark):
    sdf = registry.QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0
