"""THE correctness gate mirror: every registered query with an oracle must
hash-match its DuckDB twin at sf0.01 (the driver's correctness SF)."""

from __future__ import annotations

import pytest

from bigdata_storage_and_proccess_job_data_spark.plans import all_queries
from tests.parity import compare, duckdb_connect

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.fixture(scope="module")
def con(oracle_sf_dir):
    c = duckdb_connect(oracle_sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, oracle_sf_dir, con):
    q = QUERIES[name]
    df = q.fn(spark, oracle_sf_dir)
    problems = compare(df, con, q.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark, oracle_sf_dir):
    q = QUERIES[name]
    df = q.fn(spark, oracle_sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
