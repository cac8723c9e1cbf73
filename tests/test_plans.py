"""Physical-plan regression tests: the properties that make these
queries scale must stay in the plan, not just in docstrings.

- filter pushdown reaches the parquet scan (PushedFilters)
- column pruning reaches the scan (ReadSchema carries only needed cols)
- dimension joins broadcast (no shuffle of the fact side for dims)
- aggregations are partial+final (map-side combine)
"""

from __future__ import annotations

import pytest

from bigdata_storage_and_proccess_job_data_spark.plans import all_queries

QS = all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    return (
        QS[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )


def test_filter_pushdown_and_pruning(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    read_schema = plan.split("ReadSchema:")[1]
    # 6 needed columns only -- no l_orderkey/l_partkey/... in the scan
    assert "l_orderkey" not in read_schema.split("struct<")[1][:200]


def test_partial_final_aggregation(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "pricing_summary")
    assert "partial_sum" in plan and plan.count("HashAggregate") >= 2


def test_dimension_joins_broadcast(spark, oracle_sf_dir):
    for name in ["company_stats_v2", "location_stats", "currency_convert"]:
        plan = _plan(spark, oracle_sf_dir, name)
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast join"
        assert "SortMergeJoin" not in plan, f"{name} shuffles a dim join"


def test_anti_join_is_join_not_subquery_scan(spark, oracle_sf_dir):
    plan = _plan(spark, oracle_sf_dir, "customers_without_orders")
    assert "LeftAnti" in plan


@pytest.mark.parametrize("name", ["dedup_latest", "topk_per_group"])
def test_window_queries_single_shuffle(spark, oracle_sf_dir, name):
    plan = _plan(spark, oracle_sf_dir, name)
    # one hash-partition exchange for the window, nothing else
    assert plan.count("Exchange hashpartitioning") == 1, plan
