"""Analytics operators beyond the oracle gate: approx-distinct accuracy,
rollup structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.catalog import load_table


def test_approx_distinct_within_tolerance(spark, oracle_sf_dir):
    orders = load_table(spark, oracle_sf_dir, "orders")
    both = orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    )
    for r in both.collect():
        assert abs(r.approx - r.exact) / r.exact < 0.05, r


def test_rollup_has_subtotals_and_grand_total(spark, oracle_sf_dir):
    from bigdata_storage_and_proccess_job_data_spark.plans.analytics_queries import (
        region_rollup,
    )

    rows = region_rollup(spark, oracle_sf_dir).collect()
    grand = [r for r in rows if r.region is None and r.country is None]
    region_subs = [r for r in rows if r.region is not None and r.country is None]
    details = [r for r in rows if r.country is not None]
    assert len(grand) == 1
    assert grand[0].customer_count == sum(r.customer_count for r in details)
    assert len(region_subs) == 5
