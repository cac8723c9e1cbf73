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


def test_count_distinct_spread_ignores_null_values(spark):
    """COUNT(DISTINCT v) and size(collect_set(v)) both skip NULLs; the
    skew-safe pair rewrite must agree -- including a key whose values
    are ALL null (present, count 0), and a key with a null mixed in
    (the null adds nothing)."""
    from bigdata_storage_and_proccess_job_data_spark.operators import aggregates

    df = spark.createDataFrame(
        [("k1", None), ("k1", "a"), ("k1", "a"), ("k2", None), ("k2", None)],
        "k STRING, v STRING",
    )
    spread = {
        r.key: r.n_distinct
        for r in aggregates.count_distinct_spread(df, "k", "v").collect()
    }
    naive = {
        r.k: r.n
        for r in df.groupBy("k")
        .agg(F.size(F.collect_set("v")).alias("n"))
        .collect()
    }
    assert spread == naive == {"k1": 1, "k2": 0}
