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


def test_observe_expectations_rides_the_main_action(spark, oracle_sf_dir):
    """The observed counters must equal a dedicated expectation_report
    pass -- but come from the frame's OWN action (a noop write here; no
    second scan). Also pins the placement gotcha: a filter added AFTER
    the observe node does not change the observed counts."""
    from bigdata_storage_and_proccess_job_data_spark.operators import aggregates

    orders = load_table(spark, oracle_sf_dir, "orders")
    checks = {
        "positive_total": F.col("o_totalprice") > 0,
        "priority_known": F.col("o_orderpriority").isNotNull(),
        "impossible_rule": F.col("o_totalprice") > 1e12,  # violations > 0
    }
    observed, obs = aggregates.observe_expectations(orders, checks)
    # downstream work happens on top of the observed frame; metrics
    # reflect rows AT the observe node, not post-filter survivors
    observed.filter(F.col("o_totalprice") > 100000).write.format(
        "noop"
    ).mode("overwrite").save()
    got = obs.get

    want = aggregates.expectation_report(orders, checks).first().asDict()
    assert got == want
    assert got["n_rows"] == orders.count()
    assert got["impossible_rule"] == got["n_rows"]
    assert got["positive_total"] == 0
