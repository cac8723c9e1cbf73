"""Bucketed co-located joins: both sides bucketed by the join key with
the same bucket count => sort-merge join with ZERO Exchange in the plan
(the write-once/join-many layout for repeated fact-fact joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
from bigdata_storage_and_proccess_job_data_spark.sources import lake

N_BUCKETS = 8


@pytest.fixture()
def no_broadcast(spark):
    # force SMJ so the exchange-free property is actually exercised
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    yield
    for k, v in prev.items():
        spark.conf.set(k, v) if v is not None else spark.conf.unset(k)


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    lake.write_bucketed(
        orders, "b_orders", "o_orderkey", N_BUCKETS,
        path=str(tmp_path / "b_orders"), sort_key="o_orderkey",
    )
    lake.write_bucketed(
        lineitem, "b_lineitem", "l_orderkey", N_BUCKETS,
        path=str(tmp_path / "b_lineitem"), sort_key="l_orderkey",
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_broadcast, bucketed_tables):
    joined = (
        spark.table("b_orders")
        .join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must be exchange-free; the final small groupBy agg
    # legitimately shuffles its partial results
    join_part = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part, f"bucketed join shuffled:\n{plan}"

    # same result as the plain (shuffling) join
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    expected = {
        (r.o_orderpriority, r.n)
        for r in orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {(r.o_orderpriority, r.n) for r in joined.collect()} == expected


def test_bucketed_groupby_skips_exchange(spark, no_broadcast, bucketed_tables):
    # aggregation on the bucket key reuses the on-disk hash partitioning
    agg = (
        spark.table("b_lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucket-key groupBy shuffled:\n{plan}"


def test_bench_join_twin_equal_results_and_exchange_free(spark, sf_dir):
    """The bench twin pair join_bucketed/join_shuffled returns identical
    results, and the bucketed plan carries NO Exchange while the
    shuffled twin carries one per side."""
    from bigdata_storage_and_proccess_job_data_spark.plans import bench_probes

    b = bench_probes.join_bucketed(spark, sf_dir)
    s = bench_probes.join_shuffled(spark, sf_dir)
    rb = {r.o_orderpriority: (r.volume, r.n_lines) for r in b.collect()}
    rs = {r.o_orderpriority: (r.volume, r.n_lines) for r in s.collect()}
    assert sorted(rb) == sorted(rs) and rb
    for k in rb:  # double sums fold in partition order: approx-equal
        assert rb[k][1] == rs[k][1]
        assert abs(rb[k][0] - rs[k][0]) <= 1e-6 * abs(rs[k][0])
    # AQE's toString appends an "Initial Plan" copy -- keep the final
    # tree only, then look below the join: the agg's own exchange sits
    # ABOVE it, so any hashpartitioning below the join is a join-input
    # shuffle
    pb = (
        b._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    ps = (
        s._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "SortMergeJoin" in pb and "SortMergeJoin" in ps
    below_join_b = pb.split("SortMergeJoin", 1)[1]
    below_join_s = ps.split("SortMergeJoin", 1)[1]
    assert "Exchange hashpartitioning" not in below_join_b, pb
    assert "Exchange hashpartitioning" in below_join_s, ps
