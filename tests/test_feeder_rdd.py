"""Feeder (S12/X3) + the RDD demo smoke (S13) -- DataFrame-first, with
one genuine RDD round trip for parity with the reference's k8s/job.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
from bigdata_storage_and_proccess_job_data_spark.sources import feeder


def test_sample_with_replacement_deterministic(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    s1 = feeder.sample_with_replacement(orders, 0.1, seed=7).count()
    s2 = feeder.sample_with_replacement(orders, 0.1, seed=7).count()
    assert s1 == s2 > 0


def test_mutate_counters_seeded(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", None), ("c", 3)], ["k", "views"]
    )
    m1 = {r.k: r.views for r in feeder.mutate_counters(df, ["views"]).collect()}
    m2 = {r.k: r.views for r in feeder.mutate_counters(df, ["views"]).collect()}
    assert m1 == m2
    assert m1["b"] is not None and 0 <= m1["b"] <= 5
    assert 1 <= m1["a"] <= 6


def test_stamp_ingest(spark):
    df = spark.createDataFrame([("x",)], ["k"])
    row = feeder.stamp_ingest(df).collect()[0]
    assert row.ingest_timestamp > 1.7e9


def test_rdd_parallelize_map_reduce(spark):
    """Reference S13/A8 (k8s/job.py:24-35): parallelize -> map -> reduce,
    cross-checked against the DataFrame formulation."""
    sc = spark.sparkContext
    rdd_total = sc.parallelize(range(1, 31), 10).map(lambda x: x * x).reduce(
        lambda a, b: a + b
    )
    df_total = (
        spark.range(1, 31)
        .select(F.sum(F.col("id") * F.col("id")).alias("t"))
        .collect()[0]
        .t
    )
    assert rdd_total == df_total == sum(x * x for x in range(1, 31))
