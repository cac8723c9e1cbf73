"""Feature-engineering fit/transform: hand-math pins, unseen-group and
degenerate-group NULL semantics, and full DuckDB value parity for each
of standardize / quantile-bin / winsorize on the driver tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
from bigdata_storage_and_proccess_job_data_spark.functions.numeric import (
    sql_round,
    stable_round,
)
from bigdata_storage_and_proccess_job_data_spark.operators import features
from tests.parity import compare, duckdb_connect


def test_standardize_hand_math_and_unseen_groups(spark):
    train = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0), ("c", None)],
        "k string, x double",
    )
    fit = features.standardize_fit(train, ["x"], keys=["k"])
    apply_df = spark.createDataFrame(
        [("a", 2.0), ("a", 4.0), ("b", 9.0), ("z", 1.0), ("a", None)],
        "k string, x double",
    )
    got = {
        (r.k, r.x): r.x_z
        for r in features.standardize_apply(
            apply_df, fit, ["x"], keys=["k"]
        ).collect()
    }
    # mean=2, std=sqrt(2) for group a
    assert abs(got[("a", 2.0)] - 0.0) < 1e-12
    assert abs(got[("a", 4.0)] - 2.0 / (2.0 ** 0.5)) < 1e-12
    assert got[("b", 9.0)] is None  # singleton train group: std NULL
    assert got[("z", 1.0)] is None  # unseen group
    assert got[("a", None)] is None

    with pytest.raises(ValueError):
        features.standardize_fit(train, [])


def test_quantile_bins_hand_math(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 11)] + [(None,)], "x double"
    )
    fit = features.quantile_bins_fit(df, "x", n_bins=4)
    binned = features.quantile_bins_apply(df, fit, "x")
    got = {r.x: r.x_bin for r in binned.collect()}
    # exact quartile edges of 1..10: 3.25, 5.5, 7.75
    assert got[1.0] == 0 and got[3.0] == 0
    assert got[4.0] == 1 and got[5.0] == 1
    assert got[6.0] == 2 and got[7.0] == 2
    assert got[8.0] == 3 and got[10.0] == 3
    assert got[None] is None

    with pytest.raises(ValueError):
        features.quantile_bins_fit(df, "x", n_bins=1)


def test_winsorize_hand_math(spark):
    vals = [float(i) for i in range(1, 100)] + [10_000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r.x: r.x_w for r in features.winsorize(df, ["x"]).collect()}
    assert out[10_000.0] < 10_000.0  # tail clipped
    assert out[50.0] == 50.0         # body untouched
    with pytest.raises(ValueError):
        features.winsorize(df, ["x"], lower=0.5, upper=0.4)


def test_features_duckdb_parity(spark, oracle_sf_dir):
    """All three transforms on orders, grouped by priority, match
    DuckDB end to end (exact interpolated percentiles both sides)."""
    orders = load_table(spark, oracle_sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    con = duckdb_connect(oracle_sf_dir)

    fit = features.standardize_fit(
        orders, ["o_totalprice"], keys=["o_orderpriority"]
    )
    z = features.standardize_apply(
        orders, fit, ["o_totalprice"], keys=["o_orderpriority"]
    ).select(
        "o_orderkey",
        stable_round(F.col("o_totalprice_z"), 6).alias("z"),
    )
    problems = compare(
        z,
        con,
        f"""
        WITH f AS (
          SELECT o_orderpriority, AVG(o_totalprice) AS m,
                 STDDEV_SAMP(o_totalprice) AS s
          FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderkey,
               {sql_round('(o_totalprice - m) / s', 6)} AS z
        FROM orders JOIN f USING (o_orderpriority)
        """,
    )
    assert problems == [], problems

    bfit = features.quantile_bins_fit(
        orders, "o_totalprice", 10, keys=["o_orderpriority"]
    )
    binned = features.quantile_bins_apply(
        orders, bfit, "o_totalprice", keys=["o_orderpriority"]
    ).select("o_orderkey", "o_totalprice_bin")
    problems = compare(
        binned,
        con,
        """
        WITH f AS (
          SELECT o_orderpriority,
                 quantile_cont(o_totalprice,
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
                   AS edges
          FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderkey,
               len(list_filter(edges, e -> o_totalprice >= e))
                 AS o_totalprice_bin
        FROM orders JOIN f USING (o_orderpriority)
        """,
    )
    assert problems == [], problems

    w = features.winsorize(
        orders, ["o_totalprice"], 0.05, 0.95, keys=["o_orderpriority"]
    ).select(
        "o_orderkey",
        stable_round(F.col("o_totalprice_w"), 4).alias("w"),
    )
    problems = compare(
        w,
        con,
        f"""
        WITH f AS (
          SELECT o_orderpriority,
                 quantile_cont(o_totalprice, 0.05) AS lo,
                 quantile_cont(o_totalprice, 0.95) AS hi
          FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderkey,
               {sql_round('least(greatest(o_totalprice, lo), hi)', 4)} AS w
        FROM orders JOIN f USING (o_orderpriority)
        """,
    )
    assert problems == [], problems
