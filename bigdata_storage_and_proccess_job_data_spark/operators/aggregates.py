"""Parameterized aggregation cubes.

The reference builds 7 hand-written groupBy().agg() cubes
(spark_batch_v2.py:261-341, spark_job.py:84-87 -- SURVEY.md §2.4 A1-A7).
Here one builder covers them all: keys + a measure spec. Spark runs each
as partial+final HashAggregate with map-side combine; a single shuffle on
the group keys. At 100 TB the only knobs that matter are key cardinality
and skew -- AQE skew handling is enabled in session.py, and callers can
pre-salt via ``salt_keys`` for pathological dimensions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conditional_count(pred: Column) -> Column:
    """count of rows where pred -- the reference's sum(when(p,1).otherwise(0))
    (spark_batch_v2.py:269). Emitted as BIGINT."""
    return F.sum(F.when(pred, 1).otherwise(0)).cast("long")


def cube(
    df: DataFrame,
    keys: Sequence[str | Column],
    measures: dict[str, Column],
) -> DataFrame:
    """groupBy(keys).agg(measures) with stable output column names."""
    aggs = [expr.alias(name) for name, expr in measures.items()]
    return df.groupBy(*keys).agg(*aggs)


def salt_keys(df: DataFrame, key: str, buckets: int = 16) -> DataFrame:
    """Two-phase aggregation prep for a skewed key: add a salt column so
    the first aggregation spreads hot keys over ``buckets`` reducers; the
    caller aggregates (key, _salt) first, then re-aggregates by key.

    Use only for re-aggregatable measures (count/sum/min/max)."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)))


def global_sum(df: DataFrame, col: str, alias: str = "total") -> DataFrame:
    """Whole-table sum -- the DataFrame form of the reference's RDD
    map/reduce demo (k8s/job.py:24-35, SURVEY.md A8)."""
    return df.agg(F.sum(col).alias(alias))
