"""Windowed-aggregation queries (batch-equivalent forms of the streaming
operators W1-W6). Tumbling/sliding F.window on static frames is the exact
function Structured Streaming uses, so batch parity here verifies the
streaming semantics (SURVEY.md §5). Populated incrementally."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
from bigdata_storage_and_proccess_job_data_spark.functions.numeric import (
    sql_round,
    stable_round,
)
from bigdata_storage_and_proccess_job_data_spark.plans.registry import register


@register(
    "window_tumbling",
    headline=True,
    tags=("streaming", "window", "agg"),
    oracle=f"""
        SELECT time_bucket(INTERVAL 5 MINUTES, ts) AS window_start,
               event_type,
               COUNT(*)                        AS event_count,
               {sql_round('AVG(value)', 4)}    AS avg_value
        FROM events
        GROUP BY 1, 2
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference W3 (5-min tumbling window x dims -> count/avg,
    spark_streaming_v2.py:223-243) in batch form; identical F.window
    expression runs under readStream with a watermark (streaming/)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            stable_round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            # timestamp_ntz so the wall-clock value is tz-independent,
            # matching DuckDB's naive TIMESTAMP (session TZ is UTC).
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "event_count",
            "avg_value",
        )
    )
