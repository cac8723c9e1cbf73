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


# ---------------------------------------------------------------------------
# W2: sliding window counts (10-min window, 5-min slide)
# ---------------------------------------------------------------------------
@register(
    "window_sliding",
    tags=("streaming", "window", "agg"),
    oracle=f"""
        SELECT window_start, user_id,
               COUNT(*)                     AS event_count,
               {sql_round('SUM(value)', 2)} AS total_value
        FROM (
          SELECT unnest([time_bucket(INTERVAL 5 MINUTES, ts),
                         time_bucket(INTERVAL 5 MINUTES, ts) - INTERVAL 5 MINUTES])
                 AS window_start,
                 user_id, value
          FROM events
        )
        GROUP BY 1, 2
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference W2 (sliding window(10m,5m) x dim -> count,
    spark_streaming.py:62-74) in batch form. Each event lands in exactly
    two 5-min-phased windows; the oracle unnests both phase buckets."""
    from bigdata_storage_and_proccess_job_data_spark.streaming import windows

    events = load_table(spark, sf_dir, "events")
    return windows.windowed_agg(
        events,
        "ts",
        "10 minutes",
        {
            "event_count": F.count(F.lit(1)),
            "total_value": stable_round(F.sum("value"), 2),
        },
        slide="5 minutes",
        dims=["user_id"],
    ).drop("window_end")


# ---------------------------------------------------------------------------
# W6 + S8: stateless stream enrichment with synthetic upsert key
# ---------------------------------------------------------------------------
@register(
    "stream_detail_enrich",
    tags=("streaming", "expr"),
    oracle="""
        SELECT event_id,
               CAST(ts AS TIMESTAMP)  AS event_time,
               event_type,
               CASE WHEN value IS NULL  THEN 'unknown'
                    WHEN value < 10     THEN 'small'
                    WHEN value < 100    THEN 'medium'
                    ELSE 'large' END   AS value_bucket,
               (event_type = 'error')  AS is_error,
               CAST(hour(ts) AS BIGINT) AS event_hour,
               CAST(user_id AS VARCHAR) || '_' || CAST(event_id AS VARCHAR)
                                       AS doc_id
        FROM events
    """,
)
def stream_detail_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference W6 (stateless per-record enrichment shared batch/stream,
    spark_streaming_v2.py:103-218) + S8's synthetic doc id: identical
    code path runs under readStream (tests/test_streaming.py)."""
    from bigdata_storage_and_proccess_job_data_spark.functions import enrich

    events = load_table(spark, sf_dir, "events")
    return _enrich_events(events)


def _enrich_events(events: DataFrame) -> DataFrame:
    """The shared stateless enrichment plan (batch & streaming)."""
    from bigdata_storage_and_proccess_job_data_spark.functions import enrich

    bucket = enrich.bucketize(
        "value", [(10, "small"), (100, "medium")], default="large",
        null_label="unknown",
    )
    return events.select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("event_time"),
        "event_type",
        bucket.alias("value_bucket"),
        (F.col("event_type") == "error").alias("is_error"),
        F.hour("ts").cast("long").alias("event_hour"),
        F.concat_ws(
            "_", F.col("user_id").cast("string"), F.col("event_id").cast("string")
        ).alias("doc_id"),
    )


# ---------------------------------------------------------------------------
# Beyond-reference: session windows (gap-based user sessions)
# ---------------------------------------------------------------------------
@register(
    "session_windows",
    tags=("streaming", "window", "agg", "session"),
    oracle=f"""
        WITH ordered AS (
          SELECT user_id, ts, value,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           > INTERVAL 30 MINUTES
                      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ),
        numbered AS (
          SELECT user_id, ts, value,
                 SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING
                 ) AS session_no
          FROM ordered
        )
        SELECT MIN(ts)                          AS session_start,
               MAX(ts) + INTERVAL 30 MINUTES    AS session_end,
               user_id,
               COUNT(*)                         AS event_count,
               {sql_round('SUM(value)', 2)}     AS total_value
        FROM numbered
        GROUP BY user_id, session_no
    """,
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user (30-min inactivity gap) via
    F.session_window (streaming/windows.py:session_agg). The oracle is
    the classic gaps-and-islands formulation -- lag + cumulative session
    numbering -- which is exactly what session_window computes."""
    from bigdata_storage_and_proccess_job_data_spark.streaming import windows

    events = load_table(spark, sf_dir, "events")
    return windows.session_agg(
        events,
        "ts",
        "30 minutes",
        {
            "event_count": F.count(F.lit(1)),
            "total_value": stable_round(F.sum("value"), 2),
        },
        dims=["user_id"],
    )


# ---------------------------------------------------------------------------
# Stream-stream LEFT-OUTER interval join, batch-equivalent form
# ---------------------------------------------------------------------------
@register(
    "view_click_attribution",
    tags=("streaming", "join", "interval"),
    oracle="""
        WITH v AS (
          SELECT event_id AS view_id, user_id, ts AS view_ts
          FROM events WHERE event_type = 'view'
        ),
        c AS (
          SELECT event_id AS click_id, user_id AS click_user, ts AS click_ts
          FROM events WHERE event_type = 'click'
        )
        SELECT v.view_id, v.user_id,
               CAST(v.view_ts AS TIMESTAMP) AS view_ts,
               c.click_id,
               CAST(c.click_ts AS TIMESTAMP) AS click_ts
        FROM v LEFT JOIN c
          ON v.user_id = c.click_user
         AND c.click_ts >= v.view_ts
         AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTES
    """,
)
def view_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click attribution -- every view LEFT-OUTER joined to the clicks
    the same user made within 10 minutes after it -- expressed with the
    STREAMING join builder (streaming/pipeline.py:
    stream_stream_interval_join, left_outer): withWatermark is a no-op
    on batch frames, so this registered query runs the exact code path
    the streaming job runs, and the oracle hash-checks its semantics.
    The streaming execution of the same builder (state eviction,
    watermark-gated null emission) is pinned by
    tests/test_streaming_joins.py::test_stream_stream_left_outer_join.
    Plan shape: both sides are event-type slices of one scan; the join
    shuffles on user_id with the interval bound applied post-match --
    at 100 TB the equi-key carries the shuffle, the time bound prunes
    state (streaming) / rows (batch)."""
    from bigdata_storage_and_proccess_job_data_spark.streaming import pipeline

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    joined = pipeline.stream_stream_interval_join(
        views,
        clicks,
        "user_id",
        "view_ts",
        "click_ts",
        "30 minutes",
        "30 minutes",
        "10 MINUTES",
        how="left_outer",
        right_key="click_user",
    )
    return joined.select(
        "view_id",
        "user_id",
        F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
        "click_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
    )


# ---------------------------------------------------------------------------
# Watermark-scoped dedup, batch-equivalent form (burst openers)
# ---------------------------------------------------------------------------
@register(
    "dedup_within_delay",
    tags=("streaming", "dedup", "window"),
    oracle="""
        WITH seq AS (
          SELECT event_id, event_type, user_id, ts,
                 LAG(ts) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                 ) AS prev_ts
          FROM events
        )
        SELECT event_id, event_type, user_id,
               CAST(ts AS TIMESTAMP) AS ts
        FROM seq
        WHERE prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTES
    """,
)
def dedup_within_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time burst dedup per event_type (keep each 30-min burst's
    opener -- the alert-storm collapse), the deterministic batch
    analogue of streaming dropDuplicatesWithinWatermark
    (operators/dedup.py:first_of_burst; equivalence with the streaming
    form pinned by tests/test_streaming_joins.py::
    test_dedup_stream_batch_equivalence). One shuffle on the key, a lag
    window, a codegen filter."""
    from bigdata_storage_and_proccess_job_data_spark.operators import dedup

    ev = load_table(spark, sf_dir, "events")
    kept = dedup.first_of_burst(
        ev, ["event_type"], "ts", "30 minutes", tiebreak=["event_id"]
    )
    return kept.select(
        "event_id",
        "event_type",
        "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
    )
