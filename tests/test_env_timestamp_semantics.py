"""Environment-capability pin: the engine's load path must yield LTZ
event-time columns on this Spark runtime.

Spark 4.1 flipped parquet micros-with-isAdjustedToUTC=false (and
naive-datetime createDataFrame inference) to TIMESTAMP_NTZ, which
silently breaks three engine idioms (cast-to-long, unix_micros,
withWatermark). This test fails FIRST and obviously if a runtime
upgrade shifts timestamp semantics again, instead of ten confusing
downstream failures (VERDICT r3 next-round #7).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
from bigdata_storage_and_proccess_job_data_spark.functions.eventtime import ensure_ltz


def test_load_table_yields_ltz_timestamps(spark, sf_dir):
    for name, col in [("events", "ts"), ("orders", "o_orderdate"),
                      ("lineitem", "l_shipdate")]:
        df = load_table(spark, sf_dir, name)
        assert dict(df.dtypes)[col] == "timestamp", (
            f"{name}.{col} must load as TIMESTAMP (LTZ); got "
            f"{dict(df.dtypes)[col]} — the NTZ seam in catalog.load_table "
            "is not normalizing on this runtime"
        )


def test_ltz_watermark_idioms_work_on_loaded_events(spark, sf_dir):
    """The three idioms that Spark 4.1 rejects on NTZ must all compile
    against the loaded events table."""
    ev = load_table(spark, sf_dir, "events")
    # 1. epoch extraction via cast
    ev.select(F.col("ts").cast("long")).schema
    # 2. unix_micros
    ev.select(F.unix_micros("ts")).schema
    # 3. withWatermark (batch frames accept it as a no-op analysis check)
    ev.withWatermark("ts", "10 minutes").schema


def test_ensure_ltz_preserves_wall_clock(spark):
    """NTZ -> LTZ under the pinned-UTC session keeps the wall-clock value
    (collected values round-trip to the same naive instant)."""
    naive = datetime.datetime(2024, 5, 17, 12, 34, 56, 789000)
    df = spark.createDataFrame([(naive,)], "ts timestamp_ntz")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    out = ensure_ltz(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    [row] = out.select(F.col("ts").cast("timestamp_ntz").alias("ts")).collect()
    assert row.ts == naive
    # idempotent + no-op on already-LTZ frames
    again = ensure_ltz(out)
    assert again is out or dict(again.dtypes)["ts"] == "timestamp"


def test_ensure_ltz_targets_only_named_columns(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 2))],
        "a timestamp_ntz, b timestamp_ntz",
    )
    out = ensure_ltz(df, "a")
    assert dict(out.dtypes) == {"a": "timestamp", "b": "timestamp_ntz"}
