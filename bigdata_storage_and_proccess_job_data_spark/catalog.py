"""Testdata catalog: load the driver's parquet tables as DataFrames.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings -- one parquet file per table under
/root/testdata/sf{0.001,0.01,0.1}/.

At 100 TB the same API points at a partitioned lake (see sources/lake.py);
here the scan is a plain parquet read so Catalyst gets pushdown/pruning
for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """The driver fixtures are ONE parquet file per table (often a single
    row group), so the scan yields a single partition and every per-row
    expression runs on one core. Spread once after read so downstream
    work uses the full machine. On a real lake this is unnecessary --
    file splits provide scan parallelism -- so only repartition when the
    scan is genuinely narrower than the cluster."""
    parallelism = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(parallelism, 16):
        return df.repartition(min(parallelism, 16))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet timestamp[ns], which Spark's reader rejects;
        # read nanos as long, truncate to micros with exact integer math
        # (double division would lose sub-us precision at 1.7e18), rebuild
        # the timestamp. DuckDB truncates ns->us the same way.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _spread(spark, df)
    return _spread(spark, spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
