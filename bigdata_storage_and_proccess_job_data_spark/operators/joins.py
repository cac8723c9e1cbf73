"""Join helpers for skew and log-compaction patterns.

AQE's skew-join splitting (on in session.py) covers value skew inside a
sort-merge join; the helpers here cover the cases it cannot:

- null_skew_left_join: NULL join keys all hash to one partition and can
  never match anyway -- route them around the shuffle entirely and union
  back, so a 30%-null foreign key costs 0 shuffle for the null slice.
- compact_upserts: fold an append-only upsert log (sources/lake.py:
  upsert_by_key) into a snapshot so readers stop paying the log-replay
  dedup; the offline-compaction half of the ES-style upsert semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def null_skew_left_join(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """LEFT join where ``left`` rows with a NULL key bypass the shuffle:
    they cannot match by equi-join semantics, so they go straight to the
    output (right columns null) while only the non-null slice joins.
    Same result as a plain left join, minus the single hot partition all
    NULL keys would hash into."""
    with_key = left.filter(F.col(left_key).isNotNull()).join(
        right, F.col(left_key) == F.col(right_key), "left"
    )
    null_key = left.filter(F.col(left_key).isNull())
    for c in right.columns:
        null_key = null_key.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    return with_key.unionByName(null_key)


def compact_upserts(
    spark: SparkSession, path: str, key: str, version_col: str
) -> None:
    """Rewrite an upsert log as its latest-wins snapshot: read the log,
    resolve winners (same dedup as sources/lake.py:read_upserted), write
    to a sibling dir, swap atomically-enough for a test/backfill context
    (a production lake would swap via a table-format commit). After
    compaction the log holds one row per key, so read_upserted's window
    scan touches the minimum data."""
    import shutil
    import tempfile

    from bigdata_storage_and_proccess_job_data_spark.sources.lake import (
        read_upserted,
    )

    snapshot = read_upserted(spark, path, key, version_col)
    tmp = tempfile.mkdtemp(prefix="compact_") + "/snap"
    snapshot.write.mode("overwrite").parquet(tmp)  # distributed write
    # swap is pure filesystem metadata -- no rows touch the driver
    shutil.rmtree(path)
    shutil.move(tmp, path)
