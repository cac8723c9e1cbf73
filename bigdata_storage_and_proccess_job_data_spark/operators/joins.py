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
    NULL keys would hash into.

    The right key column is DROPPED from the output (on a match it
    duplicates the left key; unmatched it is null), so the common
    same-name FK case (``user_id = user_id``) neither trips an ambiguous
    column reference nor yields a duplicate output name. Other name
    collisions between the two frames are rejected up front."""
    overlap = (set(left.columns) & set(right.columns)) - {right_key}
    if overlap:
        raise ValueError(
            f"non-key column names collide: {sorted(overlap)}; rename before joining"
        )
    r = right.alias("_nsr")
    with_key = (
        left.filter(F.col(left_key).isNotNull())
        .alias("_nsl")
        .join(r, F.col(f"_nsl.{left_key}") == F.col(f"_nsr.{right_key}"), "left")
        .drop(F.col(f"_nsr.{right_key}"))
    )
    null_key = left.filter(F.col(left_key).isNull())
    rtypes = dict(right.dtypes)
    for c in right.columns:
        if c == right_key:
            continue
        null_key = null_key.withColumn(c, F.lit(None).cast(rtypes[c]))
    return with_key.unionByName(null_key)


def compact_upserts(
    spark: SparkSession, path: str, key: str, version_col: str
) -> None:
    """Rewrite an upsert log as its latest-wins snapshot: read the log,
    resolve winners (same dedup as sources/lake.py:read_upserted), write
    to a SIBLING dir on the same filesystem, then swap via two directory
    renames (metadata-only -- no copy, no rows on the driver).

    NOT safe under concurrency: a reader listing the dir in the
    two-rename window can miss it, and a crash between the renames
    leaves the data under ``<path>.old-*`` (recoverable, never lost --
    the old rmtree-then-move ordering could lose the log outright).
    Anything concurrent or durable should use
    sources/versioned.py:compact_log_versioned, which swaps via an
    atomic version-pointer commit instead of renaming the data dir."""
    import os
    import shutil
    import uuid

    from bigdata_storage_and_proccess_job_data_spark.sources.lake import (
        read_upserted,
    )

    snapshot = read_upserted(spark, path, key, version_col)
    base = os.path.abspath(path)
    token = uuid.uuid4().hex[:8]
    tmp = f"{base}.compact-{token}"  # sibling => same fs => rename, not copy
    snapshot.write.mode("overwrite").parquet(tmp)  # distributed write
    old = f"{base}.old-{token}"
    os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old)
