"""Continuous rollup: streaming windowed agg maintained as a queryable
latest-wins table, equivalent to the batch aggregate, and compactable
into a versioned snapshot while live reads continue."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
from bigdata_storage_and_proccess_job_data_spark.sources import versioned
from bigdata_storage_and_proccess_job_data_spark.streaming import (
    pipeline,
    rollup,
    windows,
)


def _await(query, timeout=120):
    query.awaitTermination(timeout)
    assert not query.isActive, "stream did not finish in time"


def _as_map(rows):
    return {
        (r.window_start, r.event_type): (r.n, round(r.total, 6)) for r in rows
    }


def test_continuous_rollup_matches_batch_and_compacts(spark, sf_dir, tmp_path):
    batch_events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    # several files => several micro-batches re-emitting the same windows
    batch_events.repartition(4).write.parquet(src)

    measures = {"n": F.count(F.lit(1)), "total": F.sum("value")}
    log = str(tmp_path / f"log_{uuid.uuid4().hex[:6]}")
    ckpt = str(tmp_path / "ckpt")

    stream = pipeline.file_stream(
        spark, src, batch_events.schema, max_files_per_trigger=1
    )
    q = rollup.continuous_rollup(
        stream,
        "ts",
        "6 hours",
        measures,
        log_path=log,
        checkpoint_dir=ckpt,
        dims=["event_type"],
        trigger_available_now=True,
    )
    _await(q)

    got = rollup.read_rollup(spark, log)
    expect = windows.windowed_agg(
        batch_events, "ts", "6 hours", measures, dims=["event_type"]
    )
    assert _as_map(got.collect()) == _as_map(expect.collect())

    # the log holds superseded re-emissions; compaction folds them away
    # into a committed snapshot with identical content
    raw = spark.read.parquet(log).count()
    final = got.count()
    assert raw > final  # windows spanning files were emitted more than once
    v = rollup.compact_rollup(spark, log, str(tmp_path / "table"))
    snap = versioned.read_version(spark, str(tmp_path / "table"), v)
    assert _as_map(snap.drop("_key", "_version").collect()) == _as_map(
        expect.collect()
    )
