"""End-to-end demo: feeder -> normalize -> batch cubes -> lake -> streaming.

The full reference dataflow (SURVEY.md §3) in one runnable script:

  1. feeder generates raw all-string postings (the producer leg, S12/X3)
  2. domain.normalize_raw types them; batch_job builds detail + 6 cubes
  3. cubes land partitioned in the lake; detail lands as an upsert log
  4. a second feeder wave re-lists some jobs; latest-wins readback
  5. the same enrichment runs as a Structured Streaming pass over the
     event files, windowed with a watermark (batch/stream parity, W6)

Run:  python examples/run_pipeline.py   (writes under /tmp, ~60 s)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_storage_and_proccess_job_data_spark.domain import pipeline as domain  # noqa: E402
from bigdata_storage_and_proccess_job_data_spark.domain.schemas import RAW_POSTING_SCHEMA  # noqa: E402
from bigdata_storage_and_proccess_job_data_spark.session import get_spark  # noqa: E402
from bigdata_storage_and_proccess_job_data_spark.sources import feeder, lake  # noqa: E402
from bigdata_storage_and_proccess_job_data_spark.streaming import pipeline as stream  # noqa: E402
from bigdata_storage_and_proccess_job_data_spark.streaming import windows  # noqa: E402

EVENT_DATE = "2024-03-15"
MS_DAY = 86_400_000
TS_MAR10 = 1_710_028_800_000  # 2024-03-10 00:00:00 UTC


def _raw(job_id, company, title, min_sal, max_sal, currency, days_ago, **kw):
    base = {f.name: None for f in RAW_POSTING_SCHEMA.fields}
    base.update(
        job_id=job_id,
        company_name=company,
        title=title,
        location="Austin, TX",
        min_salary=min_sal,
        max_salary=max_sal,
        currency=currency,
        views="10.0",
        applies="2.0",
        listed_time=str(TS_MAR10 - days_ago * MS_DAY),
        work_type="FULL_TIME",
        formatted_work_type="Full-time",
        formatted_experience_level="Senior",
        remote_allowed="1",
    )
    base.update(kw)
    return base


SEED_POOL = [
    _raw("j1", "Acme", "Senior Data Engineer", "$120,000", "$150,000", "USD", 1),
    _raw("j2", "Acme", "Junior Analyst", "55,000", "70,000", "USD", 3),
    _raw("j3", "Globex", "Machine Learning Engineer", "80,000", "95,000", "GBP", 2,
         remote_allowed="0"),
    _raw("j4", "Initech", "Product Manager", None, "130,000", "USD", 10),
    _raw("j5", "Hooli", "Sales Intern", "-1", None, "USD", 0,
         formatted_experience_level="Not Specified"),
    _raw("j6", "  ", "Ghost Posting", "1", "2", "USD", 1),  # invalid: blank company
]


def main() -> None:
    spark = get_spark(app_name="example-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    root = Path(tempfile.mkdtemp(prefix="engine_example_"))
    print(f"== lake root: {root}")

    # -- 1. producer leg: seeded sample of raw records, then (post-cast)
    #       counter drift + ingest stamp on the typed frame
    pool = spark.createDataFrame(SEED_POOL, RAW_POSTING_SCHEMA)
    raw = feeder.sample_with_replacement(pool, fraction=2.0, seed=7)
    print(f"== feeder produced {raw.count()} raw records")

    # -- 2. normalize + batch job (clean -> enrich -> detail + 6 cubes)
    postings = feeder.stamp_ingest(
        feeder.mutate_counters(domain.normalize_raw(raw), ["views", "applies"])
    )
    outputs = domain.batch_job(postings, EVENT_DATE)

    # -- 3. sinks: cubes partitioned by report_date; detail as upsert log
    for name, df in outputs.items():
        if name == "jobs_detail":
            lake.upsert_by_key(
                spark, df, str(root / name), key="job_id", version_col="listed_date"
            )
        else:
            lake.write_partitioned(df, str(root / name), ["report_date"])
    for name in outputs:
        n = spark.read.parquet(str(root / name)).count()
        print(f"==   sink {name}: {n} rows")

    # -- 4. second wave: j1 re-listed fresher -> latest-wins readback
    relisted = spark.createDataFrame(
        [_raw("j1", "Acme", "Staff Data Engineer", "$140,000", "$170,000",
              "USD", 0)],
        RAW_POSTING_SCHEMA,
    )
    wave2 = domain.batch_job(domain.normalize_raw(relisted), EVENT_DATE)
    lake.upsert_by_key(
        spark, wave2["jobs_detail"], str(root / "jobs_detail"),
        key="job_id", version_col="listed_date",
    )
    latest = lake.read_upserted(
        spark, str(root / "jobs_detail"), key="job_id", version_col="listed_date"
    )
    j1 = latest.filter(F.col("job_id") == "j1").select("title").first()
    print(f"== upsert readback: j1 title is now {j1.title!r}")
    assert j1.title == "Staff Data Engineer"

    # -- 5. streaming leg: two event files -> watermarked tumbling counts
    ev_dir = root / "events_in"
    detail = outputs["jobs_detail"].withColumn(
        "event_ts", F.col("listed_date").cast("timestamp")
    ).select("job_id", "job_category", "event_ts")
    detail.coalesce(1).write.mode("append").parquet(str(ev_dir))
    time.sleep(1.1)  # second file = second micro-batch (mtime ordering)
    detail.withColumn(
        "event_ts", F.col("event_ts") + F.expr("INTERVAL 2 HOURS")
    ).coalesce(1).write.mode("append").parquet(str(ev_dir))

    src = stream.file_stream(
        spark, str(ev_dir), detail.schema, max_files_per_trigger=1
    )
    counts = windows.windowed_agg(
        src,
        ts_col="event_ts",
        duration="1 hour",
        measures={"n": F.count(F.lit(1))},
        dims=["job_category"],
        watermark="4 hours",
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("example_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(root / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    out = spark.sql(
        "SELECT * FROM example_counts ORDER BY window_start, job_category"
    )
    print("== streaming windowed counts:")
    for r in out.collect():
        print(f"==   {r.window_start} {r.job_category:<18} n={r.n}")

    shutil.rmtree(root, ignore_errors=True)
    print("== example pipeline OK")


if __name__ == "__main__":
    main()
