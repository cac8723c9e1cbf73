"""Partitioned data lake IO (reference §2.1 mapped to Parquet).

| Reference                                   | Here                        |
|---------------------------------------------|-----------------------------|
| S1 daily JSON dirs, partition in path       | Parquet partitionBy(key);   |
|   (s3a://.../event_date=D/*.json)           |   filter => partition prune |
| S5 ES detail upsert by doc id               | upsert_by_key: append +     |
|                                             |   latest-wins view, or      |
|                                             |   dynamic partition overwrite|
| S6 Cassandra agg tables                     | keyed parquet dirs          |
| S11 Kafka->MinIO archiver (50 rec/60 s)     | Structured Streaming        |
|                                             |   partitionBy + trigger     |

Scale notes: writers never coalesce(1); partition counts follow the
upstream parallelism and AQE. Readers rely on Catalyst partition
pruning -- tests/test_lake.py asserts the pruned-scan plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "append",
    fmt: str = "parquet",
) -> None:
    """Hive-style partitioned columnar write (the canonical store; the
    reference encoded the partition key in the path by hand,
    kafka_to_minio.py:64-65). ``fmt``: parquet (default) or orc -- both
    get the same pruning/pushdown from Catalyst."""
    df.write.mode(mode).partitionBy(*partition_by).format(fmt).save(path)


def read_partition(
    spark: SparkSession, path: str, fmt: str = "parquet", **partition_values
) -> DataFrame:
    """Read with partition-pruning filters (replaces the reference's
    path-glob construction, spark_job.py:31 -- a filter on the partition
    column prunes at planning time, PruneFileSourcePartitions)."""
    df = spark.read.format(fmt).load(path)
    for k, v in partition_values.items():
        df = df.filter(F.col(k) == v)
    return df


def read_json_lake(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """JSON ingest with an EXPLICIT schema -- never inference (the
    reference's spark.read.json(path) schema-inference pass reads all
    data twice; at 100 TB that is a doubled scan, SURVEY.md §4)."""
    return spark.read.schema(schema).json(path)


def read_csv_lake(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    bad_records_path: str | None = None,
) -> DataFrame:
    """CSV ingest, same contract as read_json_lake: explicit schema only
    (CSV inference is another full pre-scan), PERMISSIVE parsing so a
    malformed row nulls out instead of killing a 100 TB job; route
    rejects to ``bad_records_path`` for replay instead of losing them."""
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
    )
    if bad_records_path:
        reader = reader.option("badRecordsPath", bad_records_path)
    return reader.csv(path)


class SchemaMismatchError(TypeError):
    """Raised when an append would mix incompatible file schemas in one
    log dir (parquet readers infer the table schema from a sample file,
    so a drifted append poisons every subsequent scan nondeterministically)."""


def upsert_by_key(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key: str,
    version_col: str,
) -> None:
    """Idempotent keyed upsert onto an append-only parquet dir: append
    the batch; readers resolve latest-wins via read_upserted (the
    ES es.mapping.id doc-upsert semantics, spark_job.py:78-80, without a
    mutable store). Append is O(batch); compaction can fold the log into
    a snapshot offline.

    Schema is enforced on write (like any real table format): an append
    whose column names/types differ from the existing log is rejected
    with SchemaMismatchError instead of silently corrupting reads."""
    import os

    if os.path.isdir(path) and any(
        n.endswith(".parquet") for n in os.listdir(path)
    ):
        existing = spark.read.parquet(path).schema
        incoming = df.schema
        want = {f.name: f.dataType for f in existing}
        got = {f.name: f.dataType for f in incoming}
        if want != got:
            drift = sorted(
                f"{n}: {want.get(n)} -> {got.get(n)}"
                for n in set(want) | set(got)
                if want.get(n) != got.get(n)
            )
            raise SchemaMismatchError(
                f"append to {path} drifts from the table schema: {drift}"
            )
    df.write.mode("append").parquet(path)


def read_upserted(
    spark: SparkSession, path: str, key: str, version_col: str
) -> DataFrame:
    """Latest-wins view over an upsert log written by upsert_by_key:
    row_number over (key, version desc) = 1 -- same deterministic-winner
    dedup as operators/dedup.py."""
    from bigdata_storage_and_proccess_job_data_spark.operators import dedup

    df = spark.read.parquet(path)
    return dedup.dedup_by_key(
        df, [key], order_by=[F.col(version_col).desc(), F.col(key).asc()]
    )


def archive_stream(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: list[str],
    processing_interval: str | None = "60 seconds",
    fmt: str = "parquet",
):
    """The Kafka->lake archiver (reference S11/X4, kafka_to_minio.py:47-80):
    its hand-rolled count-or-time micro-batcher collapses to a
    processing-time trigger + partitionBy; checkpointing replaces the
    manual consumer-group offset management. ``processing_interval=None``
    runs one availableNow drain instead (backfill / tests)."""
    w = (
        stream_df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy(*partition_by)
    )
    if processing_interval is None:
        w = w.trigger(availableNow=True)
    else:
        w = w.trigger(processingTime=processing_interval)
    return w.start()


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Range-cluster the data on ``cluster_by`` before writing: global
    range partitioning (sampled boundaries) gives each output file a
    narrow, non-overlapping key range, and the in-file sort tightens
    per-row-group min/max stats. Point/range filters on those columns
    then skip whole row groups at scan time via the pushed parquet
    predicates -- the data-skipping complement to partitionBy for
    high-cardinality keys where one-dir-per-value is infeasible
    (tests/test_lake.py asserts the scan reads a fraction of the rows).

    Unlike partition pruning this is statistics-based: it needs no
    catalog and composes with partitionBy (partition on the coarse key,
    cluster on the fine one)."""
    (
        df.repartitionByRange(n_files, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .parquet(path)
    )


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: dict[str, int],
    fpp: float = 0.01,
    mode: str = "overwrite",
) -> None:
    """Write parquet with per-column BLOOM FILTERS for the given columns
    (``bloom_cols`` maps column name -> expected distinct values per
    file, which sizes the filter).

    This is the POINT-LOOKUP complement to write_clustered /
    write_zordered: min/max row-group stats only skip when the data is
    range-clustered on the filter column, so an equality probe on a
    high-cardinality UNSORTED key (doc ids, session ids, content
    hashes) reads every row group. A bloom filter gives each row group
    a probabilistic absence proof instead -- the reader (Spark's
    parquet-mr path honors them out of the box) skips every row group
    whose filter rules the value out, no re-layout or table format
    required. At 100 TB this is the "find one document by id in the
    raw corpus" path: blooms cost ~1.2 bytes/value at fpp=1% in file
    footers and turn a full-corpus scan into a handful of row groups.

    Sizing: ndv is per FILE (not global) -- overshooting wastes footer
    bytes, undershooting inflates the false-positive rate; either way
    reads stay CORRECT (bloom hits fall back to reading the group).
    tests/test_lake.py:test_bloom_filter_skips_point_lookup measures
    the skip on a scattered key."""
    w = df.write.mode(mode)
    for col, ndv in bloom_cols.items():
        w = (
            w.option(f"parquet.bloom.filter.enabled#{col}", "true")
            .option(f"parquet.bloom.filter.expected.ndv#{col}", str(int(ndv)))
            .option(f"parquet.bloom.filter.fpp#{col}", str(float(fpp)))
        )
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 32,
    path: str | None = None,
    sort_key: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (hash-partitioned ON DISK by ``bucket_key``
    into ``n_buckets`` files per write task, catalog-registered so the
    reader knows the layout).

    This is the co-located join primitive for the 100 TB fact-fact case:
    two tables bucketed by their join key with the SAME bucket count
    join with ZERO Exchange on either side -- the shuffle is paid once
    at write time and amortized over every subsequent join/aggregate on
    that key. ``sort_key`` additionally pre-sorts within buckets so
    sort-merge join skips its sort. tests/test_bucketing.py asserts the
    exchange-free plan.
    """
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_key)
    )
    if sort_key:
        w = w.sortBy(sort_key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def local_dir_stats(path: str) -> tuple[int, int] | None:
    """(n_parquet_files, total_bytes) for a LOCAL file or dir, or None
    when the path isn't local (s3://, hdfs:// -- callers should then
    trust the scan's own file-split planning). Shared by
    catalog._spread's narrowness estimate and compact_small_files."""
    import glob
    import os

    if os.path.isfile(path):
        return 1, os.path.getsize(path)
    if os.path.isdir(path):
        files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        return len(files), sum(
            os.path.getsize(f) for f in files if os.path.exists(f)
        )
    return None


def parse_byte_conf(raw: str | int, default: int = 128 * 1024 * 1024) -> int:
    """Parse a Spark byte conf value ('134217728b', '128m', '1g', plain
    int). Digit-stripping alone would read '128m' as 128 BYTES and wreck
    any estimate built on it."""
    if isinstance(raw, int):
        return raw
    s = str(raw).strip().lower()
    units = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4, "b": 1}
    num, mult = s, 1
    # longest recognized suffix first ('kb' before 'b')
    for suf in ("kb", "mb", "gb", "tb", "k", "m", "g", "t", "b"):
        if s.endswith(suf):
            num, mult = s[: -len(suf)], units[suf[0]]
            break
    try:
        return int(float(num) * mult)
    except ValueError:
        return default


def compact_small_files(
    spark: SparkSession,
    path: str,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    preserve_order_by: list[str] | None = None,
) -> tuple[int, int, int]:
    """Small-file compaction: rewrite a parquet dir whose file count has
    drifted (streaming appends, per-batch upserts -- the classic lake
    disease: a 128 MB dataset in 4,000 x 32 KB files costs 4,000 scan
    tasks and 4,000 footer reads) into ~target-sized files, COMMITTED as
    a versioned snapshot so concurrent readers never see a half-rewritten
    dir. Returns (files_before, files_after, committed_version).

    File count is chosen from on-disk bytes / target (>= 1), a plain
    ``coalesce`` (no shuffle) unless ``preserve_order_by`` asks for a
    re-cluster, in which case the rewrite also restores range layout
    (repartitionByRange + in-file sort -- one shuffle, same as
    write_clustered)."""
    from bigdata_storage_and_proccess_job_data_spark.sources import versioned

    stats = local_dir_stats(path)
    if stats is None:
        raise ValueError(f"{path}: not a local path; compute stats lake-side")
    n_files, total = stats
    n_out = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    if preserve_order_by:
        df = df.repartitionByRange(n_out, *preserve_order_by).sortWithinPartitions(
            *preserve_order_by
        )
    else:
        df = df.coalesce(n_out)
    v = versioned.commit_version(df, table_dir)
    return n_files, n_out, v


def read_resilient(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a lake dir SKIPPING corrupt/truncated files instead of
    failing the whole job -- at 100 TB some file is always half-written
    by a crashed task or torn by an object-store race. Scope the option
    to this read (DataFrameReader option, not the session-wide conf) so
    correctness-critical reads elsewhere still fail loudly."""
    return (
        spark.read.option("ignoreCorruptFiles", "true").format(fmt).load(path)
    )


def evolve_append(
    spark: SparkSession, df: DataFrame, path: str
) -> None:
    """Schema-EVOLVING append: additive, nullable-safe column changes are
    allowed (new columns backfill as null on old rows; missing columns
    write as null), anything else still raises SchemaMismatchError --
    the middle ground between upsert_by_key's strict mode and silent
    drift. Readers must use read_evolved (mergeSchema) to see the union
    schema."""
    import os

    if os.path.isdir(path) and any(
        n.endswith(".parquet") for n in os.listdir(path)
    ):
        # guard against the UNION schema (mergeSchema), not one arbitrary
        # file footer: after a prior evolution, a plain read may infer
        # from an old file that lacks the evolved column, the conflict
        # set would come up empty, and a retyping append would poison
        # every subsequent mergeSchema read instead of being rejected
        existing = {
            f.name: f.dataType for f in read_evolved(spark, path).schema
        }
        incoming = {f.name: f.dataType for f in df.schema}
        conflicts = sorted(
            f"{n}: {existing[n]} -> {incoming[n]}"
            for n in set(existing) & set(incoming)
            if existing[n] != incoming[n]
        )
        if conflicts:
            raise SchemaMismatchError(
                f"append to {path} RETYPES existing columns: {conflicts}"
            )
    df.write.mode("append").option("mergeSchema", "true").parquet(path)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Union-schema read over an evolved log (mergeSchema reconciles the
    per-file footers; absent columns are null)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_avro_lake(
    spark: SparkSession, path: str, schema: "StructType | None" = None
) -> DataFrame:
    """Avro ingest (the remaining row-oriented lake format beside the
    JSON/CSV readers; the Kafka-ecosystem interchange format the
    reference's pipeline would meet first). Package-gated exactly like
    kafka_stream (streaming/pipeline.py): the built-in external module
    org.apache.spark:spark-avro_2.13:<spark-version> is not bundled
    with pyspark, so absence fails fast with the exact --packages
    coordinate instead of a deep NoClassDefFoundError mid-plan.
    An explicit ``schema`` skips inference (the read_json_lake
    rationale)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.format("avro").load(path)
    except Exception as exc:  # pragma: no cover - version-dependent type
        if "AVRO" in str(exc).upper() or "avro" in str(exc):
            ver = spark.version
            raise RuntimeError(
                "Avro support needs the external spark-avro module: "
                "start the session with --packages "
                f"org.apache.spark:spark-avro_2.13:{ver} "
                "(not bundled with pyspark; the kafka_stream gate "
                "precedent)"
            ) from exc
        raise


def write_training_shards(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    order_col: str,
    shard_rows: int,
) -> DataFrame:
    """The loader's last mile after epoch_shuffle / curriculum_order:
    materialize a totally-ordered frame as size-bounded ORDERED shards a
    training loader can stream sequentially without sorting anything.
    Shard k holds positions [k * shard_rows + 1, (k + 1) * shard_rows]
    of the 1-based ``order_col``; rows inside each shard file are
    PHYSICALLY sorted by position (parquet preserves row order, and the
    hash-by-shard repartition puts a whole shard in one task, so the
    partitionBy writer emits one sorted file per shard; the writer
    pins maxRecordsPerFile=0 locally so a session-level split setting
    cannot break the one-file-per-shard loader contract).

    Scale shape: one hash shuffle on the shard id (uniform by
    construction -- equal-size blocks of a permutation), one
    within-task sort bounded at shard_rows rows; no global sort, no
    driver rows. Returns the manifest read back FROM DISK (shard,
    n_rows, min/max position) -- self-verifying metadata, one row per
    shard; write it beside the corpus if the loader wants it."""
    if shard_rows < 1:
        raise ValueError(f"shard_rows must be >= 1: {shard_rows}")
    shard = (
        (F.col(order_col).cast("long") - F.lit(1)) / F.lit(int(shard_rows))
    ).cast("long")
    (
        df.withColumn("shard", shard)
        .repartition(F.col("shard"))
        .sortWithinPartitions("shard", order_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 0)  # pin the one-file contract
        .partitionBy("shard")
        .parquet(path)
    )
    return (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(order_col).alias("min_pos"),
            F.max(order_col).alias("max_pos"),
        )
    )
