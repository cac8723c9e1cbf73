"""Bench-only data-skipping probes (VERDICT r5 #8).

These run in bench.py alongside the registered headline queries but are
NOT in the query registry: the registry sits at its 100-query ceiling
(registry.MAX_REGISTERED), and a probe whose whole point is a prepared
physical LAYOUT (range-clustered files + parquet bloom filters) does not
fit the registry's read-the-fixture-as-is contract anyway. Split:

- ensure_layouts() builds the layout ONCE per fixture generation
  (memoized on source path + mtime + size) into a temp dir; bench.py
  calls it in the untimed warmup section, so timings cover the PROBE,
  which is the recurring cost the layout exists to amortize;
- point_lookup_lineitem() is an equality probe on the clustered +
  bloomed key; bench.py records its latency AND rows_read, so
  BENCH_r{N}.json carries a measured number for the data-skipping story
  (rows_read a small fraction of the table, vs 6,000,000-per-sf-1 for a
  plain scan);
- correctness: tests/test_lake.py pins the probe result equal to the
  same filter over the plain fixture table and asserts the skip ratio.

At 100 TB this is the "fetch one order's line items from the raw lake"
path: range-clustering gives non-overlapping per-file key ranges
(min/max row-group skipping), the bloom filter adds absence proofs for
whatever the sort didn't isolate, and the probe touches a handful of
row groups instead of the corpus.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
from bigdata_storage_and_proccess_job_data_spark.sources import lake

# per-process memo: (sf_dir -> probe key); the max-key lookup is a
# bounded one-row collect (same class as the documented top-k collects)
_KEY_CACHE: dict[str, int] = {}


def _layout_dir(sf_dir: str) -> str:
    src = os.path.join(sf_dir, "lineitem.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"sgraft_skip_layout_{key}")


def ensure_layouts(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) the clustered+bloomed lineitem layout for ``sf_dir``
    and return its path. Range-clustering on l_orderkey tightens per-file
    and per-row-group min/max stats; the bloom filter on the same column
    covers point probes for values the stats alone can't exclude."""
    dest = _layout_dir(sf_dir)
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        df = load_table(spark, sf_dir, "lineitem")
        lake.write_with_bloom(
            df.repartitionByRange(16, "l_orderkey").sortWithinPartitions(
                "l_orderkey"
            ),
            dest,
            bloom_cols={"l_orderkey": 20_000},
        )
    return dest


def point_lookup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All line rows of ONE order (the max l_orderkey -- deterministic at
    any SF), read from the skipping layout. The key is resolved eagerly
    (one-row collect, cached per process) so the returned frame's plan
    is exactly the probe: a parquet scan with the equality predicate
    pushed down, whose rows_read the bench records."""
    dest = ensure_layouts(spark, sf_dir)
    k = _KEY_CACHE.get(sf_dir)
    if k is None:
        k = (
            load_table(spark, sf_dir, "lineitem")
            .agg(F.max("l_orderkey").alias("k"))
            .first()[0]
        )
        _KEY_CACHE[sf_dir] = k
    return (
        spark.read.parquet(dest)
        .filter(F.col("l_orderkey") == F.lit(k))
        .select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
        )
    )


def bench_probes() -> dict:
    """name -> (spark, sf_dir) -> DataFrame, merged into bench.py's run
    set after the registered headline queries."""
    return {"point_lookup_lineitem": point_lookup_lineitem}
