"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(bigdata_storage_and_proccess_job_data_spark/plans/registry.py): every
implemented operator from SURVEY.md §2 registers a Spark callable + DuckDB
oracle there; this module just re-exports the driver-facing surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_storage_and_proccess_job_data_spark import plans  # noqa: E402
from bigdata_storage_and_proccess_job_data_spark.session import tune_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary: scan -> filter -> hash agg) on
    /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return plans.queries()["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = plans.queries()

    def wrap(fn):
        def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        inner.__doc__ = fn.__doc__
        return inner

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (same aliases as the Spark side)."""
    return plans.oracle_sql()
