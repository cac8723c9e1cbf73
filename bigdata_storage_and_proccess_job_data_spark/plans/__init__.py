"""Driver-facing query plans: the registry mapping every implemented
operator (SURVEY.md §2) to a Spark callable + DuckDB oracle SQL."""

from bigdata_storage_and_proccess_job_data_spark.plans.registry import (  # noqa: F401
    QueryDef,
    all_queries,
    oracle_sql,
    queries,
    register,
)

# Importing these modules populates the registry.
from bigdata_storage_and_proccess_job_data_spark.plans import (  # noqa: F401,E402
    analytics_queries,
    reference_queries,
    scale_queries,
    streaming_queries,
)
