"""Job-posting schemas: the reference's three schema layers
(SURVEY.md §1.2).

- RAW_POSTING_SCHEMA: the all-string upstream record
  (demo/src/main/java/com/example/demo/model/JobPosting.java:8-90 --
  every field String, including salaries/views/epochs/booleans).
- NORMALIZED_POSTING_SCHEMA: the canonical typed record the producers
  emit and streaming declares (bigdata-project/src/spark_streaming_v2.py:28-52,
  producer_v2.py:34-100).

The engine reads raw with an explicit schema (never inference -- schema
inference costs a full extra pass at 100 TB) and normalizes immediately.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_RAW_FIELDS = [
    "job_id",
    "company_name",
    "title",
    "description",
    "location",
    "min_salary",
    "max_salary",
    "med_salary",
    "normalized_salary",
    "currency",
    "pay_period",
    "compensation_type",
    "views",
    "applies",
    "listed_time",
    "original_listed_time",
    "expiry",
    "closed_time",
    "work_type",
    "formatted_work_type",
    "formatted_experience_level",
    "remote_allowed",
    "sponsored",
    "zip_code",
    "fips",
    "posting_domain",
    "job_posting_url",
    "application_url",
    "application_type",
    "skills_desc",
    "company_id",
]

RAW_POSTING_SCHEMA = StructType(
    [StructField(name, StringType(), True) for name in _RAW_FIELDS]
)

NORMALIZED_POSTING_SCHEMA = StructType(
    [
        StructField("job_id", StringType(), True),
        StructField("source", StringType(), True),
        StructField("company_name", StringType(), True),
        StructField("title", StringType(), True),
        StructField("description", StringType(), True),
        StructField("location", StringType(), True),
        StructField("location_country", StringType(), True),
        StructField("location_city", StringType(), True),
        StructField("location_state", StringType(), True),
        StructField("salary_min", DoubleType(), True),
        StructField("salary_max", DoubleType(), True),
        StructField("salary_currency", StringType(), True),
        StructField("work_type", StringType(), True),
        StructField("formatted_work_type", StringType(), True),
        StructField("contract_type", StringType(), True),
        StructField("experience_level", StringType(), True),
        StructField("remote_allowed", BooleanType(), True),
        StructField("listed_time", LongType(), True),  # epoch ms
        StructField("views", IntegerType(), True),
        StructField("applies", IntegerType(), True),
        StructField("category", StringType(), True),
        StructField("latitude", DoubleType(), True),
        StructField("longitude", DoubleType(), True),
        StructField("ingest_timestamp", DoubleType(), True),  # epoch s
    ]
)
