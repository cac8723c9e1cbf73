"""Scale / LLM-pipeline queries: dedup, similarity search, text analysis
over the documents/embeddings tables. Populated incrementally."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
from bigdata_storage_and_proccess_job_data_spark.operators import dedup
from bigdata_storage_and_proccess_job_data_spark.plans.registry import register


@register(
    "dedup_exact_docs",
    tags=("dedup", "text"),
    oracle="""
        SELECT content_hash, dup_count, keep_id
        FROM (
          SELECT md5(lower(trim(text))) AS content_hash,
                 COUNT(*)               AS dup_count,
                 MIN(doc_id)            AS keep_id
          FROM documents
          GROUP BY 1
        )
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup over documents: md5 of normalized text, keep
    min doc_id per cluster. Fixed-width hash is the shuffle key, not the
    document body (operators/dedup.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.duplicate_groups(docs, "text", "doc_id")
