"""Sources & sinks: partitioned parquet lake, JSON ingest, keyed upsert
sinks (the engine-side replacements for the reference's MinIO JSON lake,
Elasticsearch doc-id upserts, and Cassandra agg tables)."""
