"""Semi-structured columns via Spark 4's VARIANT type.

The reference decodes JSON payloads with a FIXED schema
(``from_json`` + explicit StructType -- spark_streaming.py:40, covered
by streaming/pipeline.py:kafka_stream and the json_extract_props
query). That is the right call when the producer contract is stable;
VARIANT is the lakehouse-era complement for the payloads that AREN'T:

- ``to_variant`` parses once at ingest into Spark's binary-encoded
  variant -- the whole document is kept (from_json silently NULLs any
  field missing from the declared schema, and new producer fields are
  dropped on the floor), and it round-trips through parquet;
- ``variant_field`` extracts typed values by JSONPath from the binary
  encoding -- repeated extraction never re-parses the source string,
  where a from_json-per-query pipeline re-tokenizes the JSON text on
  every read;
- drift tolerance: two producer generations with different shapes live
  in ONE column, each row exposing whatever fields it has
  (``schema_of_variant`` reports the per-row shape; missing paths are
  NULL under ``try_variant_get`` instead of a parse error).

Scale shape: parse once at the ingest edge, store binary, extract
natively (all JVM expressions, no UDFs). At 100 TB the win is the
single parse: N downstream extractions read the variant encoding
instead of running N JSON parses over the raw text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_variant(col: Column | str) -> Column:
    """Parse a JSON string column into a VARIANT (schema-on-read,
    whole-document, parquet-storable). Malformed input raises at parse
    time; use try_parse_json upstream if the feed is dirty."""
    c = F.col(col) if isinstance(col, str) else col
    return F.parse_json(c)


def variant_field(
    col: Column | str, path: str, dtype: str = "string"
) -> Column:
    """Typed extraction from a VARIANT by JSONPath (e.g. ``$.a.b[0]``):
    NULL when the path is absent or the cast fails -- the drift-safe
    accessor."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_variant_get(c, path, dtype)


def variant_schema(col: Column | str) -> Column:
    """Per-row shape report (``schema_of_variant``) -- the discovery
    tool for deciding which drifting fields deserve promotion to real
    typed columns."""
    c = F.col(col) if isinstance(col, str) else col
    return F.schema_of_variant(c)
