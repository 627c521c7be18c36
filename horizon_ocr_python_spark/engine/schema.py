"""Spark schemas for the pages input table and the extracted Document output.

Mapping per SURVEY §1.3: Document object graph -> one row with nested
Struct/Array columns; enums -> strings; Field.value -> string + data_type tag
(JSON contract "values should be strings", reference JSON_SCHEMA.md:395);
per-row status/error columns instead of exceptions (types.py:317-323).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# BASELINE.json input_hint: the Common-Crawl-style pages table
PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

FIELD_SCHEMA = StructType([
    StructField("name", StringType(), False),
    StructField("value", StringType(), True),
    StructField("data_type", StringType(), True),
    StructField("confidence", DoubleType(), True),
    StructField("status", StringType(), True),
    StructField("chosen_source", StringType(), True),
    StructField("n_candidates", IntegerType(), True),
])

TABLE_SCHEMA = StructType([
    StructField("rows", ArrayType(ArrayType(StringType())), True),
])

VALIDATION_SCHEMA = StructType([
    StructField("passed", BooleanType(), True),
    StructField("total_checks", IntegerType(), True),
    StructField("passed_checks", IntegerType(), True),
    StructField("failed_checks", IntegerType(), True),
    StructField("issues", ArrayType(StringType()), True),
])

# Output of the fused extraction stage. `partition_id` and `extract_ms` feed
# the per-partition lineage/metrics table (SURVEY §4 custom-work 3) without a
# second schema or side channel.
DOCUMENT_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("doc_id", StringType(), False),
    StructField("content_key", StringType(), False),  # sha256(html) — resume key
    StructField("status", StringType(), False),
    StructField("error", StringType(), True),
    StructField("file_type", StringType(), True),
    StructField("warc_ts", TimestampType(), True),
    StructField("lang", StringType(), True),
    StructField("title", StringType(), True),
    StructField("raw_text", StringType(), True),
    StructField("n_chars", LongType(), True),
    StructField("n_blocks", IntegerType(), True),
    StructField("n_content_blocks", IntegerType(), True),
    StructField("fields", ArrayType(FIELD_SCHEMA), True),
    StructField("tables", ArrayType(TABLE_SCHEMA), True),
    StructField("validation", VALIDATION_SCHEMA, True),
    StructField("partition_id", IntegerType(), True),
    StructField("extract_ms", DoubleType(), True),
])

METRICS_SCHEMA = StructType([
    StructField("partition_id", IntegerType(), False),
    StructField("n_docs", LongType(), False),
    StructField("n_ok", LongType(), False),
    StructField("n_err", LongType(), False),
    StructField("wall_ms", DoubleType(), False),
    StructField("snapshot_id", LongType(), True),
])
