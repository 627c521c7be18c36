"""Dataset-level relational operators.

Each module pairs a Spark DataFrame implementation with the ANSI-SQL oracle
string DuckDB runs on the same parquet tables (the driver's correctness
gate). Column names and rounding are aligned on both sides by construction.

These surface the reference's in-document algorithms as dataset-level
operators (SURVEY §2.9): fusion -> groupBy+window, top-k -> row_number,
dedup -> dropDuplicates, 1-D gap clustering -> lag+cumsum sessionization,
reading order -> multi-key sort — plus the training-data-pipeline extensions
(near-dup dedup family, similarity search, text analysis).
"""

from pyspark.sql import DataFrame, SparkSession


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
