"""Plan inspection helpers — assert the physical plan is the one we want
(pushdown reached the scan, codegen spans the expressions, the join
broadcast), not just that the first plan passed."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(  # noqa: SLF001
        df.sparkSession._jvm.org.apache.spark.sql.execution  # noqa: SLF001
        .ExplainMode.fromString("formatted"))


def read_schema_of(df: DataFrame) -> str:
    """The columns the parquet scan actually reads (column pruning check)."""
    m = re.search(r"ReadSchema: ([^\n]+)", physical_plan(df))
    return m.group(1) if m else ""


def pushed_filters_of(df: DataFrame) -> str:
    m = re.search(r"PushedFilters: (\[[^\]]*\])", physical_plan(df))
    return m.group(1) if m else ""


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_wholestage_codegen(df: DataFrame) -> bool:
    return "WholeStageCodegen" in physical_plan(df)


def n_exchanges(df: DataFrame) -> int:
    """Shuffle count in the plan (each Exchange hashpartitioning is one)."""
    return len(re.findall(r"Exchange (?:hash|range|SinglePartition)",
                          physical_plan(df)))
