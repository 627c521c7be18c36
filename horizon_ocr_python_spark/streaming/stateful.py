"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming state; this is the scale extension the brief
names explicitly: a per-key running extraction monitor. For each host
(url's netloc), maintain running counts of pages seen, ok/error outcomes
and total extracted chars across micro-batches, emitting the updated
snapshot per batch — the streaming analogue of the engine's per-partition
lineage table, keyed by host instead of partition.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

STATE_SCHEMA = StructType([
    StructField("n_pages", LongType()),
    StructField("n_ok", LongType()),
    StructField("n_chars", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("n_pages", LongType()),
    StructField("n_ok", LongType()),
    StructField("n_chars", LongType()),
])


def _update_host_stats(key: Tuple[str],
                       pdfs: Iterable[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    """State update function: fold this micro-batch's rows for one host into
    the running (n_pages, n_ok, n_chars) tuple and emit the new snapshot."""
    n_pages, n_ok, n_chars = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n_pages += len(pdf)
        n_ok += int((pdf["status"] == "ok").sum())
        n_chars += int(pdf["n_chars"].fillna(0).sum())
    state.update((n_pages, n_ok, n_chars))
    yield pd.DataFrame([{"host": key[0], "n_pages": n_pages,
                         "n_ok": n_ok, "n_chars": n_chars}])


def host_stats_stream(extracted_stream: DataFrame) -> DataFrame:
    """Attach the stateful per-host monitor to an extraction output stream
    (columns used: url, status, n_chars)."""
    from pyspark.sql import functions as F

    keyed = extracted_stream.select(
        F.split_part(F.col("url"), F.lit("/"), F.lit(3)).alias("host"),
        "status", "n_chars")
    return (keyed.groupBy("host")
            .applyInPandasWithState(
                _update_host_stats,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
