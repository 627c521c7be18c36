"""Window-function operators over the `events` table.

Dataset-level forms of the reference's in-document algorithms (SURVEY §2.9):

- gap_sessionize:   1-D gap clustering (detect/table_tatr.py:433-453
                    `_cluster_positions`) as the classic lag+cumsum
                    sessionization — new cluster when the gap exceeds the
                    threshold
- worst_k:          the targeted re-OCR "take <=50 worst lines per page"
                    selection (ocr/targeted_reocr.py:150-178) as
                    Window.partitionBy + row_number <= k top-k
- yband_dedup:      the reconstruction dedup key (text, y//50) per page
                    (io/reconstruction.py:173-199) as dropDuplicates-by-key
                    with deterministic first-wins
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import table

SESSION_GAP_MIN = 30
WORST_K = 5


def _epoch_seconds(ts_col):
    """NTZ timestamp -> whole epoch seconds, session-timezone-INDEPENDENT.

    Every tz-conversion route (to_utc_timestamp, unix_timestamp, LTZ casts)
    reinterprets NTZ through the session timezone, which the driver may set
    arbitrarily. Field extraction on NTZ is tz-free, so compute the epoch
    arithmetically: days-since-1970 * 86400 + time-of-day seconds
    (truncating sub-second, = DuckDB floor(epoch(ts)))."""
    return (
        F.datediff(ts_col.cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long") * 86400
        + F.hour(ts_col).cast("long") * 3600
        + F.minute(ts_col).cast("long") * 60
        + F.second(ts_col).cast("long")
    )


def gap_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions per user: a new session starts when the gap from the previous
    event exceeds 30 minutes. Output one row per session with epoch-second
    bounds (ints — exact cross-engine comparison)."""
    ev = table(spark, sf_dir, "events")
    ev = ev.withColumn("e", _epoch_seconds(F.col("ts")))
    w = Window.partitionBy("user_id").orderBy("e", "event_id")
    gap = F.col("e") - F.lag("e").over(w)
    new_session = F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0)
    sess = (ev
            .withColumn("is_new", new_session)
            .withColumn("session_id",
                        F.sum("is_new").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min("e").alias("t_start"),
                 F.max("e").alias("t_end"))
            .orderBy("user_id", "session_id"))


GAP_SESSIONIZE_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS e,
         lag(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev_e
  FROM events
), flagged AS (
  SELECT user_id, event_id, e,
         CASE WHEN prev_e IS NULL OR e - prev_e > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS is_new
  FROM ordered
), sessions AS (
  SELECT user_id, event_id, e,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY e, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       min(e) AS t_start, max(e) AS t_end
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def worst_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user, the 5 lowest-value events (re-OCR candidate selection shape:
    sort ascending by quality, cap at K — targeted_reocr.py:169-172).
    Fully deterministic order: (value, event_id)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").asc(), F.col("event_id"))
    return (ev.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= WORST_K)
            .select("user_id", "rank", "event_id", F.round("value", 6).alias("value"))
            .orderBy("user_id", "rank"))


WORST_K_SQL = f"""
SELECT user_id, rank, event_id, value FROM (
  SELECT user_id, event_id, round(value, 6) AS value,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY value ASC, event_id) AS INT) AS rank
  FROM events
) WHERE rank <= {WORST_K}
ORDER BY user_id, rank
"""


def yband_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruction-style dedup: within each user_id ("page"), keep the
    first event per (event_type, value//50 "band") — key semantics of
    io/reconstruction.py:194-199 with first-wins = min(event_id)."""
    ev = table(spark, sf_dir, "events")
    band = F.floor(F.col("value") / 50).cast("long")
    return (ev.withColumn("band", band)
            .groupBy("user_id", "event_type", "band")
            .agg(F.min("event_id").alias("event_id"),
                 F.count("*").alias("n_dropped_plus_one"))
            .orderBy("user_id", "event_type", "band"))


YBAND_DEDUP_SQL = """
SELECT user_id, event_type,
       CAST(floor(value / 50) AS BIGINT) AS band,
       min(event_id) AS event_id,
       count(*) AS n_dropped_plus_one
FROM events
GROUP BY user_id, event_type, CAST(floor(value / 50) AS BIGINT)
ORDER BY user_id, event_type, band
"""


def reading_order_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reading-order multi-key sort (page, y-band, x) surfaced on events
    as (user_id, value-band, event_id) with a global rank — a total-order
    window (single-partition at the final step, which is why at real scale
    this is a per-page sort inside the extraction stage, not a global one;
    the oracle form pins the tie-breaking)."""
    ev = table(spark, sf_dir, "events")
    banded = ev.select("event_id", "user_id",
                       F.floor(F.col("value") / 50).cast("long").alias("band"))
    w = Window.orderBy("user_id", "band", "event_id")
    return (banded.withColumn("reading_pos", F.row_number().over(w))
            .orderBy("reading_pos"))


READING_ORDER_SORT_SQL = """
SELECT event_id, user_id, CAST(floor(value/50) AS BIGINT) AS band,
       CAST(row_number() OVER (ORDER BY user_id, floor(value/50), event_id)
            AS INT) AS reading_pos
FROM events
ORDER BY reading_pos
"""
