"""Rank-and-fuse as relational algebra — the dataset-level form of
kernel.fuse (reference kie/fuse.py:293-373), oracle-checkable.

Candidate substrate: each document row acts as a candidate
    (group = lang, value = source, confidence = n_chars/1000)
with per-source weights, mirroring the reference's source-weight table
(orchestrator.py:241-251). The shapes are exactly the production ones:

weighted_vote:  explode -> groupBy(group, value).agg(sum(conf*weight))
                -> Window.partitionBy(group).orderBy(score desc) -> rank 1
consensus:      count sources per value, max agreement, weighted-vote
                tie-break (fuse.py:342-373)
status:         the CASE table of fuse.py:375-408
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import table

# deterministic per-source weight: 1.0 for src0..src4, 0.9 for src5..src9,
# 0.8 for the rest — a frozen analogue of the donut/layoutlmv3/trocr table
_WEIGHT = """CASE
  WHEN CAST(substr(source, 4) AS INT) < 5 THEN 1.0
  WHEN CAST(substr(source, 4) AS INT) < 10 THEN 0.9
  ELSE 0.8 END"""


def _candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        F.col("lang").alias("grp"),
        F.col("source").alias("value"),
        (F.col("n_chars") / 1000.0).alias("conf"),
        F.expr(_WEIGHT).cast("double").alias("weight"),
    )


def weighted_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winning value per group by summed conf*weight score.

    Ties break by value ascending (deterministic, unlike the reference's
    dict-insertion-order tie — a neutralized non-determinism, SURVEY §7.5)."""
    cands = _candidates(spark, sf_dir)
    scores = (cands.groupBy("grp", "value")
              .agg(F.round(F.sum(F.col("conf") * F.col("weight")), 6).alias("score"),
                   F.count("*").alias("n_votes")))
    w = Window.partitionBy("grp").orderBy(F.col("score").desc(), F.col("value"))
    return (scores.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") == 1)
            .select("grp", F.col("value").alias("chosen_value"), "score", "n_votes")
            .orderBy("grp"))


WEIGHTED_VOTE_SQL = f"""
WITH cands AS (
  SELECT lang AS grp, source AS value,
         n_chars / 1000.0 AS conf,
         CAST({_WEIGHT.replace("substr(source, 4)", "substr(source, 4)")} AS DOUBLE)
           AS weight
  FROM documents
), scores AS (
  SELECT grp, value, round(sum(conf * weight), 6) AS score, count(*) AS n_votes
  FROM cands GROUP BY grp, value
)
SELECT grp, value AS chosen_value, score, n_votes FROM (
  SELECT grp, value, score, n_votes,
         row_number() OVER (PARTITION BY grp ORDER BY score DESC, value) AS rank
  FROM scores
) WHERE rank = 1
ORDER BY grp
"""


def consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-agreed value per group (count of candidate rows), weighted-vote
    score as tie-break, then value ascending — fuse.py:342-373 with the
    fallback folded into the ordering."""
    cands = _candidates(spark, sf_dir)
    scores = (cands.groupBy("grp", "value")
              .agg(F.count("*").alias("n_agree"),
                   F.round(F.sum(F.col("conf") * F.col("weight")), 6).alias("score")))
    w = Window.partitionBy("grp").orderBy(
        F.col("n_agree").desc(), F.col("score").desc(), F.col("value"))
    return (scores.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") == 1)
            .select("grp", F.col("value").alias("consensus_value"),
                    "n_agree", "score")
            .orderBy("grp"))


CONSENSUS_SQL = f"""
WITH cands AS (
  SELECT lang AS grp, source AS value,
         n_chars / 1000.0 AS conf,
         CAST({_WEIGHT} AS DOUBLE) AS weight
  FROM documents
), scores AS (
  SELECT grp, value, count(*) AS n_agree,
         round(sum(conf * weight), 6) AS score
  FROM cands GROUP BY grp, value
)
SELECT grp, value AS consensus_value, n_agree, score FROM (
  SELECT grp, value, n_agree, score,
         row_number() OVER (PARTITION BY grp
                            ORDER BY n_agree DESC, score DESC, value) AS rank
  FROM scores
) WHERE rank = 1
ORDER BY grp
"""


def field_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status determination (fuse.py:375-408) as a CASE over aggregates:
    per (grp=lang, value=source): >=2 rows & avg conf >= 0.7 -> confident;
    1 row -> single_source; avg conf < 0.5 -> uncertain; else confident."""
    cands = _candidates(spark, sf_dir)
    agg = (cands.groupBy("grp", "value")
           .agg(F.count("*").alias("n_sources"),
                F.round(F.avg("conf"), 6).alias("avg_conf")))
    status = (F.when((F.col("n_sources") >= 2) & (F.col("avg_conf") >= 0.7), "confident")
              .when(F.col("n_sources") == 1, "single_source")
              .when(F.col("avg_conf") < 0.5, "uncertain")
              .otherwise("confident"))
    return (agg.withColumn("status", status)
            .select("grp", "value", "n_sources", "avg_conf", "status")
            .orderBy("grp", "value"))


FIELD_STATUS_SQL = f"""
WITH cands AS (
  SELECT lang AS grp, source AS value, n_chars / 1000.0 AS conf
  FROM documents
), agg AS (
  SELECT grp, value, count(*) AS n_sources, round(avg(conf), 6) AS avg_conf
  FROM cands GROUP BY grp, value
)
SELECT grp, value, n_sources, avg_conf,
  CASE WHEN n_sources >= 2 AND avg_conf >= 0.7 THEN 'confident'
       WHEN n_sources = 1 THEN 'single_source'
       WHEN avg_conf < 0.5 THEN 'uncertain'
       ELSE 'confident' END AS status
FROM agg
ORDER BY grp, value
"""
