"""Composed end-to-end operators: the training-pipeline flows built from the
primitive operators, each still DuckDB-oracle-exact.

- embedding_cosine_pairs: embedding-space near-dup candidate pairs (the
  "embedding-cosine near-dup" dedup family member). Brute-force pair join
  at oracle scale; the production path blocks by similarity.lsh_bucket_ann
  buckets first. Threshold 0.45 chosen from the data (max pairwise cosine
  in the driver corpus is 0.51 — a 0.95 "true dup" threshold would be
  vacuously empty).
- neardup_verdict: the full dedup flow composed — block -> word-set
  jaccard >= 0.9 -> canonical survivor (min doc_id per duplicate cluster) ->
  per-document keep/drop verdict. One row per document.
- supplier_region_rollup: full star-schema coverage (supplier-nation-region
  broadcast join chain + aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import table
from .similarity import _dot, _dvec, _sqnorm

COSINE_PAIR_THRESHOLD = 0.45


def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All vector pairs with cosine >= 0.45, exact. vec_id < vec_id halves
    the pair space; rounding to 4dp for cross-engine float stability."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec(F.col("embedding")).alias("v"))
    a = emb.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    sim = F.round(
        _dot(F.col("va"), F.col("vb"))
        / (F.sqrt(_sqnorm(F.col("va"))) * F.sqrt(_sqnorm(F.col("vb")))), 4)
    return (a.join(b, F.col("ia") < F.col("ib"))
            .select("ia", "ib", sim.alias("cos_sim"))
            .filter(F.col("cos_sim") >= COSINE_PAIR_THRESHOLD)
            .orderBy("ia", "ib"))


EMBEDDING_COSINE_PAIRS_SQL = f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
    round(
      list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i] * b.v[i]))
      / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
         * sqrt(list_sum(list_transform(b.v, x -> x*x)))), 4) AS cos_sim
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
)
SELECT ia, ib, cos_sim FROM pairs
WHERE cos_sim >= {COSINE_PAIR_THRESHOLD}
ORDER BY ia, ib
"""


def neardup_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document dedup verdict: the composed flow
    block (first-5-words) -> word-set jaccard >= 0.9 -> duplicate clusters
    -> canonical survivor = min doc_id -> keep/drop per doc.

    Cluster formation uses the canonical-anchor rule (every duplicate maps
    to the smallest doc_id it pairs with), the standard scalable
    approximation of connected components for near-dup graphs.
    """
    docs = table(spark, sf_dir, "documents")
    prepped = docs.select(
        "doc_id",
        F.array_distinct(F.filter(F.split(F.lower(F.col("text")), " "),
                                  lambda x: x != "")).alias("ws"),
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 5)).alias("blk"))
    a, b = prepped.alias("a"), prepped.alias("b")
    jac = (F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws"))).cast("double")
           / F.size(F.array_union(F.col("a.ws"), F.col("b.ws"))))
    pairs = (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("keep_id"),
                     F.col("b.doc_id").alias("dup_id"),
                     F.round(jac, 6).alias("j"))
             .filter(F.col("j") >= 0.9))
    anchor = pairs.groupBy("dup_id").agg(F.min("keep_id").alias("canonical_id"))
    return (docs.select("doc_id")
            .join(anchor, docs.doc_id == anchor.dup_id, "left")
            .select("doc_id",
                    F.coalesce("canonical_id", "doc_id").alias("canonical_id"),
                    F.col("canonical_id").isNotNull().alias("is_duplicate"))
            .orderBy("doc_id"))


NEARDUP_VERDICT_SQL = """
WITH prepped AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(lower(text), ' '),
                                   x -> x <> '')) AS ws,
         array_to_string(string_split(text, ' ')[1:5], ' ') AS blk
  FROM documents
), pairs AS (
  SELECT a.doc_id AS keep_id, b.doc_id AS dup_id,
         round(CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
               / len(list_distinct(list_concat(a.ws, b.ws))), 6) AS j
  FROM prepped a JOIN prepped b ON a.blk = b.blk AND a.doc_id < b.doc_id
), anchor AS (
  SELECT dup_id, min(keep_id) AS canonical_id
  FROM pairs WHERE j >= 0.9 GROUP BY dup_id
)
SELECT d.doc_id,
       coalesce(a.canonical_id, d.doc_id) AS canonical_id,
       a.canonical_id IS NOT NULL AS is_duplicate
FROM documents d LEFT JOIN anchor a ON d.doc_id = a.dup_id
ORDER BY d.doc_id
"""


def supplier_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema coverage: supplier -> nation -> region broadcast-join
    chain, account balances rolled up per region."""
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region")
    return (sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
            .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
            .groupBy(F.col("r_name").alias("region"))
            .agg(F.count("*").alias("n_suppliers"),
                 F.round(F.sum("s_acctbal"), 2).alias("total_acctbal"),
                 F.round(F.avg("s_acctbal"), 4).alias("avg_acctbal"))
            .orderBy("region"))


SUPPLIER_REGION_ROLLUP_SQL = """
SELECT r_name AS region,
       count(*) AS n_suppliers,
       round(sum(s_acctbal), 2) AS total_acctbal,
       round(avg(s_acctbal), 4) AS avg_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY region
"""
