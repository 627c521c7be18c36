"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All hashing is md5-based (kernel.dedup rationale) so Spark and the DuckDB
oracle produce identical values. The distributed shapes:

- exact:     groupBy(content-hash) — one map-side-combined shuffle
- minhash:   explode(words) x seeds -> min per (doc, seed); at 10^12 docs the
             explode is narrow and the min-agg combines map-side, so shuffle
             volume is n_docs * n_seeds tiny rows, not the corpus
- LSH pairs: band-key self-join — the classic bucket join; band keys are
             computed from the signature (no cross join ever materializes)
- simhash:   explode(words x 32 bits) -> signed vote per bit -> pack
- jaccard:   blocked pair join (first-k-words block key) + array intersect

Reference parity note: the reference's only dedup is exact content-hash
upload dedup (web/app.py, tests/test_io.py:259-288) = `exact_dedup` here;
the near-dup family is the training-data-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import table

NUM_HASHES = 8
BANDS = 2  # 4 rows per band


def _words(col):
    return F.filter(F.split(F.lower(col), " "), lambda x: x != "")


def _rebalanced(df: DataFrame):
    """Fan-out stages inherit the scan's split count — a single small file
    means a single task doing the whole explode. Rebalance rows across the
    cluster BEFORE the fan-out so the (words x seeds/bits) explosion
    parallelizes; the pre-explode shuffle is tiny (one row per doc)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


# --- exact dedup (C6: sha-keyed upload dedup, dataset form) -------------------


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group documents by content hash; keep the smallest doc_id as the
    canonical representative (deterministic winner), count duplicates."""
    docs = table(spark, sf_dir, "documents")
    return (docs
            .groupBy(F.md5(F.lower(F.col("text"))).alias("content_hash"))
            .agg(F.min("doc_id").alias("canonical_doc_id"),
                 F.count("*").alias("n_copies"))
            .orderBy("canonical_doc_id"))


EXACT_DEDUP_SQL = """
SELECT md5(lower(text)) AS content_hash,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
ORDER BY canonical_doc_id
"""


# --- MinHash signatures --------------------------------------------------------


def _minhash_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seed, minhash) long-form: explode words, cross the tiny seed
    range (broadcast — 8 rows), min-agg. Map-side combine keeps the shuffle
    at n_docs x n_seeds rows regardless of corpus size."""
    docs = _rebalanced(table(spark, sf_dir, "documents"))
    words = docs.select(
        "doc_id", F.explode(F.array_distinct(_words(F.col("text")))).alias("w"))
    seeds = spark.range(NUM_HASHES).toDF("seed")
    return (words.crossJoin(F.broadcast(seeds))
            .groupBy("doc_id", "seed")
            .agg(F.min(F.md5(F.concat_ws(":", F.col("seed"), F.col("w"))))
                 .alias("mh")))


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide signature: one row per doc, sig_0..sig_7."""
    long = _minhash_long(spark, sf_dir)
    aggs = [F.min(F.when(F.col("seed") == i, F.col("mh"))).alias(f"sig_{i}")
            for i in range(NUM_HASHES)]
    return long.groupBy("doc_id").agg(*aggs).orderBy("doc_id")


MINHASH_SIGNATURES_SQL = f"""
WITH words AS (
  SELECT DISTINCT doc_id, w
  FROM (SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
        FROM documents)
), long AS (
  SELECT doc_id, seed, min(md5(seed || ':' || w)) AS mh
  FROM words CROSS JOIN (SELECT unnest(range({NUM_HASHES})) AS seed)
  GROUP BY doc_id, seed
)
SELECT doc_id,
  {", ".join(f"min(CASE WHEN seed = {i} THEN mh END) AS sig_{i}" for i in range(NUM_HASHES))}
FROM long
GROUP BY doc_id
ORDER BY doc_id
"""


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: docs sharing any band key (band = md5 of 4 joined
    signature rows). Self-join on the band key — the only shuffle is by
    band_key, and bucket sizes are the natural skew bound."""
    sig = minhash_signatures(spark, sf_dir)
    rows_per_band = NUM_HASHES // BANDS
    bands = []
    for b in range(BANDS):
        cols = [F.col(f"sig_{i}") for i in range(b * rows_per_band,
                                                 (b + 1) * rows_per_band)]
        bands.append(sig.select(
            "doc_id",
            F.concat(F.lit(f"{b}:"), F.md5(F.concat_ws("|", *cols))).alias("band_key")))
    all_bands = bands[0]
    for extra in bands[1:]:
        all_bands = all_bands.unionByName(extra)
    a, b_ = all_bands.alias("a"), all_bands.alias("b")
    return (a.join(b_, (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct()
            .orderBy("doc_a", "doc_b"))


_BAND_KEYS_CTE = f"""
sig AS ({MINHASH_SIGNATURES_SQL.replace("ORDER BY doc_id", "")}),
bands AS (
  SELECT doc_id, '0:' || md5(sig_0||'|'||sig_1||'|'||sig_2||'|'||sig_3) AS band_key FROM sig
  UNION ALL
  SELECT doc_id, '1:' || md5(sig_4||'|'||sig_5||'|'||sig_6||'|'||sig_7) AS band_key FROM sig
)
"""

MINHASH_LSH_PAIRS_SQL = f"""
WITH {_BAND_KEYS_CTE}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


# --- SimHash --------------------------------------------------------------------


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (kernel.dedup.simhash32 distributed):
    token hash = top-32 bits of md5; per bit, sign of the +1/-1 vote sum.

    Token multiplicity counts (same as the kernel: votes per occurrence).
    """
    docs = _rebalanced(table(spark, sf_dir, "documents"))
    toks = (docs
            .select("doc_id", F.explode(_words(F.col("text"))).alias("w"))
            .select("doc_id",
                    F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10)
                    .cast("long").alias("h")))
    # One conditional-sum aggregate per bit instead of a 32x bit fan-out:
    # a single groupBy(doc_id) with 32 agg expressions shuffles 1 row/doc,
    # vs 32 rows/doc-token for the naive explode — same result, ~30x less
    # shuffle and no crossJoin stage.
    votes = [F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1)
                   .otherwise(-1)).alias(f"v{b}") for b in range(32)]
    packed = None
    for b in range(32):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")) \
            .otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed + term
    return (toks.groupBy("doc_id").agg(*votes)
            .select("doc_id", packed.alias("simhash"))
            .orderBy("doc_id"))


SIMHASH_SQL = """
WITH toks AS (
  SELECT doc_id,
         ('0x' || substr(md5(w), 1, 8))::BIGINT AS h
  FROM (SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
        FROM documents)
), votes AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM toks CROSS JOIN (SELECT unnest(range(32)) AS b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT)
         AS simhash
FROM votes
GROUP BY doc_id
ORDER BY doc_id
"""


# --- n-gram (word-set) Jaccard pairs ---------------------------------------------


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-set Jaccard >= 0.9, blocked on the first five
    words (blocking turns the quadratic pair space into per-block joins —
    the standard scale pattern; recall is traded explicitly and the block
    key is cheap to widen)."""
    docs = table(spark, sf_dir, "documents")
    prepped = docs.select(
        "doc_id",
        F.array_distinct(_words(F.col("text"))).alias("ws"),
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 5)).alias("blk"))
    a, b = prepped.alias("a"), prepped.alias("b")
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws")))
    union = F.size(F.array_union(F.col("a.ws"), F.col("b.ws")))
    jac = inter.cast("double") / union
    return (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.round(jac, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= 0.9)
            .orderBy("doc_a", "doc_b"))


NGRAM_JACCARD_PAIRS_SQL = """
WITH prepped AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS ws,
         array_to_string(string_split(text, ' ')[1:5], ' ') AS blk
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
             / len(list_distinct(list_concat(a.ws, b.ws))), 6) AS jaccard
FROM prepped a JOIN prepped b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE round(CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
            / len(list_distinct(list_concat(a.ws, b.ws))), 6) >= 0.9
ORDER BY doc_a, doc_b
"""
