"""C5/R7 mapping rules as oracle-checked relational operators.

The kernel's wire-shape mapper (kernel/azure_map.py) covers the dict-level
parity with azure/doc_intelligence.py:385-658 and
extract/pdf_style_extractor.py:261-343. These operators express the SAME
decision rules over synthesized per-document Azure-ish rows so the driver's
DuckDB gate checks them end-to-end:

- c5_azure_line_map: word->line span membership, line confidence =
  average word confidence with the 0.9 no-words default, paragraph role ->
  region type (ROLE_MAP, default text).
- r7_azure_styles: char-offset interval overlap between line spans and
  style spans -> per-line bold/italic/handwritten, azure_detected vs
  estimated source, 0.85/0.6 confidence, 0.75*height size clamp.

Scale notes: c5 is explode + one map-side-combined groupBy keyed by
(doc_id, line) — a single key-sized shuffle. r7 joins lines to styles on
the doc_id EQUI key with the interval test as a post-join filter; styles
per document are bounded (Azure emits a handful per doc), so the join
fan-out is O(lines * styles_per_doc), not a range join over the corpus.
Confidences are exact dyadic rationals (0.5 + k/8192): averages are
bit-exact across engines in any aggregation order, only outputs round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import table

LINES_PER_DOC = 4
WORDS_PER_LINE = 3

# line index -> synthesized Azure paragraph role (exercises ROLE_MAP's
# title/sectionHeading/default/pageFooter branches)
_ROLES = {0: "title", 1: "sectionHeading", 2: "", 3: "pageFooter"}


def c5_azure_line_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 line mapping (doc_intelligence.py:385-462 + :40-47 ROLE_MAP):
    4 lines/doc; lines with index % 4 == 3 carry no words (the 0.9 default
    confidence branch); others average their 3 words' dyadic confidences;
    role -> region type."""
    docs = table(spark, sf_dir, "documents")
    lines = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(LINES_PER_DOC - 1)))
        .alias("line"))
    words = lines.filter(F.col("line") % 4 != 3).select(
        "doc_id", "line",
        F.explode(F.sequence(F.lit(0), F.lit(WORDS_PER_LINE - 1)))
        .alias("w"))
    wconf = (F.lit(0.5)
             + (F.col("doc_id") * 31 + F.col("line") * 7 + F.col("w"))
             % 4096 / F.lit(8192.0))
    word_avg = (words.withColumn("wconf", wconf)
                .groupBy("doc_id", "line")
                .agg(F.avg("wconf").alias("avg_conf"),
                     F.count("*").alias("n_words")))
    role = F.element_at(
        F.create_map([F.lit(x) for kv in _ROLES.items() for x in kv]),
        F.col("line"))
    region_type = (F.when(role.isin("title", "sectionHeading"), "title")
                   .when(role == "pageHeader", "header")
                   .when(role.isin("pageFooter", "footnote"), "footer")
                   .when(role == "pageNumber", "page_number")
                   .otherwise("text"))
    return (lines.join(word_avg, ["doc_id", "line"], "left")
            .select("doc_id", "line",
                    F.coalesce("n_words", F.lit(0)).alias("n_words"),
                    F.round(F.coalesce("avg_conf", F.lit(0.9)), 4)
                    .alias("conf"),
                    region_type.alias("region_type"))
            .orderBy("doc_id", "line"))


C5_AZURE_LINE_MAP_SQL = f"""
WITH lines AS (
  SELECT doc_id, k AS line
  FROM documents, (SELECT unnest(range({LINES_PER_DOC})) AS k)
), words AS (
  SELECT doc_id, line, w,
         0.5 + (doc_id * 31 + line * 7 + w) % 4096 / 8192.0 AS wconf
  FROM lines, (SELECT unnest(range({WORDS_PER_LINE})) AS w)
  WHERE line % 4 <> 3
), word_avg AS (
  SELECT doc_id, line, avg(wconf) AS avg_conf, count(*) AS n_words
  FROM words GROUP BY doc_id, line
)
SELECT l.doc_id, l.line,
       COALESCE(n_words, 0) AS n_words,
       round(COALESCE(avg_conf, CAST(0.9 AS DOUBLE)), 4) AS conf,
       CASE l.line WHEN 0 THEN 'title' WHEN 1 THEN 'title'
                   WHEN 3 THEN 'footer' ELSE 'text' END AS region_type
FROM lines l LEFT JOIN word_avg USING (doc_id, line)
ORDER BY doc_id, line
"""


# --- R7: offset-interval style map ------------------------------------------

LINE_LEN = 20          # chars per synthesized line
LINE_STRIDE = 21       # +1 newline: line k spans [k*21, k*21+20)
STYLE_LINES = 5


def r7_azure_styles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7 interval style map (pdf_style_extractor.py:261-343): 5 fixed-width
    lines per doc; per doc_id%3!=0, three style spans — bold over line 1,
    italic over the first 17 chars of line 3, handwritten over the first 10
    chars of line 0. A line takes a flag iff ANY char overlaps
    (line_start < span_end AND span_start < line_end); source/confidence
    follow the detected-vs-estimated rule; size = 0.75 * (10 + 2*line)
    height, clamped [6, 72]."""
    docs = table(spark, sf_dir, "documents")
    lines = (docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(STYLE_LINES - 1)))
        .alias("line"))
        .withColumn("lo", F.col("line") * LINE_STRIDE)
        .withColumn("hi", F.col("line") * LINE_STRIDE + LINE_LEN))
    styled = docs.filter(F.col("doc_id") % 3 != 0)
    spans = styled.select(
        "doc_id",
        F.explode(F.array(
            F.struct(F.lit(1 * LINE_STRIDE).alias("s_lo"),
                     F.lit(1 * LINE_STRIDE + LINE_LEN).alias("s_hi"),
                     F.lit("bold").alias("kind")),
            F.struct(F.lit(3 * LINE_STRIDE).alias("s_lo"),
                     F.lit(3 * LINE_STRIDE + 17).alias("s_hi"),
                     F.lit("italic").alias("kind")),
            F.struct(F.lit(0).alias("s_lo"), F.lit(10).alias("s_hi"),
                     F.lit("handwritten").alias("kind")),
        )).alias("sp")).select("doc_id", "sp.*")
    overlap = (F.col("lo") < F.col("s_hi")) & (F.col("s_lo") < F.col("hi"))
    joined = lines.join(spans, ["doc_id"], "left").withColumn(
        "hit", F.when(overlap, F.col("kind")))
    flags = (joined.groupBy("doc_id", "line")
             .agg(F.max(F.when(F.col("hit") == "bold", 1).otherwise(0))
                  .alias("bold"),
                  F.max(F.when(F.col("hit") == "italic", 1).otherwise(0))
                  .alias("italic"),
                  F.max(F.when(F.col("hit") == "handwritten", 1).otherwise(0))
                  .alias("handwritten")))
    detected = (F.col("bold") == 1) | (F.col("italic") == 1)
    size = F.round(
        F.least(F.lit(72.0),
                F.greatest(F.lit(6.0),
                           (10 + F.col("line") * 2) * F.lit(0.75))), 1)
    return (flags.select(
        "doc_id", "line", "bold", "italic", "handwritten",
        F.when(detected, "azure_detected").otherwise("estimated")
        .alias("style_source"),
        F.when(detected, 0.85).otherwise(0.6).alias("style_conf"),
        size.alias("font_size"))
        .orderBy("doc_id", "line"))


R7_AZURE_STYLES_SQL = f"""
WITH lines AS (
  SELECT doc_id, k AS line, k * {LINE_STRIDE} AS lo,
         k * {LINE_STRIDE} + {LINE_LEN} AS hi
  FROM documents, (SELECT unnest(range({STYLE_LINES})) AS k)
), spans AS (
  SELECT doc_id, s_lo, s_hi, kind FROM documents, (VALUES
    ({1 * LINE_STRIDE}, {1 * LINE_STRIDE + LINE_LEN}, 'bold'),
    ({3 * LINE_STRIDE}, {3 * LINE_STRIDE + 17}, 'italic'),
    (0, 10, 'handwritten')) AS v(s_lo, s_hi, kind)
  WHERE doc_id % 3 <> 0
), flags AS (
  SELECT l.doc_id, l.line,
         max(CASE WHEN l.lo < s.s_hi AND s.s_lo < l.hi
                   AND s.kind = 'bold' THEN 1 ELSE 0 END) AS bold,
         max(CASE WHEN l.lo < s.s_hi AND s.s_lo < l.hi
                   AND s.kind = 'italic' THEN 1 ELSE 0 END) AS italic,
         max(CASE WHEN l.lo < s.s_hi AND s.s_lo < l.hi
                   AND s.kind = 'handwritten' THEN 1 ELSE 0 END)
           AS handwritten
  FROM lines l LEFT JOIN spans s USING (doc_id)
  GROUP BY l.doc_id, l.line
)
SELECT doc_id, line, bold, italic, handwritten,
       CASE WHEN bold = 1 OR italic = 1 THEN 'azure_detected'
            ELSE 'estimated' END AS style_source,
       -- CAST: DuckDB literals are DECIMAL; Spark emits DOUBLE
       CASE WHEN bold = 1 OR italic = 1 THEN CAST(0.85 AS DOUBLE)
            ELSE CAST(0.6 AS DOUBLE) END AS style_conf,
       round(least(CAST(72.0 AS DOUBLE),
                   greatest(6.0, (10 + line * 2) * 0.75)), 1) AS font_size
FROM flags
ORDER BY doc_id, line
"""
