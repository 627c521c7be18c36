"""Arrow-batched (pandas UDF / mapInPandas) operators with exact oracles.

These prove the Python-side path end-to-end: the kernel functions running
inside Arrow batches produce values an independent SQL engine reproduces.
The trick for oracle-checkability: inputs are CONSTRUCTED deterministically
from table columns, so DuckDB can recompute the expected output without
running any Python.

- k1_parse_tagged:  kernel.kie.parse_kie_output in a pandas UDF over
                    synthesized `<s_...>` strings (K1, donut_runner.py:179-236);
                    oracle = regexp extraction of the same tags
- token_count_arrow: kernel tokenizer in a pandas UDF; oracle = the same
                    whitespace-token SQL as the expression version (proves
                    kernel and Catalyst agree)
- multimodal_meta:  binary image columns built in-stage (real PNG headers,
                    dimensions derived from doc_id), parsed back by
                    kernel.multimodal.parse_image_meta via mapInPandas;
                    oracle = recompute the dimension formula in SQL
- k9_anchor_join:   spatial-anchoring relational form (orchestrator.py:
                    1180-1302 strategy 1: exact word match) — field values
                    joined to exploded document words
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, LongType, StringType, StructField,
                               StructType)

from ..kernel.kie import parse_kie_output
from ..kernel.multimodal import parse_image_meta
from ..kernel.textstats import tokenize_ws
from . import table

# --- K1: tag parse via pandas UDF ------------------------------------------------


@F.pandas_udf(StringType())
def _parse_total_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: str(parse_kie_output(x).get("total", "")))


@F.pandas_udf(StringType())
def _parse_lang_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: str(parse_kie_output(x).get("lang_tag", "")))


def k1_parse_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize Donut-style tagged output per document, parse it with the
    real kernel parser inside an Arrow batch."""
    docs = table(spark, sf_dir, "documents")
    tagged = F.concat(
        F.lit("<s_total>"), F.col("n_chars").cast("string"), F.lit("</s_total>"),
        F.lit("<s_lang_tag>"), F.col("lang"), F.lit("</s_lang_tag>"))
    return (docs.select("doc_id", tagged.alias("tagged"))
            .select("doc_id",
                    _parse_total_udf("tagged").alias("parsed_total"),
                    _parse_lang_udf("tagged").alias("parsed_lang"))
            .orderBy("doc_id"))


K1_PARSE_TAGGED_SQL = """
WITH tagged AS (
  SELECT doc_id,
         '<s_total>' || CAST(n_chars AS VARCHAR) || '</s_total>'
         || '<s_lang_tag>' || lang || '</s_lang_tag>' AS t
  FROM documents
)
SELECT doc_id,
       regexp_extract(t, '<s_total>(.*?)</s_total>', 1) AS parsed_total,
       regexp_extract(t, '<s_lang_tag>(.*?)</s_lang_tag>', 1) AS parsed_lang
FROM tagged
ORDER BY doc_id
"""


# --- token count via pandas UDF ----------------------------------------------------


@F.pandas_udf(IntegerType())
def _n_tokens_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: len(tokenize_ws(x or "")))


def token_count_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kernel tokenizer through Arrow — must agree with the pure-SQL
    token_count oracle (same output contract as textops.token_count)."""
    docs = table(spark, sf_dir, "documents")
    return (docs.select("doc_id", _n_tokens_udf("text").alias("n_tokens"))
            .orderBy("doc_id"))


TOKEN_COUNT_ARROW_SQL = """
SELECT doc_id,
  CAST(len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS INT)
    AS n_tokens
FROM documents
ORDER BY doc_id
"""


# --- multimodal binary plumbing -----------------------------------------------------

_META_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("format", StringType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("n_bytes", IntegerType(), False),
])


def _png_bytes(width: int, height: int) -> bytes:
    """A real PNG signature + IHDR header (enough for metadata parsing —
    the decode step is deliberately stubbed per the multimodal brief)."""
    import zlib
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary image columns through the engine: build deterministic
    PNG bytes per doc (width/height derived from doc_id), ship them through
    Arrow as a binary column, parse the real container headers back with
    kernel.multimodal.parse_image_meta inside mapInPandas."""
    docs = table(spark, sf_dir, "documents").select("doc_id")

    def stage(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                png = _png_bytes(64 + d % 192, 48 + d % 144)
                meta = parse_image_meta(png)
                rows.append((d, meta["format"], meta["width"], meta["height"],
                             meta["n_bytes"]))
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "format", "width",
                                                  "height", "n_bytes"])

    return docs.mapInPandas(stage, _META_SCHEMA).orderBy("doc_id")


MULTIMODAL_META_SQL = """
SELECT doc_id, 'png' AS format,
       CAST(64 + doc_id % 192 AS INT) AS width,
       CAST(48 + doc_id % 144 AS INT) AS height,
       CAST(33 AS INT) AS n_bytes
FROM documents
ORDER BY doc_id
"""


def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-column plumbing: deterministic uniform frame sampling
    (kernel.multimodal.frame_sample_indices) as pure Catalyst expressions —
    per synthetic video (n_frames derived from doc_id), the k sampled frame
    indices, exploded one row per sampled frame. At scale this is the
    pre-decode step: the binary payload is untouched until the sampled
    frame list is known (decode only what survives the sample)."""
    k = 8
    docs = table(spark, sf_dir, "documents").select("doc_id")
    vids = docs.withColumn("n_frames", (F.col("doc_id") % 240 + 1).cast("int"))
    # k >= n_frames -> every frame; else floor(i * n / k), i in 0..k-1
    idx_full = F.sequence(F.lit(0), F.col("n_frames") - 1)
    idx_sampled = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.floor(i * F.col("n_frames") / k).cast("int"))
    return (vids.select(
        "doc_id", "n_frames",
        F.explode(F.when(F.col("n_frames") <= k, idx_full)
                  .otherwise(idx_sampled)).alias("frame_idx"))
        .orderBy("doc_id", "frame_idx"))


MULTIMODAL_FRAMESAMPLE_SQL = """
WITH vids AS (
  SELECT doc_id, CAST(doc_id % 240 + 1 AS INT) AS n_frames FROM documents
)
SELECT doc_id, n_frames, CAST(frame_idx AS INT) AS frame_idx
FROM (
  SELECT doc_id, n_frames,
         unnest(CASE WHEN n_frames <= 8
                THEN range(0, n_frames)
                ELSE list_transform(range(0, 8),
                                    i -> CAST(floor(i * n_frames / 8) AS BIGINT))
                END) AS frame_idx
  FROM vids
)
ORDER BY doc_id, frame_idx
"""


# --- K9: anchoring as a relational join ------------------------------------------------


def k9_anchor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor field values to document text (exact word match, strategy 1 of
    orchestrator.py:1186-1213). The "field value" list = each document's
    leading word (the generator's analogue of extracted field values), so
    anchors genuinely resolve. Broadcast the tiny value side; the big side
    is an exploded-word aggregate."""
    docs = table(spark, sf_dir, "documents")
    values = (docs.select(
        F.lower(F.trim(F.element_at(F.split(F.col("text"), " "), 1)))
        .alias("value"))
        .filter(F.col("value") != "").distinct())
    words = docs.select(
        "doc_id",
        F.explode(F.array_distinct(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")))
        .alias("w"))
    return (words.join(F.broadcast(values), words.w == values.value)
            .groupBy("value")
            .agg(F.countDistinct("doc_id").alias("n_docs_containing"))
            .orderBy("value"))


# --- S6: markdown report render (rows-only check — markdown structure is
# --- not SQL-expressible; the kernel renderer is pinned by unit tests) ----------


def s6_markdown_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render a markdown report per document through a pandas UDF over a
    Document-shaped dict (io/markdown.py:379-457 semantics). Output is
    structural (lengths/section flags) so the driver's rows-only check
    still pins cardinality and schema."""
    from ..kernel.markdown import generate_markdown

    docs = table(spark, sf_dir, "documents")

    @F.pandas_udf(StringType())
    def render(doc_id: pd.Series, text: pd.Series, lang: pd.Series) -> pd.Series:
        out = []
        for d, t, lg in zip(doc_id, text, lang):
            doc = {
                "metadata": {"url": f"doc-{d}", "file_type": "text",
                             "file_size_bytes": len(t or ""), "lang": lg},
                "title": f"Document {d}",
                "page_count": 1,
                "pages": [{"number": 1, "raw_text": (t or "")[:200]}],
                "tables": [], "fields": [],
                "validation": {"passed": True, "total_checks": 0,
                               "passed_checks": 0, "issues": []},
            }
            out.append(generate_markdown(doc, generated_at="2026-01-01 00:00:00"))
        return pd.Series(out)

    md = docs.select("doc_id", render("doc_id", "text", "lang").alias("md"))
    return (md.select(
        "doc_id",
        F.length("md").alias("md_chars"),
        F.col("md").contains("## Document Information").alias("has_info_section"),
        F.col("md").contains("## Title").alias("has_title_section"))
        .orderBy("doc_id"))


K9_ANCHOR_JOIN_SQL = """
WITH value_list AS (
  SELECT DISTINCT lower(trim(string_split(text, ' ')[1])) AS value
  FROM documents
  WHERE lower(trim(string_split(text, ' ')[1])) <> ''
), words AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
  FROM documents
)
SELECT value, count(DISTINCT doc_id) AS n_docs_containing
FROM words JOIN value_list ON w = value
GROUP BY value
ORDER BY value
"""


# --- O7 full pass as a grouped-map (applyInPandas) operator -----------------------


def o7_reocr_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete targeted re-OCR pass as a dataset operator: per user_id
    ("page"), run kernel.reocr.process_lines over the group's events —
    selection (conf < 0.70, worst 5), deterministic recompute
    (conf + 0.20, text unchanged -> improvement 0.20 >= 0.05 accepted),
    in-place apply. Grouped-map applyInPandas: each page's lines must be
    processed together because the worst-K cap is per page.

    Oracle: the same selection + acceptance algebra in SQL (row_number
    over conf within user, cap 5, CASE acceptance).
    """
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    from ..kernel.reocr import process_lines

    ev = table(spark, sf_dir, "events")
    lines = ev.select("user_id", "event_id",
                      F.col("event_type").alias("text"),
                      F.round(F.col("value") / 500.0, 6).alias("confidence"))

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("text", StringType()),
        StructField("confidence", DoubleType()),
        StructField("source", StringType()),
    ])

    def reocr_group(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = [{"event_id": int(e), "text": t,
                 "confidence": float(c), "source": "ocr"}
                for e, t, c in zip(pdf["event_id"], pdf["text"],
                                   pdf["confidence"])]
        # deterministic selection order: the kernel cap sorts by confidence
        # (stable), so pre-sort rows by (confidence, event_id) as the
        # reference's list order would be after its page-order scan
        rows.sort(key=lambda r: (r["confidence"], r["event_id"]))
        process_lines(rows,
                      recompute=lambda ln: (ln["text"],
                                            round(ln["confidence"] + 0.20, 6)),
                      max_lines=5)
        uid = int(pdf["user_id"].iloc[0])
        return pd.DataFrame([{
            "user_id": uid, "event_id": r["event_id"], "text": r["text"],
            "confidence": round(r["confidence"], 6), "source": r["source"],
        } for r in rows])

    return (lines.groupBy("user_id").applyInPandas(reocr_group, out_schema)
            .orderBy("user_id", "event_id"))


O7_REOCR_PASS_SQL = """
WITH lines AS (
  SELECT user_id, event_id, event_type AS text,
         round(value / 500.0, 6) AS confidence
  FROM events
), ranked AS (
  SELECT user_id, event_id, text, confidence,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY confidence, event_id) AS rn
  FROM lines
)
SELECT user_id, event_id, text,
       CASE WHEN confidence < 0.70 AND rn <= 5
            THEN round(round(confidence + 0.20, 6), 6)
            ELSE confidence END AS confidence,
       CASE WHEN confidence < 0.70 AND rn <= 5
            THEN 'reocr' ELSE 'ocr' END AS source
FROM ranked
ORDER BY user_id, event_id
"""
