"""Dataset-level operators for the multi-page document model (S1) and
spatial anchoring position algebra (K9 strategy 3), plus the exploded
candidates[] roundtrip (the nested Field schema's dataset form).

All pure Catalyst expressions — explode/slice/window — no Python in the hot
path; each has an exact DuckDB oracle.

Scale notes:
- s1_page_fanout: fan-out operators inherit scan splits; callers at real
  scale should rebalance before exploding (the engine does, see
  operators/dedup.py:35-40). Page stats are computed per exploded row
  (narrow), the only shuffle is the final sort (oracle determinism only —
  production omits it).
- k9_substring_span: word positions via a cumulative-sum window partitioned
  by doc_id — shuffle is one row per word bounded by the 12-word line cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import table

PAGE_TOKENS = 40  # tokens per synthesized page


def s1_page_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 page fan-out (reference per-page loop, orchestrator.py:497-513):
    documents -> pages[] explode -> per-page stats -> doc-level rollup
    columns. Pages are synthesized deterministically: 40 tokens per page."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.col("text"), " "), lambda x: x != "").alias("tokens"))
    toks = toks.select(
        "doc_id", "tokens",
        F.size("tokens").alias("n_tokens_total"),
        F.ceil(F.size("tokens") / float(PAGE_TOKENS)).cast("int").alias("page_count"))
    # greatest(page_count, 1): an empty-text doc still yields one (empty)
    # page. Also dodges a Spark/DuckDB divergence — Spark's sequence(1, 0)
    # yields a DESCENDING [1, 0] while DuckDB's generate_series(1, 0) is
    # empty, so an unguarded explode would fan out phantom pages.
    pages = toks.select(
        "doc_id", "tokens", "n_tokens_total", "page_count",
        F.explode(F.sequence(F.lit(1), F.greatest(F.col("page_count"), F.lit(1))))
        .alias("page"))
    page_toks = F.slice(F.col("tokens"),
                        (F.col("page") - 1) * PAGE_TOKENS + 1, PAGE_TOKENS)
    return (pages.select(
        "doc_id", "page",
        F.size(page_toks).alias("n_page_tokens"),
        F.length(F.array_join(page_toks, " ")).alias("n_page_chars"),
        "page_count", "n_tokens_total")
        .orderBy("doc_id", "page"))


S1_PAGE_FANOUT_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS tokens
  FROM documents
), sized AS (
  SELECT doc_id, tokens,
         CAST(len(tokens) AS BIGINT) AS n_tokens_total,
         CAST(ceil(len(tokens) / {PAGE_TOKENS}.0) AS INT) AS page_count
  FROM toks
), pages AS (
  SELECT doc_id, tokens, n_tokens_total, page_count,
         unnest(generate_series(1, greatest(page_count, 1))) AS page
  FROM sized
)
SELECT doc_id, CAST(page AS INT) AS page,
       CAST(len(tokens[(page-1)*{PAGE_TOKENS}+1 :
                       least(page*{PAGE_TOKENS}, len(tokens))]) AS INT)
         AS n_page_tokens,
       CAST(coalesce(length(array_to_string(
           tokens[(page-1)*{PAGE_TOKENS}+1 :
                  least(page*{PAGE_TOKENS}, len(tokens))], ' ')), 0) AS INT)
         AS n_page_chars,
       page_count, n_tokens_total
FROM pages
ORDER BY doc_id, page
"""


def fields_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nested candidates[] roundtrip (types.py:201-209 Candidate /
    220-236 Field.candidates): build per-group candidate arrays with
    collect_list(struct(...)), explode them back with inline(), aggregate.
    Proves the array<struct> path produces exact values end to end."""
    docs = table(spark, sf_dir, "documents")
    cands = docs.select(
        F.col("lang").alias("grp"),
        F.struct(F.col("source"),
                 F.round(F.col("n_chars") / 1000.0, 4).alias("confidence")).alias("c"))
    fields = cands.groupBy("grp").agg(
        F.sort_array(F.collect_list("c")).alias("candidates"))
    exploded = fields.select("grp", F.inline("candidates"))
    return (exploded.groupBy("grp", "source")
            .agg(F.count("*").alias("n_cands"),
                 F.round(F.sum("confidence"), 4).alias("total_conf"),
                 F.round(F.max("confidence"), 4).alias("best_conf"))
            .orderBy("grp", "source"))


FIELDS_CANDIDATES_SQL = """
SELECT lang AS grp, source,
       COUNT(*) AS n_cands,
       ROUND(SUM(ROUND(n_chars/1000.0, 4)), 4) AS total_conf,
       ROUND(MAX(ROUND(n_chars/1000.0, 4)), 4) AS best_conf
FROM documents
GROUP BY lang, source
ORDER BY grp, source
"""


Y_TOL = 10.0  # R6 y tolerance (pdf_style_extractor.py:480)
SPAN_VARIANTS = 3  # per-doc span variants in the synthesized substrate


def r6_style_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 fuzzy style<->OCR merge (pdf_style_extractor.py:477-551) as
    relational algebra, kernel semantics exactly (kernel.style_merge):
    candidates within |dy| <= 10 AND |dx| <= 20 whose texts contain each
    other; score = character-SET intersection size; best span wins, ties to
    the lowest span index (strict > in the kernel loop); no match ->
    estimated font size.

    The y-tolerance join is expressed scalably: lines probe the 3 adjacent
    y-grid buckets (bucket width = tolerance), spans join by bucket — an
    EQUI join whose fan-in is bounded by local span density, never a
    non-equi cross join.

    Substrate: per doc, line = first 4 tokens at a position derived from
    doc_id; spans = 3 variants (full/identical/offset text at increasing
    offsets) so the tolerance cuts, the containment gate, the tie-break,
    and the estimated fallback are all exercised, including cross-document
    matches."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.slice(F.filter(F.split(F.lower(F.col("text")), " "),
                         lambda x: x != ""), 1, 6).alias("t6"))
    toks = toks.filter(F.size("t6") >= 6)
    base_x = (F.col("doc_id") * 29 % 300).cast("double")
    base_y = (F.col("doc_id") * 17 % 400).cast("double")
    lines = toks.select(
        F.col("doc_id").alias("line_id"),
        F.array_join(F.slice("t6", 1, 4), " ").alias("text_l"),
        base_x.alias("x_l"), base_y.alias("y_l"))
    k = F.explode(F.sequence(F.lit(0), F.lit(SPAN_VARIANTS - 1))).alias("k")
    spans = (toks.select("doc_id", "t6", base_x.alias("bx"),
                         base_y.alias("by"), k)
             .select((F.col("doc_id") * SPAN_VARIANTS + F.col("k")).alias("span_idx"),
                     F.col("doc_id").alias("span_doc"), "k",
                     F.when(F.col("k") == 1, F.array_join(F.slice("t6", 1, 4), " "))
                     .otherwise(F.array_join(F.col("t6"), " ")).alias("text_s"),
                     (F.col("bx") + 12 * F.col("k")).alias("x_s"),
                     # every 7th doc's spans sit out of tolerance -> its
                     # line exercises the estimated-style fallback (unless
                     # a cross-document span happens to match)
                     (F.col("by") + 6 * F.col("k")
                      + F.when(F.col("doc_id") % 7 == 0, 50).otherwise(0))
                     .alias("y_s")))
    # y-grid bucket join: probe the 3 buckets any |dy|<=tol match can be in
    probes = lines.select(
        "line_id", "text_l", "x_l", "y_l",
        F.explode(F.array(*[F.floor(F.col("y_l") / Y_TOL) + d
                            for d in (-1, 0, 1)])).alias("yb"))
    keyed_spans = spans.withColumn("yb", F.floor(F.col("y_s") / Y_TOL))
    chars = lambda c: F.array_distinct(F.split(c, ""))  # noqa: E731
    cand = (probes.join(keyed_spans, "yb")
            .filter((F.abs(F.col("y_s") - F.col("y_l")) <= Y_TOL)
                    & (F.abs(F.col("x_s") - F.col("x_l")) <= 2 * Y_TOL)
                    & ((F.expr("instr(text_s, text_l)") > 0)
                       | (F.expr("instr(text_l, text_s)") > 0)))
            .select("line_id", "span_idx", "span_doc", "k",
                    F.size(F.array_intersect(chars(F.col("text_l")),
                                             chars(F.col("text_s"))))
                    .alias("overlap")))
    w = Window.partitionBy("line_id").orderBy(F.col("overlap").desc(),
                                              F.col("span_idx"))
    best = (cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))
    return (lines.select("line_id").join(best, "line_id", "left")
            .select("line_id",
                    F.col("span_idx").isNotNull().alias("matched"),
                    "span_doc", "k", "overlap",
                    F.when(F.col("k").isNotNull(),
                           (8.0 + F.col("k")).cast("double"))
                    .otherwise(F.lit(12.0)).alias("font_size"))
            .orderBy("line_id"))


R6_STYLE_MERGE_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '')[1:6] AS t6
  FROM documents
), ok AS (SELECT * FROM toks WHERE len(t6) >= 6),
lines AS (
  SELECT doc_id AS line_id,
         array_to_string(t6[1:4], ' ') AS text_l,
         CAST(doc_id * 29 % 300 AS DOUBLE) AS x_l,
         CAST(doc_id * 17 % 400 AS DOUBLE) AS y_l
  FROM ok
), spans AS (
  SELECT doc_id * {SPAN_VARIANTS} + k AS span_idx, doc_id AS span_doc, k,
         CASE WHEN k = 1 THEN array_to_string(t6[1:4], ' ')
              ELSE array_to_string(t6, ' ') END AS text_s,
         CAST(doc_id * 29 % 300 AS DOUBLE) + 12 * k AS x_s,
         CAST(doc_id * 17 % 400 AS DOUBLE) + 6 * k
           + CASE WHEN doc_id % 7 = 0 THEN 50 ELSE 0 END AS y_s
  FROM ok, (SELECT unnest(range({SPAN_VARIANTS})) AS k)
), cand AS (
  SELECT l.line_id, s.span_idx, s.span_doc, s.k,
         len(list_intersect(list_distinct(string_split(l.text_l, '')),
                            list_distinct(string_split(s.text_s, ''))))
           AS overlap
  FROM lines l JOIN spans s
    ON floor(s.y_s / {Y_TOL}) BETWEEN floor(l.y_l / {Y_TOL}) - 1
                                  AND floor(l.y_l / {Y_TOL}) + 1
   AND abs(s.y_s - l.y_l) <= {Y_TOL}
   AND abs(s.x_s - l.x_l) <= 2 * {Y_TOL}
   AND (strpos(s.text_s, l.text_l) > 0 OR strpos(l.text_l, s.text_s) > 0)
), best AS (
  SELECT * FROM (
    SELECT cand.*,
           row_number() OVER (PARTITION BY line_id
                              ORDER BY overlap DESC, span_idx) AS rn
    FROM cand) WHERE rn = 1
)
SELECT l.line_id,
       b.span_idx IS NOT NULL AS matched,
       b.span_doc, b.k, b.overlap,
       CASE WHEN b.k IS NOT NULL THEN CAST(8.0 + b.k AS DOUBLE)
            ELSE 12.0 END AS font_size
FROM lines l LEFT JOIN best b ON b.line_id = l.line_id
ORDER BY l.line_id
"""


LINE_WORDS = 12  # words per synthesized line
SPAN_START, SPAN_LEN = 4, 3  # the field value = words 4..6 of the line


def k9_substring_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K9 anchoring strategy 3 (orchestrator.py:1259-1281) as position
    algebra: find the field value's first occurrence in the line (instr),
    compute per-word char spans via a cumulative-sum window, keep words
    overlapping the matched span, merge their boxes (min start / max end).

    Substrate: line = first 12 non-empty tokens of each document; field
    value = tokens 4..6 — the value genuinely occurs mid-line, and repeated
    tokens make first-occurrence semantics observable."""
    docs = table(spark, sf_dir, "documents")
    lines = docs.select(
        "doc_id",
        F.slice(F.filter(F.split(F.col("text"), " "), lambda x: x != ""),
                1, LINE_WORDS).alias("toks"))
    lines = (lines.filter(F.size("toks") >= LINE_WORDS)
             .select("doc_id",
                     F.array_join(F.col("toks"), " ").alias("line"),
                     F.array_join(F.slice(F.col("toks"), SPAN_START, SPAN_LEN),
                                  " ").alias("value"),
                     "toks"))
    words = lines.select(
        "doc_id", "line", "value",
        F.posexplode(F.col("toks")).alias("pos", "w"))
    # word i occupies 1-based chars [wstart+1, wstart+len(w)] where wstart =
    # sum of (len+1) over prior words
    cum = Window.partitionBy("doc_id").orderBy("pos") \
        .rowsBetween(Window.unboundedPreceding, -1)
    words = words.withColumn(
        "wstart",
        F.coalesce(F.sum(F.length("w") + 1).over(cum), F.lit(0)).cast("int"))
    mstart = F.expr("instr(line, value)")  # 1-based, always > 0
    overlap = ((F.col("wstart") + 1 < mstart + F.length("value")) &
               (F.col("wstart") + F.length("w") + 1 > mstart))
    return (words.withColumn("mstart", mstart.cast("int"))
            .filter(overlap)
            .groupBy("doc_id", "value", "mstart")
            .agg(F.min(F.col("wstart") + 1).alias("x1"),
                 F.max(F.col("wstart") + F.length("w")).alias("x2"),
                 F.count("*").alias("n_span_words"))
            .orderBy("doc_id"))


K9_SUBSTRING_SPAN_SQL = f"""
WITH lines AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '')[1:{LINE_WORDS}] AS toks
  FROM documents
), ok AS (
  SELECT doc_id,
         array_to_string(toks, ' ') AS line,
         array_to_string(toks[{SPAN_START}:{SPAN_START + SPAN_LEN - 1}], ' ') AS value,
         toks
  FROM lines
  WHERE len(toks) >= {LINE_WORDS}
), words AS (
  -- parallel unnests zip positionally in DuckDB (no WITH ORDINALITY there)
  SELECT doc_id, line, value,
         unnest(toks) AS w,
         unnest(generate_series(1, len(toks))) AS pos
  FROM ok
), spans AS (
  SELECT doc_id, line, value, w,
         CAST(COALESCE(SUM(length(w) + 1) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
           AS wstart,
         CAST(strpos(line, value) AS INT) AS mstart
  FROM words
)
SELECT doc_id, value, mstart,
       CAST(MIN(wstart + 1) AS INT) AS x1,
       CAST(MAX(wstart + length(w)) AS INT) AS x2,
       COUNT(*) AS n_span_words
FROM spans
WHERE wstart + 1 < mstart + length(value)
  AND wstart + length(w) + 1 > mstart
GROUP BY doc_id, value, mstart
ORDER BY doc_id
"""


# --- K8: OCR<->KIE bbox-overlap merge as relational algebra --------------------

OVERLAP_THRESHOLD = 0.3  # kernel/fuse.boxes_overlap (reference fuse.py:459-476)


def k8_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8 OCR<->KIE merge (kernel.fuse.boxes_overlap; reference
    fuse.py:459-476): within each document, match region boxes against
    field boxes when intersection / smaller-box-area >= 0.3.

    The join key is doc_id — K8 merges WITHIN a document, so this is an
    equi-join whose per-key fan-out is the (bounded) per-document box
    count, never a global cross join. Substrate: one OCR box per doc at a
    doc_id-derived position; three KIE box variants per doc at offsets
    that exercise full overlap (kept), sliver overlap below the ratio
    (dropped), and disjoint (dropped)."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    ax1 = (F.col("doc_id") * 13 % 200).cast("double")
    ay1 = (F.col("doc_id") * 7 % 150).cast("double")
    a = docs.select("doc_id", ax1.alias("ax1"), ay1.alias("ay1"),
                    (ax1 + 40).alias("ax2"), (ay1 + 20).alias("ay2"))
    k = F.explode(F.sequence(F.lit(0), F.lit(2))).alias("k")
    b = (docs.select("doc_id", k)
         .select("doc_id", "k",
                 (ax1 + F.when(F.col("k") == 0, 5)
                  .when(F.col("k") == 1, 35).otherwise(300)).alias("bx1"),
                 (ay1 + F.when(F.col("k") == 0, 2)
                  .when(F.col("k") == 1, 15).otherwise(300)).alias("by1")))
    b = b.select("doc_id", "k", "bx1", "by1",
                 (F.col("bx1") + 30).alias("bx2"),
                 (F.col("by1") + 10).alias("by2"))
    j = a.join(b, "doc_id")
    ix = F.greatest(F.lit(0.0),
                    F.least("ax2", "bx2") - F.greatest("ax1", "bx1"))
    iy = F.greatest(F.lit(0.0),
                    F.least("ay2", "by2") - F.greatest("ay1", "by1"))
    inter = ix * iy
    area_a = (F.col("ax2") - F.col("ax1")) * (F.col("ay2") - F.col("ay1"))
    area_b = (F.col("bx2") - F.col("bx1")) * (F.col("by2") - F.col("by1"))
    ratio = F.round(inter / F.least(area_a, area_b), 6)
    return (j.select("doc_id", "k", ratio.alias("overlap_ratio"))
            .filter(F.col("overlap_ratio") >= OVERLAP_THRESHOLD)
            .orderBy("doc_id", "k"))


K8_OVERLAP_JOIN_SQL = f"""
WITH a AS (
  SELECT doc_id,
         CAST(doc_id * 13 % 200 AS DOUBLE) AS ax1,
         CAST(doc_id * 7 % 150 AS DOUBLE) AS ay1,
         CAST(doc_id * 13 % 200 AS DOUBLE) + 40 AS ax2,
         CAST(doc_id * 7 % 150 AS DOUBLE) + 20 AS ay2
  FROM documents
), b AS (
  SELECT doc_id, k,
         CAST(doc_id * 13 % 200 AS DOUBLE)
           + CASE WHEN k = 0 THEN 5 WHEN k = 1 THEN 35 ELSE 300 END AS bx1,
         CAST(doc_id * 7 % 150 AS DOUBLE)
           + CASE WHEN k = 0 THEN 2 WHEN k = 1 THEN 15 ELSE 300 END AS by1
  FROM documents, (SELECT unnest(range(3)) AS k)
), jb AS (
  SELECT doc_id, k, bx1, by1, bx1 + 30 AS bx2, by1 + 10 AS by2 FROM b
)
SELECT a.doc_id, jb.k,
       round(greatest(0.0, least(ax2, bx2) - greatest(ax1, bx1))
             * greatest(0.0, least(ay2, by2) - greatest(ay1, by1))
             / least((ax2 - ax1) * (ay2 - ay1),
                     (bx2 - bx1) * (by2 - by1)), 6) AS overlap_ratio
FROM a JOIN jb ON a.doc_id = jb.doc_id
WHERE round(greatest(0.0, least(ax2, bx2) - greatest(ax1, bx1))
            * greatest(0.0, least(ay2, by2) - greatest(ay1, by1))
            / least((ax2 - ax1) * (ay2 - ay1),
                    (bx2 - bx1) * (by2 - by1)), 6) >= {OVERLAP_THRESHOLD}
ORDER BY a.doc_id, jb.k
"""
