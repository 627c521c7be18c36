"""Rich-table span algebra as a dataset operator.

The kernel's Table/Cell model (kernel/table_model.py; reference
types.py:161-198) resolves row/col spans at accessor time. The dataset form
does the same with pure relational ops: cells EXPLODE into their covered
grid positions (sequence over row_span x col_span — two narrow explodes,
no non-equi join), then per-row texts reassemble in column order — the
get_row_texts semantics at corpus scale.

Synthesized per-document cell layout (complete, non-overlapping 2x3 grid,
spans keyed by doc_id so both span branches are exercised):
    rs = 1 + doc_id % 2
    A(0,0) row_span=rs   B(0,1) col_span=2
    E(1,0) only if rs=1  C(1,1)            D(1,2)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import table


def table_cell_rowtexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id")
    rs = (F.lit(1) + F.col("doc_id") % 2).cast("int")

    def cell(r, c, row_span, col_span, text):
        return F.struct(
            F.lit(r).cast("int").alias("row"),
            F.lit(c).cast("int").alias("col"),
            (row_span if not isinstance(row_span, int)
             else F.lit(row_span).cast("int")).alias("row_span"),
            F.lit(col_span).cast("int").alias("col_span"),
            F.lit(text).alias("text"))

    cells = docs.select(
        "doc_id",
        F.explode(F.filter(F.array(
            cell(0, 0, rs, 1, "a"),
            cell(0, 1, 1, 2, "b"),
            cell(1, 1, 1, 1, "c"),
            cell(1, 2, 1, 1, "d"),
            F.struct(F.lit(1).cast("int").alias("row"),
                     F.lit(0).cast("int").alias("col"),
                     F.lit(1).cast("int").alias("row_span"),
                     F.lit(1).cast("int").alias("col_span"),
                     F.when(F.col("doc_id") % 2 == 0, "e").alias("text")),
        ), lambda x: x["text"].isNotNull())).alias("cell"))
    # NOTE: rs = 1 + doc_id % 2 is 1 for EVEN doc_id (e present) and 2 for
    # odd (A covers (1,0)); both engines share this rule.
    pos = (cells
           .select("doc_id", F.col("cell.*"))
           .select("doc_id", "text", "col", "col_span",
                   F.explode(F.sequence(
                       F.col("row"),
                       F.col("row") + F.col("row_span") - 1)).alias("r"))
           .select("doc_id", "text", "r",
                   F.explode(F.sequence(
                       F.col("col"),
                       F.col("col") + F.col("col_span") - 1)).alias("c")))
    return (pos.groupBy("doc_id", "r")
            .agg(F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("c", "text"))),
                            lambda x: x["text"]), "|").alias("row_text"),
                F.count("*").alias("n_slots"))
            .orderBy("doc_id", "r"))


TABLE_CELL_ROWTEXTS_SQL = """
WITH cells AS (
  SELECT doc_id, 0 AS row, 0 AS col,
         CAST(1 + doc_id % 2 AS INT) AS row_span, 1 AS col_span, 'a' AS text
  FROM documents
  UNION ALL SELECT doc_id, 0, 1, 1, 2, 'b' FROM documents
  UNION ALL SELECT doc_id, 1, 1, 1, 1, 'c' FROM documents
  UNION ALL SELECT doc_id, 1, 2, 1, 1, 'd' FROM documents
  UNION ALL SELECT doc_id, 1, 0, 1, 1, 'e' FROM documents WHERE doc_id % 2 = 0
), pos1 AS (
  SELECT doc_id, text, col, col_span,
         unnest(generate_series(row, row + row_span - 1)) AS r
  FROM cells
), pos AS (
  SELECT doc_id, text, r,
         unnest(generate_series(col, col + col_span - 1)) AS c
  FROM pos1
)
SELECT doc_id, CAST(r AS INT) AS r,
       string_agg(text, '|' ORDER BY c) AS row_text,
       count(*) AS n_slots
FROM pos
GROUP BY doc_id, r
ORDER BY doc_id, r
"""
