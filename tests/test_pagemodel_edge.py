"""s1_page_fanout edge semantics: empty-text documents (round-3 ADVICE).

Spark's sequence(1, 0) yields [1, 0] while DuckDB's generate_series(1, 0)
is empty — the greatest(page_count, 1) guard must keep both engines
identical AND give every document at least one page."""

import duckdb

from horizon_ocr_python_spark.operators.pagemodel import (S1_PAGE_FANOUT_SQL,
                                                          s1_page_fanout)


def test_empty_text_doc_yields_one_empty_page(spark, tmp_path):
    spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a b c")],
        "doc_id: long, text: string",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = s1_page_fanout(spark, str(tmp_path))
    rows = {(r.doc_id, r.page): r for r in out.collect()}
    assert set(rows) == {(1, 1), (2, 1), (3, 1)}
    assert rows[(1, 1)].n_page_tokens == 0
    assert rows[(1, 1)].page_count == 0  # true token-derived count preserved

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet/*.parquet'")
    oracle = con.execute(S1_PAGE_FANOUT_SQL).fetchall()
    spark_rows = sorted(tuple(r) for r in out.collect())
    assert spark_rows == sorted(oracle)
