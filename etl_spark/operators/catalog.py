"""The driver-facing operator catalog.

Each entry: name -> (spark_builder(spark, sf_dir) -> DataFrame,
oracle_sql or None for non-SQL-expressible ops). Consumed by
``__spark_entry__.queries()`` / ``oracle_sql()`` and by tests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_spark.operators import dedup as D
from etl_spark.operators import grouped as G
from etl_spark.operators import multimodal as M
from etl_spark.operators import relational as R
from etl_spark.operators import similarity as S
from etl_spark.operators import textstats as X
from etl_spark.plans import config_plan as P
from etl_spark.sources import coerce as C
from etl_spark.sources import json_flatten as J
from etl_spark.sources import metadata as MD
from etl_spark.streaming import windowed as W

Builder = Callable[[SparkSession, str], DataFrame]

CATALOG: dict[str, tuple[Builder, str | None]] = {
    # --- aggregations / filters ---
    "pricing_summary": (R.pricing_summary, R.PRICING_SUMMARY_SQL),
    "filter_compound": (R.filter_compound, R.FILTER_COMPOUND_SQL),
    "filter_null_notin": (R.filter_null_notin, R.FILTER_NULL_NOTIN_SQL),
    "distinct_count": (R.distinct_count, R.DISTINCT_COUNT_SQL),
    "approx_distinct_users": (R.approx_distinct_users, None),
    "domain_completion": (R.domain_completion, R.DOMAIN_COMPLETION_SQL),
    "rollup_orders": (R.rollup_orders, R.ROLLUP_ORDERS_SQL),
    "all_null_check": (R.all_null_check, R.ALL_NULL_CHECK_SQL),
    # --- joins ---
    "join_star_revenue": (R.join_star_revenue, R.JOIN_STAR_REVENUE_SQL),
    "join_left_with_missing": (R.join_left_with_missing, R.JOIN_LEFT_WITH_MISSING_SQL),
    # semi + anti consolidated into one two-join entry (standalone
    # join_semi / join_anti remain library functions) — frees a catalog
    # slot for boilerplate_line_dedup while keeping exactly 50 entries
    # inside the driver's CORRECTNESS window
    "join_semi_anti": (R.join_semi_anti, R.JOIN_SEMI_ANTI_SQL),
    "join_asof": (R.join_asof, R.JOIN_ASOF_SQL),
    "period_backfill": (R.period_backfill, R.PERIOD_BACKFILL_SQL),
    "positional_join": (R.positional_join, R.POSITIONAL_JOIN_SQL),
    # --- windows ---
    "window_top1_per_key": (R.window_top1_per_key, R.WINDOW_TOP1_SQL),
    "window_rank_topk": (R.window_rank_topk, R.WINDOW_RANK_TOPK_SQL),
    # running sum + lag delta share one per-key window: one combined
    # entry keeps the catalog within the driver's 50-entry CORRECTNESS
    # window so EVERY entry gets a driver-checked row each round
    # (standalone window_running_sum / window_lag_delta remain as
    # library functions)
    "window_running_lag": (R.window_running_lag, R.WINDOW_RUNNING_LAG_SQL),
    # --- set ops ---
    "union_dedup": (R.union_dedup, R.UNION_DEDUP_SQL),
    # except + intersect consolidated for the same reason
    "set_ops_keys": (R.set_ops_keys, R.SET_OPS_KEYS_SQL),
    # --- scalar functions ---
    "string_functions": (R.string_functions, R.STRING_FUNCTIONS_SQL),
    "date_functions": (R.date_functions, R.DATE_FUNCTIONS_SQL),
    "conditional_recode": (R.conditional_recode, R.CONDITIONAL_RECODE_SQL),
    "custom_collation_sort": (R.custom_collation_sort, R.CUSTOM_COLLATION_SQL),
    "json_extraction": (R.json_extraction, R.JSON_EXTRACTION_SQL),
    # --- CDC-shaped ---
    "cdc_lww_state": (R.cdc_lww_state, R.CDC_LWW_STATE_SQL),
    "incremental_upsert_fold": (R.incremental_upsert_fold, R.INCREMENTAL_UPSERT_FOLD_SQL),
    # --- text analysis (training-data pipeline) ---
    "lang_id": (X.lang_id, X.LANG_ID_SQL),
    "token_count": (X.token_count, X.TOKEN_COUNT_SQL),
    "quality_score": (X.quality_score, X.QUALITY_SCORE_SQL),
    "doc_fingerprint": (X.doc_fingerprint, X.DOC_FINGERPRINT_SQL),
    # --- deduplication ---
    "dedup_exact": (D.dedup_exact, D.DEDUP_EXACT_SQL),
    "ngram_jaccard_pairs": (D.ngram_jaccard_pairs, D.NGRAM_JACCARD_SQL),
    "minhash_lsh_pairs": (D.minhash_lsh_pairs, D.MINHASH_LSH_SQL),
    "near_dup_clusters": (D.near_dup_clusters, D.NEAR_DUP_CLUSTERS_SQL),
    "dedup_keep_canonical": (D.dedup_keep_canonical, D.DEDUP_KEEP_CANONICAL_SQL),
    "simhash_fingerprints": (D.simhash_fingerprints, D.SIMHASH_SQL),
    # sub-document dedup: corpus-frequent line removal (round-5 addition)
    "boilerplate_line_dedup": (D.boilerplate_line_dedup, D.BOILERPLATE_LINE_DEDUP_SQL),
    # --- similarity search ---
    "cosine_topk": (S.cosine_topk, S.COSINE_TOPK_SQL),
    "lsh_ann_buckets": (S.lsh_ann_buckets, S.LSH_ANN_SQL),
    "lsh_ann_pairs": (S.lsh_ann_pairs, S.LSH_ANN_PAIRS_SQL),
    "embedding_near_dup": (S.embedding_near_dup, S.EMBEDDING_NEAR_DUP_SQL),
    # --- grouped-map pandas UDF (D5) ---
    "grouped_linear_trend": (G.grouped_linear_trend, G.GROUPED_LINEAR_TREND_SQL),
    # --- multimodal binary plumbing ---
    "binary_payload_stats": (M.binary_payload_stats, M.BINARY_PAYLOAD_STATS_SQL),
    "image_decode_resize": (M.image_decode_resize, M.IMAGE_DECODE_RESIZE_SQL),
    "frame_sample": (M.frame_sample, M.FRAME_SAMPLE_SQL),
    # --- config-driven plans (§3.3) ---
    "config_driven_merge": (P.config_driven_merge, P.CONFIG_DRIVEN_MERGE_SQL),
    # --- schema inference / coercion (C13) ---
    "schema_coercion": (C.schema_coercion, C.SCHEMA_COERCION_SQL),
    # --- metadata-driven schema source (S10) ---
    "metadata_schema_frame": (MD.metadata_schema_frame, MD.METADATA_SCHEMA_FRAME_SQL),
    # --- multi-level nested JSON flatten (S9) ---
    "json_nested_flatten": (J.json_nested_flatten, J.JSON_NESTED_FLATTEN_SQL),
    # --- event-time windowed aggregation (C5, batch twin of the stream) ---
    "windowed_event_counts": (W.windowed_event_counts_batch, W.WINDOWED_EVENT_COUNTS_SQL),
}
