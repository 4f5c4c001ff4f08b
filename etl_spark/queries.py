"""Registry of oracle-checked queries — the coverage surface the driver
verifies (one entry per implemented operator family, SURVEY.md §2 +
the training-data-pipeline layer).

Each entry: name -> (spark_callable(spark, sf_dir) -> DataFrame,
oracle_sql | None). Column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_spark.ops import (
    binparse,
    cdcq,
    multimodal,
    refops,
    simsearch,
    textops,
    tpch,
    tpch2,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {
    # --- CDC engine core (SURVEY §2.5/§2.9: LWW merge, dedup, replay) ---
    "cdc_lww_state": (cdcq.cdc_lww_state, cdcq.LWW_STATE_SQL),
    "cdc_lww_salted": (cdcq.cdc_lww_salted, cdcq.LWW_STATE_SQL),
    "cdc_replay_state": (cdcq.cdc_replay_state, cdcq.LWW_STATE_SQL),
    "cdc_wap_replay": (cdcq.cdc_wap_replay, cdcq.LWW_STATE_SQL),
    "cdc_constraint_state": (cdcq.cdc_constraint_state, cdcq.CONSTRAINT_STATE_SQL),
    "cdc_zorder_state": (cdcq.cdc_zorder_state, cdcq.LWW_STATE_SQL),
    "cdc_replica_sync": (cdcq.cdc_replica_sync, cdcq.LWW_STATE_SQL),
    "cdc_dispositions": (cdcq.cdc_dispositions, cdcq.DISPOSITIONS_SQL),
    "cdc_stream_stats": (cdcq.cdc_stream_stats, cdcq.STREAM_STATS_SQL),
    "cdc_conv_stats": (cdcq.cdc_conv_stats, cdcq.CONV_STATS_SQL),
    "cdc_changelog": (cdcq.cdc_changelog, cdcq.CHANGELOG_SQL),
    "cdc_evolution_replay": (cdcq.cdc_evolution_replay, cdcq.EVOLUTION_SQL),
    "cdc_rebucket_replay": (cdcq.cdc_rebucket_replay, cdcq.LWW_STATE_SQL),
    "cdc_point_lookup": (cdcq.cdc_point_lookup, cdcq.POINT_LOOKUP_SQL),
    "cdc_value_lookup": (cdcq.cdc_value_lookup, cdcq.VALUE_LOOKUP_SQL),
    "cdc_mv_conv_stats": (cdcq.cdc_mv_conv_stats, cdcq.CONV_STATS_SQL),
    "conv_transcript_nested": (cdcq.conv_transcript_nested, cdcq.CONV_TRANSCRIPT_SQL),
    "cdc_time_window": (cdcq.cdc_time_window, cdcq.TIME_WINDOW_SQL),
    "cdc_patch_state": (cdcq.cdc_patch_state, cdcq.PATCH_STATE_SQL),
    "cdc_patch_replay": (cdcq.cdc_patch_replay, cdcq.PATCH_STATE_SQL),
    "cdc_envelope_decode": (cdcq.cdc_envelope_decode, cdcq.ENVELOPE_DECODE_SQL),
    "cdc_envelope_repair": (cdcq.cdc_envelope_repair, cdcq.ENVELOPE_REPAIR_SQL),
    "cdc_delete_update": (cdcq.cdc_delete_update, cdcq.DELETE_UPDATE_SQL),
    "cdc_route_split": (cdcq.cdc_route_split, cdcq.ROUTE_SPLIT_SQL),
    "cdc_wire_roundtrip": (cdcq.cdc_wire_roundtrip, cdcq.LWW_STATE_SQL),
    # --- reference dataflow operators (SURVEY §2.3/§2.4/§2.6) ---
    "last_event_summary": (refops.last_event_summary, refops.LAST_EVENT_SUMMARY_SQL),
    "snapshot_thinning": (refops.snapshot_thinning, refops.SNAPSHOT_THINNING_SQL),
    "minute_rollup": (refops.minute_rollup, refops.MINUTE_ROLLUP_SQL),
    "changepoints": (refops.changepoints, refops.CHANGEPOINTS_SQL),
    "sessionize": (refops.sessionize, refops.SESSIONIZE_SQL),
    "error_budget": (refops.error_budget, refops.ERROR_BUDGET_SQL),
    "props_extract": (refops.props_extract, refops.PROPS_EXTRACT_SQL),
    "top_events_per_user": (refops.top_events_per_user, refops.TOP_EVENTS_PER_USER_SQL),
    "hash_sampling": (refops.hash_sampling, refops.HASH_SAMPLING_SQL),
    "field_masking": (refops.field_masking, refops.FIELD_MASKING_SQL),
    "json_props_parse": (refops.json_props_parse, refops.JSON_PROPS_PARSE_SQL),
    "synthetic_key": (refops.synthetic_key, refops.SYNTHETIC_KEY_SQL),
    "explode_directions": (refops.explode_directions, refops.EXPLODE_DIRECTIONS_SQL),
    "delta_encoding": (refops.delta_encoding, refops.DELTA_ENCODING_SQL),
    "grouped_samples": (refops.grouped_samples, refops.GROUPED_SAMPLES_SQL),
    "canonical_broadcast": (
        refops.canonical_broadcast,
        refops.CANONICAL_BROADCAST_SQL,
    ),
    "hop_tree_flatten": (refops.hop_tree_flatten, refops.HOP_TREE_FLATTEN_SQL),
    "session_repair": (refops.session_repair, refops.SESSION_REPAIR_SQL),
    "meta_snaplog_join": (refops.meta_snaplog_join, refops.META_SNAPLOG_JOIN_SQL),
    "lookahead_discard": (refops.lookahead_discard, refops.LOOKAHEAD_DISCARD_SQL),
    "archive_path_decode": (refops.archive_path_decode, refops.ARCHIVE_PATH_DECODE_SQL),
    "type_day_rollup": (refops.type_day_rollup, refops.TYPE_DAY_ROLLUP_SQL),
    "stratified_sample": (refops.stratified_sample, refops.STRATIFIED_SAMPLE_SQL),
    "events_asof_join": (refops.events_asof_join, refops.EVENTS_ASOF_JOIN_SQL),
    "events_range_join": (refops.events_range_join, refops.EVENTS_RANGE_JOIN_SQL),
    "events_distinct_sketch": (
        refops.events_distinct_sketch,
        refops.EVENTS_DISTINCT_SKETCH_SQL,
    ),
    "event_percentiles": (refops.event_percentiles, refops.EVENT_PERCENTILES_SQL),
    "type_day_rollup_sets": (
        refops.type_day_rollup_sets,
        refops.TYPE_DAY_ROLLUP_SETS_SQL,
    ),
    "user_type_pivot": (refops.user_type_pivot, refops.USER_TYPE_PIVOT_SQL),
    "user_set_ops": (refops.user_set_ops, refops.USER_SET_OPS_SQL),
    "events_trailing_window": (
        refops.events_trailing_window,
        refops.EVENTS_TRAILING_WINDOW_SQL,
    ),
    "events_funnel": (refops.events_funnel, refops.EVENTS_FUNNEL_SQL),
    "events_retention": (refops.events_retention, refops.EVENTS_RETENTION_SQL),
    # --- star-schema analytics (joins/agg/top-k) ---
    "q1_pricing_summary": (tpch.q1_pricing_summary, tpch.Q1_SQL),
    "top_orders_by_revenue": (tpch.top_orders_by_revenue, tpch.TOP_ORDERS_SQL),
    "region_revenue": (tpch.region_revenue, tpch.REGION_REVENUE_SQL),
    "order_priority_semijoin": (
        tpch.order_priority_semijoin,
        tpch.ORDER_PRIORITY_SQL,
    ),
    "promo_revenue": (tpch.promo_revenue, tpch.PROMO_REVENUE_SQL),
    "large_volume_orders": (tpch.large_volume_orders, tpch.LARGE_VOLUME_SQL),
    "filtered_revenue": (tpch.filtered_revenue, tpch.FILTERED_REVENUE_SQL),
    "returned_item_revenue": (
        tpch.returned_item_revenue,
        tpch.RETURNED_ITEM_SQL,
    ),
    "shipping_priority": (tpch.shipping_priority, tpch.SHIPPING_PRIORITY_SQL),
    "customers_no_orders": (tpch.customers_no_orders, tpch.CUSTOMERS_NO_ORDERS_SQL),
    "small_qty_revenue": (tpch.small_qty_revenue, tpch.SMALL_QTY_REVENUE_SQL),
    "top_supplier": (tpch.top_supplier, tpch.TOP_SUPPLIER_SQL),
    "parts_supplier_count": (
        tpch.parts_supplier_count,
        tpch.PARTS_SUPPLIER_COUNT_SQL,
    ),
    "market_share": (tpch.market_share, tpch.MARKET_SHARE_SQL),
    "part_pairs": (tpch.part_pairs, tpch.PART_PAIRS_SQL),
    "local_supplier_volume": (
        tpch2.local_supplier_volume,
        tpch2.LOCAL_SUPPLIER_VOLUME_SQL,
    ),
    "nation_volume_shipping": (
        tpch2.nation_volume_shipping,
        tpch2.NATION_VOLUME_SHIPPING_SQL,
    ),
    "product_type_profit": (tpch2.product_type_profit, tpch2.PRODUCT_TYPE_PROFIT_SQL),
    "late_shipment_priority": (
        tpch2.late_shipment_priority,
        tpch2.LATE_SHIPMENT_PRIORITY_SQL,
    ),
    "customer_order_histogram": (
        tpch2.customer_order_histogram,
        tpch2.CUSTOMER_ORDER_HISTOGRAM_SQL,
    ),
    "disjunctive_revenue": (tpch2.disjunctive_revenue, tpch2.DISJUNCTIVE_REVENUE_SQL),
    "waiting_supplier": (tpch2.waiting_supplier, tpch2.WAITING_SUPPLIER_SQL),
    "min_cost_supplier": (tpch2.min_cost_supplier, tpch2.MIN_COST_SUPPLIER_SQL),
    "important_parts": (tpch2.important_parts, tpch2.IMPORTANT_PARTS_SQL),
    "excess_share_suppliers": (
        tpch2.excess_share_suppliers,
        tpch2.EXCESS_SHARE_SUPPLIERS_SQL,
    ),
    "event_transitions": (refops.event_transitions, refops.EVENT_TRANSITIONS_SQL),
    "user_activity_deciles": (
        refops.user_activity_deciles,
        refops.USER_ACTIVITY_DECILES_SQL,
    ),
    "type_day_cube": (refops.type_day_cube, refops.TYPE_DAY_CUBE_SQL),
    "events_session_window": (
        refops.events_session_window,
        refops.EVENTS_SESSION_WINDOW_SQL,
    ),
    "props_variant_stats": (
        refops.props_variant_stats,
        refops.PROPS_VARIANT_STATS_SQL,
    ),
    "events_gap_fill": (refops.events_gap_fill, refops.EVENTS_GAP_FILL_SQL),
    "events_heavy_hitters": (
        refops.events_heavy_hitters,
        refops.EVENTS_HEAVY_HITTERS_SQL,
    ),
    "doc_bm25_search": (textops.doc_bm25_search, textops.DOC_BM25_SEARCH_SQL),
    # --- text curation: dedup / quality / lang-id / fingerprint ---
    "doc_exact_dedup": (textops.doc_exact_dedup, textops.DOC_EXACT_DEDUP_SQL),
    "doc_chunk_overlap": (textops.doc_chunk_overlap, textops.DOC_CHUNK_OVERLAP_SQL),
    "doc_quality": (textops.doc_quality, textops.DOC_QUALITY_SQL),
    "doc_lang_id": (textops.doc_lang_id, textops.DOC_LANG_ID_SQL),
    "doc_fingerprint": (textops.doc_fingerprint, textops.DOC_FINGERPRINT_SQL),
    "doc_shingle_jaccard": (textops.doc_shingle_jaccard, textops.DOC_SHINGLE_JACCARD_SQL),
    "doc_minhash_signatures": (
        textops.doc_minhash_signatures,
        textops.DOC_MINHASH_SIG_SQL,
    ),
    "doc_minhash_pairs": (textops.doc_minhash_pairs, textops.DOC_MINHASH_PAIRS_SQL),
    "doc_simhash": (textops.doc_simhash, textops.DOC_SIMHASH_SQL),
    "doc_simhash_pairs": (textops.doc_simhash_pairs, textops.DOC_SIMHASH_PAIRS_SQL),
    "doc_token_count": (textops.doc_token_count, textops.DOC_TOKEN_COUNT_SQL),
    "doc_oversize_guard": (textops.doc_oversize_guard, textops.DOC_OVERSIZE_GUARD_SQL),
    "doc_field_zip": (textops.doc_field_zip, textops.DOC_FIELD_ZIP_SQL),
    "doc_dup_groups": (textops.doc_dup_groups, textops.DOC_DUP_GROUPS_SQL),
    "doc_top_terms": (textops.doc_top_terms, textops.DOC_TOP_TERMS_SQL),
    "doc_repetition_ratio": (
        textops.doc_repetition_ratio,
        textops.DOC_REPETITION_SQL,
    ),
    "doc_incremental_neardup": (
        textops.doc_incremental_neardup,
        textops.DOC_INCREMENTAL_NEARDUP_SQL,
    ),
    "doc_neardup_gate": (textops.doc_neardup_gate, textops.DOC_NEARDUP_GATE_SQL),
    # gate sequence with a mid-stream segment compaction — same oracle:
    # per-round dup pairs must be unchanged by the file merge
    "doc_neardup_gate_compact": (
        textops.doc_neardup_gate_compact,
        textops.DOC_NEARDUP_GATE_SQL,
    ),
    "doc_pii_redact": (textops.doc_pii_redact, textops.DOC_PII_REDACT_SQL),
    "doc_contamination": (textops.doc_contamination, textops.DOC_CONTAMINATION_SQL),
    "doc_domain_mix": (textops.doc_domain_mix, textops.DOC_DOMAIN_MIX_SQL),
    "doc_pack_sequences": (
        textops.doc_pack_sequences,
        textops.DOC_PACK_SEQUENCES_SQL,
    ),
    "doc_quality_funnel": (
        textops.doc_quality_funnel,
        textops.DOC_QUALITY_FUNNEL_SQL,
    ),
    "doc_substring_dup": (
        textops.doc_substring_dup,
        textops.DOC_SUBSTRING_DUP_SQL,
    ),
    "doc_curation_pipeline": (
        textops.doc_curation_pipeline,
        textops.DOC_CURATION_PIPELINE_SQL,
    ),
    "doc_winnow_fingerprint": (
        textops.doc_winnow_fingerprint,
        textops.DOC_WINNOW_SQL,
    ),
    "doc_dup_canonical": (textops.doc_dup_canonical, textops.DOC_DUP_CANONICAL_SQL),
    "doc_multimodal_gate": (
        textops.doc_multimodal_gate,
        textops._multimodal_gate_sql(),
    ),
    # --- similarity search over embeddings ---
    "emb_cosine_topk": (simsearch.emb_cosine_topk, simsearch.EMB_COSINE_TOPK_SQL),
    "emb_knn_label": (simsearch.emb_knn_label, simsearch.EMB_KNN_LABEL_SQL),
    "emb_neardup_pairs": (simsearch.emb_neardup_pairs, simsearch.EMB_NEARDUP_SQL),
    "emb_ivf_topk": (simsearch.emb_ivf_topk, simsearch.EMB_IVF_TOPK_SQL),
    "emb_neardup_gate": (simsearch.emb_neardup_gate, simsearch.EMB_NEARDUP_GATE_SQL),
    "emb_ivf_recall": (simsearch.emb_ivf_recall, simsearch.EMB_IVF_RECALL_SQL),
    "mm_resize_plan": (multimodal.mm_resize_plan, multimodal.MM_RESIZE_PLAN_SQL),
    "emb_lsh_topk": (simsearch.emb_lsh_topk, simsearch.EMB_LSH_TOPK_SQL),
    "emb_sq_topk": (simsearch.emb_sq_topk, simsearch.EMB_SQ_TOPK_SQL),
    "emb_sq_recall": (simsearch.emb_sq_recall, simsearch.EMB_SQ_RECALL_SQL),
    "emb_kmeans": (simsearch.emb_kmeans, simsearch.EMB_KMEANS_SQL),
    "emb_ivf_index_topk": (
        simsearch.emb_ivf_index_topk,
        simsearch.EMB_IVF_INDEX_TOPK_SQL,
    ),
    "emb_ivf_index_recall": (
        simsearch.emb_ivf_index_recall,
        simsearch.EMB_IVF_INDEX_RECALL_SQL,
    ),
    # served from a COMPACTED index — same oracle as the uncompacted row:
    # the registry-level proof that segment compaction is a pure file
    # merge with identical rankings (round-5 maintenance verb)
    "emb_ivf_index_compact": (
        simsearch.emb_ivf_index_compact,
        simsearch.EMB_IVF_INDEX_TOPK_SQL,
    ),
    # --- multimodal plumbing (Arrow mapInPandas decode stub) ---
    "mm_decode_meta": (multimodal.mm_decode_meta, multimodal.MM_DECODE_META_SQL),
    "mm_frame_sample": (multimodal.mm_frame_sample, multimodal.MM_FRAME_SAMPLE_SQL),
    "mm_audio_chunks": (multimodal.mm_audio_chunks, multimodal.MM_AUDIO_CHUNKS_SQL),
    # --- reference parser shapes: binary snaplog + multi-line text record ---
    "bin_snaplog_decode": (binparse.bin_snaplog_decode, binparse.BIN_SNAPLOG_DECODE_SQL),
    "txt_hoplog_parse": (binparse.txt_hoplog_parse, binparse.TXT_HOPLOG_PARSE_SQL),
}


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
