"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``ai_data_pipeline_spark/``; this module is
pure wiring.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ai_data_pipeline_spark.plans import relational


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: revenue by nation (3-way join + agg) at sf0.001."""
    return relational.q03_revenue_by_nation(spark, "/root/testdata/sf0.001")


# Names with a green hashed driver row in any CORRECTNESS_r{N}.json
# (cumulative through r07).  The driver grades only the FIRST
# 50 entries of queries(), so iteration order routes evidence: every
# query NOT in this set (anything new this round, plus any query whose
# oracle changed and needs a fresh hashed row) is emitted first so the
# driver's 50-entry window covers it.  tests/test_oracle.py guards this
# invariant.  Keep (total queries − len(DRIVER_EVIDENCE)) ≤ 50.
DRIVER_EVIDENCE = frozenset({
    # --- green in CORRECTNESS_r01.json ---
    "q01_scan_filter_project", "q02_broadcast_join", "q03_revenue_by_nation",
    "q04_left_join_counts", "q05_semi_join", "q06_anti_join", "q07_range_join",
    "q08_agg_suite", "q09_rollup", "q10_cube", "q11_topk_per_group",
    "q12_analytic_window", "q13_moving_average", "q14_global_topk",
    "q15a_intersect", "q15b_except", "q16_string_functions", "q17_date_trunc",
    "q18_json_extract", "q19_l2_topk", "q20_exact_dedup",
    "q22_knn_threshold", "q23_ngram_jaccard",
    "q26_cosine_neardup", "q27_cosine_topk", "q29_lang_profile",
    "q30_quality_topk", "q31_token_counts", "q39_grouping_sets",
    "q42_window_suite", "q43_union_ops", "q44_pivot_counts",
    "q45_percentile_disc", "q47_salted_join", "q50_distinct_suite",
    "q53_rank_fns", "q65_above_avg_customers", "q66_fuzzy_match",
    "q68_date_fns", "q70_conditional_fns", "q75_union_by_name",
    "q76_sql_subqueries", "q77_arg_extremes", "q79_string_suite",
    "q81_percentile_cont",
    # --- green in CORRECTNESS_r02.json (all 50 graded rows hashed green) ---
    "q28_ivf_ann", "q32_fingerprint", "q33_asof_join", "q34_sessionize",
    "q35_tumbling_window", "q36_multimodal_meta", "q37_lang_id",
    "q38_rp_lsh_ann", "q40_audio_meta", "q41_streaming_tumbling",
    "q46_hash_sample", "q48_dedup_keep_first", "q49_embed_knn",
    "q51_group_normalize", "q52_streaming_dedup", "q54_top_tokens",
    "q55_map_fns", "q56_contamination", "q57_rule_filters",
    "q58_variant_json", "q59_funnel", "q60_cohort_retention",
    "q61_stratified_sample", "q62_chunk_embed_sim", "q63_sliding_window",
    "q64_array_hof", "q67_session_conversion", "q69_decimal_agg",
    "q71_lang_id_ngram", "q72_video_frames", "q73_streaming_sliding",
    "q74_streaming_sessionize", "q78_array_set_fns",
    "q80_repetition_quality", "q82_blocked_neardup", "q83_full_outer_join",
    "q84_dedup_clusters", "q85_explode_outer", "q86_asof_forward",
    "q87_concat_packing", "q88_length_band_trim", "q89_shingle_containment",
    "q90_vocab_coverage", "q91_curation_funnel", "q92_token_zipf",
    "q93_part_cooccurrence", "q94_variance_suite", "q95_streaming_curation",
    "q96_prefix_jaccard",
    # --- green in CORRECTNESS_r03.json (49 of 50 graded rows hashed green) ---
    "q100_split_assign", "q101_source_mixing", "q102_tfidf_topk",
    "q103_bigram_fluency", "q104_embed_quant", "q105_minhash_estimate",
    "q106_kmeans_update", "q107_canonical_keeper", "q108_incremental_dedup",
    "q109_segment_dedup", "q110_label_dispersion", "q111_dupgraph_degree",
    "q112_gap_fill", "q113_moving_median", "q114_pmi_bigrams",
    "q115_scd2_intervals", "q116_forward_fill", "q117_column_profile",
    "q118_max_concurrency", "q119_corr_moments", "q120_zscore_outliers",
    "q121_ngram_novelty", "q122_winnowing", "q123_markov_transitions",
    "q124_bloom_audit", "q125_weighted_sample", "q126_source_tvd",
    "q127_session_paths", "q128_wow_change", "q129_price_histogram",
    "q130_integrity_audit", "q132_rolling_active", "q133_time_to_convert",
    "q134_pareto_abc", "q135_weighted_median", "q136_weekly_churn",
    "q137_interarrival", "q138_hot_keys", "q139_cross_source_dups",
    "q140_embed_norm_audit", "q141_lerp_resample", "q142_vocab_overlap",
    "q143_seasonality", "q21_chunker", "q24_minhash_lsh",
    "q25_simhash", "q97_streaming_join", "q98_pii_mask",
    "q99_url_extract",
    # --- green in CORRECTNESS_r04.json (q106 re-graded on its changed
    # exact-assignment oracle) ---
    "q106_kmeans_update",
    # --- green in CORRECTNESS_r05.json (all 50 graded rows hashed
    # green; q131 finally confirmed after the offset-division +
    # BIGINT-cast fixes — its two latent causes are documented in the
    # r04/r05 commit history and CLAUDE.md) ---
    "q131_kmeans_reassign", "q144_theta_overlap", "q145_kll_profile",
    "q146_dup_span_removal", "q147_scd2_apply", "q148_subsequence_topk",
    "q149_hll_profile", "q150_zorder_cluster_audit", "q151_recursive_chains",
    # --- green in CORRECTNESS_r07.json (all 50 graded rows hashed green) ---
    "q152_e2e_pdf_qa", "q153_stateful_running_stats", "q154_pyds_scan",
    "q155_udtf_lateral_chunks", "q156_unpivot_metrics", "q157_lateral_topk",
    "q158_bit_bool_aggs", "q159_listagg_segments", "q160_regexp_extract_all",
    "q161_matryoshka_overlap", "q162_tokenizer_fertility", "q163_partition_pruned_scan",
    "q164_bucketed_join", "q165_null_safe_join", "q166_arrow_udf",
    "q167_stream_restart_exactly_once", "q168_orc_source", "q169_csv_roundtrip",
    "q170_pyds_stream", "q171_asof_tolerance", "q172_pit_lookup",
    "q173_percentile_approx_exact", "q174_group_by_all", "q175_setops_all",
    "q176_try_cast", "q177_date_parts", "q178_date_spine",
    "q179_xml_roundtrip", "q180_native_hll", "q181_collation_group",
    "q182_stateful_restart", "q183_polymorphic_udtf", "q184_not_in_null_semantics",
    "q185_minmax_downsample", "q186_bitmap_distinct", "q187_pagerank3",
    "q188_triangle_count", "q189_ewma_recurrence", "q190_template_dedup",
    "q191_luhn_checksum", "q192_sql_scripting", "q193_param_sql",
    "q194_approx_topk_exact", "q195_printf_format", "q196_interval_overlap",
    "q197_try_arithmetic", "q198_skyline", "q199_equidepth_ntile",
    "q200_largest_remainder", "q201_sequence_gaps",
    # --- green in CORRECTNESS_r08.json (all 50 graded rows hashed green) ---
    "q202_gopher_quality", "q203_semantic_dedup", "q204_minhash_keeper",
    "q205_pack_interleave", "q206_c4_quality", "q207_temperature_mix",
    "q208_linear_trend", "q209_ann_recall", "q210_tf_cosine",
    "q211_ivf_cell_profile", "q212_dataset_card", "q213_seasonal_strength",
    "q214_market_share", "q215_dynamic_overwrite", "q216_release_funnel",
    "q217_targeted_delete", "q218_bpe_merge_candidates", "q219_lsh_recall_audit",
    "q220_streaming_quality_gate", "q221_salted_hot_agg",
    # --- green in CORRECTNESS_r09.json (all 50 graded rows hashed green) ---
    "q222_long_span_dedup", "q223_semdedup_scaled", "q224_lloyd_refine",
    "q225_ccnet_lang_buckets", "q226_vocab_growth", "q227_quality_keeper",
    "q228_mixture_sample", "q229_embedding_drift",
    "q231_multi_epoch_mixture", "q232_oov_coverage", "q233_nprobe_recall_curve",
    "q234_streaming_mixture_gate", "q235_pq_audit", "q236_adc_recall_audit",
    # --- green in CORRECTNESS_r10.json (all 50 graded rows hashed green,
    # including q230's changed-oracle re-grade) ---
    "q230_winnowing_span_audit", "q237_pq_train_lift", "q238_decontaminate_13gram",
    "q239_boundary_pack", "q240_hard_negatives", "q241_cdc_chunk_dedup",
    "q242_dsir_importance", "q243_longest_dup_span", "q244_vocab_truncation_curve",
    "q245_embedding_decontamination", "q246_padding_waste", "q247_ivf_tree_assign",
    "q248_streaming_decontamination_gate", "q249_opq_allocation", "q250_ivf_partitioned_store",
    "q251_lsh_band_sweep", "q252_quantization_retrieval_sweep", "q253_trimmed_robust_stats",
    "q254_anti_clustered_sharding", "q255_pq_layout_training_ablation", "q256_source_snapshot_drift",
    "q257_tree_partitioned_store", "q258_water_filling_budget", "q259_ivfadc_residual",
    "q260_mad_outliers", "q261_prefix_cache_savings", "q262_lexical_richness",
    "q263_dedup_cascade", "q264_sample_diversity", "q265_epochs_to_exhaustion",
    "q266_snapshot_novelty", "q267_snapshot_length_drift", "q268_dup_quality_interaction",
    "q269_dup_position_profile", "q270_retrieval_margin", "q271_neardup_flow_matrix",
    "q272_consistent_hash_ring", "q273_frequent_line_removal", "q274_transitivity_audit",
    "q275_quality_budget_curve", "q276_tau_sensitivity", "q277_quality_calibration",
    "q278_bpe_merge_apply", "q279_streaming_ring_router", "q280_snapshot_recycling",
    "q281_cascade_order_ablation",
    "q282_incremental_neardup_store", "q283_bpe_two_rounds", "q284_phash_image_dedup",
    "q285_retrieval_rank_eval", "q286_script_mixture", "q287_snapshot_dedup_trend",
    "q288_streaming_store_gate", "q289_store_lifecycle_merge", "q290_inverted_index_search",
    "q291_video_frame_dedup", "q292_decontaminated_split", "q293_vector_store_delete",
    "q294_incremental_postings_merge", "q295_cross_modality_agreement", "q296_ranked_retrieval",
    "q297_streaming_tombstone_deletes", "q298_multimodal_funnel", "q299_vector_store_admission",
    "q300_vector_store_compaction", "q301_full_postings_index", "q302_retrieval_release_gate",
    "q303_dedup_precision_audit", "q304_filtered_vector_search", "q305_rrf_hybrid_retrieval",
    "q306_postings_store_compaction", "q307_release_export_manifest", "q308_selective_compaction",
    "q309_boolean_retrieval", "q310_incremental_manifest", "q311_nprobe_escalation",
    "q312_snapshot_time_travel", "q313_epoch_shuffle", "q314_cross_store_erasure",
    "q315_streaming_export_manifest", "q316_snapshot_gc",
    # --- green in CORRECTNESS_r13.json (all 50 graded rows hashed green,
    # including the nine inherited build rows q317–q325) ---
    "q317_store_upsert_merge", "q318_incremental_cluster_labels",
    "q319_snapshot_schema_evolution", "q320_bpe_encode_fixed_vocab",
    "q321_snapshot_change_feed", "q322_ivf_reindex_migration",
    "q323_streaming_cdc_upserts", "q324_deletion_vectors",
    "q325_zonemap_skipping",
})

# Backward-compatible alias (pre-r03 name).
R01_DRIVER_EVIDENCE = DRIVER_EVIDENCE


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Iteration order is evidence routing (see DRIVER_EVIDENCE):
    queries still needing a driver CORRECTNESS row come first.
    """
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    merged.update(relational.QUERIES)
    # Import each plan module independently: a breakage in one must
    # never silently shrink the graded surface of the others (the
    # guard test pins the total count, so a shrink fails loudly).
    from ai_data_pipeline_spark.plans import pipeline_queries

    merged.update(pipeline_queries.QUERIES)
    from ai_data_pipeline_spark.plans import analysis_queries

    merged.update(analysis_queries.QUERIES)
    from ai_data_pipeline_spark.plans import extended_queries

    merged.update(extended_queries.QUERIES)
    from ai_data_pipeline_spark.plans import frontier_queries

    merged.update(frontier_queries.QUERIES)
    from ai_data_pipeline_spark.plans import frontier2_queries

    merged.update(frontier2_queries.QUERIES)
    from ai_data_pipeline_spark.plans import frontier3_queries

    merged.update(frontier3_queries.QUERIES)
    from ai_data_pipeline_spark.plans import frontier4_queries

    merged.update(frontier4_queries.QUERIES)
    from ai_data_pipeline_spark.plans import frontier5_queries

    merged.update(frontier5_queries.QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in merged:
        if name not in DRIVER_EVIDENCE:
            out[name] = merged[name]
    for name in merged:
        if name not in out:
            out[name] = merged[name]
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL twins for every oracle-expressible query."""
    out: dict[str, str] = {}
    out.update(relational.ORACLE)
    from ai_data_pipeline_spark.plans import pipeline_queries

    out.update(pipeline_queries.ORACLE)
    # q21's twin is built lazily (the golden-VALUES table is
    # computed from the graded corpora, not a static string).
    q21 = pipeline_queries.q21_oracle()
    if q21 is not None:
        out["q21_chunker"] = q21
    # q152's twin is likewise a lazily-built golden-VALUES table
    # (pure-Python R1→R8 twins over the graded corpora).
    q152 = pipeline_queries.q152_oracle()
    if q152 is not None:
        out["q152_e2e_pdf_qa"] = q152
    from ai_data_pipeline_spark.plans import analysis_queries

    out.update(analysis_queries.ORACLE)
    from ai_data_pipeline_spark.plans import extended_queries

    out.update(extended_queries.ORACLE)
    from ai_data_pipeline_spark.plans import frontier_queries

    out.update(frontier_queries.ORACLE)
    from ai_data_pipeline_spark.plans import frontier2_queries

    out.update(frontier2_queries.ORACLE)
    from ai_data_pipeline_spark.plans import frontier3_queries

    out.update(frontier3_queries.ORACLE)
    from ai_data_pipeline_spark.plans import frontier4_queries

    out.update(frontier4_queries.ORACLE)
    from ai_data_pipeline_spark.plans import frontier5_queries

    out.update(frontier5_queries.ORACLE)
    return out
