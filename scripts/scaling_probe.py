"""Scaling probe: run pipeline-heavy queries at 1x (sf0.1) and the
Nx corpus from make_scale_data.py; print per-query seconds and the
Nx/1x ratio. A ratio ≲ N on a fixed 32-core box means the plan's
work grows linearly with data (no quadratic joins, no driver
bottleneck) — the property that survives a 1000-executor scale-out.

Usage: python scripts/make_scale_data.py && python scripts/scaling_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from ai_data_pipeline_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALED = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tmp_scale")
FACTOR = int(os.environ.get("SCALE_FACTOR", "8"))

PROBE = [
    "q21_chunker",          # CPU-bound UDF pipeline
    "q23_ngram_jaccard",    # shingle join (the quadratic trap)
    "q24_minhash_lsh",      # LSH candidate generation
    "q29_lang_profile",     # expression-heavy scan+agg
    "q31_token_counts",     # tokenize+agg
    "q35_tumbling_window",  # event-time agg
    "q49_embed_knn",        # pandas-UDF encode + top-k
    "q54_top_tokens",       # explode + two-phase agg
    "q62_chunk_embed_sim",  # UDTF chunk → embed → score, composed
    "q81_percentile_cont",  # domain-histogram percentile (r07 verdict flag)
    "q82_blocked_neardup",  # LSH blocking + exact within-block verify
    "q84_dedup_clusters",   # pair → connected components (star)
    "q86_asof_forward",     # join-free as-of (union + window)
    "q87_concat_packing",   # token cumsum packing
    "q88_length_band_trim", # exact-quantile trim, single shuffle
    "q89_shingle_containment",  # capped-shingle asymmetric near-dup
    "q90_vocab_coverage",   # broadcast vocab probe
    "q91_curation_funnel",  # composed funnel, single pass
    "q93_part_cooccurrence",  # basket self-join (lineitem scaled too)
    "q96_prefix_jaccard",   # prefix-filtered exact similarity join
    "q98_pii_mask",         # per-row regex masking
    "q102_tfidf_topk",      # token window df + per-source top-k
    "q103_bigram_fluency",  # bigram frequency window + per-doc mean
    "q105_minhash_estimate",  # exact pairs + signature audit
    "q106_kmeans_update",   # HOF assignment + fixed-point means
    "q107_canonical_keeper",  # clusters + keeper window
    "q114_pmi_bigrams",     # unigram+bigram counts, vocab joins
    "q121_ngram_novelty",   # gram-hash window MIN + per-doc agg
    "q122_winnowing",       # posexplode + frame MIN + distinct
    "q124_bloom_audit",     # broadcast bit probe + membership join
    "q125_weighted_sample", # per-row decimal compare + agg
    "q126_source_tvd",      # histogram collapse + micro pair join
    "q132_rolling_active",  # distinct fan-out + count-distinct per day
    "q135_weighted_median", # running-weight selection windows
    "q137_interarrival",    # per-user lag + ladder histogram
    "q139_cross_source_dups",  # digest-keyed set pairs
    "q141_lerp_resample",   # bidirectional union-then-window lerp
    "q142_vocab_overlap",   # distinct token pairs + size windows
    "q144_theta_overlap",   # two map-side sketch reductions, no join
    "q145_kll_profile",     # sketch build + merge rollup
    "q146_dup_span_removal",  # gram window + span anti-join + rebuild
    "q147_scd2_apply",      # history windows + CDC apply
    "q148_subsequence_topk",  # sliding arrays + HOF fold + TakeOrdered
    "q149_hll_profile",     # map-side coupon sketches + merge rollup
    "q152_e2e_pdf_qa",      # composed R1→R9: binaryFile + 3 python stages
    "q153_stateful_running_stats",  # stateful streaming replay (3 batches)
    "q155_udtf_lateral_chunks",  # python UDTF fan-out
    "q161_matryoshka_overlap",   # two cosine ranks per row, one scan
    "q167_stream_restart_exactly_once",  # 2-run checkpointed stream
    "q180_native_hll",      # built-in datasketches rollup
    "q185_minmax_downsample",  # bucketed extreme-point windows
    "q186_bitmap_distinct",  # mergeable-bitmap exact distinct
    "q187_pagerank3",       # 3-iteration PageRank (scaled lineitem edges)
    "q188_triangle_count",  # support-thresholded wedge join
    "q189_ewma_recurrence",  # applyInPandas recurrence, capped series
    "q190_template_dedup",  # masked-template hash groups
    "q196_interval_overlap",  # order⋈lineitem clamped-overlap measure
    "q198_skyline",         # running-max Pareto frontier
    "q200_largest_remainder",  # two-level apportionment windows
    "q202_gopher_quality",  # pure-Catalyst rule projection (at the scan)
    "q203_semantic_dedup",  # Σ|cell|² pair kernel + star components
    "q204_minhash_keeper",  # banded candidates + components + keeper agg
    "q205_pack_interleave", # two-pass distributed prefix sum packing
    "q206_c4_quality",      # pure-Catalyst C4 rule projection
    "q210_tf_cosine",       # df-capped sparse term self-join
    "q211_ivf_cell_profile", # kernel assign + map-side agg
    "q212_dataset_card",    # one-scan corpus summary (digest distinct)
    "q213_seasonal_strength", # daily pre-agg + one window pass
    "q214_market_share",    # 6-table star, broadcast dims
    "q216_release_funnel",  # quality → exact dedup → minhash keeper, composed
    "q218_bpe_merge_candidates",  # char-pair explode + map-side count
    "q219_lsh_recall_audit",      # exact capped pairs FULL OUTER lsh pairs
    "q222_long_span_dedup",       # 50-token gram window + span anti-join
    "q223_semdedup_scaled",       # occupancy-scaled cells (K grows with corpus)
    "q224_lloyd_refine",          # two kernel assignment passes + (cell,dim) agg
    "q225_ccnet_lang_buckets",    # per-lang bigram window + NTILE
    "q226_vocab_growth",          # type-keyed MIN agg (one row per type)
    "q227_quality_keeper",        # minhash clusters × gopher score keeper
    "q230_winnowing_span_audit",  # per-doc fingerprint window + hash accounting
    "q232_oov_coverage",          # MAX window over (lang, gram-hash)
    "q233_nprobe_recall_curve",   # probe-pruned candidates vs linear exact side
    "q235_pq_audit",              # int64 kernel pass at the scan, no joins
    "q236_adc_recall_audit",      # LUT broadcast + kernel codes vs linear exact side
    "q237_pq_train_lift",         # 3 kernel passes + linear (vec,subspace) training shuffle
    "q238_decontaminate_13gram",  # semi-join gram probe + span anti-join rebuild
    "q239_boundary_pack",         # distributed prefix sum + bin agg
    "q240_hard_negatives",        # probed-cell candidates + 15-row anti-join
    "q241_cdc_chunk_dedup",       # per-doc boundary window + chunk-hash agg
    "q242_dsir_importance",       # feature explode + 8192-row lambda broadcast
    "q243_longest_dup_span",      # gram-hash window + per-doc islands window
    "q244_vocab_truncation_curve",# two-phase type agg + vocab-sized rank window
    "q245_embedding_decontamination", # broadcast bench side, corpus scanned once
    "q246_padding_waste",         # two prefix-sum rank passes + batch aggs
    "q247_ivf_tree_assign",       # 3 kernel assigns + N*K/S grouped argmin
    "q249_opq_allocation",        # 64-row variance agg + two pq-kernel passes
    "q250_ivf_partitioned_store", # partitionBy(cell) write + pruned read-back
    "q251_lsh_band_sweep",        # banded candidate joins x3 + capped exact truth
    "q252_quantization_retrieval_sweep", # 3 expression-only corpus scans
    "q253_trimmed_robust_stats",  # per-source rank window + hash agg
    "q254_anti_clustered_sharding", # q204 clusters + per-cluster rank window
    "q255_pq_layout_training_ablation", # 4 kernel passes + 2 bounded training aggs
    "q256_source_snapshot_drift",  # one scan + (source, snap) agg + tiny window
    "q257_tree_partitioned_store", # tree assign + 2-level partitioned write/pruned read
    "q258_water_filling_budget",   # one corpus agg + |sources|-row windows
    "q259_ivfadc_residual",        # 2 pq-kernel passes + coarse assign + probed-cell ADC
    "q260_mad_outliers",           # two rank windows sharing one source shuffle
    "q261_prefix_cache_savings",   # tokenize scan + prefix-key hash agg
    "q262_lexical_richness",       # token explode + two-phase agg
    "q263_dedup_cascade",          # exact window + capped pairs + survivor semdedup
    "q264_sample_diversity",       # rank-window sample + bounded capped pairs
    "q265_epochs_to_exhaustion",   # tokenize agg to |sources| rows + arithmetic
    "q266_snapshot_novelty",       # gram explode + two hash aggs
    "q267_snapshot_length_drift",  # (source, band) agg + source window
    "q268_dup_quality_interaction", # rule scan + capped pairs + components
    "q269_dup_position_profile",   # gram-hash window + tercile projection
    "q270_retrieval_margin",       # brute-force pass + probed-cell pool
    "q271_neardup_flow_matrix",    # capped pairs + |sources|^2 matrix
    "q272_consistent_hash_ring",   # ring kernel scan + 81-row matrix
    "q273_frequent_line_removal",  # line explode + h-window + rebuild agg
    "q274_transitivity_audit",     # capped pairs + cluster-size rollup
    "q275_quality_budget_curve",   # rule scan to 8x|sources| rows + tiny cross join
    "q276_tau_sensitivity",        # one capped pair pass + 3 component runs
    "q277_quality_calibration",    # (source, band) agg + 101-row cut window
    "q278_bpe_merge_apply",        # 2 char-explode scans + 1-row broadcast merge
    "q280_snapshot_recycling",     # capped pairs + per-doc MIN partner snap
    "q281_cascade_order_ablation", # one shared pair pass + two component runs
    "q282_incremental_neardup_store",  # store write/read + banded batch-vs-store join
    "q283_bpe_two_rounds",         # 3 explode scans + two 1-row broadcast merges
    "q284_phash_image_dedup",      # 66-md5 fold/doc + segment-blocked pairs
    "q285_retrieval_rank_eval",    # bf pass (q27 law) + probed-cell ANN + k-row eval
    "q286_script_mixture",         # one regex scan + 5-row agg
    "q287_snapshot_dedup_trend",   # one capped pair pass + per-snap components
    "q290_inverted_index_search",  # postings build + positional joins
    "q291_video_frame_dedup",      # 8 frame hashes/video + set-overlap pairs
    "q289_store_lifecycle_merge",  # q282 admission + gen-2 store merge/digest
    "q292_decontaminated_split",   # capped pair pass + boundary leak flags
    "q293_vector_store_delete",    # pruned delete-rewrite + post-delete search
    "q294_incremental_postings_merge",  # token-partitioned postings append + digest
    "q295_cross_modality_agreement",    # three pair stages + 8-row mask agg
    "q296_ranked_retrieval",            # postings-pruned tf·idf scoring + rank window
    "q298_multimodal_funnel",           # gate scan + 3 survivor pair stages + components
    "q299_vector_store_admission",      # append-only cell ingest + full-store search
    "q300_vector_store_compaction",     # 3 append gens + one-file-per-cell rewrite + search
    "q301_full_postings_index",         # UNPRUNED postings build + bucket-pruned serving
    "q302_retrieval_release_gate",      # bf + 2 ANN points + integer gate aggs
    "q303_dedup_precision_audit",       # exact truth + 3 mechanism pair stages
    "q304_filtered_vector_search",      # label-filtered probed-cell ANN + recall audit
    "q305_rrf_hybrid_retrieval",        # kw + vector top-k lists + integer RRF fusion
    "q306_postings_store_compaction",   # 3 append gens + per-bucket rewrite + pruned digest
    "q307_release_export_manifest",     # distributed-rank sharded export + read-back manifest
    "q308_selective_compaction",        # files-per-cell planner + flagged-cells-only rewrite
    "q309_boolean_retrieval",           # OR / index-only AND-NOT over pruned postings
    "q310_incremental_manifest",        # range-shard append + touched-shards-only manifest refresh
    "q311_nprobe_escalation",           # probe-ladder pool counts + chosen-rung top-1
    "q312_snapshot_time_travel",        # COW manifests: v1/v2 pinned reads + shared-file audit
    "q313_epoch_shuffle",               # hash-order epoch permutation + prefix-sum batch slicing
    "q314_cross_store_erasure",         # one delete set erased from 3 partitioned artifacts + digests
    "q315_streaming_export_manifest",   # foreachBatch appends + per-batch pruned manifest refresh
    "q316_snapshot_gc",                 # COW compaction + reference-counted expiry GC + v2-pinned read
    "q317_store_upsert_merge",          # CDC merge: affected-cells-only rewrite + full-store search
    "q318_incremental_cluster_labels",  # hist pairs + batch pairs + touched-components re-contraction
    "q319_snapshot_schema_evolution",   # metadata-only evolved append + two pinned reads
    "q320_bpe_encode_fixed_vocab",      # distinct-word 32-merge encode + doc reassembly shuffle
    "q321_snapshot_change_feed",        # COW merge + manifest-diff pre/post reads + feed join
    "q322_ivf_reindex_migration",       # 2 assignment kernel passes + one new-cell shuffle
    "q323_streaming_cdc_upserts",       # 3 foreachBatch merges (streaming-replay wall class)
    "q324_deletion_vectors",            # DV sidecar write + MOR anti-join + selective materialize
    "q325_zonemap_skipping",            # 16-way range-clustered write + manifest-planned band read
]


def main() -> int:
    spark = get_spark("scaling-probe")
    qs = entrymod.queries()
    qs["q02_broadcast_join"](spark, BASE).collect()  # warm
    # same fixed pure-JVM canary as bench.py: makes probe ratios
    # comparable across rounds/hosts (r06 verdict item #3) — divide
    # out canary drift before reading cross-round ratio changes.
    canary = None
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr(
            "sum(id * 2654435761 % 1000003) AS s"
        ).collect()
        dt = time.perf_counter() - t0
        canary = dt if canary is None else min(canary, dt)
    out = {}
    only = set(sys.argv[1:])
    for name in PROBE:
        if only and name not in only:
            continue
        times = {}
        for tag, d in (("1x", BASE), (f"{FACTOR}x", SCALED)):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, d).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[tag] = round(best, 2)
        times["ratio"] = round(times[f"{FACTOR}x"] / max(times["1x"], 1e-9), 1)
        out[name] = times
        print(f"# {name}: {times}", file=sys.stderr)
    print(json.dumps({"factor": FACTOR, "canary_sec": round(canary, 3), "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
