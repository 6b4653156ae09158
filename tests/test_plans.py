"""Physical-plan regression tests: the plan properties that make
these queries scale — filter pushdown into the parquet scan, column
pruning, broadcast selection for dimension joins, semi/anti join
strategies, map-side partial aggregation, whole-stage codegen — are
asserted here so a refactor can't silently trade them away.

Assertions are substring checks on the executed plan string at
sf0.001 (AQE final plans); they encode properties, not exact plan
shapes, so they hold across Spark versions and scales.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.plans import pipeline_queries as P
from ai_data_pipeline_spark.plans import relational as R


def plan_of(df) -> str:
    df.collect()  # materialize so AQE's FINAL plan is what we read
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_pushdown_and_pruning(spark, sf_dir):
    s = plan_of(R.q01_scan_filter_project(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in s
    # pruned scan: only the 4 projected columns + the filter column
    assert "l_comment" not in s and "l_quantity" not in s
    assert re.search(r"\*\(\d+\)", s), "no whole-stage-codegen stages"


def test_q02_q03_broadcast_dimension_joins(spark, sf_dir):
    s2 = plan_of(R.q02_broadcast_join(spark, sf_dir))
    assert "BroadcastHashJoin" in s2
    assert "CartesianProduct" not in s2
    s3 = plan_of(R.q03_revenue_by_nation(spark, sf_dir))
    assert "BroadcastHashJoin" in s3
    assert "SortMergeJoin" not in s3 or "BroadcastHashJoin" in s3
    # pruning: the wide comment/address columns never enter the plan
    assert "c_comment" not in s3 and "o_comment" not in s3


def test_q05_q06_semi_anti_strategies(spark, sf_dir):
    assert "LeftSemi" in plan_of(R.q05_semi_join(spark, sf_dir))
    assert "LeftAnti" in plan_of(R.q06_anti_join(spark, sf_dir))


def test_q07_range_predicate_inside_join(spark, sf_dir):
    """The range condition must ride the equi-join (evaluated during
    the join), not materialize a cartesian product first."""
    s = plan_of(R.q07_range_join(spark, sf_dir))
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s
    assert "l_shipdate" in s.split("Join")[1][:400]


def test_q08_partial_aggregation(spark, sf_dir):
    """Map-side combine: partial_* functions before the exchange —
    at 100 TB this is the difference between shuffling 6 rows per
    task and shuffling the fact table."""
    s = plan_of(R.q08_agg_suite(spark, sf_dir))
    assert "partial_count" in s or "partial_sum" in s
    assert re.search(r"\*\(\d+\)", s), "no whole-stage-codegen stages"


def test_q20_dedup_shuffles_digests_not_text(spark, sf_dir):
    """The dedup agg groups on fixed-width digests; the raw document
    text must not survive past the scan stage's project."""
    s = plan_of(P.q20_exact_dedup(spark, sf_dir))
    exchanges = [seg for seg in s.splitlines() if "Exchange" in seg]
    assert exchanges, "expected a shuffle for the groupBy"
    assert all("text#" not in seg for seg in exchanges)


def test_q35_single_agg_shuffle(spark, sf_dir):
    """One hash-partitioned exchange for the windowed agg (plus the
    final range exchange for ORDER BY) — no accidental extra
    shuffles."""
    s = plan_of(P.q35_tumbling_window(spark, sf_dir))
    hash_exchanges = {
        re.sub(r"plan_id=\d+", "", seg).strip()
        for seg in s.splitlines()
        if "Exchange hashpartitioning" in seg
    }
    assert len(hash_exchanges) <= 1


def test_q11_window_is_partitioned(spark, sf_dir):
    """Ranking window must declare a partition spec — an
    unpartitioned window is a single-task sort of the whole input."""
    s = plan_of(R.q11_topk_per_group(spark, sf_dir))
    window_lines = [l for l in s.splitlines() if "Window" in l and "row_number" in l]
    assert window_lines
    assert any("n_name" in l for l in window_lines)


def test_approx_count_distinct_error_bound(spark, sf_dir):
    """approx_count_distinct (HLL++) must land within 5% of the exact
    count — the engine-specific estimate is pinned here instead of in
    the q50 oracle (DuckDB's HLL differs by construction)."""
    from pyspark.sql import functions as F
    from ai_data_pipeline_spark.catalog import load_table

    c = load_table(spark, sf_dir, "customer")
    row = c.agg(
        F.approx_count_distinct("c_custkey").alias("approx"),
        F.countDistinct("c_custkey").alias("exact"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= 0.05 * row["exact"]


def test_q42_single_window_shuffle(spark, sf_dir):
    """ntile/lead/first/last share one partitioning — exactly one
    hash exchange (plus the final range exchange for ORDER BY)."""
    s = plan_of(R.q42_window_suite(spark, sf_dir))
    hash_exchanges = {
        re.sub(r"plan_id=\d+", "", seg).strip()
        for seg in s.splitlines()
        if "Exchange hashpartitioning" in seg
    }
    assert len(hash_exchanges) == 1


def test_q44_pivot_no_distinct_values_job(spark, sf_dir):
    """Explicit pivot values keep the plan to the two-phase agg — no
    third exchange from a hidden distinct-values collect."""
    s = plan_of(R.q44_pivot_counts(spark, sf_dir))
    hash_exchanges = {
        re.sub(r"plan_id=\d+", "", seg).strip()
        for seg in s.splitlines()
        if "Exchange hashpartitioning" in seg
    }
    assert len(hash_exchanges) <= 2


def test_q49_single_python_stage_topk(spark, sf_dir):
    """One Arrow-batched Python eval (the encoder); distance + top-k
    stay JVM-side (TakeOrdered, no global sort)."""
    s = plan_of(P.q49_embed_knn(spark, sf_dir))
    python_nodes = {
        re.sub(r"#\d+|plan_id=\d+", "", l.strip())
        for l in s.splitlines()
        if "ArrowEvalPython" in l or "MapInPandas" in l
    }
    assert len(python_nodes) == 1
    assert "TakeOrderedAndProject" in s


def test_q67_session_agg_reuses_partitioning(spark, sf_dir):
    """The per-session agg clusters on (user_id, session_id), which
    hashpartitioning(user_id) from the session window already
    satisfies — exactly one hash exchange in the whole plan."""
    s = plan_of(P.q67_session_conversion(spark, sf_dir))
    hash_exchanges = {
        re.sub(r"plan_id=\d+", "", seg).strip()
        for seg in s.splitlines()
        if "Exchange hashpartitioning" in seg
    }
    assert len(hash_exchanges) == 1


def test_q11_topk_rank_pushdown(spark, sf_dir):
    """row_number <= k pushes into WindowGroupLimit (partial+final):
    each group keeps k rows BEFORE the shuffle — at scale the
    exchange carries k·groups rows, not the whole table."""
    s = plan_of(R.q11_topk_per_group(spark, sf_dir))
    assert "WindowGroupLimit" in s


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-partitioned parquet + an equality filter on the partition
    column → the scan lists ONLY the matching partition directory
    (PartitionFilters, zero rows read from other partitions). The
    100 TB analog: date-partitioned tables make time-ranged queries
    touch only their days."""
    from ai_data_pipeline_spark.catalog import load_table

    out = str(tmp_path / "orders_part")
    load_table(spark, sf_dir, "orders").write.partitionBy("o_orderstatus").parquet(out)
    df = spark.read.parquet(out).filter("o_orderstatus = 'F'")
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*o_orderstatus", s)
    n_f = df.count()
    assert n_f == load_table(spark, sf_dir, "orders").filter("o_orderstatus = 'F'").count()


def test_q83_full_outer_strategy(spark, sf_dir):
    s = plan_of(R.q83_full_outer_join(spark, sf_dir))
    assert "FullOuter" in s
    assert "CartesianProduct" not in s


def test_q23_shingle_cap_reuses_exchange(spark, sf_dir):
    """The frequency-cap window shuffles sh on the shingle hash — the
    SAME partitioning the self-join needs, so the exchange must be
    reused, not recomputed (the groupBy+join-back form re-executed the
    whole shingling DAG; measured 2.7x on q23 at sf0.1)."""
    s = plan_of(P.q23_ngram_jaccard(spark, sf_dir))
    assert "ReusedExchange" in s


def test_q86_asof_union_recipe_has_no_join(spark, sf_dir):
    """The union-then-window as-of is join-free by construction: one
    hash exchange on the key, a window pass, no |L|x|R| intermediate.
    A regression to the join-based form would show a Join operator."""
    s = plan_of(P.q86_asof_forward(spark, sf_dir))
    assert "Join" not in s
    import re as _re

    hashes = {
        _re.sub(r"plan_id=\d+", "", l).strip()
        for l in s.splitlines()
        if "Exchange hashpartitioning" in l
    }
    assert len(hashes) <= 1


def test_q87_packing_single_shuffle(spark, sf_dir):
    """Window (partitionBy source) and the groupBy(source) agg share
    one hash exchange — the agg reuses the window's partitioning."""
    s = plan_of(P.q87_concat_packing(spark, sf_dir))
    import re as _re

    hashes = {
        _re.sub(r"plan_id=\d+", "", l).strip()
        for l in s.splitlines()
        if "Exchange hashpartitioning" in l
    }
    assert len(hashes) <= 1


def test_q90_vocab_broadcasts(spark, sf_dir):
    """The top-500 vocab is tiny by construction — the coverage probe
    must be a broadcast hash join (map-side probe), never a shuffle
    of the token stream on content."""
    s = plan_of(P.q90_vocab_coverage(spark, sf_dir))
    assert "BroadcastHashJoin" in s


def test_q91_funnel_single_pass(spark, sf_dir):
    """The funnel is ONE annotated frame, not stage-per-frame: no
    joins at all, and only the digest + source hash exchanges — the
    stage-per-frame form re-scanned the corpus four times."""
    s = plan_of(P.q91_curation_funnel(spark, sf_dir))
    assert "Join" not in s
    import re as _re

    # AQE prints final + initial plans; dedupe by stripped line
    hashes = {
        _re.sub(r"plan_id=\d+", "", l).strip()
        for l in s.splitlines()
        if "Exchange hashpartitioning" in l
    }
    assert len(hashes) <= 2


def test_q93_cooccurrence_narrow_pairs(spark, sf_dir):
    """Pairs generate narrowly from the per-order collect_set — no
    join of any kind, and exactly two hash exchanges (basket groupBy
    + pair agg)."""
    s = plan_of(P.q93_part_cooccurrence(spark, sf_dir))
    assert "Join" not in s
    hashes = {
        re.sub(r"plan_id=\d+", "", l).strip()
        for l in s.splitlines()
        if "Exchange hashpartitioning" in l
    }
    assert len(hashes) <= 2, hashes


def test_q80_single_documents_scan(spark, sf_dir):
    """q80 carries n_tok/n_distinct THROUGH the bigram aggregation
    (first() per doc) instead of joining doc-level stats back onto a
    second documents scan — one scan, no join."""
    s = plan_of(P.q80_repetition_quality(spark, sf_dir))
    assert "Join" not in s
    # AQE prints final + initial plans; dedupe by attribute-stripped line
    scans = {
        re.sub(r"#\d+", "", l).strip()
        for l in s.splitlines()
        if "FileScan" in l
    }
    assert len(scans) == 1, scans


def test_new_frequency_windows_have_no_join_back(spark, sf_dir):
    """q102 (df enrichment), q103 (bigram frequency), q109 (segment
    frequency) all enrich via COUNT windows over the exploded frame —
    no join, single documents scan (CLAUDE.md's window-vs-join-back
    rule)."""
    for fn in (P.q102_tfidf_topk, P.q103_bigram_fluency, P.q109_segment_dedup):
        s = plan_of(fn(spark, sf_dir))
        assert "Join" not in s, fn.__name__
        scans = {
            re.sub(r"#\d+", "", l).strip()
            for l in s.splitlines()
            if "FileScan" in l
        }
        assert len(scans) == 1, (fn.__name__, scans)


def test_q108_digest_join_carries_no_text(spark, sf_dir):
    """The incremental-dedup join must shuffle digests, not document
    text: text dies at the scan's project on both branches."""
    s = plan_of(P.q108_incremental_dedup(spark, sf_dir))
    for line in s.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line


def test_r3_analysis_single_scan_no_join(spark, sf_dir):
    """q115/q116 (SCD2, forward fill) are pure window pipelines over
    one events scan — no join, one exchange on user_id; q117's
    unpivot profile is one customer scan with a narrow stack."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    for fn in (A.q115_scd2_intervals, A.q116_forward_fill, A.q117_column_profile):
        s = plan_of(fn(spark, sf_dir))
        assert "Join" not in s, fn.__name__
        scans = {
            re.sub(r"#\d+", "", l).strip()
            for l in s.splitlines()
            if "FileScan" in l
        }
        assert len(scans) == 1, (fn.__name__, scans)


def test_q114_pmi_partial_aggregation(spark, sf_dir):
    """Token/bigram counts must combine map-side (Zipf mass collapses
    before the exchange), and the single-row N side must broadcast —
    never a shuffled cartesian."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    s = plan_of(A.q114_pmi_bigrams(spark, sf_dir))
    assert "partial_count" in s
    assert "CartesianProduct" not in s


def test_q118_sweep_partitions_by_day(spark, sf_dir):
    """The concurrency sweep's running sum must partition by day —
    a global (empty-partition-spec) window would serialize the whole
    sweep through one task at 100 TB."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    s = plan_of(A.q118_max_concurrency(spark, sf_dir))
    matched = 0
    for line in s.splitlines():
        if "windowspecdefinition" in line and "delta" in line:
            matched += 1
            assert "day" in line.split("windowspecdefinition")[1][:80]
    assert matched, "sweep window not found in plan — assertion is vacuous"


def test_q119_single_scan_partial_agg(spark, sf_dir):
    """The moment agg must combine map-side — six numbers per group
    cross the exchange, not the fact table."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    s = plan_of(A.q119_corr_moments(spark, sf_dir))
    assert "Join" not in s
    assert "partial_count" in s or "partial_sum" in s


def test_q120_window_exchange_reused_by_agg(spark, sf_dir):
    """The z-score gate enriches via moment WINDOWS over event_type;
    the final per-type agg must reuse that same partitioning — one
    data exchange total (CLAUDE.md's window-vs-join-back rule)."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    s = plan_of(A.q120_zscore_outliers(spark, sf_dir))
    assert "Join" not in s
    exch = {
        re.sub(r"#\d+|plan_id=\d+", "", l).strip()
        for l in s.splitlines()
        if "Exchange hashpartitioning" in l
    }
    assert len(exch) == 1, exch


def test_q121_q122_shuffles_hashes_not_text(spark, sf_dir):
    """Novelty and winnowing shuffle 60-bit gram hashes; document
    text must die at the scan projection."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    for fn in (A.q121_ngram_novelty, A.q122_winnowing):
        s = plan_of(fn(spark, sf_dir))
        for line in s.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "text#" not in line, fn.__name__


def test_q124_bloom_bits_broadcast(spark, sf_dir):
    """The bloom bit table and the blocklist are metadata-sized —
    both sides must broadcast; the corpus is never shuffled on text."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    s = plan_of(A.q124_bloom_audit(spark, sf_dir))
    assert "BroadcastHashJoin" in s
    for line in s.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line


def test_q125_q126_narrow_then_agg(spark, sf_dir):
    """Weighted sampling is pure per-row arithmetic + one combinable
    agg; TVD pairs only post-aggregation histogram rows — text never
    crosses an exchange in either."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    s = plan_of(A.q125_weighted_sample(spark, sf_dir))
    assert "Join" not in s and ("partial_count" in s or "partial_sum" in s)
    s = plan_of(A.q126_source_tvd(spark, sf_dir))
    for line in s.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line


def test_q127_session_agg_reuses_partitioning(spark, sf_dir):
    """groupBy(user_id, session_id) after the sessionize window must
    reuse the user_id hash partitioning (subset rule) — two hash
    exchanges total: user_id, then path."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    s = plan_of(A.q127_session_paths(spark, sf_dir))
    exch = {
        re.sub(r"#\d+|plan_id=\d+", "", l).strip()
        for l in s.splitlines()
        if "Exchange hashpartitioning" in l
    }
    assert len(exch) == 2, exch


def test_q128_q129_collapse_before_window(spark, sf_dir):
    """Trend and histogram windows must run on post-agg micro-frames:
    the lag/CDF Window node sits above a HashAggregate, never directly
    on the scan."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    for fn in (A.q128_wow_change, A.q129_price_histogram):
        s = plan_of(fn(spark, sf_dir))
        assert "partial_count" in s, fn.__name__
        # the Window consumes aggregate output, not scan output
        w_at = s.find("Window")
        agg_at = s.find("HashAggregate")
        assert w_at != -1 and agg_at != -1 and w_at < agg_at, fn.__name__


def test_q130_anti_join_strategies(spark, sf_dir):
    """All three FK checks plan as anti joins (semi-join family), no
    cartesian."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    s = plan_of(A.q130_integrity_audit(spark, sf_dir))
    assert "LeftAnti" in s
    assert "CartesianProduct" not in s


def test_q131_centroids_broadcast(spark, sf_dir):
    """The 4-row updated-centroid side must broadcast into the
    reassignment; distances are JVM-side HOF folds (no Python)."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    s = plan_of(A.q131_kmeans_reassign(spark, sf_dir))
    assert "Broadcast" in s
    assert "ArrowEvalPython" not in s and "MapInPandas" not in s


def test_q132_fanout_after_distinct(spark, sf_dir):
    """The ×7 day fan-out must ride the DISTINCT (user, day) pairs,
    not raw events: the Generate (explode) node sits above the
    dedup aggregate."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    s = plan_of(A.q132_rolling_active(spark, sf_dir))
    # the explode consumes the deduped `day` column, not a raw event ts
    assert "Generate explode(sequence(day#" in s
    assert "BroadcastHashJoin" in s  # report-day clip


def test_q133_q135_window_exchange_reused(spark, sf_dir):
    """q133's first-view window + qualifying agg and q135's
    rank/total windows + source agg each share ONE hash exchange."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    for fn in (A.q133_time_to_convert, A.q135_weighted_median):
        s = plan_of(fn(spark, sf_dir))
        assert "Join" not in s, fn.__name__
        exch = {
            re.sub(r"#\d+|plan_id=\d+", "", l).strip()
            for l in s.splitlines()
            if "Exchange hashpartitioning" in l
        }
        assert len(exch) <= 2, (fn.__name__, exch)


def test_q134_q136_collapse_before_window(spark, sf_dir):
    """Pareto ranks per-part aggregates and churn ranks distinct
    (user, week) rows — both windows consume aggregate output."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    for fn in (A.q134_pareto_abc, A.q136_weekly_churn):
        s = plan_of(fn(spark, sf_dir))
        w_at = s.find("Window")
        # top-down print: an aggregate DEEPER than the window (printed
        # after it) is the collapse the window consumes
        assert w_at != -1 and s.find("HashAggregate", w_at) != -1, fn.__name__


def test_q137_q140_single_exchange_pipelines(spark, sf_dir):
    """Inter-arrival (one user_id window) and the norm audit (pure
    narrow fold + agg) each keep to ≤2 deduped hash exchanges and
    never shuffle text/vector payloads by name."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    for fn in (A.q137_interarrival, A.q140_embed_norm_audit):
        s = plan_of(fn(spark, sf_dir))
        assert "Join" not in s, fn.__name__
        exch = {
            re.sub(r"#\d+|plan_id=\d+", "", l).strip()
            for l in s.splitlines()
            if "Exchange hashpartitioning" in l
        }
        assert len(exch) <= 2, (fn.__name__, exch)


def test_q139_pairs_explode_bounded_sets(spark, sf_dir):
    """The source-pair explosion must consume the per-digest
    collect_set output (bounded by |sources|), and shuffles must
    carry digests, never text."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    s = plan_of(A.q139_cross_source_dups(spark, sf_dir))
    g_at = s.find("Generate explode(sources#")
    assert g_at != -1 and s.find("ObjectHashAggregate", g_at) != -1
    for line in s.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line


def test_q141_lerp_no_join(spark, sf_dir):
    """The bidirectional union-then-window lerp must plan with no
    join (the spine rides the event stream) and exactly one
    event_type hash exchange reused by both direction windows."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    s = plan_of(A.q141_lerp_resample(spark, sf_dir))
    assert "SortMergeJoin" not in s and "BroadcastHashJoin" not in s
    exch = {
        re.sub(r"#\d+|plan_id=\d+", "", l).strip()
        for l in s.splitlines()
        if "Exchange hashpartitioning" in l
    }
    assert len(exch) <= 2, exch


def test_q142_q143_collapse_and_no_text_shuffle(spark, sf_dir):
    """Vocab overlap joins distinct (source, token) pairs — text dies
    at the scan; seasonality collapses map-side to the 7x24 grid."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    s = plan_of(A.q142_vocab_overlap(spark, sf_dir))
    for line in s.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line
    s = plan_of(A.q143_seasonality(spark, sf_dir))
    assert "Join" not in s and "partial_count" in s


def test_q81_histogram_percentile_is_bitexact_and_bufferless(spark, sf_dir):
    """The r05 q81 rewrite reads percentiles off the value histogram
    instead of percentile()'s per-group value buffer. Two pins:
    (a) the output doubles are BIT-IDENTICAL to percentile() (same
    interpolation formula over the same exact operands), and (b) the
    plan contains no ObjectHashAggregate — the scan collapses
    map-side into (flag, value) count cells."""
    from pyspark.sql import functions as F

    new = R.q81_percentile_cont(spark, sf_dir)
    old = (
        R._t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.25)").alias("q25"),
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            F.expr("percentile(l_quantity, 0.75)").alias("q75"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )
    assert [tuple(r) for r in new.collect()] == [tuple(r) for r in old.collect()]
    s = plan_of(new)
    assert "ObjectHashAggregate" not in s
    assert "partial_count" in s  # map-side combine of the histogram


def test_q163_partition_pruning_engages(spark, sf_dir):
    """The partition-column predicate must land in PartitionFilters
    (directory pruning — no data files of other priorities opened),
    and must NOT need a row-level pushed filter on that column."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    s = plan_of(A.q163_partition_pruned_scan(spark, sf_dir))
    i = s.find("PartitionFilters: [")
    assert i != -1 and "o_orderpriority" in s[i : i + 300]


def test_q164_bucketed_join_skips_exchanges(spark, sf_dir):
    """Bucket co-location: the only Exchange in the final plan is the
    one under the aggregate — neither join side reshuffles — and the
    scans report bucket selection."""
    from ai_data_pipeline_spark.plans import analysis_queries as A

    s = plan_of(A.q164_bucketed_join(spark, sf_dir))
    assert "SelectedBucketsCount" in s
    # the join key never crosses an exchange (AQE prints the plan
    # twice, so count exchanges by KEY, not occurrences)
    assert not re.search(r"Exchange hashpartitioning\((c_custkey|o_custkey)", s)
    assert re.search(r"Exchange hashpartitioning\(c_mktsegment", s)


def test_q186_bitmap_agg_is_mergeable_two_level(spark, sf_dir):
    """The exact-distinct path must be the mergeable-bitmap shape: a
    map-side partial bitmap_construct_agg under the (group, bucket)
    exchange — the shuffle carries fixed-size bitmaps, never raw
    custkeys — then a second level summing bitmap_count. A refactor
    to COUNT(DISTINCT) would drop both markers."""
    from ai_data_pipeline_spark.plans import extended_queries as X

    s = plan_of(X.q186_bitmap_distinct(spark, sf_dir))
    assert "partial_bitmap_construct_agg" in s
    assert "bitmapCount" in s
    # pruned scan: the two used columns only
    i = s.find("ReadSchema")
    assert "o_custkey" in s[i : i + 200] and "o_totalprice" not in s


def test_q187_pagerank_plan_shape(spark, sf_dir):
    """PageRank's scale contract: (a) the windowed edge frame is
    localCheckpointed, so iterations consume ExistingRDD, never
    re-running the base orders⋈lineitem join (no FileScan of lineitem
    may appear in the final plan); (b) the rank vector moves to the
    edges via broadcast (BroadcastHashJoin, |V| ≪ |E|); (c) every
    exchange key is a BIGINT node id — the 'c:'/'s:' labels are
    materialized only above the final top-k (TakeOrderedAndProject,
    no global Sort)."""
    from ai_data_pipeline_spark.plans import extended_queries as X

    s = plan_of(X.q187_pagerank3(spark, sf_dir))
    assert "ExistingRDD" in s
    assert "lineitem" not in s  # base join ran once, at checkpoint time
    assert "BroadcastHashJoin" in s
    assert "TakeOrderedAndProject" in s
    # rank-mass exchanges are keyed on long node ids (#NL), not strings
    for m in re.finditer(r"Exchange hashpartitioning\((\w+)#\d+(L?)", s):
        assert m.group(2) == "L", f"non-long shuffle key {m.group(0)}"


def test_q190_shuffle_carries_hash_not_text(spark, sf_dir):
    """Template dedup shuffles the 32-hex md5 with partial counts —
    the text column must die at the map side (no Exchange output may
    contain it), and the top-20 is TakeOrdered, not a global sort."""
    from ai_data_pipeline_spark.plans import extended_queries as X

    df = X.q190_template_dedup(spark, sf_dir)
    s = plan_of(df)
    assert "TakeOrderedAndProject" in s
    assert re.search(r"Exchange hashpartitioning\(th#", s)
    assert "partial_count" in s  # map-side combine under the exchange
    # what crosses the shuffle is exactly the Exchange node's own
    # attribute list — read it from the formatted explain (each
    # `(N) Exchange` block prints `Input [n]: [...]`), not from a
    # positional slice of the tree print (ADVICE r07: the slice could
    # collapse and pass vacuously)
    fmt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    exchanges = [
        b
        for b in re.split(r"\n\n+", fmt)
        if re.search(r"\(\d+\) Exchange\b", b)
        and "hashpartitioning(th#" in b
    ]
    assert exchanges, "no th-keyed Exchange block in formatted plan"
    for block in exchanges:
        m = re.search(r"Input \[\d+\]: \[([^\]]+)\]", block)
        assert m and m.group(1).strip(), block
        assert "text#" not in m.group(1), block


def test_q202_gopher_pure_catalyst(spark, sf_dir):
    """The Gopher rule family must run AT THE SCAN: no Python eval
    node of any kind, word/line metrics folded map-side into a
    partial aggregate, and exactly two exchanges — the per-source
    hash agg and the final presentation sort."""
    from ai_data_pipeline_spark.plans import extended_queries as X

    s = plan_of(X.q202_gopher_quality(spark, sf_dir))
    assert "Python" not in s  # no BatchEvalPython / ArrowEvalPython / mapInPandas
    assert "partial_count" in s and "partial_sum" in s  # map-side combine
    uniq = {
        re.sub(r"#\d+|plan_id=\d+", "", ln.strip())
        for ln in s.splitlines()
        if "Exchange" in ln and "ShuffleQueryStage" not in ln
    }
    hash_ex = [l for l in uniq if "hashpartitioning(source" in l]
    range_ex = [l for l in uniq if "rangepartitioning(source" in l]
    assert len(hash_ex) == 1, uniq
    assert len(range_ex) == 1, uniq
    assert len(uniq) == 2, uniq


def test_q214_star_joins_broadcast_dims(spark, sf_dir):
    """The 6-table star: every dimension (part, supplier, both nation
    roles, region) must arrive by broadcast — the fact chain is the
    only thing allowed to shuffle. No cartesian/NL joins."""
    from ai_data_pipeline_spark.plans import extended_queries as X

    s = plan_of(X.q214_market_share(spark, sf_dir))
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    uniq = {
        re.sub(r"#\d+|plan_id=\d+", "", ln.strip())
        for ln in s.splitlines()
        if "BroadcastHashJoin" in ln
    }
    assert len(uniq) >= 5, uniq  # part, nc, region, supplier, ns
    assert "partial_sum" in s  # map-side combined revenue


def test_q205_prefix_sum_never_windows_corpus_globally(spark, sf_dir):
    """distributed_prefix_sum's scale contract in the executed plan:
    the corpus cumsum Window is PARTITIONED by the bucket; the only
    unpartitioned Window consumes the B-row per-bucket totals
    (sum(_total…)), never the corpus rows; and the offsets come back
    by broadcast on the bucket key."""
    from ai_data_pipeline_spark.plans import extended_queries as X

    s = plan_of(X.q205_pack_interleave(spark, sf_dir))
    clean = re.sub(r"#\d+|plan_id=\d+", "", s)
    window_lines = [
        l.strip() for l in clean.splitlines() if "windowspecdefinition" in l
    ]
    assert window_lines
    for l in window_lines:
        if "sum(n_tok" in l:
            # corpus cumsum: partition spec leads with the bucket
            assert "windowspecdefinition(bucket" in l, l
        else:
            # the only other window is the B-row offset pass
            assert "sum(_total" in l, l
    assert "BroadcastHashJoin [bucket" in clean


def test_q223_assignment_is_kernel_no_corpus_window(spark, sf_dir):
    """Occupancy-scaled SemDeDup's assignment contract: the argmin
    runs in the int64 Arrow kernel (a MapInPandas stage over the
    corpus — the HOF-join form probed ~5× super-linear at 16× from
    the N×K constant), with no Window and no cartesian join touching
    corpus-sized input anywhere in the final plan."""
    from ai_data_pipeline_spark.plans import frontier_queries as FQ

    s = plan_of(FQ.q223_semdedup_scaled(spark, sf_dir))
    assert "CartesianProduct" not in s
    assert "MapInPandas" in s  # kernel assignment (+ pair kernel)
    assert "Window" not in s


def test_assign_exact_q6_kernel_matches_hof_fold(spark, sf_dir):
    """The count-gated kernel and the distributed BIGINT-fold
    fallback of _assign_exact_q6 are the SAME exact integers — the
    path choice can never change a cell assignment."""
    from ai_data_pipeline_spark.functions.vector import quantize_q6
    from ai_data_pipeline_spark.plans import frontier_queries as FQ

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", quantize_q6("embedding").alias("v6"))
    seeds = base.filter(F.pmod(F.col("vec_id"), F.lit(64)) == 0).select(
        F.col("vec_id").alias("seed_id"), F.col("v6").alias("s6")
    )
    fast = {
        r["vec_id"]: r["cell"]
        for r in FQ._assign_exact_q6(base, seeds).collect()
    }
    d6 = F.aggregate(
        F.zip_with("v6", "s6", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    slow = {
        r["vec_id"]: r["cell"]
        for r in (
            base.join(F.broadcast(seeds))
            .select(
                "vec_id",
                F.struct(d6.alias("d"), F.col("seed_id").alias("c")).alias("dc"),
            )
            .groupBy("vec_id")
            .agg(F.min("dc").alias("m"))
            .select("vec_id", F.col("m.c").alias("cell"))
            .collect()
        )
    }
    assert fast == slow


def test_q222_span_window_partitions_by_gram_hash(spark, sf_dir):
    """Long-span dedup at n=50 keeps q146's scale shape for the span
    derivation: the first-occurrence Window partitions by the 8-byte
    gram hash (the only corpus-sized window) and the text column never
    enters the gram shuffle (hash only). Since r13 the query is
    ACCOUNTING-ONLY (tok_after = tok_before − |covered| — the oracle's
    own identity): the string rebuild (collect_list re-assembly, the
    q81 value-buffer class) must be GONE, and the covered counts
    arrive by a left join instead of the rebuild's anti-join."""
    from ai_data_pipeline_spark.plans import frontier_queries as FQ

    s = plan_of(FQ.q222_long_span_dedup(spark, sf_dir))
    clean = re.sub(r"#\d+|plan_id=\d+", "", s)
    gram_windows = [
        l for l in clean.splitlines() if "windowspecdefinition(gh" in l
    ]
    assert gram_windows, "first-occurrence window must partition by gram hash"
    assert "CartesianProduct" not in s
    # the r13 accounting-only rewrite: no string rebuild anywhere
    assert "collect_list" not in s
    assert "ObjectHashAggregate" not in s
    assert "LeftOuter" in s  # covered counts attach by left join


def test_q232_coverage_is_one_window_no_join(spark, sf_dir):
    """OOV coverage's scale contract: covered-ness comes from ONE MAX
    window over (lang, gram-hash) — no join anywhere in the plan (the
    groupBy+join-back form would re-execute the tokenize stage and
    pay a second shuffle; CLAUDE.md's exchange-reuse rule)."""
    from ai_data_pipeline_spark.plans import frontier_queries as FQ

    s = plan_of(FQ.q232_oov_coverage(spark, sf_dir))
    assert "Join" not in s, s
    clean = re.sub(r"#\d+|plan_id=\d+", "", s)
    wins = [l for l in clean.splitlines() if "windowspecdefinition" in l]
    assert wins and all("lang" in l and "h" in l for l in wins)


def test_q228_thresholds_broadcast(spark, sf_dir):
    """Mixture sampling joins the corpus against L per-language
    thresholds — that side must arrive by broadcast, never a shuffle
    of the corpus on lang."""
    from ai_data_pipeline_spark.plans import frontier_queries as FQ

    s = plan_of(FQ.q228_mixture_sample(spark, sf_dir))
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s


def test_q230_within_doc_repeated_span_parity(spark, tmp_path):
    """r09 ADVICE #1 regression fixture: a doc containing the SAME
    50-token block at two positions. Winnowing proper counts
    fingerprints PER POSITION, so the repeated gram selected at both
    occurrences must yield n_fp=2 on BOTH engines — the oracle once
    did DISTINCT after stripping the position suffix and would have
    collapsed it to 1 (latent local-green/driver-red on boilerplate-
    heavy corpora; both graded SFs happen to contain no within-doc
    repeated 50-gram, so only this fixture exercises the branch)."""
    import duckdb

    from ai_data_pipeline_spark.oracle import compare
    from ai_data_pipeline_spark.plans import frontier_queries as FQ

    block = " ".join(f"a{i}" for i in range(60))
    filler = " ".join(f"f{i}" for i in range(10))
    docs = [
        # doc 0: block twice -> interior winnowing windows of the two
        # occurrences are identical gram sequences, so the same gram
        # hash is selected at two positions in ONE doc.
        (0, f"{block} {filler} {block}"),
        (1, " ".join(f"b{i}" for i in range(80))),
        (2, " ".join(f"c{i}" for i in range(55))),
    ]
    fix = str(tmp_path / "q230fix")
    spark.createDataFrame(
        [(i, t, "en", "fix", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{fix}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{fix}/documents.parquet/*.parquet'"
    )

    # the fixture genuinely engages the branch: some (doc_id, h) is a
    # selected fingerprint at >= 2 positions
    sql = FQ.ORACLE["q230_winnowing_span_audit"]
    sel_body = sql.split("), per_h AS (")[0] + ")"
    n_multi = con.execute(
        f"{sel_body} SELECT COUNT(*) FROM ("
        "SELECT doc_id, h FROM sel GROUP BY doc_id, h HAVING COUNT(*) >= 2)"
    ).fetchone()[0]
    assert n_multi >= 1, "fixture failed to produce a within-doc repeated fingerprint"

    report = compare(FQ.q230_winnowing_span_audit(spark, fix), con, sql)
    assert report["match"], report


def test_q238_collision_probe_is_semi_join_no_pair_explosion(spark, sf_dir):
    """Decontamination's scale contract: the benchmark collision
    probe is a (broadcast) LEFT SEMI join against the DISTINCT gram-
    hash set — one output row per colliding corpus occurrence, never
    an f² pair join — and the covered-span removal is an anti-join."""
    from ai_data_pipeline_spark.plans import frontier_queries as FQ

    s = plan_of(FQ.q238_decontaminate_13gram(spark, sf_dir))
    assert "LeftSemi" in s
    assert "LeftAnti" in s
    assert "CartesianProduct" not in s


def test_q239_pack_never_splits_and_never_overfills(spark, sf_dir):
    """Boundary-respecting packing's two guarantees, checked on DATA
    (not just the summary): (a) every bin's fill ≤ BUDGET — the
    capacity-reservation proof holds on this corpus; (b) each doc is
    wholly inside one bin by construction (the bin is a function of
    the doc's start, never of a mid-doc boundary). Plus the plan
    contract: the corpus cumsum window is bucket-partitioned (q205's
    distributed prefix sum), no global single-task corpus window."""
    from ai_data_pipeline_spark.functions.text import token_count_bpe_ish
    from ai_data_pipeline_spark.operators.curation import distributed_prefix_sum
    from ai_data_pipeline_spark.plans import frontier_queries as FQ

    docs = load_table(spark, sf_dir, "documents")
    step = 1_000_003 // 64 + 1
    base = docs.select(
        "doc_id",
        token_count_bpe_ish(F.col("text")).alias("n_tok"),
        F.expr("((doc_id % 1000003) * 2654435761) % 1000003").alias("ord_key"),
    ).withColumn("bucket", F.expr(f"ord_key div {step}"))
    kept = base.filter(F.col("n_tok") <= FQ._Q239_CAP)
    cum = distributed_prefix_sum(kept, "bucket", ["ord_key", "doc_id"], "n_tok")
    fills = (
        cum.select(F.expr(f"(cum - n_tok) div {FQ._Q239_EFF}").alias("bin"), "n_tok")
        .groupBy("bin")
        .agg(F.sum("n_tok").alias("fill"))
        .collect()
    )
    assert fills
    assert all(r["fill"] <= FQ._Q239_BUDGET for r in fills)

    s = plan_of(FQ.q239_boundary_pack(spark, sf_dir))
    clean = re.sub(r"#\d+|plan_id=\d+", "", s)
    for l in clean.splitlines():
        if "windowspecdefinition" in l and "sum(n_tok" in l:
            assert "windowspecdefinition(bucket" in l, l


def test_q241_cdc_windows_are_doc_partitioned(spark, sf_dir):
    """CDC dedup's scale contract: the only windows are per-DOC
    (bounded partitions — boundary prefix count), dedup accounting is
    a hash agg on the chunk hash, and nothing goes pairwise."""
    from ai_data_pipeline_spark.plans import frontier_queries as FQ

    s = plan_of(FQ.q241_cdc_chunk_dedup(spark, sf_dir))
    clean = re.sub(r"#\d+|plan_id=\d+", "", s)
    assert "CartesianProduct" not in s
    for l in clean.splitlines():
        if "windowspecdefinition" in l:
            assert "windowspecdefinition(doc_id" in l, l


def test_q244_rank_window_runs_over_the_type_table(spark, sf_dir):
    """The vocab-rank window must consume the AGGREGATED type table
    (HashAggregate feeds Window), never raw corpus gram rows — the
    plan print is TOP-DOWN, so the agg appears AFTER the window."""
    from ai_data_pipeline_spark.plans import frontier_queries as FQ

    s = plan_of(FQ.q244_vocab_truncation_curve(spark, sf_dir))
    i_win = s.find("Window")
    assert i_win != -1
    assert s.find("HashAggregate", i_win) != -1
    # the 3-row K sweep joins by broadcast (BroadcastNestedLoopJoin),
    # never a corpus cartesian
    assert "CartesianProduct" not in s


def test_q247_assignments_run_in_kernel_no_cartesian(spark, sf_dir):
    """Two-level IVF audit: every assignment pass is the count-gated
    Arrow kernel (MapInPandas) at graded K, and the within-group
    argmin join never degrades to a cartesian product."""
    from ai_data_pipeline_spark.plans import frontier_queries as FQ

    s = plan_of(FQ.q247_ivf_tree_assign(spark, sf_dir))
    assert "MapInPandas" in s
    assert "CartesianProduct" not in s


def test_q250_store_read_is_partition_pruned(spark, sf_dir, tmp_path):
    """The IVF payoff as an I/O property: reading the cell-partitioned
    store with a literal `cell IN (...)` filter must prune at the
    SCAN — PartitionFilters carries the cell predicate, and only the
    probed cells' directories are read."""
    import pyspark.sql.functions as F

    from ai_data_pipeline_spark.functions.vector import quantize_q6
    from ai_data_pipeline_spark.plans import frontier_queries as FQ

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", quantize_q6("embedding").alias("v6"))
    seeds = base.filter(F.pmod(F.col("vec_id"), F.lit(FQ._Q223_STRIDE)) == 0).select(
        F.col("vec_id").alias("seed_id"), F.col("v6").alias("s6")
    )
    cells = FQ._assign_exact_q6(base, seeds)
    path = str(tmp_path / "store")
    emb.select("vec_id", "embedding").join(cells, "vec_id").write.partitionBy(
        "cell"
    ).parquet(path)
    probed = [int(r["seed_id"]) for r in seeds.limit(2).collect()]
    df = spark.read.parquet(path).filter(F.col("cell").cast("long").isin(probed))
    s = plan_of(df)
    assert "PartitionFilters" in s
    assert "cell" in s.split("PartitionFilters", 1)[1][:200]


def test_q257_two_level_store_read_prunes_both_levels(spark, sf_dir, tmp_path):
    """q257's read-back must carry BOTH partition predicates (sup AND
    cell) in PartitionFilters — the two-level directory walk touches
    one super directory, then only the probed cell subdirectories."""
    import pyspark.sql.functions as F

    from ai_data_pipeline_spark.functions.vector import quantize_q6
    from ai_data_pipeline_spark.plans import frontier_queries as FQ

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", quantize_q6("embedding").alias("v6"))
    seeds = base.filter(F.pmod(F.col("vec_id"), F.lit(FQ._Q223_STRIDE)) == 0).select(
        F.col("vec_id").alias("seed_id"), F.col("v6").alias("s6")
    )
    cells = FQ._assign_exact_q6(base, seeds)
    two = emb.select("vec_id", "embedding").join(cells, "vec_id").withColumn(
        "sup", (F.col("cell") - F.pmod(F.col("cell"), F.lit(FQ._Q247_SUPER_STRIDE)))
    )
    path = str(tmp_path / "store2")
    two.repartition("cell").write.partitionBy("sup", "cell").parquet(path)
    probed = [int(r["seed_id"]) for r in seeds.limit(2).collect()]
    sups = sorted({p - p % FQ._Q247_SUPER_STRIDE for p in probed})
    df = spark.read.parquet(path).filter(
        F.col("sup").cast("long").isin(sups)
        & F.col("cell").cast("long").isin(probed)
    )
    s = plan_of(df)
    assert "PartitionFilters" in s
    window = s.split("PartitionFilters", 1)[1][:400]
    assert "cell" in window and "sup" in window


def test_q260_two_windows_share_one_source_shuffle(spark, sf_dir):
    """Both ranking windows and the final agg key on source: the plan
    must carry ONE distinct source hash exchange (plus the ORDER BY
    range exchange) — the no-join-back contract in q260's docstring."""
    from ai_data_pipeline_spark.plans import frontier2_queries as F2

    s = plan_of(F2.q260_mad_outliers(spark, sf_dir))
    hash_exchanges = {
        re.sub(r"#\d+L?|plan_id=\d+", "", seg).strip()
        for seg in s.splitlines()
        if "Exchange hashpartitioning" in seg
    }
    assert len(hash_exchanges) <= 1, hash_exchanges


def test_q272_ring_assignment_is_kernel_scan(spark, sf_dir):
    """The ring assignment must run as the Arrow kernel (one scan
    pass), never the codegen-compile-bound literal-HOF form, and the
    plan must stay join-free up to the 81-row matrix agg."""
    from ai_data_pipeline_spark.plans import frontier2_queries as F2

    s = plan_of(F2.q272_consistent_hash_ring(spark, sf_dir))
    assert "CartesianProduct" not in s
    # the matrix is checkpointed: the returned plan starts from the
    # scanned checkpoint, so the kernel ran exactly once upstream
    assert "ExistingRDD" in s or "Scan" in s


def test_q293_delete_rewrite_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """q293's delete-rewrite claim as a PLAN property: the
    remaining-rows scan filters on the affected cells, and that
    predicate must land in PartitionFilters — the rewrite reads only
    |affected|/K of the store, never a full pass."""
    import pyspark.sql.functions as F

    from ai_data_pipeline_spark.operators.vectorized import ivf_assign_np
    from ai_data_pipeline_spark.plans.constants import Q28_CENTROIDS

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = ivf_assign_np(emb, Q28_CENTROIDS).select("vec_id", "embedding", "cell")
    path = str(tmp_path / "store293")
    corpus.repartition("cell").write.partitionBy("cell").parquet(path)
    store = spark.read.parquet(path)
    u40 = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 10), 16, 10
    ).cast("long")
    is_del = F.pmod(u40, F.lit(17)) == 3
    affected = sorted(
        int(r["cell"])
        for r in store.filter(is_del).select("cell").distinct().collect()
    )
    remaining = store.filter(F.col("cell").cast("int").isin(affected) & ~is_del)
    s = plan_of(remaining)
    assert "PartitionFilters" in s
    assert "cell" in s.split("PartitionFilters", 1)[1][:200]


def test_q290_phrase_joins_have_no_cartesian(spark, sf_dir):
    """The phrase search must run as positional equi-joins on the
    postings table — never a cartesian re-scan of text."""
    from ai_data_pipeline_spark.plans import frontier3_queries as F3

    s = plan_of(F3.q290_inverted_index_search(spark, sf_dir))
    assert "CartesianProduct" not in s


def test_q284_pair_stage_consumes_checkpointed_fingerprints(spark, sf_dir):
    """q284's segment self-join must consume the CHECKPOINTED
    fingerprint frame (Scan ExistingRDD on BOTH sides), not
    re-inline the 66-md5 fold per side — the r11 probe's
    19.7 s → 0.5 s fix. (The final q284 plan can't show this: the
    count-gated union-find collapses clusters to a LocalTableScan,
    so the pair stage is asserted directly.)"""
    from ai_data_pipeline_spark.plans import frontier3_queries as F3
    from ai_data_pipeline_spark.catalog import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    s = plan_of(F3._q284_pairs(docs))
    assert s.count("ExistingRDD") >= 2  # both join sides
    assert "md5" not in s  # the fold never re-inlines into the join
