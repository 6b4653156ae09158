"""Runtime scale mechanisms the 100 TB posture relies on, proven in
the executed plan: dynamic partition pruning (star-schema scans skip
partitions based on the dim filter at RUNTIME) and AQE skew-join
splitting (a hot key's shuffle partition is split instead of
straggling). Session confs enable both (session.py); these tests pin
that they actually ENGAGE.
"""

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    prev = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            prev[key] = spark.conf.get(key)
        except Exception:
            prev[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in prev.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dynamic_partition_pruning_engages(spark, tmp_path):
    """Hive-partitioned fact ⋈ filtered dim: the fact scan's
    PartitionFilters must carry a dynamicpruning subquery — at 100 TB
    this is what turns a full-fact scan into reading only the
    partitions the dim filter selects, decided at runtime."""
    fact_p = str(tmp_path / "fact")
    dim_p = str(tmp_path / "dim")
    spark.range(100_000).select(
        (F.col("id") % 10).alias("d"), F.col("id").alias("v")
    ).write.partitionBy("d").parquet(fact_p)
    spark.range(10).select(
        F.col("id").alias("d"), (F.col("id") % 3).alias("cat")
    ).write.parquet(dim_p)

    fact = spark.read.parquet(fact_p)
    dim = spark.read.parquet(dim_p).filter("cat = 0")
    q = fact.join(dim, "d").groupBy("d").count()
    rows = q.collect()
    # cat=0 selects d ∈ {0,3,6,9}
    assert sorted(r["d"] for r in rows) == [0, 3, 6, 9]
    plan = _plan(q)
    assert "dynamicpruning" in plan.lower(), plan
    assert "PartitionFilters" in plan


def test_aqe_skew_join_split_engages(spark):
    """A 100x-hot key under thresholds scaled to test data: the final
    adaptive plan must mark the sort-merge join skew-handled
    (skew=true) — the runtime defense the session enables for
    power-law keys when no manual salt (operators/skew.py) is
    applied."""
    with _confs(
        spark,
        **{
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        hot = spark.range(200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        )
        tail = spark.range(1, 2_000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        right = spark.range(2_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = hot.union(tail).join(right, "k")
        # NB: an action with no downstream aggregate — AQE declines
        # the skew split when the join output's partitioning is
        # reused by a consumer stage (it would add a shuffle).
        j.foreach(lambda r: None)
        plan = _plan(j)
        assert "skew=true" in plan, plan
        assert j.count() == 200_000 + 1_999


def test_cbo_stats_flip_join_to_broadcast(spark, tmp_path):
    """Cost-based optimization: a managed table UNDER the broadcast
    threshold joins as SortMergeJoin while the catalog has no stats
    (unknown size defaults conservative with the file estimate of the
    WIDE on-disk footprint), but after ANALYZE TABLE … COMPUTE
    STATISTICS the known row/byte counts flip it to broadcast — the
    mechanism that lets a 1000-executor plan pick the cheap side
    without hints. Pinned on a dim whose parquet footprint exceeds
    the threshold while its true (post-pruning) stats fit."""
    import uuid

    db_tag = uuid.uuid4().hex[:8]
    big = f"cbo_fact_{db_tag}"
    dim = f"cbo_dim_{db_tag}"
    spark.sql(
        f"CREATE TABLE {big} USING parquet LOCATION '{tmp_path}/fact' AS "
        "SELECT id AS k, id % 97 AS payload FROM range(200000)"
    )
    # dim: few rows but a WIDE padding column so the on-disk size
    # estimate (sizeInBytes from files) overshoots the threshold
    spark.sql(
        f"CREATE TABLE {dim} USING parquet LOCATION '{tmp_path}/dim' AS "
        "SELECT id AS k, repeat(uuid(), 64) AS pad FROM range(4000)"
    )
    q = (
        f"SELECT COUNT(*) FROM {big} b JOIN (SELECT k FROM {dim}) d ON b.k = d.k"
    )
    try:
        with _confs(
            spark,
            **{
                "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024),
                "spark.sql.adaptive.enabled": "false",
                "spark.sql.cbo.enabled": "true",
            },
        ):
            df0 = spark.sql(q)
            df0.collect()
            before = _plan(df0)
            spark.sql(f"ANALYZE TABLE {dim} COMPUTE STATISTICS FOR ALL COLUMNS")
            df1 = spark.sql(q)
            df1.collect()
            after = _plan(df1)
        assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before, before
        assert "BroadcastHashJoin" in after, after
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {big}")
        spark.sql(f"DROP TABLE IF EXISTS {dim}")


def test_runtime_bloom_filter_join_engages(spark, tmp_path):
    """Runtime (row-level) bloom-filter join: with broadcast off, a
    selective dim filter must inject a BloomFilterAggregate on the
    dim side and a might_contain probe on the FACT side — rows that
    cannot match die at the fact scan instead of riding the shuffle.
    At 100 TB this is the difference between shuffling the whole
    fact table and shuffling the ~matching fraction. The injection
    needs real scans with size estimates (parquet), not in-memory
    ranges — probed empirically."""
    from pyspark.sql import functions as F

    big_p = str(tmp_path / "big")
    dim_p = str(tmp_path / "dim")
    spark.range(3_000_000).select(
        (F.col("id") % 100_000).alias("k"), F.col("id").alias("v")
    ).write.parquet(big_p)
    spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") % 977).alias("f")
    ).write.parquet(dim_p)
    with _confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
        },
    ):
        big = spark.read.parquet(big_p)
        dim = spark.read.parquet(dim_p).filter("f = 3")
        j = big.join(dim, "k")
        n = j.count()
        plan = _plan(j)
    assert "might_contain" in plan, plan[:2000]
    assert n == dim.count() * 30  # 3M facts / 100k keys = 30 per key


def test_ivf_cell_layout_prunes_partitions(spark, tmp_path):
    """The IVF "index as layout" contract behind q233's cost axis: a
    corpus WRITTEN partitioned by its assigned cell serves a probe
    (`cell IN (...)`) by partition PRUNING — the scan reads only the
    probed cells' files, never the corpus. This is what nprobe ×
    occupancy candidate cost means at rest."""
    from ai_data_pipeline_spark.functions.vector import quantize_q6
    from ai_data_pipeline_spark.operators.vectorized import ivf_assign_q6_np
    from tests.conftest import SF_SMOKE

    from ai_data_pipeline_spark.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = emb.select("vec_id", "embedding", quantize_q6("embedding").alias("v6"))
    seeds = [
        (int(r["vec_id"]), list(r["v6"]))
        for r in base.filter(F.pmod(F.col("vec_id"), F.lit(64)) == 0)
        .select("vec_id", "v6")
        .collect()
    ]
    out = str(tmp_path / "ivf_corpus")
    ivf_assign_q6_np(base, seeds).drop("v6").write.partitionBy("cell").parquet(out)

    probed = [seeds[0][0], seeds[-1][0]]
    scan = spark.read.parquet(out).filter(F.col("cell").isin(probed))
    n = scan.count()
    assert 0 < n < emb.count()
    plan = _plan(scan)
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]
    # the data filter list must NOT carry the cell predicate (it is
    # satisfied entirely by pruning), and only probed dirs are read
    import re as _re

    m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan
