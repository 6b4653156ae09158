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
