"""SparkSession factory tuned for the engine.

Scale posture (SURVEY.md §4, §7.6): everything here is a stock-Spark
knob — AQE (runtime re-planning, partition coalescing, skew-join
splitting), Arrow for the pandas-UDF exchange, a UTC session timezone
so event-time semantics are deployment-independent, and a shuffle
partition count sized for the local harness but overridable for a
real cluster (set ``shuffle_partitions≈2×cores`` per stage on a
1000-executor deployment, or leave AQE to coalesce from a high
initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ai-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults favor the driver harness (``local[$SPARK_GRAFT_CPUS]``);
    every setting is a plain Spark conf so the same code runs
    unchanged on a cluster — partitioning and broadcast decisions are
    expressed in the plans, not in deployment code.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # local mode: one JVM hosts driver AND all executor threads —
        # the default 1g suffocates any real shuffle. Only effective
        # when this builder launches the JVM (i.e. first session).
        .config("spark.driver.memory", driver_mem)
        # Runtime re-planning: coalesce small shuffle partitions,
        # split skewed ones, switch to broadcast joins when runtime
        # stats allow. Essential at 100 TB where static estimates lie.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow-batched exchange for pandas UDFs / mapInPandas — the
        # only sanctioned Python touchpoints in this engine.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Dimension tables (region/nation/supplier/part at typical
        # scale) broadcast; fact-fact joins shuffle. 64 MiB keeps the
        # dim side of every declared query broadcastable.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Deterministic event-time semantics regardless of host TZ.
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet scans: pushdown + pruning are on by default; keep
        # split sizes bounded so a 100 TB scan parallelizes.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.ts is parquet TIMESTAMP(NANOS): read as ns-epoch LONG
        # (Spark has no ns timestamp type). Plans that need wall-clock
        # semantics derive a µs timestamp; plans that need exact
        # event-time comparisons stay on the ns long — see
        # catalog.load_events.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
