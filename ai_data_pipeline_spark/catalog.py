"""Table catalog for the driver's synthetic star schema.

``TESTDATA.md``: ten parquet tables per scale factor directory.
Loading is lazy (``spark.read.parquet``) so filters/projections in
downstream plans push into the scan. At 100 TB these would be
partitioned/bucketed tables behind a metastore; the API shape
(``load_table(name)``) stays the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # engine semantic: event-time is UTC regardless of caller session
    # (date_trunc/window/to_date otherwise shift with the harness TZ)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects
        # unless read as an ns-epoch long. Runtime-settable SQL conf,
        # so this works under any caller-provided session (the
        # driver's harness builds its own).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin rebalance before a compute-bound narrow stage.

    A parquet scan parallelizes at file/row-group granularity; a table
    written as one row group (the driver's testdata, or any coarsely
    compacted input) arrives as ONE task, serializing every downstream
    per-row expression with it. For scan-bound queries that's fine —
    never pay a shuffle to redistribute a cheap filter — but for
    CPU-bound text/vector kernels (chunking, shingling, lang-id,
    mapInPandas decodes) the one-off shuffle of the input bytes buys
    full-cluster parallelism for the expensive stage. Same recipe at
    100 TB: rebalance when upstream split granularity << cores,
    e.g. after reading few huge compacted files.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with both exact and wall-clock time columns.

    The parquet `ts` column is TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as an
    ns-epoch LONG. We keep it as ``ts_ns`` (exact, total-ordered —
    used for as-of joins and session gaps so results are
    bit-identical to engines that keep ns precision) and derive a
    µs-truncated ``ts`` timestamp for calendar bucketing (truncation
    ns→µs can never move a value across a window boundary that is a
    whole number of µs).
    """
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import functions as F

    # integer div, NOT "/": ns-epoch longs (~1.7e18) exceed double's
    # 2^53 exact range, so a float division here silently corrupts µs
    return e.withColumnRenamed("ts", "ts_ns").withColumn(
        "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for ``spark.sql`` use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
