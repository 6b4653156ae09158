"""Sinks: R9's per-document JSONL append, upgraded to idempotent.

The reference appends one line per record with flush
(`app/main.py:91-99,110-111`) — rerunning a document duplicates every
record (append mode, `app/main.py:99`). Engine upgrades:

- batch: ``write_jsonl_partitioned`` partitions output by the source
  stem (one directory per document — the scalable analog of one file
  per document) and ``mode="overwrite"`` with dynamic partition
  overwrite replaces exactly the partitions being rewritten →
  idempotent re-runs (the reference's dup-on-rerun is a regression
  test);
- streaming: ``stream_jsonl`` writes with a checkpoint → exactly-once
  per micro-batch, the streaming fix for flush-per-record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_jsonl_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "source_stem",
    mode: str = "overwrite",
) -> None:
    """R9: one output partition per source document, idempotent.

    Dynamic partition overwrite: only partitions present in ``df``
    are replaced; others are untouched — re-processing one document
    cannot duplicate or clobber the rest of the corpus.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.partitionBy(partition_col).mode(mode).json(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def with_source_stem(df: DataFrame, source_col: str = "source_file") -> DataFrame:
    """<stem>.jsonl naming rule of the reference (`app/main.py:92`)
    → a partition value: filename minus extension."""
    return df.withColumn(
        "source_stem", F.regexp_replace(F.element_at(F.split(F.col(source_col), "/"), -1), r"\.[^.]+$", "")
    )


def stream_jsonl(df: DataFrame, path: str, checkpoint: str, partition_col: str | None = None):
    """Streaming JSONL sink with checkpointed exactly-once commit."""
    w = df.writeStream.format("json").option("path", path).option(
        "checkpointLocation", checkpoint
    ).outputMode("append")
    if partition_col:
        w = w.partitionBy(partition_col)
    return w
