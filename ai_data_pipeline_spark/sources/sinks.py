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
    # Per-write option, not session conf: identical semantics, and the
    # driver's vanilla session (which sets no confs) behaves the same.
    df.write.option("partitionOverwriteMode", "dynamic").partitionBy(
        partition_col
    ).mode(mode).json(path)


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


def foreach_batch_upsert(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: list[str],
):
    """foreachBatch sink: per-micro-batch keyed upsert into a parquet
    table — the escape hatch for sinks Structured Streaming has no
    native writer for (JDBC merges, multi-table fan-out, dedup
    writes).

    Each batch replays idempotently: rows are deduped against the
    current table state by ``key_cols`` before append, so a batch
    re-delivered after a failure (foreachBatch is at-least-once —
    exactly-once holds only if the batch body is idempotent like
    this one) inserts nothing the second time.

    Scale: the anti-join reads only ``key_cols`` of the existing
    table (column pruning) and the batch side is small — Spark
    broadcasts it. For very large key spaces, partition the table by
    a key prefix so the anti-join prunes partitions.
    """

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates(key_cols)
        try:
            existing = spark.read.parquet(path).select(*key_cols)
            fresh = fresh.join(existing, key_cols, "left_anti")
        except Exception:
            pass  # first batch: table doesn't exist yet
        fresh.write.mode("append").parquet(path)

    return (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int,
    sort: bool = True,
) -> None:
    """Persist a bucketed (and bucket-sorted) parquet table: rows are
    hash-partitioned into ``buckets`` files by ``key`` at WRITE time,
    so equi-joins and aggregations on ``key`` between co-bucketed
    tables need NO shuffle at read time — the exchange is paid once,
    at ingest, and amortized over every downstream query.

    This is the co-located-join strategy for 100 TB fact-fact joins
    (orders ⋈ lineitem on orderkey): bucket both tables by the join
    key with the same bucket count; Catalyst then plans a sort-merge
    join with zero Exchange (see test_sources.py's plan assertion).
    ``sort=True`` additionally orders within buckets so the merge
    phase needs no sort either.
    """
    w = df.write.format("parquet").option("path", path).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode("overwrite").saveAsTable(table)


def compact_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    target_files: int,
) -> None:
    """Small-file compaction with range clustering: rewrite the input
    as ``target_files`` parquet files, range-partitioned then sorted
    within each file on ``sort_cols``.

    Why this shape at 100 TB: an incremental ingest (streaming sink,
    hourly batches) leaves thousands of small files with overlapping
    value ranges — every file's parquet min/max stats span everything,
    so predicate pushdown skips nothing and the file listing itself
    costs. After range compaction the files carry DISJOINT sort-key
    ranges (asserted by the footer-stats test), so a selective filter
    on the sort key touches one or two files and row-group pruning
    works inside them. This is the zorder-lite single-dimension
    layout; repartitionByRange samples the key distribution, so skew
    lands as uneven-but-bounded file sizes rather than hot files.
    """
    (
        df.repartitionByRange(target_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_key(a, b, bits: int = 16):
    """Z-order (Morton) interleave of two columns as a single sortable
    BIGINT — the 2-D extension of ``compact_sorted``'s 1-D layout.

    Each input is linearly bucketed to ``bits`` bits via its global
    min/max (computed by the caller — see ``compact_zorder``), then
    bit-spread with the classic mask ladder and interleaved, all in
    Catalyst integer expressions (codegen'd; no UDF). Sorting by the
    result gives files whose footer stats are tight in BOTH
    dimensions, so predicates on EITHER column skip files — a 1-D
    sort leaves the second column spanning the full range in every
    file. ``a``/``b`` must already be non-negative ints < 2**bits.
    """
    if bits * 2 > 62:
        raise ValueError("bits must be <= 31")

    def spread(c):
        # insert a zero bit between every bit of c (the classic mask
        # ladder, in a 64-bit lane). NB: Column | / & are LOGICAL in
        # PySpark — bitwise needs the bitwiseOR/bitwiseAND methods.
        for shift, mask in (
            (16, 0x0000FFFF0000FFFF),
            (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F),
            (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ):
            c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
        return c

    a = (F.col(a) if isinstance(a, str) else a).cast("long")
    b = (F.col(b) if isinstance(b, str) else b).cast("long")
    return spread(a).bitwiseOR(F.shiftleft(spread(b), 1))


def compact_zorder(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    target_files: int,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` as ``target_files`` parquet files clustered on
    the Z-order curve over (col_a, col_b): both columns' footer
    min/max stats come out tight per file, so selective filters on
    either (or both) dimensions skip files — the zorder-lite 2-D
    answer to ``compact_sorted``'s single dimension.

    The min/max scan is one cheap aggregate (4 scalars to the driver
    — metadata-scale, same class as blocked_neardup's sizing count);
    the rewrite is one range repartition + local sort, identical
    shuffle shape to compact_sorted.
    """
    mm = df.agg(
        F.min(col_a).alias("a0"), F.max(col_a).alias("a1"),
        F.min(col_b).alias("b0"), F.max(col_b).alias("b1"),
    ).collect()[0]
    hi = (1 << bits) - 1

    def bucket(c, lo, span):
        if span <= 0:
            return F.lit(0)
        return F.floor(
            (c.cast("double") - F.lit(float(lo))) / F.lit(float(span)) * hi
        ).cast("long")

    za = bucket(F.col(col_a), mm["a0"], mm["a1"] - mm["a0"])
    zb = bucket(F.col(col_b), mm["b0"], mm["b1"] - mm["b0"])
    keyed = df.withColumn("_zkey", zorder_key(za, zb, bits))
    (
        keyed.repartitionByRange(target_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
