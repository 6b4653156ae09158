"""Structured Streaming surface: the streaming twins of the batch
pipeline (SURVEY.md §2B "streaming" row).

Reference parity: the reference's only incremental behavior is
flush-per-record JSONL append (`app/main.py:110-111`) with no
checkpoint — re-runs duplicate records. Here every stream is a
checkpointed micro-batch pipeline: file sources replay from the
checkpoint, sinks commit exactly-once per batch, and re-running a
stopped stream resumes instead of duplicating (the regression test
for the reference's dup bug lives in tests/test_streaming.py).

Scale posture: a file-source stream over a landing directory is the
100 TB ingest shape (each micro-batch = newly arrived files, split
into tasks by maxPartitionBytes); watermarks bound state so windowed
aggregations and dedup hold a fixed-size state store regardless of
how much history has flowed through.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_data_pipeline_spark.sources.sinks import with_source_stem

# ---------------------------------------------------------------------------
# Sources
# ---------------------------------------------------------------------------


def read_events_stream(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    Schema is pinned from a batch read of the same directory (file
    streams require an explicit schema). `ts` has shipped as parquet
    TIMESTAMP(NANOS) *and* as timestamp[us] across testdata
    generations; both encodings flow through
    `catalog.normalize_event_time` (the dual-encoding contract), which
    exposes the canonical pair — exact ns-epoch `ts_ns` plus a
    µs-truncated `ts` timestamp for event-time windowing.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(events_dir)
    if "ts" in raw.columns:
        from ai_data_pipeline_spark.catalog import normalize_event_time

        raw = normalize_event_time(raw)
    return raw


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of R13 (`rag_chatbot/main.py:8-13`): incremental
    JSONL corpus ingest. FAILFAST parity with the reference (which
    crashes on a malformed line) is the default; pass a schema with
    a corrupt-record column for PERMISSIVE pipelines."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def read_documents_stream(
    spark: SparkSession,
    landing_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of R1 (`app/main.py:139`): watch a landing
    directory for whole-document text files; one row per file with
    (source_file, text). The binaryFile/PDF variant swaps the `text`
    format for `binaryFile` + a parse UDF (sources/readers.py)."""
    reader = (
        spark.readStream.format("text")
        .option("wholetext", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return (
        reader.load(landing_dir)
        .select(
            F.input_file_name().alias("source_file"),
            F.col("value").alias("text"),
        )
    )


# ---------------------------------------------------------------------------
# Windowed aggregations (watermark + late-data drop)
# ---------------------------------------------------------------------------


def tumbling_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    time_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type.

    State bound: windows older than (max event time − watermark) are
    finalized and evicted; rows later than that are dropped — the
    late-row drop is golden-tested with an out-of-order file feed.
    """
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("long").alias("wstart_s"),
            "event_type",
            "n",
        )
    )


def sliding_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    time_col: str = "ts",
) -> DataFrame:
    """Sliding-window counts (each event lands in window/slide
    overlapping windows)."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("long").alias("wstart_s"),
            F.col("w.end").cast("long").alias("wend_s"),
            "event_type",
            "n",
        )
    )


def session_event_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    time_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Session windows: per-key sessions closed after `gap` of
    inactivity (the streaming twin of operators.asof.sessionize —
    same gap semantics, incremental state instead of a batch window
    pass)."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.session_window(time_col, gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("w.start").cast("long").alias("session_start_s"),
            F.col("w.end").cast("long").alias("session_end_s"),
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame,
    id_col: str = "event_id",
    watermark: str = "2 hours",
    time_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup on a key: state holds ids within the
    watermark horizon only (unbounded-state dedup is a leak at
    100 TB — the watermark is what makes this deployable)."""
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark([id_col])


# ---------------------------------------------------------------------------
# The streaming Q&A pipeline (EP1 as a stream: R1→R4→R5→R6→R8→R9)
# ---------------------------------------------------------------------------


def stream_qa_pipeline(
    docs: DataFrame,
    llm_factory: Callable[[], object],
    chunk_size: int = 1500,
    chunk_overlap: int = 200,
    page_chars: int = 2000,
) -> DataFrame:
    """documents stream → chunk → LLM map → JSON fallback → lineage.

    Identical operator chain to the batch pipeline (the chunker, LLM
    map and JSON fallback are the same DataFrame functions — they
    don't know they're streaming); output schema matches the
    reference's Q&A record (`app/main.py:106-110`).
    """
    from ai_data_pipeline_spark.operators.chunker import chunk_documents
    from ai_data_pipeline_spark.operators.json_fallback import valid_records
    from ai_data_pipeline_spark.operators.llm_map import llm_map

    docs = docs.withColumn("doc_id", F.col("source_file"))
    chunks = chunk_documents(
        docs,
        "doc_id",
        "text",
        page_chars=page_chars,
        chunk_size=chunk_size,
        chunk_overlap=chunk_overlap,
    )
    enriched = llm_map(chunks, llm_factory, text_col="chunk_text", out_col="raw_response")
    records = valid_records(
        enriched, "raw_response", lineage=("doc_id", "window_index", "subchunk_index")
    ).withColumnRenamed("doc_id", "source_file")
    return with_source_stem(records, "source_file")


def stream_curation_pipeline(
    docs: DataFrame,
    time_col: str = "ingest_ts",
    watermark: str = "2 hours",
    min_tokens: int = 10,
    avg_len_range: tuple[float, float] = (2.0, 15.0),
    scope_cols: list[str] | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Streaming front-end of the q91 curation funnel: incremental
    document ingest → exact dedup on the normalized-text digest
    (state bounded by the watermark — the deployable form; unbounded
    dedup state is a leak) → quality gate (token count + average
    token length, the same thresholds as the batch funnel). Emits the
    curated stream with its quality features attached; compose with
    jsonl_stream_sink / parquet sink for exactly-once landing.

    The length-trim and packing stages of the batch funnel are
    corpus-relative (exact quantiles over ALL docs) and so belong to
    a periodic batch pass over the landed data, not the per-record
    stream — the standard lambda split for rank-based curation.

    ``scope_cols`` narrows the dedup key to (scope, digest) — e.g.
    per-source dedup, which also makes per-scope survivor counts
    invariant to which duplicate arrives first. ``normalize=False``
    digests the RAW text instead of the normalized form — survivors
    are then byte-identical to their duplicates, so every downstream
    stat is survivor-choice-invariant (what an exactly-reproducible
    pipeline wants; normalized dedup is the higher-recall default).
    """
    from ai_data_pipeline_spark.functions.text import normalized_text, ws_tokens

    digest_input = normalized_text(F.col("text")) if normalize else F.col("text")
    digest = F.md5(digest_input.cast("binary"))
    toks = ws_tokens(F.col("text"))
    n_tok = F.size(toks).cast("long")
    tok_chars = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    deduped = (
        docs.withColumn("digest", digest)
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark([*(scope_cols or []), "digest"])
    )
    avg_len = F.when(F.col("n_tok") > 0, F.col("tok_chars") / F.col("n_tok")).otherwise(
        F.lit(0.0)
    )
    lo, hi = avg_len_range
    return (
        deduped.withColumn("n_tok", n_tok)
        .withColumn("tok_chars", tok_chars)
        .withColumn("avg_token_len", avg_len)
        .filter(
            (F.col("n_tok") >= min_tokens)
            & (F.col("avg_token_len") >= lo)
            & (F.col("avg_token_len") <= hi)
        )
        .drop("tok_chars")
    )


def jsonl_stream_sink(df: DataFrame, path: str, checkpoint: str):
    """Exactly-once JSONL sink: append-format file sink whose metadata
    log makes micro-batch commits idempotent — with a
    checkpoint — the streaming fix for the reference's dup-on-rerun
    (`app/main.py:99`). Returns an unstarted StreamingQuery builder;
    call .start() / use run_to_completion."""
    return (
        df.writeStream.format("json")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


# ---------------------------------------------------------------------------
# Test/demo driver
# ---------------------------------------------------------------------------


def run_to_completion(writer, timeout_s: float = 300.0):
    """Start a StreamingQuery, drain all available input, stop.

    The batch-ish execution mode used by golden tests: deterministic
    because every available file is processed before stop.
    """
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(int(timeout_s))
    return q


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str = "ts",
    right_time: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: each left event matches right events
    with the same key whose time is within [left_time - lookback,
    left_time]. Both sides carry watermarks so the join state is
    bounded — Spark evicts right rows once the left watermark passes
    their time + lookback (without the time bound the state grows
    forever; an unbounded stream-stream join is rejected).

    ``how="leftOuter"`` additionally emits unmatched left rows with
    null right columns — but only once the watermark passes the
    row's join bound (the engine must be sure no match can still
    arrive), so outer results trail the watermark by design.

    Column names: right columns come through ``r_``-prefixed (the
    key and both times kept). Scale: state is partitioned by the
    join key like any shuffle; the watermark bound is the knob that
    keeps per-key state O(events-in-lookback), independent of stream
    lifetime.
    """
    l = left.withWatermark(left_time, watermark).alias("l")
    r_cols = [c for c in right.columns if c != key]
    r = (
        right.select(
            F.col(key).alias("_rk"),
            *[F.col(c).alias(f"r_{c}") for c in r_cols],
        )
        .withWatermark(f"r_{right_time}", watermark)
        .alias("r")
    )
    cond = (
        (F.col(f"l.{key}") == F.col("r._rk"))
        & (F.col(f"r.r_{right_time}") <= F.col(f"l.{left_time}"))
        & (
            F.col(f"r.r_{right_time}")
            >= F.col(f"l.{left_time}") - F.expr(f"INTERVAL {lookback}")
        )
    )
    return l.join(r, cond, how).drop("_rk")


def stream_hll_profile(
    stream_df: DataFrame,
    keys: list[str],
    col: str,
    path: str,
    checkpoint: str,
    lgk: int = 12,
):
    """Incremental per-segment distinct-count profiling: each
    micro-batch reduces to per-key HLL sketches (operators/sketches
    laws) that foreachBatch merges into the parquet profile at
    ``path`` — the streaming form of ``hll_distinct_by``/``hll_rollup``.

    Why this is replay-safe WITHOUT transactional sinks: foreachBatch
    is at-least-once, but an HLL sketch is a max-register structure —
    merging the same batch's sketch twice is a no-op (union is
    idempotent, not additive). A re-delivered batch therefore cannot
    inflate the estimate, the failure mode that makes COUNT-based
    incremental profiles require exactly-once machinery. (Pinned by
    tests/test_streaming.py's double-merge assertion.)

    Scale: state never grows with data — the profile is |keys| rows ×
    ~2^lgk bytes; each batch contributes one map-side-combined sketch
    per key; history is never re-read (the merge law).

    Crash safety: the profile dir is only ever REPLACED by rename
    (write to ``<path>.__tmp``, swing ``path`` → ``<path>.__old``,
    ``__tmp`` → ``path``), so a crash mid-write can never leave a
    partial dir at ``path``; a crash between the two renames is
    recovered at the next batch by restoring ``__old``.  First-batch
    detection is an explicit existence check — a read failure on an
    EXISTING profile propagates and fails the batch instead of
    silently resetting the accumulated profile to the fresh batch
    (the r03 bare-except bug).  On a real cluster swap the local
    renames for the object store's atomic-commit primitive.
    """
    import os
    import re
    import shutil

    from pyspark.sql import functions as FF

    # The swap below uses os.rename/shutil — LOCAL-filesystem-only
    # semantics. On an object-store/DFS URI those calls silently see
    # nothing, so "first batch" would trigger every batch and reset
    # the accumulated profile. Fail loudly instead of corrupting.
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", path)
    if m:
        raise ValueError(
            f"stream_hll_profile requires a plain local-filesystem path; "
            f"got {path!r} ({m.group(1)}:// URI — os.rename cannot see "
            f"it). Route the profile swap through the object store's "
            f"atomic-commit primitive instead."
        )

    tmp_dir, old_dir = f"{path}.__tmp", f"{path}.__old"

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not os.path.exists(path) and os.path.exists(old_dir):
            os.rename(old_dir, path)  # crashed between the two renames
        fresh = batch_df.groupBy(*keys).agg(
            FF.hll_sketch_agg(FF.col(col), lgk).alias("hll_sketch")
        )
        if os.path.exists(path):
            # any failure here propagates: a corrupt existing profile
            # must fail the batch, never reset it
            prev = spark.read.parquet(path).select(*keys, "hll_sketch")
            merged = (
                prev.unionByName(fresh)
                .groupBy(*keys)
                .agg(FF.hll_union_agg("hll_sketch").alias("hll_sketch"))
            )
        else:  # first batch — no profile yet
            merged = fresh
        out = merged.withColumn(
            "distinct_est", FF.hll_sketch_estimate("hll_sketch")
        )
        # tiny frame (one row per segment): collect-and-rewrite keeps
        # the sink a plain parquet dir, swapped in atomically below
        rows = out.collect()
        shutil.rmtree(tmp_dir, ignore_errors=True)
        spark.createDataFrame(rows, out.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp_dir)
        shutil.rmtree(old_dir, ignore_errors=True)
        if os.path.exists(path):
            os.rename(path, old_dir)
        os.rename(tmp_dir, path)
        shutil.rmtree(old_dir, ignore_errors=True)

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
