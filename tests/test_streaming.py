"""Golden micro-batch tests for the Structured Streaming surface
(SURVEY.md §5.2: streaming windows/watermarks against precomputed
expected outputs; §5.3: exactly-once re-run — the reference's
dup-on-rerun (`app/main.py:99`) is the regression case).

Determinism recipe: write file₁ → processAllAvailable → write file₂ →
processAllAvailable. Each file becomes exactly one micro-batch in a
known order, so watermark advancement (and therefore late-row drops
and append-mode window finalization) is reproducible.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

from ai_data_pipeline_spark.operators.llm_map import StubLLM
from ai_data_pipeline_spark.streaming import (
    dedup_stream,
    jsonl_stream_sink,
    read_documents_stream,
    session_event_stats,
    stream_qa_pipeline,
    tumbling_event_counts,
)

EVENT_SCHEMA = "ts timestamp, user_id bigint, event_type string, event_id string"


def _write_jsonl(path: str, rows: list[dict]) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _mem_sink(df, name: str):
    return df.writeStream.format("memory").queryName(name).outputMode("append")


def _drain(q):
    q.processAllAvailable()


@pytest.fixture()
def events_stream_factory(spark, tmp_path):
    def make(watermark="1 hour", window="1 hour"):
        in_dir = tmp_path / "in"
        in_dir.mkdir(exist_ok=True)
        stream = spark.readStream.schema(EVENT_SCHEMA).json(str(in_dir))
        return in_dir, stream

    return make


def test_tumbling_watermark_drops_late_rows(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    name = f"tumble_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(in_dir))
    out = tumbling_event_counts(stream, window="1 hour", watermark="1 hour", time_col="ts")
    q = _mem_sink(out, name).start()
    try:
        # batch 1: two rows in the 10:00 window + one at 12:00 that
        # advances max event time (watermark after batch = 11:00)
        _write_jsonl(
            str(in_dir / "b1.json"),
            [
                {"ts": "2024-01-01 10:05:00", "user_id": 1, "event_type": "a", "event_id": "e1"},
                {"ts": "2024-01-01 10:15:00", "user_id": 1, "event_type": "a", "event_id": "e2"},
                {"ts": "2024-01-01 12:00:00", "user_id": 1, "event_type": "a", "event_id": "e3"},
            ],
        )
        _drain(q)
        # batch 2: e4 is LATE (10:20 < watermark 11:00, its window is
        # closed) → dropped; e5 advances the watermark to 13:30 which
        # passes the 12:00 window's end → it finalizes too
        _write_jsonl(
            str(in_dir / "b2.json"),
            [
                {"ts": "2024-01-01 10:20:00", "user_id": 1, "event_type": "a", "event_id": "e4"},
                {"ts": "2024-01-01 14:30:00", "user_id": 1, "event_type": "a", "event_id": "e5"},
            ],
        )
        _drain(q)
    finally:
        q.stop()
    rows = {
        (r["wstart_s"], r["event_type"]): r["n"]
        for r in spark.table(name).collect()
    }
    base = 1704103200  # 2024-01-01 10:00:00 UTC
    assert rows[(base, "a")] == 2, "late e4 must NOT be counted"
    assert rows[(base + 7200, "a")] == 1  # the 12:00 window
    assert (base + 14400, "a") not in rows  # e5's own window not finalized


def test_dedup_stream_across_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(in_dir))
    out = dedup_stream(stream, id_col="event_id", watermark="1 hour", time_col="ts")
    q = _mem_sink(out, name).start()
    try:
        _write_jsonl(
            str(in_dir / "b1.json"),
            [
                {"ts": "2024-01-01 10:00:00", "user_id": 1, "event_type": "a", "event_id": "e1"},
                {"ts": "2024-01-01 10:01:00", "user_id": 1, "event_type": "a", "event_id": "e2"},
                {"ts": "2024-01-01 10:01:00", "user_id": 1, "event_type": "a", "event_id": "e2"},
            ],
        )
        _drain(q)
        _write_jsonl(
            str(in_dir / "b2.json"),
            [
                # duplicate of e1 within the watermark horizon → dropped
                {"ts": "2024-01-01 10:00:00", "user_id": 1, "event_type": "a", "event_id": "e1"},
                {"ts": "2024-01-01 10:30:00", "user_id": 2, "event_type": "b", "event_id": "e3"},
            ],
        )
        _drain(q)
    finally:
        q.stop()
    ids = sorted(r["event_id"] for r in spark.table(name).collect())
    assert ids == ["e1", "e2", "e3"]


def test_session_windows(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    name = f"sess_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(in_dir))
    out = session_event_stats(stream, gap="30 minutes", watermark="1 hour", time_col="ts")
    q = _mem_sink(out, name).start()
    try:
        _write_jsonl(
            str(in_dir / "b1.json"),
            [
                # user 1: two events 10 min apart (one session), then a
                # 40-min gap (new session)
                {"ts": "2024-01-01 10:00:00", "user_id": 1, "event_type": "a", "event_id": "e1"},
                {"ts": "2024-01-01 10:10:00", "user_id": 1, "event_type": "a", "event_id": "e2"},
                {"ts": "2024-01-01 10:50:00", "user_id": 1, "event_type": "a", "event_id": "e3"},
            ],
        )
        _drain(q)
        # far-future row pushes the watermark past every session end
        _write_jsonl(
            str(in_dir / "b2.json"),
            [{"ts": "2024-01-02 00:00:00", "user_id": 9, "event_type": "a", "event_id": "e9"}],
        )
        _drain(q)
    finally:
        q.stop()
    sess = [
        (r["session_start_s"], r["n_events"])
        for r in spark.table(name).filter(F.col("user_id") == 1).orderBy("session_start_s").collect()
    ]
    base = 1704103200  # 10:00 UTC
    assert sess == [(base, 2), (base + 3000, 1)]


def test_stream_qa_pipeline_exactly_once(spark, tmp_path):
    """EP1 as a stream + the dup-on-rerun regression test: restarting
    from the same checkpoint with no new input must not duplicate
    records (the reference's append mode would)."""
    landing = tmp_path / "landing"
    landing.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (landing / "doc_a.txt").write_text(
        ("Spark streams documents. " * 40 + "\n\n") * 3
    )
    (landing / "doc_b.txt").write_text("Short doc. " * 80)

    def run_once():
        docs = read_documents_stream(spark, str(landing))
        records = stream_qa_pipeline(docs, StubLLM, chunk_size=300, chunk_overlap=60, page_chars=200)
        writer = jsonl_stream_sink(records, out_dir, ckpt)
        q = writer.start()
        q.processAllAvailable()
        q.stop()

    run_once()
    first = spark.read.json(out_dir)
    n1 = first.count()
    assert n1 > 0
    assert set(first.columns) >= {"question", "answer", "source_file", "window_index", "subchunk_index", "source_stem"}
    # StubLLM yields valid JSON for ~3/4 of prompts; all parsed rows
    # must satisfy the two-key contract
    assert first.filter(F.col("question").isNull() | F.col("answer").isNull()).count() == 0

    run_once()  # restart, same checkpoint, no new files
    assert spark.read.json(out_dir).count() == n1, "re-run duplicated records"

    # new file arrives → only its records are appended
    (landing / "doc_c.txt").write_text("Another document entirely. " * 50)
    run_once()
    n3 = spark.read.json(out_dir).count()
    assert n3 > n1
    stems = {r["source_stem"] for r in spark.read.json(out_dir).select("source_stem").distinct().collect()}
    assert stems == {"doc_a", "doc_b", "doc_c"}


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join: purchases match views of the
    same user within the 1h lookback; out-of-bound and wrong-user
    views never match."""
    from ai_data_pipeline_spark.streaming.pipelines import interval_join_streams

    l_dir, r_dir = tmp_path / "purch", tmp_path / "views"
    l_dir.mkdir(), r_dir.mkdir()
    purchases = spark.readStream.schema(EVENT_SCHEMA).json(str(l_dir))
    views = spark.readStream.schema(EVENT_SCHEMA).json(str(r_dir))
    joined = interval_join_streams(
        purchases, views, key="user_id", lookback="1 hour", watermark="2 hours"
    ).select("event_id", "user_id", "r_event_id")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = _mem_sink(joined, name).start()
    try:
        _write_jsonl(
            str(r_dir / "v1.json"),
            [
                {"ts": "2024-01-01 10:00:00", "user_id": 1, "event_type": "view", "event_id": "v_in"},
                {"ts": "2024-01-01 08:00:00", "user_id": 1, "event_type": "view", "event_id": "v_old"},
                {"ts": "2024-01-01 10:20:00", "user_id": 2, "event_type": "view", "event_id": "v_other_user"},
                {"ts": "2024-01-01 11:00:00", "user_id": 1, "event_type": "view", "event_id": "v_future"},
            ],
        )
        _write_jsonl(
            str(l_dir / "p1.json"),
            [{"ts": "2024-01-01 10:30:00", "user_id": 1, "event_type": "purchase", "event_id": "p1"}],
        )
        _drain(q)
    finally:
        q.stop()
    rows = {(r["event_id"], r["r_event_id"]) for r in spark.table(name).collect()}
    # only v_in (10:00, within [09:30, 10:30], same user) matches
    assert rows == {("p1", "v_in")}


def test_stream_stream_left_outer_join(spark, tmp_path):
    """leftOuter stream-stream join: unmatched purchases emit with
    null right columns once the watermark passes their join bound."""
    from ai_data_pipeline_spark.streaming.pipelines import interval_join_streams

    l_dir, r_dir = tmp_path / "purch", tmp_path / "views"
    l_dir.mkdir(), r_dir.mkdir()
    purchases = spark.readStream.schema(EVENT_SCHEMA).json(str(l_dir))
    views = spark.readStream.schema(EVENT_SCHEMA).json(str(r_dir))
    joined = interval_join_streams(
        purchases, views, key="user_id", lookback="1 hour",
        watermark="1 hour", how="leftOuter",
    ).select("event_id", "r_event_id")
    name = f"ssoj_{uuid.uuid4().hex[:8]}"
    q = _mem_sink(joined, name).start()
    try:
        _write_jsonl(
            str(r_dir / "v1.json"),
            [{"ts": "2024-01-01 10:00:00", "user_id": 1, "event_type": "view", "event_id": "v1"}],
        )
        _write_jsonl(
            str(l_dir / "p1.json"),
            [
                {"ts": "2024-01-01 10:30:00", "user_id": 1, "event_type": "purchase", "event_id": "p_matched"},
                {"ts": "2024-01-01 10:30:00", "user_id": 9, "event_type": "purchase", "event_id": "p_unmatched"},
            ],
        )
        _drain(q)
        # advance both watermarks far past p_unmatched's bound so the
        # engine finalizes it as matchless
        _write_jsonl(
            str(r_dir / "v2.json"),
            [{"ts": "2024-01-01 20:00:00", "user_id": 8, "event_type": "view", "event_id": "v_wm"}],
        )
        _write_jsonl(
            str(l_dir / "p2.json"),
            [{"ts": "2024-01-01 20:00:00", "user_id": 8, "event_type": "purchase", "event_id": "p_wm"}],
        )
        _drain(q)
        _write_jsonl(
            str(l_dir / "p3.json"),
            [{"ts": "2024-01-01 23:00:00", "user_id": 7, "event_type": "purchase", "event_id": "p_tick"}],
        )
        _write_jsonl(
            str(r_dir / "v3.json"),
            [{"ts": "2024-01-01 23:00:00", "user_id": 6, "event_type": "view", "event_id": "v_tick"}],
        )
        _drain(q)
    finally:
        q.stop()
    rows = {(r["event_id"], r["r_event_id"]) for r in spark.table(name).collect()}
    assert ("p_matched", "v1") in rows
    assert ("p_unmatched", None) in rows


def test_available_now_backfill_trigger(spark, tmp_path):
    """Trigger.AvailableNow: process everything present, then stop on
    its own — the backfill/catch-up mode (bounded run over unbounded
    source). A second run with the same checkpoint adds nothing."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_jsonl(
        str(in_dir / "a.json"),
        [{"ts": "2024-01-01 10:00:00", "user_id": 1, "event_type": "a", "event_id": "e1"},
         {"ts": "2024-01-01 10:05:00", "user_id": 2, "event_type": "b", "event_id": "e2"}],
    )

    def run_once():
        stream = spark.readStream.schema(EVENT_SCHEMA).json(str(in_dir))
        q = (
            stream.writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.json(out).count() == 2
    run_once()  # checkpointed: re-run is a no-op, not a duplicate
    assert spark.read.json(out).count() == 2


def test_stream_curation_pipeline(spark, tmp_path):
    """Streaming curation front-end: cross-micro-batch exact dedup
    within the watermark plus the quality gate. Duplicates arriving
    in a LATER micro-batch must still be dropped (state carries
    across batches); junk docs (too few tokens / degenerate token
    length) never reach the sink."""
    from ai_data_pipeline_spark.streaming.pipelines import stream_curation_pipeline

    in_dir = tmp_path / "docs_in"
    in_dir.mkdir()
    schema = "doc_id bigint, text string, ingest_ts timestamp"
    good = "a good document with plenty of ordinary words " * 3
    t0 = "2024-01-01 10:{m:02d}:00"

    def write_batch(name, rows):
        with open(in_dir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    write_batch("b1.jsonl", [
        {"doc_id": 1, "text": good, "ingest_ts": t0.format(m=0)},
        {"doc_id": 2, "text": "too short", "ingest_ts": t0.format(m=1)},
        {"doc_id": 3, "text": "x " * 40, "ingest_ts": t0.format(m=2)},  # avg len 1 -> junk
    ])

    stream = spark.readStream.schema(schema).json(str(in_dir))
    curated = stream_curation_pipeline(stream)
    name = f"curated_{uuid.uuid4().hex[:8]}"
    q = (
        curated.select("doc_id", "n_tok", "avg_token_len")
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert {r["doc_id"] for r in spark.table(name).collect()} == {1}

        # later micro-batch: an exact dup of doc 1 (inside the
        # watermark) and one fresh good doc
        write_batch("b2.jsonl", [
            {"doc_id": 4, "text": good, "ingest_ts": t0.format(m=5)},
            {"doc_id": 5, "text": good + "with a different ending", "ingest_ts": t0.format(m=6)},
        ])
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.table(name).collect()}
        assert got == {1, 5}, f"dup not dropped across batches: {got}"
    finally:
        q.stop()


def test_available_now_bounded_backfill(spark, tmp_path):
    """Trigger.availableNow + maxFilesPerTrigger: the backfill-as-
    stream pattern — all existing input processed in BOUNDED micro-
    batches (state/memory stays capped), then the query stops on its
    own. Asserts multiple batches actually ran and the result equals
    the batch count."""
    import json as _json

    in_dir = tmp_path / "bf"
    in_dir.mkdir()
    for f in range(4):
        with open(in_dir / f"f{f}.jsonl", "w") as fh:
            for i in range(5):
                fh.write(_json.dumps({"k": f * 5 + i}) + "\n")

    stream = (
        spark.readStream.schema("k bigint")
        .option("maxFilesPerTrigger", "1")
        .json(str(in_dir))
    )
    name = f"bf_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    progress = q.recentProgress
    assert len(progress) >= 4  # one bounded micro-batch per file
    assert spark.table(name).count() == 20


def test_streaming_oracle_queries_leave_no_sink_tables(spark):
    """q41/q52/q73/q74/q95 drain their uuid-named memory sinks into
    createDataFrame-backed results and drop the temp view — repeated
    invocations in a long-lived session must not accumulate
    session-global in-memory tables."""
    from ai_data_pipeline_spark.plans import pipeline_queries as P
    from tests.conftest import SF_SMOKE

    df = P.q52_streaming_dedup(spark, SF_SMOKE)
    n = df.count()
    assert n > 0
    leaked = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith(("q41_", "q52_", "q73_", "q74_", "q95_"))
    ]
    assert leaked == [], leaked
    # the drained frame must survive the drop (it no longer reads the sink)
    assert df.count() == n


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: each micro-batch enriches against a STATIC
    dimension (re-read per batch — updates between batches are
    visible), and the static side broadcasts: no stateful join, no
    watermark needed, the streaming plan's analog of q02's dimension
    join. The enrichment dim here is in-memory; a parquet dim behaves
    identically."""
    in_dir = tmp_path / "in_ss"
    in_dir.mkdir()
    name = f"ss_{uuid.uuid4().hex[:8]}"
    dim = spark.createDataFrame(
        [("view", 1), ("purchase", 10)], "event_type string, weight int"
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(in_dir))
    enriched = stream.join(F.broadcast(dim), "event_type", "left").select(
        "event_id", "event_type", F.coalesce("weight", F.lit(0)).alias("weight")
    )
    q = _mem_sink(enriched, name).start()
    try:
        _write_jsonl(
            str(in_dir / "b1.json"),
            [
                {"ts": "2024-01-01 10:00:00", "user_id": 1, "event_type": "view", "event_id": "a"},
                {"ts": "2024-01-01 10:01:00", "user_id": 1, "event_type": "purchase", "event_id": "b"},
                {"ts": "2024-01-01 10:02:00", "user_id": 2, "event_type": "signup", "event_id": "c"},
            ],
        )
        _drain(q)
    finally:
        q.stop()
    rows = {r["event_id"]: r["weight"] for r in spark.table(name).collect()}
    spark.catalog.dropTempView(name)
    assert rows == {"a": 1, "b": 10, "c": 0}


def test_stream_hll_profile_incremental_and_idempotent(spark, tmp_path):
    """Incremental sketch profile: two file-arrival waves merge into
    the stored profile; estimates equal the batch-over-everything
    sketch EXACTLY (merge law), and re-merging a batch is a no-op
    (HLL union is idempotent — at-least-once replay cannot inflate)."""
    import json as _json

    from pyspark.sql import functions as F

    from ai_data_pipeline_spark.streaming.pipelines import stream_hll_profile

    land = tmp_path / "land"
    land.mkdir()
    prof = str(tmp_path / "profile")
    ckpt = str(tmp_path / "ckpt")

    def write_wave(name, rows):
        with open(land / name, "w") as f:
            for seg, m in rows:
                f.write(_json.dumps({"seg": seg, "m": m}) + "\n")

    # wave 1: seg a sees 0..99, seg b sees 0..49
    write_wave("w1.jsonl", [("a", i) for i in range(100)] + [("b", i) for i in range(50)])
    stream = spark.readStream.schema("seg string, m long").json(str(land))
    writer = stream_hll_profile(stream, ["seg"], "m", prof, ckpt)
    writer.trigger(availableNow=True).start().awaitTermination(60)

    first = {r["seg"]: r["distinct_est"] for r in spark.read.parquet(prof).collect()}

    # wave 2: seg a repeats 50..99 (no new) + adds 100..119; seg c appears
    write_wave("w2.jsonl", [("a", i) for i in range(50, 120)] + [("c", i) for i in range(10)])
    writer2 = stream_hll_profile(stream, ["seg"], "m", prof, ckpt)
    writer2.trigger(availableNow=True).start().awaitTermination(60)

    got = {r["seg"]: r["distinct_est"] for r in spark.read.parquet(prof).collect()}
    batch = spark.createDataFrame(
        [("a", i) for i in range(120)] + [("b", i) for i in range(50)] + [("c", i) for i in range(10)],
        "seg string, m long",
    ).groupBy("seg").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("m", 12)).alias("e")
    )
    want = {r["seg"]: r["e"] for r in batch.collect()}
    assert got == want  # merge law: incremental == batch, exactly
    assert first["b"] == got["b"]  # untouched segment unchanged

    # idempotency: merge wave 2's data AGAIN via a fresh checkpoint
    # (simulates at-least-once re-delivery of a whole batch)
    writer3 = stream_hll_profile(
        spark.readStream.schema("seg string, m long").json(str(land)),
        ["seg"], "m", prof, str(tmp_path / "ckpt2"),
    )
    writer3.trigger(availableNow=True).start().awaitTermination(60)
    again = {r["seg"]: r["distinct_est"] for r in spark.read.parquet(prof).collect()}
    assert again == want

    # crash safety: (a) a crash BETWEEN the two swap renames leaves
    # only <prof>.__old — the next batch must restore it, not treat
    # the run as first-batch and reset the profile to the fresh wave
    import os
    import shutil

    os.rename(prof, prof + ".__old")
    write_wave("w3.jsonl", [("a", i) for i in range(120, 130)])
    writer4 = stream_hll_profile(
        spark.readStream.schema("seg string, m long").json(str(land)),
        ["seg"], "m", prof, str(tmp_path / "ckpt3"),
    )
    writer4.trigger(availableNow=True).start().awaitTermination(60)
    after = {r["seg"]: r["distinct_est"] for r in spark.read.parquet(prof).collect()}
    assert after["b"] == want["b"]  # history survived the recovery
    assert after["a"] >= want["a"]  # and the new wave merged in
    assert not os.path.exists(prof + ".__old")
    # (b) a CORRUPT existing profile fails the batch instead of being
    # silently discarded as "first batch"
    shutil.rmtree(prof)
    os.mkdir(prof)
    with open(os.path.join(prof, "part-00000.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    write_wave("w4.jsonl", [("a", 999)])
    writer5 = stream_hll_profile(
        spark.readStream.schema("seg string, m long").json(str(land)),
        ["seg"], "m", prof, str(tmp_path / "ckpt4"),
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        writer5.trigger(availableNow=True).start().awaitTermination(60)


def test_stream_hll_profile_rejects_non_local_path(spark):
    """The rename-swap sink is local-filesystem-only: an object-store
    URI must fail at build time, not silently reset the profile every
    batch (os.path.exists sees nothing for s3://...)."""
    import pytest as _pytest

    from ai_data_pipeline_spark.streaming.pipelines import stream_hll_profile

    stream = spark.readStream.format("rate").load()
    for bad in ("s3://bucket/profile", "hdfs://nn/profile"):
        with _pytest.raises(ValueError, match="local-filesystem"):
            stream_hll_profile(stream, ["value"], "value", bad, "/tmp/ck")
