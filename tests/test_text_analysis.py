"""Text-analysis operators: language id, quality features,
fingerprints, token counts, multimodal metadata plumbing, sinks."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_data_pipeline_spark.functions.text import token_count_bpe_ish, token_count_ws
from ai_data_pipeline_spark.operators.multimodal import (
    extract_blob_meta,
    fake_image_meta,
    frame_sample_plan,
    to_blob_table,
)
from ai_data_pipeline_spark.operators.text_analysis import (
    fingerprint,
    lang_id,
    quality_features,
)
from ai_data_pipeline_spark.sources.sinks import with_source_stem, write_jsonl_partitioned


def test_lang_id_heuristic(spark):
    rows = [
        (1, "the cat and the dog of a house"),
        (2, "le chat et la maison de le chien les"),
        (3, "der hund und die katze ist das"),
        (4, "xyzzy qwerty plugh"),
    ]
    df = spark.createDataFrame(rows, "id BIGINT, text STRING")
    got = {r.id: r.lang for r in df.select("id", lang_id("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello world, it's 42 degrees!")], "id BIGINT, text STRING")
    r = df.select(
        token_count_ws("text").alias("ws"), token_count_bpe_ish("text").alias("bpe")
    ).collect()[0]
    assert r.ws == 5
    # hello world , it ' s 42 degrees !  → 9 BPE-ish tokens
    assert r.bpe == 9


def test_quality_features_empty_text(spark):
    df = spark.createDataFrame([(1, ""), (2, "abc def")], "id BIGINT, text STRING")
    rows = {r.id: r for r in quality_features(df, "id", "text").collect()}
    assert rows[1].n_tokens_ws == 0 and rows[1].avg_token_len == 0.0
    assert rows[2].avg_token_len == 3.0


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "different")],
        "id BIGINT, text STRING",
    )
    rows = {r.id: r for r in fingerprint(df, "id", "text").collect()}
    assert rows[1].fp == rows[2].fp  # same after normalization
    assert rows[1].fp != rows[3].fp
    assert 0 <= rows[1].bucket < 16


def test_multimodal_meta_roundtrip(spark):
    df = spark.createDataFrame([(1, "some bytes"), (2, "")], "doc_id BIGINT, text STRING")
    blobs = to_blob_table(df, "doc_id", "text", "image")
    rows = {r.id: r for r in extract_blob_meta(blobs).collect()}
    assert rows[1].n_bytes == 10 and rows[1].status == "decoded"
    assert rows[2].n_bytes == 0 and rows[2].status == "empty"
    w, h = fake_image_meta(b"some bytes")
    assert (rows[1].width, rows[1].height) == (w, h)
    assert 64 <= w < 256 and 64 <= h < 256


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, "v")], "doc_id BIGINT, text STRING")
    blobs = to_blob_table(df, "doc_id", "text", "video")
    frames = frame_sample_plan(blobs, every_n=10, max_frames=3).collect()
    assert [r.frame_no for r in frames] == [0, 10, 20]


def test_jsonl_sink_idempotent_rerun(spark, tmp_path):
    """R9 regression: the reference duplicates on rerun
    (app/main.py:99 append mode); the engine must not."""
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [("a.pdf", "q1", "a1"), ("a.pdf", "q2", "a2"), ("b.pdf", "q3", "a3")],
        "source_file STRING, question STRING, answer STRING",
    )
    df2 = with_source_stem(df)
    write_jsonl_partitioned(df2, out)
    write_jsonl_partitioned(df2, out)  # rerun: must overwrite, not append
    back = spark.read.json(out)
    assert back.count() == 3
    # partition layout: one directory per source stem
    stems = {r.source_stem for r in back.select("source_stem").distinct().collect()}
    assert stems == {"a", "b"}
    # partial rerun: rewriting only a's records must not clobber b
    write_jsonl_partitioned(df2.filter(F.col("source_stem") == "a"), out)
    assert spark.read.json(out).count() == 3
