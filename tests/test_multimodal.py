"""Multimodal plumbing tests: the decode seam is stubbed
(deterministic fakes — no image/audio libs in this container) but the
Spark-side contract (schema, Arrow batch shape, binary round-trip,
blob pruning) is real and pinned here.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.operators.multimodal import (
    extract_audio_features,
    extract_blob_meta,
    fake_audio_features,
    fake_image_meta,
    fake_resize,
    frame_sample_plan,
    resize_blobs,
    to_blob_table,
)


@pytest.fixture(scope="module")
def blobs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return to_blob_table(docs, "doc_id", "text", "image")


def test_blob_meta_matches_fake_decoder(spark, blobs):
    rows = extract_blob_meta(blobs).collect()
    assert len(rows) == 50
    src = {r["id"]: r for r in blobs.collect()}
    for r in rows:
        raw = bytes(src[r["id"]]["blob"])
        assert r["digest"] == hashlib.md5(raw).hexdigest()
        assert (r["width"], r["height"]) == fake_image_meta(raw)
        assert r["n_bytes"] == len(raw)
        assert r["status"] == ("decoded" if raw else "empty")


def test_resize_blobs_contract(spark, blobs):
    out = resize_blobs(blobs, 32, 24).collect()
    assert len(out) == 50
    src = {r["id"]: bytes(r["blob"]) for r in blobs.collect()}
    for r in out:
        assert (r["width"], r["height"]) == (32, 24)
        got = bytes(r["blob"])
        assert len(got) == 32 * 24 * 3
        assert got == fake_resize(src[r["id"]], 32, 24)  # deterministic


def test_resize_requires_decoder(spark, blobs):
    with pytest.raises(NotImplementedError):
        resize_blobs(blobs, 8, 8, resizer=None)


def test_audio_features(spark, blobs):
    out = extract_audio_features(blobs).collect()
    src = {r["id"]: bytes(r["blob"]) for r in blobs.collect()}
    for r in out:
        dms, sr, ch = fake_audio_features(src[r["id"]])
        assert (r["duration_ms"], r["sample_rate"], r["n_channels"]) == (dms, sr, ch)
        assert r["sample_rate"] in (8000, 16000, 22050, 44100)
        assert r["n_channels"] in (1, 2)
        assert 500 <= r["duration_ms"] < 60500


def test_frame_sample_plan(spark, blobs):
    out = frame_sample_plan(blobs.limit(3), every_n=30, max_frames=4).collect()
    assert len(out) == 12
    frames = sorted({r["frame_no"] for r in out})
    assert frames == [0, 30, 60, 90]


def test_blob_pruning(spark, blobs):
    """Metadata-only queries must not read the blob column — the
    schema-first design promise. The optimized plan's ReadSchema
    should prune 'blob' away."""
    meta_only = blobs.select("id", "modality")
    plan = meta_only._jdf.queryExecution().optimizedPlan().toString()
    assert "blob" not in plan
