"""Embedding transform (R15): pandas-UDF plumbing + encoder seam.

Reference semantics: `rag_chatbot/main.py:20-23` — corpus texts →
float vector matrix, row i ↔ text i. Here the identity is carried by
the row (doc_id), not position, and the encoder is pluggable.
"""

import math

import pytest

from pyspark.sql import functions as F

from ai_data_pipeline_spark.operators.embedding import (
    EMBED_DIM_DEFAULT,
    embed_text,
    fake_text_encoder,
)


def test_fake_encoder_deterministic_and_bounded():
    v1 = fake_text_encoder(["hello", "world"])
    v2 = fake_text_encoder(["hello", "world"])
    assert v1 == v2
    assert len(v1[0]) == EMBED_DIM_DEFAULT
    assert all(-1.0 <= x < 1.0 for v in v1 for x in v)
    assert v1[0] != v1[1]


def test_fake_encoder_dim_not_multiple_of_16():
    (v,) = fake_text_encoder(["x"], dim=20)
    assert len(v) == 20
    # first 16 components come from chunk 0, rest from chunk 1
    assert v[:16] == fake_text_encoder(["x"], dim=16)[0]


def test_embed_text_matches_local_encoder(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, None)], "id long, txt string"
    )
    rows = {r["id"]: r["e"] for r in embed_text(df, "txt", "e").collect()}
    assert rows[1] == pytest.approx(fake_text_encoder(["alpha"])[0], abs=0.0)
    assert rows[2] == pytest.approx(fake_text_encoder(["beta"])[0], abs=0.0)
    # nulls encode as empty string, not as null/crash
    assert rows[3] == pytest.approx(fake_text_encoder([""])[0], abs=0.0)


def test_embed_text_requires_encoder(spark):
    df = spark.createDataFrame([(1, "a")], "id long, txt string")
    with pytest.raises(NotImplementedError):
        embed_text(df, "txt", encoder=None)


def test_embed_then_knn_is_self_nearest(spark):
    texts = [(i, f"document number {i}") for i in range(8)]
    df = spark.createDataFrame(texts, "id long, txt string")
    emb = embed_text(df, "txt")
    from ai_data_pipeline_spark.functions.vector import array_lit, cosine

    q = fake_text_encoder(["document number 3"])[0]
    top = (
        emb.withColumn("cos", cosine(F.col("embedding"), array_lit(q), EMBED_DIM_DEFAULT))
        .orderBy(F.desc("cos"))
        .first()
    )
    assert top["id"] == 3
    assert math.isclose(top["cos"], 1.0, abs_tol=1e-12)
