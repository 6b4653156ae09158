"""Unit tests for operators/profiling.py — edges the corpus doesn't
exercise: Bloom no-false-negatives and saturation, exact Pareto cut
boundaries, hotness thresholds."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_data_pipeline_spark.operators.profiling import (
    bloom_prefilter,
    hot_key_shares,
    pareto_classes,
)


def test_bloom_never_false_negative_and_saturates(spark):
    df = spark.createDataFrame(
        [(i, f"key{i}") for i in range(40)], "id long, k string"
    )
    block = df.filter(F.col("id") % 4 == 0).select("k")
    out = bloom_prefilter(df, block, "k", m=4096, k=3)
    hits = {r["id"]: r["bloom_hit"] for r in out.collect()}
    # every true member MUST hit (no false negatives — the Bloom law)
    assert all(hits[i] == 1 for i in range(0, 40, 4))
    # a tiny filter (m=2) saturates: everything hits
    sat = bloom_prefilter(df, block, "k", m=2, k=1)
    assert all(r["bloom_hit"] == 1 for r in sat.collect())


def test_pareto_cut_boundaries(spark):
    # weights 80, 15, 5: cum shares 80/95/100 — the <=80 and <=95
    # boundaries land EXACTLY on the cuts (inclusive)
    df = spark.createDataFrame(
        [("a", 80), ("b", 15), ("c", 5)], "k string, w long"
    )
    out = {r["k"]: r["cls"] for r in pareto_classes(df, "k", "w").collect()}
    assert out == {"a": "A", "b": "B", "c": "C"}


def test_hot_key_threshold_is_strict(spark):
    # 1000 rows: a key with exactly 1 row sits AT 1 per-mille — the
    # strict > means not hot; a key with 2 rows is hot
    rows = [(0,)] * 2 + [(i,) for i in range(1, 999)]
    df = spark.createDataFrame(rows, "k long")
    out = {r["k"]: r["is_hot"] for r in hot_key_shares(df, "k").collect()}
    assert out[0] == 1 and out[1] == 0
