"""Unit tests for the reusable curation operators (the library forms
behind q98/q99/q100/q109/q112/q113 — those queries' DuckDB twins pin
cross-engine semantics; these pin the operator API on small frames)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ai_data_pipeline_spark.operators import curation as C


def test_mask_pii_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "write to bob99@mail.example.com or call 555-0199 now"),
         (2, "no pii here")],
        "id LONG, text STRING",
    )
    out = df.select(
        "id",
        C.mask_pii("text").alias("masked"),
        *[c.alias(f"c{i}") for i, c in enumerate(C.pii_counts("text"))],
    ).orderBy("id").collect()
    assert out[0]["masked"] == "write to <EMAIL> or call <PHONE> now"
    assert (out[0]["c0"], out[0]["c1"]) == (1, 1)
    assert out[1]["masked"] == "no pii here"
    assert (out[1]["c0"], out[1]["c1"]) == (0, 0)


def test_url_domain(spark):
    df = spark.createDataFrame(
        [(1, "see https://a.example.org/x page"), (2, "nothing")],
        "id LONG, text STRING",
    )
    got = {r["id"]: r["d"] for r in df.select("id", C.url_domain("text").alias("d")).collect()}
    assert got == {1: "a.example.org", 2: ""}


def test_assign_split_deterministic_and_dup_stable(spark):
    df = spark.createDataFrame(
        [(i, f"doc number {i} body") for i in range(50)] + [(99, "doc number 7 body")],
        "id LONG, text STRING",
    )
    rows = df.select("id", "text", C.assign_split("text").alias("s")).collect()
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], set()).add(r["s"])
    # exact dups land in the same split
    assert all(len(v) == 1 for v in by_text.values())
    # rerun → identical assignment
    again = {r["id"]: r["s"] for r in df.select("id", C.assign_split("text").alias("s")).collect()}
    assert again == {r["id"]: r["s"] for r in rows}


def test_segment_table_ragged_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l"), (2, "   "), (3, "x y")],
        "id LONG, text STRING",
    )
    segs = C.segment_table(df, "id", "text", seg_tokens=5).collect()
    got = {}
    for r in segs:
        got.setdefault(r["id"], []).append(r["seg"])
    assert got[1] == ["a b c d e", "f g h i j", "k l"]
    assert 2 not in got          # empty doc → zero segments
    assert got[3] == ["x y"]


def test_segment_dedup_stats_flags_boilerplate(spark):
    boiler = "the same ten tokens repeated in every single doc here"
    rows = [(i, boiler + f" unique tail {i} x") for i in range(4)]
    df = spark.createDataFrame(rows, "id LONG, text STRING")
    out = {
        r["id"]: (r["n_segments"], r["n_dropped"], r["retained_tok"])
        for r in C.segment_dedup_stats(df, "id", "text", seg_tokens=10, max_freq=2).collect()
    }
    # the shared 10-token prefix segment occurs 4 times > max_freq → dropped;
    # each doc keeps only its 4-token ragged tail
    assert all(v == (2, 1, 4) for v in out.values()), out


def test_gap_fill_hourly_zero_fills(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00"), ("a", "2024-01-01 02:20:00"),
         ("b", "2024-01-01 01:30:00")],
        "k STRING, t STRING",
    ).select("k", F.col("t").cast("timestamp").alias("t"))
    out = {(r["k"], r["hour"].hour): (r["n"], r["is_gap"])
           for r in C.gap_fill_hourly(df, "t", "k").collect()}
    assert len(out) == 6  # 3 hours x 2 keys
    assert out[("a", 0)] == (1, False)
    assert out[("a", 1)] == (0, True)
    assert out[("b", 1)] == (1, False)
    assert out[("b", 0)] == (0, True)


def test_rolling_median_int_odd_even(spark):
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate([10, 2, 8, 4, 100])],
        "k LONG, i LONG, v LONG",
    )
    w = Window.partitionBy("k").orderBy("i").rowsBetween(-2, 0)
    got = [r["m"] for r in df.select("i", C.rolling_median_int("v", w).alias("m"))
           .orderBy("i").collect()]
    # frames: [10], [10,2], [10,2,8], [2,8,4], [8,4,100]
    assert got == [10.0, 6.0, 8.0, 4.0, 8.0]
