"""Property tests for the curation-query arithmetic (q87 packing,
q88 length-band trim): the Spark window recipes vs straight-line
Python references on randomized inputs. The oracle already pins them
against DuckDB on the fixed testdata; these pin the SEMANTICS on
corpora the testdata doesn't contain (empty docs, giant docs, single-
doc sources, all-equal lengths)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

BUDGET = 512


def _pack_ref(tok_counts: list[int], budget: int = BUDGET) -> dict:
    """Straight-line concat-and-chunk packing accounting."""
    cum = 0
    n_spanning = 0
    max_span = None
    for t in tok_counts:
        start_seq = cum // budget
        cum += t
        # mirror the query: end = greatest(cum-1, cum-t) div budget
        end_seq = max(cum - 1, cum - t) // budget
        span = end_seq - start_seq
        n_spanning += 1 if span > 0 else 0
        max_span = span if max_span is None else max(max_span, span)
    n_seqs = (cum + budget - 1) // budget
    return {
        "n_docs": len(tok_counts),
        "n_tok": cum,
        "n_seqs": n_seqs,
        "n_spanning": n_spanning,
        "max_span": max_span,
    }


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=40)
)
def test_packing_matches_reference(spark, tok_counts):
    """The q87 window recipe on synthetic docs == the straight-line
    reference. Docs are 'w ' * k so token_count_ws == k exactly."""
    from ai_data_pipeline_spark.plans.pipeline_queries import Q87_BUDGET
    from ai_data_pipeline_spark.functions.text import token_count_ws
    from pyspark.sql import Window

    assert Q87_BUDGET == BUDGET
    rows = [(i, "w " * k) for i, k in enumerate(tok_counts)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING").withColumn(
        "source", F.lit("s")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = docs.select(
        "source", "doc_id", token_count_ws(F.col("text")).cast("long").alias("n_tok")
    ).withColumn("cum", F.sum("n_tok").over(w))
    t = t.select(
        "source",
        "n_tok",
        F.expr(f"(cum - n_tok) div {BUDGET}").alias("start_seq"),
        F.expr(f"greatest(cum - 1, cum - n_tok) div {BUDGET}").alias("end_seq"),
        "cum",
    )
    got = (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tok"),
            F.expr(f"(max(cum) + {BUDGET} - 1) div {BUDGET}").cast("long").alias("n_seqs"),
            F.sum(F.when(F.col("end_seq") > F.col("start_seq"), 1).otherwise(0))
            .cast("long")
            .alias("n_spanning"),
            F.max(F.col("end_seq") - F.col("start_seq")).cast("long").alias("max_span"),
        )
        .collect()[0]
    )
    ref = _pack_ref(tok_counts)
    assert got["n_docs"] == ref["n_docs"]
    assert got["n_tok"] == ref["n_tok"]
    assert got["n_seqs"] == ref["n_seqs"]
    assert got["n_spanning"] == ref["n_spanning"]
    assert got["max_span"] == ref["max_span"]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=30)
)
def test_length_band_trim_matches_reference(spark, tok_counts):
    """q88's nearest-rank p10/p90 band == the sorted-list reference
    (rank semantics: value at ceil(n·f) in (n_tok, doc_id) order)."""
    from pyspark.sql import Window

    rows = [(i, "w " * k) for i, k in enumerate(tok_counts)]
    from ai_data_pipeline_spark.functions.text import token_count_ws

    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING").withColumn(
        "source", F.lit("s")
    )
    base = docs.select(
        "source", "doc_id", token_count_ws(F.col("text")).cast("long").alias("n_tok")
    )
    w = Window.partitionBy("source").orderBy("n_tok", "doc_id")
    wn = Window.partitionBy("source")
    ranked = base.select(
        "source",
        "n_tok",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = lambda f: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.col("n") * f).cast("long"), F.col("n_tok"))
    ).over(wn)
    marked = ranked.select("source", "n_tok", pick(0.1).alias("p10"), pick(0.9).alias("p90"))
    kept = F.col("n_tok").between(F.col("p10"), F.col("p90"))
    got = (
        marked.groupBy("source")
        .agg(
            F.max("p10").alias("p10"),
            F.max("p90").alias("p90"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        )
        .collect()[0]
    )
    s = sorted(tok_counts)
    n = len(s)
    p10 = s[math.ceil(n * 0.1) - 1]
    p90 = s[math.ceil(n * 0.9) - 1]
    assert got["p10"] == p10
    assert got["p90"] == p90
    assert got["n_kept"] == sum(1 for t in tok_counts if p10 <= t <= p90)
