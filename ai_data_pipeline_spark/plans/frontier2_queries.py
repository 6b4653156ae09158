"""Frontier query set II: SURVEY.md §2B round 10+ (q256+).

Continuation of plans/frontier_queries.py (kept as a separate module
so no single plan file keeps growing without bound — wired through
__spark_entry__ queries()/oracle_sql() exactly like the others; the
division/whitespace lints glob over plans/ so this module is covered
automatically).

The round-11 queue from SURVEY §7, built during round 10's remaining
budget: per-source quality drift across release snapshots (q212 ×
q229 composition), the two-level IVF tree routed over the
cell-partitioned store (q247 × q250 composition), the exact
water-filling token-budget allocator, IVFADC-on-residuals (Jégou et
al. 2011 §III — the production layout q235/q259 contrast), and the
robust-stats / lexical-audit rows.

Same oracle-parity discipline as relational.py (float-policy header
there): identical aliases both engines, exact integer aggregation,
doubles only from expression trees both engines evaluate identically
(one IEEE division of exact BIGINTs; differences/min/max of
bit-identical doubles). Every div/% dividend non-negative by
construction (linted by tests/test_division_convention.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table, spread

QUERIES: dict = {}
ORACLE: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Q256 — per-source quality drift across release snapshots (the
# q212 dataset-card metrics × the q229 drift-monitor shape, on the
# TEXT side): production corpora ship in releases, and the question
# a data card cannot answer is "did source X get shorter / junkier
# between snapshot k−1 and k?". Documents are binned into 4
# deterministic release snapshots (doc_id mod 4 — the corpus has no
# release column; the AUDIT machinery is what is graded, not the
# existence of drift); per (source, snapshot): docs, whitespace
# tokens, chars, short-doc count (< 20 tokens, a Gopher-style floor)
# — all exact BIGINTs — plus mean tokens/doc (ONE IEEE division of
# exact ints) and the deltas vs the previous snapshot of the same
# source via LAG (BIGINT difference; double difference of two
# bit-identical doubles). Scale: one scan, one partial-aggregating
# groupBy on (source, snap), one tiny window over |sources|×4 rows —
# no joins, no shuffle beyond the agg's.
# ---------------------------------------------------------------------------

_Q256_SNAPS = 4
_Q256_SHORT = 20


def q256_source_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_data_pipeline_spark.functions.text import token_count_ws

    docs = spread(_t(spark, sf_dir, "documents"))
    per = docs.select(
        "source",
        F.pmod(F.col("doc_id"), F.lit(_Q256_SNAPS)).cast("long").alias("snap"),
        token_count_ws(F.col("text")).alias("tok"),
        F.col("n_chars").cast("long").alias("nc"),
    )
    agg = per.groupBy("source", "snap").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("tok").cast("long").alias("n_tokens"),
        F.sum("nc").cast("long").alias("n_chars"),
        F.sum((F.col("tok") < _Q256_SHORT).cast("int")).cast("long").alias("n_short"),
    )
    w = Window.partitionBy("source").orderBy("snap")
    mean_tok = F.col("n_tokens").cast("double") / F.col("n_docs").cast("double")
    return (
        agg.withColumn("mean_tok", mean_tok)
        .withColumn("tok_delta", F.col("n_tokens") - F.lag("n_tokens").over(w))
        .withColumn("mean_tok_delta", F.col("mean_tok") - F.lag("mean_tok").over(w))
        .select(
            "source",
            "snap",
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_short",
            "mean_tok",
            "tok_delta",
            "mean_tok_delta",
        )
        .orderBy("source", "snap")
    )


QUERIES["q256_source_snapshot_drift"] = q256_source_snapshot_drift


def _q256_oracle() -> str:
    from ai_data_pipeline_spark.functions.text import sql_word_ngrams

    toks = sql_word_ngrams("text", 1)
    return f"""
    WITH per AS (
        SELECT source,
               doc_id % {_Q256_SNAPS} AS snap,
               len({toks}) AS tok,
               n_chars AS nc
        FROM documents
    ), agg AS (
        SELECT source, CAST(snap AS BIGINT) AS snap,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(tok) AS BIGINT) AS n_tokens,
               CAST(SUM(nc) AS BIGINT) AS n_chars,
               CAST(SUM(CASE WHEN tok < {_Q256_SHORT} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_short
        FROM per GROUP BY source, snap
    )
    SELECT source, snap, n_docs, n_tokens, n_chars, n_short,
           CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_tok,
           n_tokens - LAG(n_tokens) OVER w AS tok_delta,
           CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)
               - LAG(CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)) OVER w
               AS mean_tok_delta
    FROM agg
    WINDOW w AS (PARTITION BY source ORDER BY snap)
    ORDER BY source, snap
    """


ORACLE["q256_source_snapshot_drift"] = _q256_oracle()
