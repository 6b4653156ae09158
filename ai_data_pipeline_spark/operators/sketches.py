"""Mergeable-sketch profiling operators (Apache DataSketches via the
built-in Spark 4 SQL functions — ``hll_sketch_agg``,
``theta_sketch_agg``, ``kll_sketch_agg_*``, ``count_min_sketch``).

Why this surface exists at all: at 100 TB the exact forms of these
questions — distinct counts per segment, corpus overlap, quantile
profiles, per-key frequencies — each cost a full shuffle of the raw
column (and overlap costs a JOIN between corpora). The sketch forms
are (a) map-side combinable: each partition reduces to a KB-scale
binary state and only sketches shuffle, and (b) MERGEABLE across
frames: a per-day/per-source sketch table can be rolled up to any
coarser grain later (``*_union_agg`` / ``*_merge_agg``) WITHOUT
re-reading the data — the property that makes incremental, 1000-day
profiling feasible where exact re-aggregation is not.

Everything here is a thin, typed composition of JVM aggregates — no
Python in the loop, all whole-stage-codegen-eligible. Tests
(tests/test_sketches.py) pin the two laws that matter:

- estimate accuracy vs the exact answer at the configured lgK, and
- the MERGE law: union-of-sketches == sketch-of-union (the exact
  guarantee the rollup path relies on).

The reference has no sketch surface (its pipeline is single-node
pandas-scale, `app/main.py`); this is part of the declared
beyond-reference training-pipeline layer, same tier as
operators/profiling.py's Bloom/Pareto/hot-key levers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_distinct_by",
    "hll_rollup",
    "theta_sketch_by",
    "theta_overlap",
    "kll_quantile_profile",
    "kll_rollup_quantiles",
]


def hll_distinct_by(
    df: DataFrame, keys: list[str], col: str, lgk: int = 12
) -> DataFrame:
    """Per-group approximate distinct count of ``col`` with the
    mergeable HLL state kept alongside the estimate.

    Output: ``keys + [distinct_est: long, hll_sketch: binary]``.
    Keep the sketch column when persisting segment profiles — any
    coarser re-grouping later is ``hll_rollup`` over the stored
    sketches (no raw-data re-scan). lgK=12 → ~1.6% relative standard
    error at ~4 KB per group; raise lgK for tighter error.
    """
    sk = F.hll_sketch_agg(F.col(col), lgk).alias("hll_sketch")
    return (
        df.groupBy(*keys)
        .agg(sk)
        .withColumn("distinct_est", F.hll_sketch_estimate("hll_sketch"))
        .select(*keys, "distinct_est", "hll_sketch")
    )


def hll_rollup(profile: DataFrame, keys: list[str]) -> DataFrame:
    """Merge an ``hll_distinct_by`` profile down to coarser ``keys``
    (e.g. daily → monthly) purely from the stored sketches: the merge
    law guarantees the result equals re-sketching the raw union."""
    return (
        profile.groupBy(*keys)
        .agg(F.hll_union_agg("hll_sketch").alias("hll_sketch"))
        .withColumn("distinct_est", F.hll_sketch_estimate("hll_sketch"))
        .select(*keys, "distinct_est", "hll_sketch")
    )


def theta_sketch_by(df: DataFrame, keys: list[str], col: str, lgk: int = 12) -> DataFrame:
    """Per-group Theta sketch of ``col`` (``keys + [theta_sketch]``).
    Unlike HLL, Theta states support INTERSECTION and DIFFERENCE —
    the set-algebra needed for overlap/contamination estimation."""
    return df.groupBy(*keys).agg(
        F.theta_sketch_agg(F.col(col), lgk).alias("theta_sketch")
    )


def theta_overlap(a: DataFrame, b: DataFrame, col: str, lgk: int = 12) -> DataFrame:
    """Corpus-overlap estimate between two frames on ``col`` WITHOUT
    a join: each side reduces (map-side) to one Theta sketch; the
    1-row result holds estimated ``n_a``, ``n_b``, ``n_intersection``,
    ``n_union``, ``jaccard``.

    This is the scale path for "how much of corpus B is already in
    corpus A" (the q56 contamination question) when an exact
    hashed-key join is too expensive or the corpora live in different
    tables/periods: 100 TB per side reduces to two ~KB states and one
    driver-scale set operation. Error ~1/sqrt(2^lgk) per estimate;
    the exact q56 join stays the right tool when per-document
    attribution (not the aggregate rate) is required.
    """
    sa = a.agg(F.theta_sketch_agg(F.col(col), lgk).alias("s")).select(
        F.col("s").alias("sa")
    )
    sb = b.agg(F.theta_sketch_agg(F.col(col), lgk).alias("s")).select(
        F.col("s").alias("sb")
    )
    # both sides are 1-row aggregates; the cross join is 1×1
    return sa.crossJoin(sb).select(
        F.theta_sketch_estimate("sa").alias("n_a"),
        F.theta_sketch_estimate("sb").alias("n_b"),
        F.theta_sketch_estimate(F.theta_intersection("sa", "sb")).alias(
            "n_intersection"
        ),
        F.theta_sketch_estimate(F.theta_union("sa", "sb")).alias("n_union"),
        (
            F.theta_sketch_estimate(F.theta_intersection("sa", "sb"))
            / F.theta_sketch_estimate(F.theta_union("sa", "sb"))
        ).alias("jaccard"),
    )


def kll_quantile_profile(
    df: DataFrame,
    keys: list[str],
    col: str,
    quantiles: list[float] = (0.25, 0.5, 0.75, 0.95),
    k: int = 200,
) -> DataFrame:
    """Per-group quantile profile of a BIGINT column via a mergeable
    KLL sketch: ``keys + [n, q_25, q_50, ...]`` plus ``kll_sketch``
    (binary) for later rollup. k=200 → ~1.65% rank error.

    The exact alternative (percentile_disc / window-sort) shuffles
    every raw value per group; KLL shuffles a bounded state per
    partition×group and — unlike percentile_approx — the stored
    state composes across profile tables via kll_rollup_quantiles.
    """
    prof = df.groupBy(*keys).agg(
        F.kll_sketch_agg_bigint(F.col(col).cast("bigint"), F.lit(k)).alias(
            "kll_sketch"
        )
    )
    cols = [F.kll_sketch_get_n_bigint("kll_sketch").alias("n")]
    for q in quantiles:
        cols.append(
            F.kll_sketch_get_quantile_bigint("kll_sketch", F.lit(float(q))).alias(
                f"q_{int(round(q * 100)):02d}"
            )
        )
    return prof.select(*keys, *cols, "kll_sketch")


def kll_rollup_quantiles(
    profile: DataFrame,
    keys: list[str],
    quantiles: list[float] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Merge stored KLL states down to coarser ``keys`` and re-read
    the quantiles — the quantile analogue of hll_rollup."""
    merged = profile.groupBy(*keys).agg(
        F.kll_merge_agg_bigint("kll_sketch").alias("kll_sketch")
    )
    cols = [F.kll_sketch_get_n_bigint("kll_sketch").alias("n")]
    for q in quantiles:
        cols.append(
            F.kll_sketch_get_quantile_bigint("kll_sketch", F.lit(float(q))).alias(
                f"q_{int(round(q * 100)):02d}"
            )
        )
    return merged.select(*keys, *cols, "kll_sketch")
