"""Reusable data-profiling / pre-filter operators: the library forms
behind q124/q134/q138. Oracle twins pin corpus-level semantics; unit
tests in tests/test_profiling.py pin edges (saturated filters, exact
threshold boundaries, tie ranks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ai_data_pipeline_spark.operators.dedup import md5_hash60


def bloom_bits(blocklist: DataFrame, key: str, m: int, k: int) -> DataFrame:
    """The set bit positions (one ``pos`` column, distinct) of an
    m-bit, k-hash Bloom filter over ``blocklist[key]`` — md5-derived
    positions, deterministic across runs/engines. Size rule: hold
    bits-per-key constant (m ∝ |blocklist|, k ≈ (m/n)·ln 2) or the
    filter saturates (SCALING.md measures the q124 curve)."""
    return (
        blocklist.select(
            F.explode(
                F.array(*[(md5_hash60(F.col(key), j) % m) for j in range(k)])
            ).alias("pos")
        )
        .distinct()
    )


def bloom_prefilter(
    df: DataFrame, blocklist: DataFrame, key: str, m: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Adds ``bloom_hit`` (1 = possibly in blocklist, 0 = definitely
    not) to ``df`` by probing a Bloom filter built from ``blocklist``
    — the cheap pre-filter run before an expensive exact membership
    join: rows with bloom_hit=0 skip the join entirely; hits (true +
    false positives) proceed to exact verification. The bit table
    broadcasts; the probe is k narrow hash evaluations per row, and
    ``df`` is never shuffled."""
    bits = bloom_bits(blocklist, key, m, k).withColumn("_set", F.lit(1))
    # rows are re-assembled by grouping on all of df's columns after
    # the ×k probe explode — callers must pass row-unique frames
    # (exact duplicate rows would merge); q124 keys on doc_id.
    probes = df.select(
        "*",
        F.explode(
            F.array(*[(md5_hash60(F.col(key), j) % m) for j in range(k)])
        ).alias("_pos"),
    )
    hit = (
        probes.join(F.broadcast(bits), probes["_pos"] == bits["pos"], "left")
        .groupBy(*df.columns)
        .agg(
            (F.sum(F.coalesce(F.col("_set"), F.lit(0))) == k).cast("int").alias("bloom_hit")
        )
    )
    return hit


def pareto_classes(
    df: DataFrame,
    key: str,
    weight: Column | str,
    cuts: list[tuple[str, int]] = (("A", 80), ("B", 95)),
    last_label: str = "C",
) -> DataFrame:
    """ABC / Pareto classification: rows ranked by descending weight,
    cumulative share cut at integer-percent boundaries via cross-
    multiplied BIGINT comparisons (100·cum ≤ p·total — no float ever
    enters a predicate). Returns [key, weight, cum, total, cls].
    The global ranking window is DIMENSION-sized by design — collapse
    facts per key before calling."""
    w = F.col(weight) if isinstance(weight, str) else weight
    base = df.select(key, w.alias("w"))
    wrun = Window.orderBy(F.desc("w"), F.asc(key)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.sum("w").over(Window.partitionBy())
    ranked = base.select(
        key,
        "w",
        F.sum("w").over(wrun).alias("cum"),
        total.alias("total"),
    )
    cls = None
    for label, pct in cuts:
        cond = 100 * F.col("cum") <= pct * F.col("total")
        cls = F.when(cond, label) if cls is None else cls.when(cond, label)
    return ranked.withColumn("cls", cls.otherwise(last_label))


def hot_key_shares(df: DataFrame, key: str, hot_per_mille: int = 1) -> DataFrame:
    """Heavy-hitter diagnostic: per-key counts with an integer
    cross-multiplied hotness flag (count·1000 > per_mille·total) and
    the exact share — the evidence a planner salts/skew-hints on.
    Per-key counts combine map-side; the total rides a single-row
    broadcast."""
    per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = per_key.agg(F.sum("n").cast("long").alias("total"))
    return (
        per_key.crossJoin(F.broadcast(total))
        .withColumn(
            "is_hot", (F.col("n") * 1000 > hot_per_mille * F.col("total")).cast("int")
        )
        .withColumn("share", F.col("n").cast("double") / F.col("total").cast("double"))
    )
