"""operators/sketches.py — the two laws that make sketches the 100 TB
profiling path: estimate accuracy at the configured size, and the
merge law (union-of-sketches == sketch-of-union) that rollups rely on.
"""

from pyspark.sql import functions as F

from ai_data_pipeline_spark.operators import sketches as S


def _seg(spark):
    # 3 "days" × values with known per-day and global distinct counts:
    # day d holds m in [d*400, d*400 + 1000) → per-day distinct 1000,
    # global distinct = span of [0, 1800) = 1800 (overlapping days).
    return (
        spark.range(0, 30000)
        .select(
            (F.col("id") % 3).alias("day"),
            ((F.col("id") % 1000) + (F.col("id") % 3) * 400).alias("m"),
            F.col("id").alias("v"),
        )
    )


def test_hll_distinct_by_accuracy(spark):
    prof = S.hll_distinct_by(_seg(spark), ["day"], "m", lgk=12)
    rows = {r["day"]: r["distinct_est"] for r in prof.collect()}
    assert set(rows) == {0, 1, 2}
    for est in rows.values():
        # lgK=12 → ~1.6% RSE; allow 5% (3 sigma)
        assert abs(est - 1000) <= 50


def test_hll_merge_law(spark):
    """Rolling up stored per-day sketches must equal sketching the
    raw union directly — not just approximately: HLL union at equal
    lgK is deterministic, so the estimates are IDENTICAL."""
    df = _seg(spark)
    daily = S.hll_distinct_by(df, ["day"], "m", lgk=12)
    rolled = S.hll_rollup(daily, []).collect()[0]["distinct_est"]
    direct = (
        df.agg(F.hll_sketch_estimate(F.hll_sketch_agg("m", 12)).alias("e"))
        .collect()[0]["e"]
    )
    assert rolled == direct
    assert abs(rolled - 1800) <= 90


def test_theta_overlap_exact_small(spark):
    """Below the sketch's retention threshold Theta is EXACT — the
    constructed 500-key overlap must come back precisely."""
    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(500, 1500).select(F.col("id").alias("k"))
    r = S.theta_overlap(a, b, "k").collect()[0]
    assert (r["n_a"], r["n_b"]) == (1000, 1000)
    assert r["n_intersection"] == 500
    assert r["n_union"] == 1500
    assert abs(r["jaccard"] - 1 / 3) < 1e-12


def test_theta_overlap_estimation_regime(spark):
    """Above retention the estimates stay within the documented
    ~1/sqrt(2^lgk) error envelope."""
    a = spark.range(0, 200_000).select(F.col("id").alias("k"))
    b = spark.range(100_000, 300_000).select(F.col("id").alias("k"))
    r = S.theta_overlap(a, b, "k", lgk=12).collect()[0]
    assert abs(r["n_intersection"] - 100_000) / 100_000 < 0.10
    assert abs(r["n_union"] - 300_000) / 300_000 < 0.10


def test_kll_quantile_profile_rank_error(spark):
    """q_50 of uniform [0, 10000) per group must sit within ~2% rank
    error of the true median; n is exact."""
    df = _seg(spark)
    prof = S.kll_quantile_profile(df, ["day"], "v", k=200)
    for r in prof.collect():
        assert r["n"] == 10000
        assert abs(r["q_50"] - 15000) <= 3 * 300 + 3  # values are 0..29999 step 3-ish
        assert r["q_25"] < r["q_50"] < r["q_75"] < r["q_95"]


def test_kll_merge_law(spark):
    """kll_rollup_quantiles over stored per-day states equals the
    direct whole-frame sketch (KLL merge is deterministic given the
    same input order per partition; compare with rank tolerance to
    stay robust to partition-order differences)."""
    df = _seg(spark)
    daily = S.kll_quantile_profile(df, ["day"], "v", k=200)
    rolled = S.kll_rollup_quantiles(daily, []).collect()[0]
    assert rolled["n"] == 30000
    # true median of 0..29999 uniform = 15000; 2% rank error of 30k
    # values spanning 30000 → ±600 value units, use 3x margin
    assert abs(rolled["q_50"] - 15000) <= 1800


def test_q149_graded_sfs_stay_in_hll_coupon_exact_regime():
    """q149's oracle is COUNT(DISTINCT) — valid ONLY because the HLL
    (lgk=14) is still in its exact coupon phase at graded
    cardinalities (measured exact through >=1500 distinct; ADVICE r05
    asked for a structural guard instead of the bare measurement).
    If a future testdata generation pushes distinct users at a graded
    SF past HALF the measured boundary, fail loudly here BEFORE the
    driver hash flips: re-probe the boundary (scripts in SCALING.md
    "sketch exact-regime" section) or switch q149's largest group to
    an estimation-regime tolerance oracle."""
    import duckdb

    for sf in ("sf0.001", "sf0.01"):  # the driver grades these two
        n = duckdb.sql(
            "SELECT COUNT(DISTINCT user_id) FROM "
            f"read_parquet('/root/testdata/{sf}/events.parquet')"
        ).fetchone()[0]
        assert n <= 750, (
            f"{sf}: {n} distinct users is within 2x of the measured "
            "lgk=14 coupon-exact limit (1500) — q149's exact oracle "
            "is no longer safely in-regime"
        )


def test_percentile_approx_exact_regime_semantics(spark):
    """q173's regime contract: while n < accuracy, percentile_approx
    returns the inclusive-rank discrete quantile — DuckDB
    quantile_disc — including odd/even counts and negatives (the
    same boundary discipline as the KLL rows)."""
    import duckdb

    from pyspark.sql import functions as F

    cases = [
        [1, 2, 3, 4, 5],
        [1, 2, 3, 4],
        [-7, -3, 0, 4, 9, 12],
        [5],
        [2, 2, 2, 7],
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = df.agg(
            F.percentile_approx("v", 0.1, 100000),
            F.percentile_approx("v", 0.5, 100000),
            F.percentile_approx("v", 0.9, 100000),
        ).collect()[0]
        lst = str(vals)
        want = duckdb.sql(
            f"SELECT quantile_disc(v, 0.1), quantile_disc(v, 0.5), "
            f"quantile_disc(v, 0.9) FROM (SELECT unnest({lst}) AS v)"
        ).fetchone()
        assert tuple(got) == want, (vals, tuple(got), want)
