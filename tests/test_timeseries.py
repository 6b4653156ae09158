"""Unit tests for operators/timeseries.py — the library forms behind
q115/q116/q118/q132/q135/q141. The oracle twins pin corpus-level
parity; these pin edge semantics on tiny synthetic frames: midnight
clipping, open intervals, spine-second ties, window boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_data_pipeline_spark.operators.timeseries import (
    DAY_NS,
    forward_fill,
    lerp_resample,
    max_concurrency_by_day,
    rolling_distinct_count,
    scd2_intervals,
    weighted_median,
)


def test_forward_fill_carries_latest_nonnull(spark):
    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, 10), (1, 3, None), (1, 4, 20), (2, 1, None)],
        "k long, t long, v long",
    )
    out = forward_fill(df, "k", ["t"], F.col("v"), "c").orderBy("k", "t")
    assert [r["c"] for r in out.collect()] == [None, 10, 10, 20, None]


def test_scd2_single_event_is_open_interval(spark):
    df = spark.createDataFrame(
        [(1, 10, 1, "a"), (1, 20, 2, "a"), (1, 30, 3, "b"), (2, 5, 4, "x")],
        "k long, t long, tb long, s string",
    )
    out = scd2_intervals(df, "k", "t", "tb", "s").orderBy("k", "valid_from")
    rows = [(r["k"], r["s"], r["valid_from"], r["valid_to"]) for r in out.collect()]
    # consecutive duplicate 'a' at t=20 collapses; last interval open
    assert rows == [(1, "a", 10, 30), (1, "b", 30, None), (2, "x", 5, None)]


def test_max_concurrency_clips_midnight(spark):
    # one span crossing midnight: counted in both days; two
    # overlapping spans in day 0 peak at 2
    spans = spark.createDataFrame(
        [
            (1, 1, 100, DAY_NS + 100),          # crosses into day 1
            (2, 1, 200, 300),                    # inside day 0
        ],
        "user_id long, session_id long, t0 long, t1 long",
    )
    out = max_concurrency_by_day(spans, ["user_id", "session_id"]).orderBy("day")
    rows = [(r["day"], r["peak_concurrency"]) for r in out.collect()]
    assert rows == [(0, 2), (1, 1)]


def test_rolling_distinct_count_window(spark):
    # user 1 active day 0; user 2 active day 2 -> day 2 trailing-7 = 2
    df = spark.createDataFrame([(1, 0), (2, 2)], "u long, d long")
    out = rolling_distinct_count(df, "u", "d", window_days=7).orderBy("report_day")
    rows = [(r["report_day"], r["n_distinct"]) for r in out.collect()]
    # only observed days (0 and 2) are reported
    assert rows == [(0, 1), (2, 2)]


def test_weighted_median_threshold(spark):
    # weights 1,1,8 over values 1,2,3 -> median value 3 (2*cum>=10 at third row)
    df = spark.createDataFrame(
        [("g", 1, 1, 1), ("g", 2, 1, 2), ("g", 3, 8, 3)],
        "g string, v long, w long, tb long",
    )
    out = weighted_median(df, "g", "v", "w", "tb").collect()
    assert out[0]["wmedian"] == 3 and out[0]["total_weight"] == 10


def test_lerp_midpoint_and_spine_tie(spark):
    # observations at t=0 (v=0) and t=7200 (v=100):
    #   spine 3600 -> lerp 50.0; spine 7200 ties an observation ->
    #   backward side wins (t0 == t) -> exactly 100
    df = spark.createDataFrame(
        [("s", 0, 0), ("s", 7200, 100)], "series string, t_s long, v long"
    )
    out = lerp_resample(df, "series", "t_s", "v", step_s=3600).orderBy("t_s")
    rows = [(r["t_s"], r["lerp_v"]) for r in out.collect()]
    assert rows == [(3600, 50.0), (7200, 100.0)]


class TestScd2Apply:
    def _hist(self, spark, rows):
        return spark.createDataFrame(
            rows, "k long, state string, valid_from long, valid_to long"
        )

    def _chg(self, spark, rows):
        return spark.createDataFrame(rows, "k long, state string, ts long, op string")

    def _apply(self, spark, hist, chg):
        from ai_data_pipeline_spark.operators.timeseries import scd2_apply

        out = scd2_apply(self._hist(spark, hist), self._chg(spark, chg), "k", "state")
        return sorted(tuple(r) for r in out.collect())

    def test_upsert_closes_open_row(self, spark):
        got = self._apply(
            spark,
            [(1, "a", 0, 10), (1, "b", 10, None)],
            [(1, "c", 20, "upsert")],
        )
        assert got == [(1, "a", 0, 10), (1, "b", 10, 20), (1, "c", 20, None)]

    def test_chained_batch_and_delete(self, spark):
        got = self._apply(
            spark,
            [(1, "a", 0, None)],
            [(1, "b", 5, "upsert"), (1, "c", 8, "upsert"), (1, "c", 12, "delete")],
        )
        # a closes at 5, b at 8, c at 12; nothing open after delete
        assert got == [(1, "a", 0, 5), (1, "b", 5, 8), (1, "c", 8, 12)]

    def test_new_key_and_untouched_keys_pass_through(self, spark):
        got = self._apply(
            spark,
            [(1, "a", 0, None), (2, "z", 0, 3), (2, "y", 3, None)],
            [(3, "n", 7, "upsert")],
        )
        assert got == [
            (1, "a", 0, None),
            (2, "y", 3, None),
            (2, "z", 0, 3),
            (3, "n", 7, None),
        ]

    def test_delete_unknown_key_is_noop(self, spark):
        got = self._apply(spark, [(1, "a", 0, None)], [(9, "x", 4, "delete")])
        assert got == [(1, "a", 0, None)]

    def test_closed_rows_skip_the_exchange(self, spark):
        """Plan posture: the closed-history branch must not appear
        under any Exchange — only open rows of touched keys and the
        batch shuffle."""
        from ai_data_pipeline_spark.operators.timeseries import scd2_apply

        hist = self._hist(spark, [(1, "a", 0, 5), (1, "b", 5, None)])
        chg = self._chg(spark, [(1, "c", 9, "upsert")])
        out = scd2_apply(hist, chg, "k", "state")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the union's first branch (closed rows) is a bare filter scan:
        # assert SOME branch feeds the union without an Exchange above
        # it — cheap structural check: count Exchanges is bounded (the
        # window + two join sides), and the plan keeps a Union node
        assert "Union" in plan
        assert plan.count("Exchange") <= 6


class TestSubsequenceTopk:
    def test_planted_pattern_found_amplitude_invariant(self, spark):
        """A scaled+shifted copy of the query planted at a known
        offset must rank first with ~zero z-normed distance."""
        import math

        from pyspark.sql import functions as F

        from ai_data_pipeline_spark.operators.timeseries import subsequence_topk

        query = [0.0, 1.0, 4.0, 9.0, 4.0, 1.0, 0.0]
        base = [math.sin(0.7 * t) for t in range(60)]
        # plant 5*q + 100 at t=20 in series 'a'; series 'b' is noise
        series_a = list(base)
        for i, q in enumerate(query):
            series_a[20 + i] = 5.0 * q + 100.0
        rows = [("a", t, v) for t, v in enumerate(series_a)] + [
            ("b", t, v * 1.3 + 2) for t, v in enumerate(base)
        ]
        df = spark.createDataFrame(rows, "k string, t long, v double")
        top = subsequence_topk(df, "k", "t", "v", query, k=3).collect()
        assert (top[0]["k"], top[0]["t"]) == ("a", 20)
        assert top[0]["dist"] < 1e-9
        assert top[1]["dist"] > 0.5  # nothing else comes close

    def test_flat_window_cannot_win(self, spark):
        from ai_data_pipeline_spark.operators.timeseries import subsequence_topk

        query = [1.0, 2.0, 3.0]
        rows = [("flat", t, 7.0) for t in range(10)] + [
            ("ramp", t, float(t)) for t in range(10)
        ]
        df = spark.createDataFrame(rows, "k string, t long, v double")
        top = subsequence_topk(df, "k", "t", "v", query, k=1).collect()
        # every ramp window z-normalizes exactly onto the query
        assert top[0]["k"] == "ramp" and top[0]["dist"] < 1e-9

    def test_single_exchange_plan(self, spark):
        from ai_data_pipeline_spark.operators.timeseries import subsequence_topk

        df = spark.createDataFrame(
            [("a", t, float(t % 5)) for t in range(50)], "k string, t long, v double"
        )
        out = subsequence_topk(df, "k", "t", "v", [1.0, 2.0, 1.0], k=5)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        # AQE prints final + initial plans; count the final section only
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("Exchange hashpartitioning") <= 1
        assert "TakeOrderedAndProject" in final
