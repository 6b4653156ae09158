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


def test_scd2_apply_matches_reference_fold_on_random_streams(spark):
    """Property test: 40 random keys, each with a random change-only
    history (collapsed consecutive states, last interval open) and a
    random delete/upsert batch — scd2_apply must equal a per-key
    pure-Python fold of the documented semantics. One Spark job for
    all keys."""
    import random

    from ai_data_pipeline_spark.operators.timeseries import scd2_apply

    rng = random.Random(7)
    split = 1000
    hist_rows, chg_rows, expected = [], [], []
    for k in range(40):
        # history: sorted unique times below split, consecutive dups collapsed
        times = sorted(rng.sample(range(split), rng.randint(0, 6)))
        states = []
        for t in times:
            s = rng.choice("abcd")
            if states and states[-1][1] == s:
                continue
            states.append((t, s))
        ivs = [
            (t, s, states[i + 1][0] if i + 1 < len(states) else None)
            for i, (t, s) in enumerate(states)
        ]
        hist_rows += [(k, s, t, to) for (t, s, to) in ivs]
        # batch: sorted unique times above split (may be empty;
        # some keys have no history)
        bt = sorted(rng.sample(range(split + 1, split + 200), rng.randint(0, 5)))
        batch = [
            (t, rng.choice("abcd"), rng.choice(["upsert", "upsert", "delete"]))
            for t in bt
        ]
        chg_rows += [(k, s, t, op) for (t, s, op) in batch]
        # reference fold
        closed = [(k, s, t, to) for (t, s, to) in ivs if to is not None]
        open_iv = next(((t, s) for (t, s, to) in ivs if to is None), None)
        if not batch:
            expected += closed + (
                [(k, open_iv[1], open_iv[0], None)] if open_iv else []
            )
            continue
        ev = ([(open_iv[0], open_iv[1], "upsert")] if open_iv else []) + batch
        for i, (t, s, op) in enumerate(ev):
            if op == "upsert":
                nxt = ev[i + 1][0] if i + 1 < len(ev) else None
                expected.append((k, s, t, nxt))
        expected += closed
    got = scd2_apply(
        spark.createDataFrame(
            hist_rows, "k long, state string, valid_from long, valid_to long"
        ),
        spark.createDataFrame(chg_rows, "k long, state string, ts long, op string"),
        "k",
        "state",
    )
    key = lambda r: (r[0], r[2], r[1])  # noqa: E731
    assert sorted((tuple(r) for r in got.collect()), key=key) == sorted(
        expected, key=key
    )


def test_subsequence_topk_matches_numpy_bruteforce(spark):
    """Property test: z-normalized subsequence search equals the
    numpy brute force on random integer series (3 keys x 60 points,
    random query, k=8) within float tolerance; the picked windows
    match exactly."""
    import math
    import random

    from ai_data_pipeline_spark.operators.timeseries import subsequence_topk

    rng = random.Random(11)
    m, k = 5, 8
    query = [rng.uniform(-3, 3) for _ in range(m)]
    rows = []
    series = {}
    for key in range(3):
        vals = [rng.randint(-20, 20) for _ in range(60)]
        series[key] = vals
        rows += [(key, t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, t long, v long")
    got = subsequence_topk(df, "k", "t", "v", query, k=k, znorm=True).collect()

    mu = sum(query) / m
    sd = math.sqrt(sum((x - mu) ** 2 for x in query) / m) or 1.0
    qn = [(x - mu) / sd for x in query]
    cand = []
    for key, vals in series.items():
        for t in range(len(vals) - m + 1):
            w = vals[t : t + m]
            wm = sum(w) / m
            wv = sum(x * x for x in w) / m - wm * wm
            ws = math.sqrt(max(wv, 0.0))
            wn = [(x - wm) / ws for x in w] if ws > 0 else [0.0] * m
            d = math.sqrt(sum((a - b) ** 2 for a, b in zip(wn, qn)))
            cand.append((d, key, t))
    cand.sort()
    want = cand[:k]
    assert len(got) == k
    for r, (d, key, t) in zip(sorted(got, key=lambda r: (r.dist, r.k, r.t)), want):
        assert (r.k, r.t) == (key, t)
        assert abs(r.dist - d) < 1e-9
