"""Reusable time-series operators: the library forms of the q112–q141
recipe family (gap fill and rolling median live in curation.py; this
module holds the round-3 additions). Each function works on arbitrary
frames/columns — the registered queries are thin wrappers, and the
oracle twins pin the semantics end-to-end.

Scale notes per function; the shared discipline: exact integer time
(ns-epoch longs), windows partitioned by a real key, corpora collapsed
before any micro-frame window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DAY_NS = 86_400_000_000_000


def forward_fill(
    df: DataFrame,
    key: str,
    time_cols: list[str],
    value: Column,
    out_col: str = "carried",
) -> DataFrame:
    """Last-observation-carried-forward: ``out_col`` holds the most
    recent non-null ``value`` per key at each row (pandas ffill).
    One window shuffle on the key; the frame is running state,
    evaluated in O(rows)."""
    w = (
        Window.partitionBy(key)
        .orderBy(*[F.asc(c) for c in time_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.last(value, ignorenulls=True).over(w))


def scd2_intervals(
    df: DataFrame,
    key: str,
    time_col: str,
    tiebreak_col: str,
    state_col: str,
) -> DataFrame:
    """Type-2 validity intervals from a state stream: consecutive
    duplicates drop, each change opens [from, next-change) —
    ``[key, state, from, to]`` with ``to`` NULL on the open interval.
    Both window passes share one key exchange; the change filter
    shrinks the stream to its information content between them."""
    w = Window.partitionBy(key).orderBy(time_col, tiebreak_col)
    changes = (
        df.select(key, time_col, tiebreak_col, state_col)
        .withColumn("_prev", F.lag(state_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(state_col)))
    )
    return changes.select(
        key,
        state_col,
        F.col(time_col).alias("valid_from"),
        F.lead(time_col).over(w).alias("valid_to"),
    )


def session_spans(
    df: DataFrame, key: str, time_col: str, gap: int
) -> DataFrame:
    """[key, session_id, t0, t1] — gap-based sessions reduced to their
    spans (one window pass + one agg reusing the key partitioning)."""
    from ai_data_pipeline_spark.operators.asof import sessionize

    s = sessionize(df, key=key, time_col=time_col, gap=gap)
    return s.groupBy(key, "session_id").agg(
        F.min(time_col).alias("t0"), F.max(time_col).alias("t1")
    )


def max_concurrency_by_day(
    spans: DataFrame, key_cols: list[str], day_ns: int = DAY_NS
) -> DataFrame:
    """Sweep-line peak concurrency per day over [t0, t1] spans
    (inclusive endpoints; ns-epoch longs). Midnight-crossing spans
    clip into per-day segments, so the running-sum window partitions
    BY DAY — embarrassingly parallel, never a global sort. +1 sorts
    before −1 at equal t: touching spans count as concurrent."""
    d0 = F.expr(f"t0 div {day_ns}")
    d1 = F.expr(f"t1 div {day_ns}")
    seg = spans.withColumn("day", F.explode(F.sequence(d0, d1))).select(
        *key_cols,
        "day",
        F.greatest(F.col("t0"), F.col("day") * day_ns).alias("seg0"),
        F.least(F.col("t1"), (F.col("day") + 1) * day_ns - 1).alias("seg1"),
    )
    starts = seg.select("day", F.col("seg0").alias("t"), F.lit(1).alias("delta"), *key_cols)
    ends = seg.select("day", F.col("seg1").alias("t"), F.lit(-1).alias("delta"), *key_cols)
    pts = starts.union(ends)
    w = (
        Window.partitionBy("day")
        .orderBy(F.asc("t"), F.desc("delta"), *[F.asc(c) for c in key_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.withColumn("open_now", F.sum("delta").over(w))
        .groupBy("day")
        .agg(
            F.max("open_now").cast("long").alias("peak_concurrency"),
            (F.count(F.lit(1)) / 2).cast("long").alias("n_session_segments"),
        )
    )


def rolling_distinct_count(
    df: DataFrame,
    entity: str,
    day_col: Column | str,
    window_days: int = 7,
) -> DataFrame:
    """Trailing-N-day distinct-entity count per observed day (the
    DAU/WAU metric). Rolling DISTINCT cardinality is inexpressible as
    a window frame (frames aggregate rows, not sets): each distinct
    (entity, day) fans out narrowly to the N report days it counts
    toward, then one count-distinct per day. Report days clip to
    observed days via a broadcast semi-join."""
    d = F.col(day_col) if isinstance(day_col, str) else day_col
    ud = df.select(F.col(entity).alias("entity"), d.alias("day")).distinct()
    days = ud.select("day").distinct()
    fanned = ud.withColumn(
        "report_day",
        F.explode(F.sequence(F.col("day"), F.col("day") + (window_days - 1))),
    )
    return (
        fanned.join(
            F.broadcast(days.withColumnRenamed("day", "report_day")), "report_day"
        )
        .groupBy("report_day")
        .agg(F.countDistinct("entity").alias("n_distinct"))
    )


def weighted_median(
    df: DataFrame, group: str, value_col: str, weight_col: str, tiebreak_col: str
) -> DataFrame:
    """Exact weighted median of ``value_col`` per group (first value
    where 2·cum_weight ≥ total). The selected value is invariant to
    tie order (run-end cumulative weights are permutation-free), but
    the window demands a TOTAL order for deterministic execution —
    pass a unique tiebreak. Rank and total windows share the
    per-group exchange; all comparisons BIGINT."""
    wrun = (
        Window.partitionBy(group)
        .orderBy(value_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group)
    marked = df.select(
        group,
        value_col,
        weight_col,
        F.sum(weight_col).over(wrun).alias("_cum"),
        F.sum(weight_col).over(wall).alias("_tot"),
    )
    return marked.groupBy(group).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("_tot").cast("long").alias("total_weight"),
        F.min(
            F.when(2 * F.col("_cum") >= F.col("_tot"), F.col(value_col))
        ).alias("wmedian"),
    )


def lerp_resample(
    obs: DataFrame,
    series: str,
    time_s: Column | str,
    value: Column | str,
    step_s: int = 3600,
) -> DataFrame:
    """Linear-interpolation resample: a ``step_s``-second spine per
    series, each point lerped between the last observation at-or-
    before and the first strictly-after (integer-second time, exact
    BIGINT numerators, one final IEEE division; NULL outside the
    observed span). Join-free — spine rows ride the stream through
    one forward and one backward window on the series key. The
    partition key is the SERIES: parallelism = series count (re-key
    to (series, time-range) with boundary exchange for few-series ×
    huge-volume regimes)."""
    t = F.col(time_s) if isinstance(time_s, str) else time_s
    v = F.col(value) if isinstance(value, str) else value
    o = obs.select(
        F.col(series).alias("series"),
        t.alias("t_s"),
        v.alias("v"),
        F.lit(0).alias("is_spine"),
    )
    span = o.groupBy("series").agg(
        F.expr(f"min(t_s) div {step_s}").alias("k0"),
        F.expr(f"max(t_s) div {step_s}").alias("k1"),
    )
    spine = span.select(
        "series", F.explode(F.sequence(F.col("k0") + 1, F.col("k1"))).alias("k")
    ).select(
        "series",
        (F.col("k") * step_s).alias("t_s"),
        F.lit(None).cast("long").alias("v"),
        F.lit(1).alias("is_spine"),
    )
    u = o.unionByName(spine)
    wf = (
        Window.partitionBy("series")
        .orderBy("t_s", "is_spine")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wb = (
        Window.partitionBy("series")
        .orderBy(F.desc("t_s"), F.desc("is_spine"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    point = F.when(F.col("v").isNotNull(), F.struct("t_s", "v"))
    filled = (
        u.withColumn("p0", F.last(point, ignorenulls=True).over(wf))
        .withColumn("p1", F.last(point, ignorenulls=True).over(wb))
        .filter(F.col("is_spine") == 1)
    )
    tt, t0, t1 = F.col("t_s"), F.col("p0.t_s"), F.col("p1.t_s")
    v0, v1 = F.col("p0.v"), F.col("p1.v")
    num = v0 * (t1 - tt) + v1 * (tt - t0)
    den = t1 - t0
    lerp = (
        F.when(F.col("p0").isNotNull() & (t0 == tt), v0.cast("double"))
        .when(F.col("p0").isNull() | F.col("p1").isNull(), None)
        .otherwise(num.cast("double") / den.cast("double"))
    )
    return filled.select("series", "t_s", lerp.alias("lerp_v"))


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key: str,
    state_col: str,
    time_col: str = "ts",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC batch to a Type-2 history table: the incremental
    companion to ``scd2_intervals`` (which derives history from a full
    state stream). ``history`` is ``[key, state, valid_from,
    valid_to]`` with NULL valid_to marking the open row; ``changes``
    is ``[key, state, ts, op]`` with op ∈ {'upsert', 'delete'}.

    Per changed key: the open row closes at the first change's ts;
    each upsert opens an interval that the NEXT change (in ts order)
    closes; a delete closes its predecessor and opens nothing. Keys
    without history insert cleanly; CLOSED history rows pass through
    untouched. Same-ts changes for one key are contract-invalid
    (tie order undefined) — pre-dedup the batch.

    Scale shape: closed rows never shuffle (pass-through union);
    open rows + changes shuffle ONCE on ``key`` and both window
    passes reuse that exchange. A 10-billion-row history with a
    1-million-row nightly batch therefore moves only the open rows of
    changed keys plus the batch through the exchange — the closed
    bulk streams straight to the output. For repeated nightly runs
    pair with a partitioned/bucketed-by-key table so the pass-through
    write also skips the exchange.
    """
    open_rows = history.filter(F.col("valid_to").isNull())
    closed = history.filter(F.col("valid_to").isNotNull())
    # open rows only for keys the batch touches; untouched open rows
    # pass through with the closed bulk
    ckeys = changes.select(key).distinct()
    touched_open = open_rows.join(ckeys, key, "left_semi")
    untouched_open = open_rows.join(ckeys, key, "left_anti")

    events = touched_open.select(
        key,
        state_col,
        F.col("valid_from").alias("_t"),
        F.lit("upsert").alias("_op"),
        F.lit(0).alias("_src"),  # history sorts before same-key changes
    ).unionByName(
        changes.select(
            key,
            state_col,
            F.col(time_col).alias("_t"),
            F.col(op_col).alias("_op"),
            F.lit(1).alias("_src"),
        )
    )
    w = Window.partitionBy(key).orderBy("_t", "_src")
    applied = (
        events.withColumn("_next", F.lead("_t").over(w))
        .filter(F.col("_op") == "upsert")
        .select(
            key,
            state_col,
            F.col("_t").alias("valid_from"),
            F.col("_next").alias("valid_to"),
        )
    )
    return closed.unionByName(untouched_open).unionByName(applied)


def subsequence_topk(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    query: list[float],
    k: int = 10,
    znorm: bool = True,
) -> DataFrame:
    """Top-k most-similar subsequences to a query pattern across all
    keyed series: sliding windows of len(query) points per key,
    z-normalized euclidean distance (amplitude/offset-invariant when
    ``znorm``), globally smallest-k — the distributed whole-corpus
    subsequence search (UCR-suite-style z-norm ED, the public
    time-series-similarity primitive).

    Output: ``[key, time_col, dist]`` — ``time_col`` is the window's
    START; ``dist`` is the z-normed ED (not squared).

    Plan shape: ONE exchange on ``key`` (the sort window), windows
    materialize as length-m arrays via collect_list over a row frame
    — an m-fold re-blocking of the series, the same expansion every
    sliding re-blocking pays (fine for pattern lengths in the tens to
    hundreds; matrix-profile batch algorithms are the recipe beyond
    that) — then mean/std/distance fold per window in codegen'd HOFs
    (no Python). Top-k runs as per-partition TakeOrdered then a
    k-row driver merge: the shuffle carries k rows per partition, not
    the windows. A constant (std=0) window cannot match a non-constant
    query: its normalized form is the zero vector (distance = ||qn||).
    """
    import math

    m = len(query)
    if znorm:
        mu = sum(query) / m
        sd = math.sqrt(sum((x - mu) ** 2 for x in query) / m) or 1.0
        qn = [(x - mu) / sd for x in query]
    else:
        qn = list(query)
    qcol = F.array(*[F.lit(float(x)) for x in qn])

    w = Window.partitionBy(key).orderBy(time_col).rowsBetween(0, m - 1)
    win = (
        df.select(
            key,
            time_col,
            F.collect_list(F.col(value_col).cast("double")).over(w).alias("_w"),
        )
        .filter(F.size("_w") == m)
    )
    if znorm:
        mean = (
            F.aggregate("_w", F.lit(0.0), lambda a, x: a + x) / m
        )
        var = (
            F.aggregate("_w", F.lit(0.0), lambda a, x: a + x * x) / m
        ) - mean * mean
        # clamp tiny negative fp residue; flat window -> zero vector
        std = F.sqrt(F.greatest(var, F.lit(0.0)))
        win = win.withColumn("_mu", mean).withColumn("_sd", std)
        norm = F.when(
            F.col("_sd") > 0,
            F.transform("_w", lambda x: (x - F.col("_mu")) / F.col("_sd")),
        ).otherwise(F.transform("_w", lambda x: x * 0.0))
    else:
        norm = F.col("_w")
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(norm, qcol, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    return (
        win.select(key, time_col, dist.alias("dist"))
        .orderBy("dist", key, time_col)
        .limit(k)
    )
