"""As-of join: for each left row, the single latest right row with
right.time ≤ left.time, per key.

Spark has no native ASOF JOIN (DuckDB does — the oracle uses it);
the recipe here is the standard range-join + per-left-row top-1:

    left ⋈ right ON key AND r.time <= l.time
         → row_number() over (partition by left row, order by r.time desc) = 1

Scale notes: the equi key carries the shuffle; the range predicate
filters within key groups. For dense right sides, bound the lookback
(``max_lookback``) so the intermediate join is (left × right-within-
window), not (left × all-history) — at 100 TB an unbounded as-of
against a year of history is the difference between a join and an
explosion. The union-then-window alternative (no join at all: union
both sides, one window pass) is exposed as ``asof_join_union`` for
skew-prone keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    left_id: str,
    how: str = "left",
    max_lookback: int | None = None,
) -> DataFrame:
    """Join each left row to the latest right row at-or-before its
    time. Times may be any orderable type (use ns-epoch longs for
    exactness). Right columns come through prefixed ``r_``.
    Deterministic tie-break: latest right_time, then highest r id
    columns order by all right columns descending is overkill — we
    require callers to pass unique right_time per key or accept
    arbitrary-but-deterministic (right_time desc) choice.
    """
    r = right.select(
        F.col(key).alias("_rk"),
        F.col(right_time).alias("_rt"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key,)],
    )
    cond = (left[key] == r["_rk"]) & (r["_rt"] <= left[left_time])
    if max_lookback is not None:
        cond = cond & (r["_rt"] > left[left_time] - max_lookback)
    joined = left.join(r, cond, how)
    w = Window.partitionBy(left_id).orderBy(F.desc_nulls_last("_rt"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rk", "_rt", "_rn")
    )


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join with NO join at all: tag both sides, union, and
    carry the latest right row forward with one ordered window per
    key (``last(..., ignorenulls=True)`` over unbounded-preceding).

    Same result as ``asof_join`` (left rows + ``r_``-prefixed right
    payload; ties at equal times resolve to the right row, matching
    ``r.time <= l.time``). Right columns must be listed explicitly
    (``right_cols``; defaults to all non-key, non-time columns).

    ``direction="forward"`` matches each left row to the EARLIEST
    right row at-or-after it instead (r.time >= l.time, ties still
    match) — implemented by running the backward recipe under time
    negation, so both directions share one code path. Times must be
    numeric (ns-epoch longs) for the forward form.

    Scale: the join-based recipe materializes |left| × |right-within-
    lookback| intermediate rows per key before the top-1 window —
    quadratic for hot keys. This form is strictly linear: one shuffle
    of |left| + |right| rows on the key, one sort, no intermediate
    blowup — the recipe for power-law keys (one user with millions of
    events) where even AQE skew splitting can't save the join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_time)]
    r_payload = F.struct(*[F.col(c) for c in right_cols])
    lt = F.col(left_time) if direction == "backward" else -F.col(left_time)
    rt = F.col(right_time) if direction == "backward" else -F.col(right_time)
    # align both sides on (_k, _t, _side, _l struct, _r struct);
    # _side 0 (right) sorts before 1 (left) so r.time == l.time matches
    l_u = left.select(
        F.col(key).alias("_k"),
        lt.alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(right.select(r_payload.alias("_r")).schema["_r"].dataType).alias("_r"),
    )
    r_u = right.select(
        F.col(key).alias("_k"),
        rt.alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*left.columns).alias("_l")).schema["_l"].dataType).alias("_l"),
        r_payload.alias("_r"),
    )
    u = l_u.unionByName(r_u)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_t"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_rlast", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[F.col("_rlast")[c].alias(f"r_{c}") for c in right_cols],
    )
    return out


def sessionize(
    df: DataFrame,
    key: str,
    time_col: str,
    gap: int,
) -> DataFrame:
    """Assign batch session ids: a new session starts when the gap to
    the previous event (same key, ordered by time) exceeds ``gap``
    (same unit as time_col — use ns-epoch longs for exactness).

    Adds ``session_id`` (1-based per key). Single window pass: lag →
    boundary flag → running sum. One shuffle on the key.
    """
    w = Window.partitionBy(key).orderBy(time_col)
    prev = F.lag(time_col).over(w)
    new_sess = F.when(prev.isNull() | ((F.col(time_col) - prev) > gap), 1).otherwise(0)
    return df.withColumn("_new", new_sess).withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).drop("_new")
