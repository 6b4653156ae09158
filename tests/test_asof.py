"""As-of join: the join+top-1 recipe and the union+window recipe
must agree exactly (same ≤-match, same tie handling), including on
the real events tables. The union form is the skew-proof path — no
per-key quadratic intermediate — so its equivalence is the license
to swap it in for power-law keys.
"""

from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_events
from ai_data_pipeline_spark.operators.asof import asof_join, asof_join_union
from tests.conftest import SF_SMOKE


def _toy(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3"), (3, 7, "p4")],
        "user long, t long, pid string",
    )
    right = spark.createDataFrame(
        [(1, 10, "v1"), (1, 15, "v2"), (2, 9, "v3")],
        "user long, t long, vid string",
    )
    return left, right


def test_union_form_ties_and_missing(spark):
    left, right = _toy(spark)
    out = {
        r["pid"]: r["r_vid"]
        for r in asof_join_union(left, right, "user", "t", "t").collect()
    }
    assert out["p1"] == "v1"  # tie at t=10: r.t <= l.t matches
    assert out["p2"] == "v2"  # latest preceding
    assert out["p3"] is None  # right row is later than the left row
    assert out["p4"] is None  # key has no right rows at all


def test_union_form_matches_join_form_on_events(spark):
    e = load_events(spark, SF_SMOKE)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_ns"
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"), "user_id", "ts_ns"
    )
    a = (
        asof_join(purchases, views, key="user_id", left_time="ts_ns",
                  right_time="ts_ns", left_id="event_id")
        .select("event_id", "user_id", "r_view_event_id")
        .orderBy("event_id")
        .collect()
    )
    b = (
        asof_join_union(purchases, views, key="user_id", left_time="ts_ns",
                        right_time="ts_ns")
        .select("event_id", "user_id", "r_view_event_id")
        .orderBy("event_id")
        .collect()
    )
    assert a == b


def test_forward_direction(spark):
    """direction='forward': earliest right row at-or-after each left
    row; ties at equal times match; nothing after → null."""
    left, right = _toy(spark)
    out = {
        r["pid"]: r["r_vid"]
        for r in asof_join_union(
            left, right, "user", "t", "t", direction="forward"
        ).collect()
    }
    assert out["p1"] == "v1"   # tie at t=10 matches
    assert out["p2"] is None   # no view at/after t=20
    assert out["p3"] == "v3"   # next at t=9
    assert out["p4"] is None   # key absent on the right


def test_forward_direction_rejects_bad_arg(spark):
    import pytest as _pytest

    left, right = _toy(spark)
    with _pytest.raises(ValueError):
        asof_join_union(left, right, "user", "t", "t", direction="sideways")
