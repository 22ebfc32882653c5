"""As-of and time-range join semantics + the plan shapes that make them
100 TB-safe (no join node for as-of; equi-join, never a cross product, for
the range join)."""

import datetime as dt
import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from data_quality_autohealer_spark.operators.temporal import (
    asof_join, time_range_join,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10), 1.0),
         (2, "u", _ts(20), 2.0),
         (3, "u", _ts(5), 3.0),    # before every right row -> NULL match
         (4, "v", _ts(15), 4.0),
         (5, "w", _ts(15), 5.0)],  # key with no right rows at all
        "event_id long, user_id string, ts timestamp, value double")
    right = spark.createDataFrame(
        [("u", _ts(10), 101, 0.1),   # equal ts -> inclusive match for id 1
         ("u", _ts(10), 102, 0.2),   # tie on ts -> max tie_col wins (102)
         ("u", _ts(12), 103, 0.3),
         ("v", _ts(14), 201, 0.4)],
        "user_id string, ts timestamp, event_id long, value double")
    return left, right


def test_asof_backward_inclusive_ties_and_nulls(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["user_id"], left_ts="ts",
                    right_ts="ts", payload=["event_id", "value"],
                    tie_col="event_id")
    rows = {r["event_id"]: r for r in out.collect()}
    assert len(rows) == 5  # every left row survives exactly once
    # equal-ts rows are included (backward INCLUSIVE) and the tie at
    # ts=10 breaks deterministically to the greatest tie_col
    assert rows[1]["event_id_asof"] == 102 and rows[1]["value_asof"] == 0.2
    assert rows[2]["event_id_asof"] == 103  # latest prior, not just any
    assert rows[3]["event_id_asof"] is None and rows[3]["ts_asof"] is None
    assert rows[5]["event_id_asof"] is None  # key absent from right
    assert rows[4]["event_id_asof"] == 201
    # left payload columns pass through untouched
    assert rows[2]["value"] == 2.0


def test_asof_match_is_row_consistent(spark):
    """ts_asof and the payload must come from the SAME right row (struct
    packing) — a per-column window would mix rows on ties."""
    left, right = _frames(spark)
    out = asof_join(left, right, on=["user_id"], left_ts="ts",
                    right_ts="ts", payload=["event_id", "value"],
                    tie_col="event_id")
    r1 = {r["event_id"]: r for r in out.collect()}[1]
    assert (r1["ts_asof"], r1["event_id_asof"], r1["value_asof"]) == (
        _ts(10), 102, 0.2)


def test_asof_plan_has_no_join_and_one_shuffle(spark):
    left, right = _frames(spark)
    plan = _plan(asof_join(left, right, on=["user_id"], left_ts="ts",
                           right_ts="ts", payload=["event_id", "value"],
                           tie_col="event_id"))
    assert "Join" not in plan, plan
    # exactly one Exchange node (tree entry + detail entry = 2 mentions):
    # the window's hashpartitioning on the key
    assert plan.count("Exchange") <= 2, plan


def test_time_range_join_matches_brute_force(spark):
    left, right = _frames(spark)
    out = time_range_join(left, right, on=["user_id"], left_ts="ts",
                          right_ts="ts", window_sec=120,
                          right_cols=["event_id"])
    got = {(r["event_id"], r["event_id_r"]) for r in out.collect()}
    lrows = left.collect()
    rrows = right.collect()
    want = {(l["event_id"], r["event_id"])
            for l in lrows for r in rrows
            if l["user_id"] == r["user_id"]
            and abs((l["ts"] - r["ts"]).total_seconds()) <= 120}
    assert got == want and len(want) >= 3


def test_time_range_join_bucket_boundary(spark):
    """Pairs exactly at the window bound and pairs straddling a bucket edge
    must both survive the coarse-bucket pre-filter."""
    left = spark.createDataFrame(
        [(1, "u", _ts(0, 59)), (2, "u", _ts(2, 1))],
        "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [("u", _ts(1, 59), 11),   # exactly 60s after left id 1
         ("u", _ts(1, 1), 12)],   # exactly 60s before left id 2
        "user_id string, ts timestamp, event_id long")
    out = time_range_join(left, right, on=["user_id"], left_ts="ts",
                          right_ts="ts", window_sec=60,
                          right_cols=["event_id"])
    got = {(r["event_id"], r["event_id_r"]) for r in out.collect()}
    assert got == {(1, 11), (1, 12), (2, 11), (2, 12)}


def test_time_range_join_plan_is_equi_join(spark):
    left, right = _frames(spark)
    plan = _plan(time_range_join(left, right, on=["user_id"], left_ts="ts",
                                 right_ts="ts", window_sec=120,
                                 right_cols=["event_id"]))
    assert ("CartesianProduct" not in plan
            and "BroadcastNestedLoopJoin" not in plan), plan
    assert "Join" in plan  # a real equi-join node exists


def test_time_range_join_excludes_outside_window(spark):
    left, right = _frames(spark)
    out = time_range_join(left, right, on=["user_id"], left_ts="ts",
                          right_ts="ts", window_sec=60,
                          right_cols=["event_id"])
    got = {(r["event_id"], r["event_id_r"]) for r in out.collect()}
    # left id 2 at ts=20min is 8min from the latest u click -> excluded
    assert not any(l == 2 for l, _ in got)
    assert (4, 201) in got  # 60s apart exactly


def test_asof_null_keys_and_null_ties(spark):
    """NULL join keys never match (twin equi-join semantics) and a NULL
    tie_col row loses to any non-NULL one at the same ts."""
    left = spark.createDataFrame(
        [(1, None, _ts(10), 1.0), (2, "u", _ts(10), 2.0)],
        "event_id long, user_id string, ts timestamp, value double")
    right = spark.createDataFrame(
        [(None, _ts(5), 50, 0.5),      # NULL key: matches nothing
         ("u", _ts(5), None, 0.7),     # NULL tie at same ts as id 51
         ("u", _ts(5), 51, 0.9)],
        "user_id string, ts timestamp, event_id long, value double")
    out = {r["event_id"]: r for r in asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        payload=["event_id", "value"], tie_col="event_id").collect()}
    assert out[1]["event_id_asof"] is None  # NULL-key left row unmatched
    assert out[2]["event_id_asof"] == 51    # non-NULL tie wins
