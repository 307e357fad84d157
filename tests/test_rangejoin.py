"""Range join operator (operators/rangejoin.py): binned interval join
semantics — end-exclusivity, bucket-boundary edges, keyed variant,
brute-force parity, and a plan audit (no nested-loop/cartesian join)."""

from datetime import datetime, timedelta

import pytest

from named_architecture_entity_recognition_spark.operators.rangejoin import (
    range_join,
)


def _t(s: float) -> datetime:
    return datetime(2024, 1, 1) + timedelta(seconds=s)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [
            (1, 100, _t(50)),
            (2, 100, _t(600)),   # exactly on a bucket boundary
            (3, 100, _t(99)),    # == interval end -> excluded
            (4, 200, _t(50)),    # same ts, other key
            (5, 100, _t(0)),     # == interval start -> included
        ],
        "event_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (10, 100, _t(0), _t(99)),      # within one bucket
            (11, 100, _t(590), _t(1810)),  # spans 3 buckets (w=600)
            (12, 200, _t(40), _t(60)),     # other key
            (13, 100, _t(70), _t(70)),     # empty -> matches nothing
            (14, 100, _t(80), _t(20)),     # inverted -> matches nothing
        ],
        "iv_id long, user_id long, start timestamp, end timestamp",
    )
    return points, intervals


def _pairs(df):
    return {(r.event_id, r.iv_id_i) for r in df.collect()}


def test_semantics_unkeyed(spark, frames):
    points, intervals = frames
    got = _pairs(range_join(points, intervals, bucket_s=600))
    assert got == {
        (1, 10),  # 0 <= 50 < 99
        (1, 12),  # 40 <= 50 < 60
        (2, 11),  # bucket-boundary point inside spanning interval
        (4, 10),  # unkeyed: key mismatch still matches on time
        (4, 12),
        (5, 10),  # ts == start included
    }
    # end-exclusive: point 3 sits exactly at interval 10's end
    assert all(eid != 3 for eid, _ in got)


def test_semantics_keyed(spark, frames):
    points, intervals = frames
    got = _pairs(range_join(points, intervals, on="user_id", bucket_s=600))
    assert got == {(1, 10), (5, 10), (2, 11), (4, 12)}


def test_point_and_interval_columns_survive(spark, frames):
    points, intervals = frames
    row = (
        range_join(points, intervals, on="user_id", bucket_s=600)
        .where("event_id = 2")
        .collect()[0]
    )
    assert row.user_id == 100 and row.iv_id_i == 11
    assert row.ts == _t(600) and row.start_i == _t(590)


def test_bucket_width_does_not_change_results(spark, frames):
    points, intervals = frames
    base = _pairs(range_join(points, intervals, on="user_id", bucket_s=600))
    for w in (1.0, 7.0, 100.0, 5000.0):
        assert (
            _pairs(range_join(points, intervals, on="user_id", bucket_s=w))
            == base
        ), w


def test_matches_bruteforce_on_random_data(spark):
    import random

    rng = random.Random(17)
    point_rows = [
        (i, rng.randint(0, 4), _t(rng.randint(0, 2000)))
        for i in range(150)
    ]
    iv_rows = []
    for j in range(80):
        s = rng.randint(0, 2000)
        iv_rows.append((j, rng.randint(0, 4), _t(s), _t(s + rng.randint(0, 400))))
    points = spark.createDataFrame(
        point_rows, "event_id long, user_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        iv_rows, "iv_id long, user_id long, start timestamp, end timestamp"
    )
    got = _pairs(range_join(points, intervals, on="user_id", bucket_s=300))
    want = {
        (eid, j)
        for eid, k, ts in point_rows
        for j, ik, s, e in iv_rows
        if ik == k and s <= ts < e
    }
    assert got == want


def test_plan_is_equi_join_not_nested_loop(spark, frames):
    points, intervals = frames
    plan = (
        range_join(points, intervals, on="user_id", bucket_s=600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_timestamp_ntz_inputs(spark, frames):
    # Parquet tables surface TIMESTAMP_NTZ, which cannot cast straight
    # to double — the operator must route it through an LTZ cast.
    points, intervals = frames
    p_ntz = points.withColumn("ts", points["ts"].cast("timestamp_ntz"))
    i_ntz = intervals.withColumn(
        "start", intervals["start"].cast("timestamp_ntz")
    ).withColumn("end", intervals["end"].cast("timestamp_ntz"))
    got = _pairs(range_join(p_ntz, i_ntz, on="user_id", bucket_s=600))
    assert got == {(1, 10), (5, 10), (2, 11), (4, 12)}


def test_rejects_nonpositive_bucket(spark, frames):
    points, intervals = frames
    with pytest.raises(ValueError):
        range_join(points, intervals, bucket_s=0)
