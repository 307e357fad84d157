"""CDC compaction (operators/cdc.py): latest-snapshot semantics
(newest wins, delete rules, deterministic tie-break), SCD2 interval
chaining, and the hash-aggregate (not window) plan for the snapshot."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.operators.cdc import (
    latest_snapshot,
    scd2_history,
)


def _t(h):
    return datetime(2024, 3, 1, h)


@pytest.fixture(scope="module")
def changelog(spark):
    rows = [
        # key, ts, seq, op, val
        ("a", _t(1), 1, "upsert", 10),
        ("a", _t(2), 2, "upsert", 11),
        ("b", _t(1), 3, "upsert", 20),
        ("b", _t(3), 4, "delete", None),   # newest for b -> key removed
        ("c", _t(1), 5, "delete", None),
        ("c", _t(2), 6, "upsert", 30),     # delete superseded -> kept
        ("d", _t(5), 7, "upsert", 40),     # tied ts: higher seq wins
        ("d", _t(5), 8, "upsert", 41),
    ]
    return spark.createDataFrame(
        rows, "k string, ts timestamp, seq long, op string, val int"
    )


def test_latest_snapshot_semantics(spark, changelog):
    got = {
        r.k: (r.val, r.seq)
        for r in latest_snapshot(changelog, "k", "ts", "seq", op="op").collect()
    }
    assert got == {"a": (11, 2), "c": (30, 6), "d": (41, 8)}


def test_latest_without_op_keeps_delete_rows(spark, changelog):
    got = {r.k: r.op for r in latest_snapshot(changelog, "k", "ts", "seq").collect()}
    assert got["b"] == "delete" and len(got) == 4


def test_scd2_intervals_chain(spark, changelog):
    hist = scd2_history(changelog, "k", "ts", "seq")
    rows = sorted(
        hist.filter("k = 'a'").collect(), key=lambda r: r.effective_from
    )
    assert rows[0].effective_to == rows[1].effective_from == _t(2)
    assert rows[1].effective_to is None and rows[1].is_current
    assert not rows[0].is_current
    # one interval per version, current count == distinct keys
    assert hist.count() == 8
    assert hist.filter("is_current").count() == 4
    # tied-ts versions chain by seq: d's seq-7 row closes at seq-8's ts
    d = {r.seq: r for r in hist.filter("k = 'd'").collect()}
    assert d[7].effective_to == _t(5) and d[8].is_current


def test_snapshot_plan_is_hash_aggregate_not_window(spark, changelog):
    plan = (
        latest_snapshot(changelog, "k", "ts", "seq", op="op")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan
    assert "partial_max_by" in plan, plan  # map-side combine is present


def test_snapshot_deterministic_under_repartition(spark, changelog):
    base = {
        (r.k, r.val, r.seq)
        for r in latest_snapshot(changelog, "k", "ts", "seq", op="op").collect()
    }
    for n in (1, 7):
        got = {
            (r.k, r.val, r.seq)
            for r in latest_snapshot(
                changelog.repartition(n), "k", "ts", "seq", op="op"
            ).collect()
        }
        assert got == base, n
