"""Table profiler (operators/profile.py): hand-computed stats, null
accounting, cardinality bound, single-scan plan audit, no Python."""

import math
import statistics

import pytest
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.operators.profile import (
    profile_table,
)


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (float(v) if v is not None else None, s)
        for v, s in [
            (1, "aa"), (3, "bbbb"), (4, None), (7, "c"),
            (11, "dd"), (None, "eee"), (13, "aa"), (20, "f"),
        ]
    ]
    return spark.createDataFrame(rows, "v double, s string")


def test_numeric_profile_matches_hand_computed(spark, table):
    row = {r.column: r for r in profile_table(table).collect()}["v"]
    vals = [1.0, 3.0, 4.0, 7.0, 11.0, 13.0, 20.0]
    assert row.n_rows == 8 and row.n_nulls == 1
    assert row.min == 1.0 and row.max == 20.0
    assert abs(row.mean - statistics.mean(vals)) < 1e-12
    assert abs(row.stddev - statistics.stdev(vals)) < 1e-12
    # exact linear-interpolation quantiles (numpy 'linear' method)
    import numpy as np

    want = np.quantile(vals, [0.05, 0.25, 0.5, 0.75, 0.95]).tolist()
    assert all(abs(a - b) < 1e-9 for a, b in zip(row.quantiles, want))
    assert row.avg_len is None


def test_string_profile(spark, table):
    row = {r.column: r for r in profile_table(table).collect()}["s"]
    assert row.n_rows == 8 and row.n_nulls == 1
    assert row.min is None and row.quantiles is None
    # lengths of non-null strings: 2,4,1,2,3,2,1
    assert abs(row.avg_len - (2 + 4 + 1 + 2 + 3 + 2 + 1) / 7) < 1e-12


def test_cardinality_estimate_bound(spark):
    df = spark.range(20000).select(
        (F.col("id") % 5000).cast("long").alias("k")
    )
    row = profile_table(df, ["k"]).collect()[0]
    # default rsd=0.02 -> 3-sigma bound 6%
    assert abs(row.n_distinct_approx - 5000) / 5000 < 0.06


def test_single_scan_no_union(spark, table):
    out = profile_table(table)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") == 1, final
    assert "Union" not in final and "Join" not in final, final
    assert "BatchEvalPython" not in final and "ArrowEvalPython" not in final


def test_rejects_unsupported_and_empty(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1),)], "ts timestamp"
    )
    with pytest.raises(ValueError, match="unsupported type"):
        profile_table(df, ["ts"])
    with pytest.raises(ValueError, match="no columns"):
        profile_table(df)


def test_default_column_selection_skips_nonscalar(spark):
    df = spark.createDataFrame(
        [(1.0, "x", [1, 2])], "v double, s string, a array<int>"
    )
    cols = {r.column for r in profile_table(df).collect()}
    assert cols == {"v", "s"}
