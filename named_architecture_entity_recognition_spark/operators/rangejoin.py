"""Range (interval) join: match point rows to interval rows where
``start <= ts < end``, optionally also on an equality key.

Spark expresses this predicate as a theta join, which physically becomes
BroadcastNestedLoopJoin (small side) or a per-key cross product — both
collapse at scale: a hot key with n points and m intervals costs n*m
comparisons. The scale-correct shape is the *binned* range join (the
same strategy Databricks' range-join optimization applies under the
hood, re-expressed here with public DataFrame ops):

1. pick a bucket width ``bucket_s`` (seconds);
2. explode each interval into the buckets it covers
   (``sequence(floor(start/w), floor(end/w))`` — at most
   ``len/w + 2`` rows per interval);
3. map each point to its single bucket ``floor(ts/w)``;
4. equi-join on bucket (+ key), then residual-filter the exact
   ``start <= ts < end`` predicate.

Cost model: ONE shuffle on (bucket[, key]) — the join is a plain
SortMergeJoin/ShuffledHashJoin, whole-stage codegen, no Python. The
explosion factor is bounded by interval_length / bucket_s, so choose
``bucket_s`` near the TYPICAL interval length: too small explodes the
interval side, too large piles unrelated rows into one bucket and
shifts work to the residual filter. Hot buckets (rush-hour data) are
ordinary join skew — AQE's skew-join handles them, and the optional
``on`` key further splits buckets.

Reference parity: the reference engine has no temporal joins at all —
this operator (like operators/asof.py) extends the engine for the
event/stream tables the training-data pipeline carries.

DuckDB oracle: a plain inequality join (DuckDB plans IEJoin for it),
see q_range_join in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_seconds(df: DataFrame, name: str):
    """Column of ``name`` as double seconds. TIMESTAMP_NTZ cannot cast
    straight to double (Spark 4), so route timestamps through an LTZ
    cast first — both sides of the join go through the same path, so
    the session-timezone offset cancels."""
    col = F.col(name)
    if dict(df.dtypes)[name].startswith("timestamp"):
        col = col.cast("timestamp")
    return col.cast("double")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    on: str | None = None,
    bucket_s: float = 600.0,
    suffix: str = "_i",
) -> DataFrame:
    """Inner-join points to intervals on ``start <= ts < end`` (and
    ``points[on] = intervals[on]`` when ``on`` is given).

    Output = all point columns as-is, then all interval columns with
    ``suffix`` appended. Empty intervals (``end <= start``) match
    nothing and are dropped up front — they would otherwise make
    ``sequence`` step backwards.
    """
    w = float(bucket_s)
    if w <= 0:
        raise ValueError(f"bucket_s must be positive, got {bucket_s}")
    ipay = F.struct(*[F.col(c) for c in intervals.columns])
    i2 = (
        intervals.filter(F.col(end) > F.col(start))
        .select(
            ipay.alias("_ipay"),
            F.col(start).alias("_is"),
            F.col(end).alias("_ie"),
            _as_seconds(intervals, start).alias("_iss"),
            _as_seconds(intervals, end).alias("_ies"),
            *([F.col(on).alias("_ik")] if on else []),
        )
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(F.col("_iss") / w).cast("long"),
                    F.floor(F.col("_ies") / w).cast("long"),
                )
            ),
        )
    )
    p2 = points.select(
        F.struct(*[F.col(c) for c in points.columns]).alias("_ppay"),
        F.col(ts).alias("_pts"),
        _as_seconds(points, ts).alias("_ptss"),
        *([F.col(on).alias("_pk")] if on else []),
    ).withColumn("_b", F.floor(F.col("_ptss") / w).cast("long"))
    cond = (
        (p2["_b"] == i2["_b"])
        & (p2["_pts"] >= i2["_is"])
        & (p2["_pts"] < i2["_ie"])
    )
    if on:
        cond = cond & (p2["_pk"] == i2["_ik"])
    joined = p2.join(i2, cond, "inner")
    out_cols = [F.col("_ppay")[c].alias(c) for c in points.columns] + [
        F.col("_ipay")[c].alias(c + suffix) for c in intervals.columns
    ]
    return joined.select(*out_cols)
