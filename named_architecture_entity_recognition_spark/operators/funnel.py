"""Ordered event-sequence (funnel) analysis over the events stream.

``funnel_levels(events, steps, window_s)``: for each user, the deepest
funnel prefix step_1 < step_2 < ... < step_k (strictly increasing event
time, types in order) completable with total span ``ts_k - ts_1 <=
window_s``. The standard product-analytics question ("how many users
viewed, then clicked, then purchased within an hour?") — ClickHouse
ships it as ``windowFunnel``; here it is derived from first principles
as a chain of greedy earliest-next joins:

    t2(e1) = min{ts of a step-2 event of the same user with ts > t1}
    t3(e1) = min{ts of a step-3 event with ts > t2(e1)}            ...

Greedy earliest-next is *exact*, not a heuristic: for a fixed start
event, taking the earliest valid next event can only leave more room
for the remaining steps (exchange argument), so a chain within the
window exists iff the greedy chain from some start is within the
window. That makes the semantics deterministic and lets the DuckDB
oracle (q_funnel_levels) reproduce the result with the same joins.

Scale shape: every join keys on (user_id [+ chain timestamp]), so the
whole funnel is computed inside one hash-partitioning by user — Spark
reuses the exchange across the chained joins (AQE coalesces the tiny
sides). Fan-out is bounded by per-user-per-type event counts, not by
|events|^2: step_i rows join only same-user step_{i+1} rows. Power
users (the skew case) are exactly the `operators/skew.py` salting /
AQE skew-join story; funnels beyond ~5 steps should pre-aggregate
each user's per-type sorted timestamps instead (one groupBy, then a
per-row array scan).

Reference parity: beyond-reference capability (events table only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_levels(
    events: DataFrame,
    steps: list[str],
    window_s: float,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """-> (user_id, level): max funnel prefix depth (1..len(steps))
    reachable within ``window_s`` seconds of the chain's first event.
    Users with no step-1 event are absent (level 0)."""
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    by_type = [
        events.filter(F.col(type_col) == s).select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).cast("timestamp").alias(f"t{i + 1}"),
        )
        for i, s in enumerate(steps)
    ]
    # chains[i] = one row per step-1 event with its greedy chain through
    # step i+1 (t_{j+1} = earliest step-(j+1) ts after t_j); left joins
    # keep partial chains so the level CASE below sees them
    chain = by_type[0]
    for i in range(1, len(steps)):
        nxt = by_type[i]
        chain = (
            chain.join(
                nxt,
                (chain.user_id == nxt.user_id)
                & (F.col(f"t{i + 1}") > F.col(f"t{i}")),
                "left",
            )
            .drop(nxt.user_id)
            .groupBy("user_id", *[f"t{j + 1}" for j in range(i)])
            .agg(F.min(f"t{i + 1}").alias(f"t{i + 1}"))
        )
    span_ok = [
        (
            F.col(f"t{i + 1}").isNotNull()
            & (
                F.col(f"t{i + 1}").cast("double") - F.col("t1").cast("double")
                <= window_s
            )
        ).cast("int")
        for i in range(1, len(steps))
    ]
    # level of one start event = 1 + deepest consecutive-ok prefix;
    # products of the 0/1 flags give the consecutive-prefix semantics
    level = F.lit(1)
    prefix = F.lit(1)
    for ok in span_ok:
        prefix = prefix * ok
        level = level + prefix
    return (
        chain.withColumn("_lvl", level)
        .groupBy("user_id")
        .agg(F.max("_lvl").cast("int").alias("level"))
    )


def funnel_levels_array(
    events: DataFrame,
    steps: list[str],
    window_s: float,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    n_salts: int | None = None,
) -> DataFrame:
    """Same contract and semantics as ``funnel_levels`` (pytest asserts
    the two kernels identical), different scale shape — the documented
    >5-step / power-user variant:

    ONE groupBy collects each user's per-step sorted timestamp arrays,
    then the greedy chain runs as a pure-Catalyst array scan (nested
    higher-order functions — zero Python). A k-step funnel as chain
    joins is k-1 joins whose per-user fan-out multiplies for power
    users; here the per-user work is an in-memory scan bounded by that
    user's own event count, and the job has exactly one shuffle.

    ``n_salts``: two-phase collect for mega-users (skew.py pattern) —
    partial collect_list on (user, salt), merge+sort on user. The
    final per-user array still lands on one task (the scan needs it),
    but no single task ever receives the raw event rows of a hot user
    in one gulp.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    ev = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("_type"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
    )
    step_aggs = [
        F.array_sort(
            F.collect_list(F.when(F.col("_type") == s, F.col("_ts")))
        ).alias(f"a{i + 1}")
        for i, s in enumerate(steps)
    ]
    if n_salts:
        from named_architecture_entity_recognition_spark.operators.skew import (
            with_salt,
        )

        partial = with_salt(
            ev, n_salts, cols=["user_id", "_type", "_ts"]
        ).groupBy("user_id", "salt").agg(*step_aggs)
        per_user = partial.groupBy("user_id").agg(
            *[
                F.array_sort(F.flatten(F.collect_list(f"a{i + 1}"))).alias(
                    f"a{i + 1}"
                )
                for i in range(len(steps))
            ]
        )
    else:
        per_user = ev.groupBy("user_id").agg(*step_aggs)

    def _after(p):
        # closure factory: a default-arg lambda would have TWO params
        # and PySpark would bind it to filter's (element, index) form
        return lambda x: x > p

    def level_from(t1):
        # greedy chain from start event t1: earliest step-(i+1) ts after
        # the chain's step-i ts (arrays are sorted, min = earliest);
        # level = 1 + deepest consecutive within-window prefix
        prev = t1
        lvl = F.lit(1)
        ok = F.lit(True)
        for i in range(1, len(steps)):
            nxt = F.array_min(
                F.filter(F.col(f"a{i + 1}"), _after(prev))
            )
            ok = (
                ok
                & nxt.isNotNull()
                & (
                    nxt.cast("double") - t1.cast("double")
                    <= float(window_s)
                )
            )
            lvl = lvl + F.when(ok, 1).otherwise(0)
            prev = nxt
        return lvl

    return (
        per_user.select(
            "user_id",
            F.array_max(F.transform(F.col("a1"), level_from))
            .cast("int")
            .alias("level"),
        )
        # users with no step-1 event have level null -> absent, matching
        # the join kernel
        .filter(F.col("level").isNotNull())
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    approx_k: int | None = None,
) -> DataFrame:
    """Weekly cohort retention: (cohort, period, n_users) where cohort
    = Monday of the user's first-ever event week, period = whole weeks
    between that and the activity week, n_users = distinct users from
    the cohort active in that period.

    Scale shape: the first-seen aggregate and the events⨝first join
    both hash-partition on the user column — one exchange serves both
    (AQE reuses it); the final (cohort, period) aggregate is a
    partial-agg shuffle over a tiny key space.

    ``approx_k``: at 10^9 users the exact countDistinct's per-key
    distinct set outgrows memory; approx_k = K swaps in the mergeable
    KMV sketch (`operators/sketch.py`, md5-portable so DuckDB oracles
    it) — n_users becomes an estimate, exact while a cell holds < K
    distinct users, relative std err ~ 1/sqrt(K-2) beyond (error-bound
    pytest in tests/test_funnel.py).
    """
    u = F.col(user_col)
    week = F.date_trunc("week", F.col(ts_col))
    first = events.groupBy(u.alias("_u")).agg(
        F.min(week).alias("_cohort")
    )
    cells = events.join(first, u == F.col("_u")).select(
        u.alias("_user"),
        F.col("_cohort").cast("date").alias("cohort"),
        F.floor(
            F.datediff(week.cast("date"), F.col("_cohort").cast("date"))
            / 7
        )
        .cast("int")
        .alias("period"),
    )
    if approx_k is not None:
        from named_architecture_entity_recognition_spark.operators.sketch import (
            kmv_distinct,
        )

        return kmv_distinct(
            cells, ("cohort", "period"), "_user", k=approx_k
        ).withColumnRenamed("est_distinct", "n_users")
    return cells.groupBy("cohort", "period").agg(
        F.countDistinct("_user").alias("n_users")
    )
