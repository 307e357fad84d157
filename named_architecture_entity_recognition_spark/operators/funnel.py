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

    ONE groupBy collects each user's time-sorted (ts, step) event array,
    then a ONE-PASS state machine runs as a pure-Catalyst ``aggregate``
    (zero Python): state = per-level latest chain-start time. For each
    event of step j at time t, a level-j chain extends the level-(j-1)
    chain with the LATEST start satisfying the window — latest-start
    dominates (every deeper constraint only loosens with a later start),
    and greedy earliest-next is existence-optimal, so this equals the
    max-over-start-events greedy-chain semantics of ``funnel_levels``
    and the DuckDB oracle. O(events x steps) per user.

    (History: the r3 form evaluated a nested-HOF greedy chain from
    EVERY step-1 event — O(k·n²) with re-evaluated subtrees in Spark's
    interpreted higher-order functions. The r4 whale-user bench case —
    one user holding ~10% of all events — took minutes on a 10k-event
    user; this one-pass runs it in milliseconds.)

    Tie discipline: chains need strictly increasing ts, so the merged
    array sorts by (ts asc, step DESC) — a step-(j+1) event at time t
    is processed before any same-ts step-j update can be written, so
    it only ever extends chains whose previous event is strictly
    earlier.

    ``n_salts``: two-phase collect for mega-users (skew.py pattern) —
    partial sorted arrays on (user, salt), flatten+sort on user. The
    final per-user array still lands on one task (the scan needs it),
    but no single task ever receives the raw event rows of a hot user
    in one gulp.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    k = len(steps)
    w = float(window_s)
    ev = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("_type"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
    )
    # one struct per (event, matching step position) — a type appearing
    # at several funnel positions contributes to each of them
    steps_lit = F.array(
        *[
            F.struct(F.lit(i + 1).alias("j"), F.lit(s).alias("s"))
            for i, s in enumerate(steps)
        ]
    )
    tagged = ev.select(
        "user_id",
        F.explode(
            F.filter(steps_lit, lambda x: x["s"] == F.col("_type"))
        ).alias("m"),
        F.col("_ts").cast("double").alias("t"),
    ).select(
        "user_id",
        F.col("t"),
        (-F.col("m.j")).cast("int").alias("negstep"),
    )
    e_struct = F.struct(F.col("t"), F.col("negstep"))
    merged = F.array_sort(F.collect_list(e_struct)).alias("evs")
    if n_salts:
        from named_architecture_entity_recognition_spark.operators.skew import (
            with_salt,
        )

        partial = with_salt(
            tagged, n_salts, cols=["user_id", "t", "negstep"]
        ).groupBy("user_id", "salt").agg(merged)
        per_user = partial.groupBy("user_id").agg(
            F.array_sort(F.flatten(F.collect_list("evs"))).alias("evs")
        )
    else:
        per_user = tagged.groupBy("user_id").agg(merged)

    init = F.struct(
        F.array_repeat(F.lit(None).cast("double"), k).alias("L"),
        F.lit(0).alias("best"),
    )

    def update(acc, e):
        j = (-e["negstep"]).cast("int")
        t = e["t"]
        # element_at is 1-based; greatest() clamps the j==1 probe to a
        # valid index (its value is unused on that branch)
        prev = F.element_at(acc["L"], F.greatest(j - 1, F.lit(1)))
        extend = (j > 1) & prev.isNotNull() & ((t - prev) <= F.lit(w))
        new_l = F.transform(
            acc["L"],
            lambda x, i: F.when(
                (i + 1) == j,
                F.when(j == 1, t).otherwise(
                    # greatest() skips nulls: max(existing, new start)
                    F.when(extend, F.greatest(x, prev)).otherwise(x)
                ),
            ).otherwise(x),
        )
        new_best = (
            F.when(j == 1, F.greatest(acc["best"], F.lit(1)))
            .when(extend, F.greatest(acc["best"], j))
            .otherwise(acc["best"])
        )
        return F.struct(new_l.alias("L"), new_best.alias("best"))

    level = F.aggregate(
        F.col("evs"), init, update, lambda acc: acc["best"]
    ).cast("int")
    return (
        per_user.select("user_id", level.alias("level"))
        # users with no step-1 event never start a chain -> absent,
        # matching the join kernel
        .filter(F.col("level") >= 1)
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
