"""Funnel sequence analysis (operators/funnel.py)."""

from datetime import datetime, timedelta

import pytest

from named_architecture_entity_recognition_spark.operators.funnel import (
    cohort_retention,
    funnel_levels,
)

T0 = datetime(2026, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, T0 + timedelta(seconds=s)) for u, t, s in rows],
        "user_id string, event_type string, ts timestamp",
    )


def _levels(df, steps=("view", "click", "purchase"), window=3600.0):
    return {
        r.user_id: r.level
        for r in funnel_levels(df, list(steps), window).collect()
    }


def test_funnel_basic_levels(spark):
    df = _ev(spark, [
        # u1: full chain within the hour
        ("u1", "view", 0), ("u1", "click", 100), ("u1", "purchase", 200),
        # u2: view+click only
        ("u2", "view", 0), ("u2", "click", 50),
        # u3: view only
        ("u3", "view", 0),
        # u4: wrong order -> stuck at level 1
        ("u4", "purchase", 0), ("u4", "click", 10), ("u4", "view", 20),
        # u5: no view at all -> absent
        ("u5", "click", 0), ("u5", "purchase", 10),
    ])
    assert _levels(df) == {"u1": 3, "u2": 2, "u3": 1, "u4": 1}


def test_funnel_window_bounds_whole_chain(spark):
    df = _ev(spark, [
        # chain completes but purchase is 2h after the first view
        ("u1", "view", 0), ("u1", "click", 100), ("u1", "purchase", 7200),
        # a LATER view restarts the chain and completes in time
        ("u2", "view", 0), ("u2", "click", 100), ("u2", "view", 6900),
        ("u2", "click", 7000), ("u2", "purchase", 7200),
    ])
    assert _levels(df) == {"u1": 2, "u2": 3}


def test_funnel_greedy_is_exact_not_heuristic(spark):
    """The earliest click after the first view leads to a purchase
    outside the window, but a later click chain fits — existence
    semantics must still report level 3 (greedy from each start is
    span-minimal, so the single start covers it)."""
    df = _ev(spark, [
        ("u1", "view", 0),
        ("u1", "click", 10),           # greedy t2
        ("u1", "purchase", 3000),      # within window via greedy
    ])
    assert _levels(df) == {"u1": 3}
    # strictly-increasing requirement: simultaneous events don't chain
    df2 = _ev(spark, [("u1", "view", 0), ("u1", "click", 0)])
    assert _levels(df2) == {"u1": 1}


def test_funnel_two_steps_and_validation(spark):
    df = _ev(spark, [("u1", "view", 0), ("u1", "click", 10)])
    assert _levels(df, steps=("view", "click")) == {"u1": 2}
    with pytest.raises(ValueError, match=">= 2 steps"):
        funnel_levels(df, ["view"], 60.0)


def test_cohort_retention_triangle(spark):
    # 2026-01-01 is a Thursday; that week's Monday is 2025-12-29.
    # u1 first seen week 0, active weeks 0 and 2; u2 week 0 only;
    # u3 first seen week 1, active weeks 1 and 2 (period 0 and 1).
    df = _ev(spark, [
        ("u1", "view", 0), ("u1", "view", 14 * 86400),
        ("u2", "view", 3600),
        ("u3", "view", 7 * 86400), ("u3", "view", 14 * 86400),
    ])
    got = {
        (str(r.cohort), r.period): r.n_users
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2025-12-29", 0): 2,
        ("2025-12-29", 2): 1,
        ("2026-01-05", 0): 1,
        ("2026-01-05", 1): 1,
    }


def test_funnel_single_user_partitioning_invariance(spark):
    rows = []
    for i in range(40):
        rows += [("u%d" % (i % 7), "view", i * 37),
                 ("u%d" % (i % 7), "click", i * 37 + 5),
                 ("u%d" % (i % 7), "purchase", i * 37 + 9)]
    df = _ev(spark, rows)
    assert _levels(df) == _levels(df.repartition(13))


def test_funnel_joins_are_equi_not_nested_loop(spark):
    """With broadcast disabled (the 100 TB regime), every chain join
    must extract the user_id equi-key (SortMergeJoin) — a
    BroadcastNestedLoopJoin/CartesianProduct here would be quadratic
    in events."""
    rows = []
    for i in range(200):
        rows += [(f"u{i % 9}", "view", i * 11), (f"u{i % 9}", "click", i * 11 + 3),
                 (f"u{i % 9}", "purchase", i * 11 + 7)]
    df = _ev(spark, rows)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = funnel_levels(df, ["view", "click", "purchase"], 3600.0)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in final, final
        assert "BroadcastNestedLoopJoin" not in final, final
        assert "CartesianProduct" not in final, final
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _levels_array(df, steps=("view", "click", "purchase"), window=3600.0,
                  n_salts=None):
    from named_architecture_entity_recognition_spark.operators.funnel import (
        funnel_levels_array,
    )

    return {
        r.user_id: r.level
        for r in funnel_levels_array(
            df, list(steps), window, n_salts=n_salts
        ).collect()
    }


def test_funnel_array_kernel_matches_join_kernel(spark):
    """The per-user sorted-array kernel must be row-identical to the
    chain-join kernel on every semantic case above."""
    df = _ev(spark, [
        ("u1", "view", 0), ("u1", "click", 100), ("u1", "purchase", 200),
        ("u2", "view", 0), ("u2", "click", 50),
        ("u3", "view", 0),
        ("u4", "purchase", 0), ("u4", "click", 10), ("u4", "view", 20),
        ("u5", "click", 0), ("u5", "purchase", 10),
        # window-restart case
        ("u6", "view", 0), ("u6", "click", 100), ("u6", "view", 6900),
        ("u6", "click", 7000), ("u6", "purchase", 7200),
        # simultaneous events don't chain
        ("u7", "view", 0), ("u7", "click", 0),
    ])
    assert _levels_array(df) == _levels(df)


def test_funnel_array_kernel_eight_steps(spark):
    """>5-step funnel — the regime the array kernel exists for (the
    join kernel's chain grows a join per step)."""
    from named_architecture_entity_recognition_spark.operators.funnel import (
        funnel_levels,
        funnel_levels_array,
    )

    steps = [f"s{i}" for i in range(8)]
    rows = []
    # u_full: completes all 8 within window; u_parts: stops at step 5;
    # u_slow: completes but step 8 falls outside the window
    for i in range(8):
        rows.append(("u_full", f"s{i}", i * 10))
    for i in range(5):
        rows.append(("u_part", f"s{i}", i * 10))
    for i in range(8):
        rows.append(("u_slow", f"s{i}", i * 200))
    df = _ev(spark, rows)
    want = {"u_full": 8, "u_part": 5, "u_slow": 6}  # 5*200=1000 <= 1000
    got_a = {
        r.user_id: r.level
        for r in funnel_levels_array(df, steps, 1000.0).collect()
    }
    got_j = {
        r.user_id: r.level
        for r in funnel_levels(df, steps, 1000.0).collect()
    }
    assert got_a == want and got_j == want


def test_funnel_array_kernel_power_user_skew(spark):
    """Power-user skew: one user with 600 interleaved events (the case
    that makes the join kernel's per-key fan-out explode and a naive
    collect hot). Both kernels agree, and the two-phase salted collect
    (skew.py wiring) is identical to the direct one."""
    rows = []
    for i in range(200):
        rows += [("whale", "view", i * 50), ("whale", "click", i * 50 + 7),
                 ("whale", "purchase", i * 50 + 13)]
    for i in range(10):
        rows += [(f"m{i}", "view", i * 100), (f"m{i}", "click", i * 100 + 1)]
    df = _ev(spark, rows)
    base = _levels(df)
    assert _levels_array(df) == base
    assert _levels_array(df, n_salts=4) == base


def test_funnel_array_kernel_is_single_shuffle_no_python(spark):
    """Plan audit: the array kernel has exactly ONE exchange (the
    groupBy on user) and zero Python boundaries."""
    from named_architecture_entity_recognition_spark.operators.funnel import (
        funnel_levels_array,
    )

    rows = [("u1", "view", 0), ("u1", "click", 5), ("u1", "purchase", 9)]
    df = _ev(spark, rows)
    out = funnel_levels_array(df, ["view", "click", "purchase"], 3600.0)
    simple = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert simple.count("Exchange") == 1, simple
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in simple, simple


def test_cohort_retention_approx_kmv(spark):
    """KMV n_users path: exact while distinct users per cell < k, and
    within the published KMV error envelope at small k (rel std err
    ~ 1/sqrt(k-2); assert 5x that, i.e. a 5-sigma bound)."""
    rows = []
    for u in range(400):
        rows.append((f"u{u}", "view", (u % 3) * 7 * 86400))
        if u % 2 == 0:
            rows.append((f"u{u}", "view", (u % 3) * 7 * 86400 + 14 * 86400))
    df = _ev(spark, rows)
    exact = {
        (str(r.cohort), r.period): r.n_users
        for r in cohort_retention(df).collect()
    }
    # k large enough: every estimate is EXACT (sketch never fills)
    big = {
        (str(r.cohort), r.period): r.n_users
        for r in cohort_retention(df, approx_k=512).collect()
    }
    assert big == exact
    # small k: 5-sigma KMV bound on every cell
    import math

    k = 32
    approx = {
        (str(r.cohort), r.period): r.n_users
        for r in cohort_retention(df, approx_k=k).collect()
    }
    assert set(approx) == set(exact)
    tol = 5.0 / math.sqrt(k - 2)
    for cell, n in exact.items():
        assert abs(approx[cell] - n) <= max(tol * n, 1.0), (
            cell, n, approx[cell]
        )


def test_funnel_kernels_agree_on_random_streams(spark):
    """Randomized equivalence: 4 seeded random event streams (ties,
    out-of-order types, users missing steps, duplicate timestamps) —
    the join and array kernels must emit identical level maps on every
    one, for both a 3-step and a 6-step funnel."""
    import numpy as np

    from named_architecture_entity_recognition_spark.operators.funnel import (
        funnel_levels,
        funnel_levels_array,
    )

    types3 = ["view", "click", "purchase"]
    types6 = [f"s{i}" for i in range(6)]
    for seed in range(4):
        rng = np.random.RandomState(seed)
        all_types = types3 + types6
        rows = [
            (f"u{int(rng.randint(0, 25))}",
             all_types[int(rng.randint(0, len(all_types)))],
             int(rng.randint(0, 5000)))
            for _ in range(600)
        ]
        df = _ev(spark, rows)
        for steps, win in ((types3, 900.0), (types6, 2500.0)):
            a = {r.user_id: r.level
                 for r in funnel_levels(df, steps, win).collect()}
            b = {r.user_id: r.level
                 for r in funnel_levels_array(df, steps, win).collect()}
            assert a == b, (seed, steps)


def test_funnel_array_kernel_equal_timestamp_ties(spark):
    """Chains need STRICTLY increasing timestamps. The one-pass kernel's
    tie discipline (merged array sorted by (ts asc, step desc)) must
    refuse a same-ts step-2 event and accept one strictly later —
    pinned explicitly because the randomized equivalence suite only
    rarely generates exact collisions."""
    import datetime as dt

    from named_architecture_entity_recognition_spark.operators.funnel import (
        funnel_levels,
        funnel_levels_array,
    )

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # u1: A and B at the SAME instant -> B cannot chain -> level 1
        (1, "A", t0),
        (1, "B", t0),
        # u2: B strictly later -> level 2
        (2, "A", t0),
        (2, "B", t0 + dt.timedelta(seconds=1)),
        # u3: A at t0 and t0+2; B at t0+1 -> only the earlier A chains
        # (greedy from t1=t0 finds B; from t1=t0+2 does not) -> level 2
        (3, "A", t0),
        (3, "A", t0 + dt.timedelta(seconds=2)),
        (3, "B", t0 + dt.timedelta(seconds=1)),
        # u4: B BEFORE any A -> level 1 (no backwards chaining)
        (4, "B", t0),
        (4, "A", t0 + dt.timedelta(seconds=1)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    expected = {1: 1, 2: 2, 3: 2, 4: 1}
    for kernel in (funnel_levels, funnel_levels_array):
        got = {
            r.user_id: r.level
            for r in kernel(ev, ["A", "B"], window_s=3600.0).collect()
        }
        assert got == expected, (kernel.__name__, got)
