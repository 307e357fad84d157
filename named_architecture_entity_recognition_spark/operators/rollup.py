"""Hypertable-style multi-granularity time rollup (continuous-aggregate
shape): aggregate the raw table ONCE at the finest grain, then derive
every coarser grain by re-aggregating the next-finer grain.

Why this shape at 100 TB: the naive plan (one groupBy per grain, each
scanning the raw table) reads the fact table G times and shuffles raw
rows G times. Here the raw table is scanned and shuffled exactly once —
at the finest grain — and each coarser level shuffles only the
already-aggregated buckets (orders of magnitude smaller: a year of
1-minute buckets per key is ~526k rows regardless of raw volume). This
is the same dataflow TimescaleDB continuous aggregates and druid-style
rollup hierarchies use, expressed with plain DataFrame ops so Catalyst
still gets partial (map-side) aggregation at every level.

Only re-aggregable measures are exposed (count -> sum, sum -> sum,
min -> min, max -> max; mean = sum/count at read time). Non-decomposable
measures (exact median, exact distinct) deliberately have no place here —
use a mergeable sketch (operators/sketch.py) for distinct counts.

Reference parity: the reference engine has no temporal aggregation at
all — this operator (like operators/asof.py and operators/rangejoin.py)
extends the engine for the event/stream tables the training-data
pipeline carries.

DuckDB oracle: one date_trunc GROUP BY per grain over the raw table,
UNION ALL — see q_rollup_hypertable in __spark_entry__.py (equality of
the two plans is exactly the re-aggregation invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Finest-to-coarsest truncation order; each grain must be an exact
# refinement of the next (date_trunc(coarse, date_trunc(fine, ts)) ==
# date_trunc(coarse, ts)). 'week' sits between day and month in
# coarseness but is NOT aligned with month/quarter/year boundaries, so
# it may only be the LAST grain in a chain (nothing re-aggregates from
# weeks).
GRAIN_ORDER = ["minute", "hour", "day", "week", "month", "quarter", "year"]
_NON_REFINING = {"week"}  # cannot be a source for a coarser grain


def rollup_hypertable(
    df: DataFrame,
    ts: str = "ts",
    keys: tuple[str, ...] = (),
    value: str = "value",
    grains: tuple[str, ...] = ("hour", "day", "month"),
) -> DataFrame:
    """Rollup of ``df`` at every grain in ``grains`` (finest first).

    Output schema: ``grain string, bucket timestamp, *keys,
    n_rows long, sum_value double, min_value double, max_value double``.
    Coarser grains are computed from the finer level, never from raw.
    """
    if not grains:
        raise ValueError("grains must be non-empty")
    order = []
    for g in grains:
        if g not in GRAIN_ORDER:
            raise ValueError(f"unknown grain {g!r}; choose from {GRAIN_ORDER}")
        order.append(GRAIN_ORDER.index(g))
    if order != sorted(order) or len(set(order)) != len(order):
        raise ValueError(f"grains must be strictly finest-to-coarsest: {grains}")
    for g in grains[:-1]:
        if g in _NON_REFINING:
            raise ValueError(
                f"{g!r} buckets do not align with coarser grains; "
                "it may only be the last grain"
            )

    key_cols = [F.col(k) for k in keys]
    cur = df.groupBy(
        F.date_trunc(grains[0], F.col(ts)).alias("bucket"), *key_cols
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(value).alias("sum_value"),
        F.min(value).alias("min_value"),
        F.max(value).alias("max_value"),
    )
    levels = [cur.select(F.lit(grains[0]).alias("grain"), "*")]
    for g in grains[1:]:
        cur = cur.groupBy(
            F.date_trunc(g, F.col("bucket")).alias("bucket"), *key_cols
        ).agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        levels.append(cur.select(F.lit(g).alias("grain"), "*"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
