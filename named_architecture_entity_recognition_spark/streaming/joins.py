"""Stream-stream event-time interval join.

The streaming counterpart of ``operators/rangejoin.py``: match point
events to opener events of the same key within ``[opener.ts,
opener.ts + window)``, as both streams arrive. This is Spark's native
stream-stream join pattern — watermarks on BOTH sides plus a time-range
join condition that bounds each side's event time relative to the
other, which is exactly what lets the state store evict rows: an opener
older than ``watermark + window`` can never match a future point, so
Spark drops it. Without the range bound the join state grows forever —
that is the 100 TB failure mode this module exists to avoid.

Batch/stream parity: the same function works on batch DataFrames (the
watermark is skipped, the join is a plain theta join Catalyst plans
normally), so tests assert stream output == batch output == the binned
batch operator (`range_join`) on identical input.

Reference parity: the reference engine has no streaming at all
(SURVEY §2.6); this extends the engine's streaming surface (windowed
aggs, sessionization, streaming dedup, streaming triples) with joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    points: DataFrame,
    openers: DataFrame,
    ts: str = "ts",
    on: str = "user_id",
    window: str = "10 minutes",
    watermark: str = "1 hour",
    suffix: str = "_o",
) -> DataFrame:
    """Inner-join ``points`` to ``openers`` on
    ``openers[on] = points[on] AND openers.ts <= points.ts <
    openers.ts + window``.

    Output = point columns as-is + all opener columns with ``suffix``.
    On streaming inputs both sides get ``withWatermark(ts, watermark)``
    (required for state cleanup); on batch inputs the watermark is a
    no-op and is skipped.
    """
    o = openers.select(
        *[F.col(c).alias(c + suffix) for c in openers.columns]
    )
    p = points
    if p.isStreaming:
        p = p.withWatermark(ts, watermark)
    if o.isStreaming:
        o = o.withWatermark(ts + suffix, watermark)
    cond = (
        (p[on] == o[on + suffix])
        & (p[ts] >= o[ts + suffix])
        & (p[ts] < o[ts + suffix] + F.expr(f"INTERVAL {window}"))
    )
    return p.join(o, cond, "inner")


def run_interval_join_stream(
    spark,
    points_path: str,
    openers_path: str,
    schema,
    out_path: str,
    checkpoint_path: str,
    opener_filter: str,
    ts: str = "ts",
    on: str = "user_id",
    window: str = "10 minutes",
    watermark: str = "1 hour",
):
    """File-source driver: read both streams from parquet directories
    (``openers`` = rows of ``openers_path`` matching ``opener_filter``),
    drain with availableNow, append matches to ``out_path``."""
    points = spark.readStream.schema(schema).parquet(points_path)
    openers = (
        spark.readStream.schema(schema).parquet(openers_path).filter(opener_filter)
    )
    joined = interval_join_stream(
        points, openers, ts=ts, on=on, window=window, watermark=watermark
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
