"""Stream-stream interval join (streaming/joins.py): batch-form
semantics vs the binned range_join operator, real streaming run parity,
and incremental arrival."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.streaming.joins import (
    interval_join_stream,
    run_interval_join_stream,
)


@pytest.fixture(scope="module")
def events(spark):
    base = dt.datetime(2026, 1, 1)
    # monotonic event time: the incremental test appends ids >= 40 as a
    # second drain, which must not fall behind the watermark the first
    # drain advanced (late rows are dropped — correct semantics, but
    # not what that test exercises)
    rows = [
        (
            i,
            base + dt.timedelta(minutes=i * 3),
            i % 5,
            "error" if i % 7 == 0 else "click",
            float(i),
        )
        for i in range(80)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def _pairs(df):
    return {(r.event_id, r.event_id_o) for r in df.collect()}


def test_batch_form_matches_range_join(spark, events):
    from named_architecture_entity_recognition_spark.operators.rangejoin import (
        range_join,
    )

    got = _pairs(
        interval_join_stream(
            events, events.filter("event_type = 'error'"), window="10 minutes"
        )
    )
    openers = events.filter("event_type = 'error'").select(
        F.col("event_id").alias("opener_id"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("end"),
    )
    want = {
        (r.event_id, r.opener_id_i)
        for r in range_join(
            events, openers, on="user_id", bucket_s=300
        ).collect()
    }
    assert got == want and got  # non-empty


def test_streaming_run_matches_batch(spark, events, tmp_path):
    src = str(tmp_path / "events")
    events.repartition(3).write.parquet(src)
    out = str(tmp_path / "joined")
    run_interval_join_stream(
        spark,
        src,
        src,
        events.schema,
        out,
        str(tmp_path / "ckpt"),
        opener_filter="event_type = 'error'",
        window="10 minutes",
    )
    got = _pairs(spark.read.parquet(out))
    want = _pairs(
        interval_join_stream(
            events, events.filter("event_type = 'error'"), window="10 minutes"
        )
    )
    assert got == want and got


def test_streaming_incremental_arrival(spark, events, tmp_path):
    """Second availableNow drain after more files land emits exactly the
    new matches (checkpointed offsets, no duplicates)."""
    src = str(tmp_path / "events")
    out = str(tmp_path / "joined")
    ckpt = str(tmp_path / "ckpt")
    first = events.filter("event_id < 40")
    first.write.parquet(src)
    run_interval_join_stream(
        spark, src, src, events.schema, out, ckpt,
        opener_filter="event_type = 'error'", window="10 minutes",
    )
    n1 = spark.read.parquet(out).count()
    events.filter("event_id >= 40").write.mode("append").parquet(src)
    run_interval_join_stream(
        spark, src, src, events.schema, out, ckpt,
        opener_filter="event_type = 'error'", window="10 minutes",
    )
    got = _pairs(spark.read.parquet(out))
    assert len(got) > n1 > 0
    # every batch-side match whose BOTH endpoints were in the same drain
    # is present; no pair is emitted twice (set size == row count)
    assert len(got) == spark.read.parquet(out).count()
    batch_pairs = _pairs(
        interval_join_stream(
            events, events.filter("event_type = 'error'"), window="10 minutes"
        )
    )
    same_drain = {
        (p, o)
        for (p, o) in batch_pairs
        if (p < 40) == (o < 40)
    }
    assert same_drain <= got <= batch_pairs


def test_stream_plan_has_watermarks_both_sides(spark, events, tmp_path):
    src = str(tmp_path / "ev")
    events.write.parquet(src)
    s1 = spark.readStream.schema(events.schema).parquet(src)
    s2 = spark.readStream.schema(events.schema).parquet(src).filter(
        "event_type = 'error'"
    )
    joined = interval_join_stream(s1, s2, window="10 minutes")
    assert joined.isStreaming
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2, plan
