"""Structured Streaming incremental pipeline + multimodal span ops."""

import pytest
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.operators.media import (
    extract_media_features,
    media_spans,
)
from named_architecture_entity_recognition_spark.streaming.stream import (
    read_documents_stream,
    stream_triples,
)
from named_architecture_entity_recognition_spark.synth import (
    synth_documents,
    synth_gazetteer,
)


@pytest.fixture(scope="module")
def docs(spark):
    return synth_documents(
        spark, 12, seed=11, gazetteer_size=20, sentences_lo=5,
        sentences_hi=20, media_ratio=0.5,
    )


def test_media_spans_extracted(docs):
    m = media_spans(docs)
    assert m.count() > 0
    kinds = {r.kind for r in m.select("kind").distinct().collect()}
    assert kinds <= {"image", "diagram"} and kinds


def test_media_features_deterministic(docs):
    f1 = extract_media_features(docs, dim=8)
    f2 = extract_media_features(docs.repartition(5), dim=8)
    a = {(r.media_ref): (r.width, r.height, tuple(r.embedding)) for r in f1.collect()}
    b = {(r.media_ref): (r.width, r.height, tuple(r.embedding)) for r in f2.collect()}
    assert a == b
    w, h, vec = next(iter(a.values()))
    assert 64 <= w <= 2048 and 64 <= h <= 2048 and len(vec) == 8


def test_media_real_decode_is_stubbed(docs):
    with pytest.raises(Exception):
        extract_media_features(docs, decode="real").collect()


def test_streaming_incremental_triples(spark, docs, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    gaz = synth_gazetteer(20)

    # batch 1: first 6 docs
    docs.filter(F.col("doc_id") < "doc0000000006").write.mode("append").parquet(src)
    stream = read_documents_stream(spark, src)
    stream_triples(stream, gaz, out, ckpt, available_now=True)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # batch 2: remaining docs arrive; only new ones are processed
    docs.filter(F.col("doc_id") >= "doc0000000006").write.mode("append").parquet(src)
    stream = read_documents_stream(spark, src)
    stream_triples(stream, gaz, out, ckpt, available_now=True)
    n2 = spark.read.parquet(out).count()
    assert n2 > n1

    # streamed total == batch total over the same docs
    from named_architecture_entity_recognition_spark.plans.pipeline import (
        RecognizerPipeline,
    )

    batch_n = RecognizerPipeline(gaz).triples(docs).count()
    assert n2 == batch_n


def test_windowed_event_counts_stream_matches_batch(spark, tmp_path):
    """Streaming windowed agg with watermark (availableNow drain) equals
    the same aggregation run in batch over closed windows."""
    import datetime as dt

    from pyspark.sql import functions as F

    from named_architecture_entity_recognition_spark.streaming.stream import (
        run_windowed_counts_stream,
        windowed_event_counts,
    )

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=i * 3), i % 4, "click" if i % 2 else "view",
         float(i))
        for i in range(40)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    src = str(tmp_path / "events")
    events.repartition(3).write.parquet(src)

    out = str(tmp_path / "agg")
    run_windowed_counts_stream(
        spark, src, out, str(tmp_path / "ckpt"), window="10 minutes",
        watermark="5 minutes",
    )
    got = spark.read.parquet(out)
    batch = windowed_event_counts(
        spark.read.parquet(src), window="10 minutes", watermark="5 minutes"
    )
    # the final (open) window is withheld by the watermark in streaming
    # append mode; every window the stream emitted must match batch
    j = got.join(
        batch.withColumnRenamed("n_events", "n_b").withColumnRenamed(
            "sum_value", "s_b"
        ),
        ["window_start", "window_end", "event_type"],
    )
    assert got.count() > 0
    assert j.count() == got.count()
    assert j.filter(
        (F.col("n_events") != F.col("n_b")) | (F.col("sum_value") != F.col("s_b"))
    ).count() == 0


def test_stateful_sessionization_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState session windows: every session the stream
    closes must match the batch window-function sessionization; the
    final (open) session per user stays in state."""
    import datetime as dt

    from named_architecture_entity_recognition_spark.streaming.sessions import (
        sessionize_batch,
        sessionize_stream,
    )

    base = dt.datetime(2026, 1, 1)
    rows = []
    for u in range(3):
        t = base + dt.timedelta(minutes=u)
        for s in range(3):
            for i in range(4):
                rows.append((u, t, float(u * 100 + s * 10 + i)))
                t += dt.timedelta(minutes=5)
            t += dt.timedelta(minutes=45)
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    ev.repartition(2).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        sessionize_stream(stream, watermark="10 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    batch = sessionize_batch(spark.read.parquet(src))
    assert got.count() == 6  # 2 closed + 1 still-open session per user
    assert batch.count() == 9
    # sum_value in the join key: stream-emitted sums (rounded to 4) must
    # equal the batch/oracle round(sum, 4) exactly, not just the window
    # boundaries (ADVICE r1)
    j = got.join(
        batch,
        ["user_id", "session_start", "session_end", "n_events", "sum_value"],
        "inner",
    )
    assert j.count() == got.count()


def test_dedup_stream_drops_duplicates_and_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps the first arrival per key and
    drops later duplicates; result matches the deterministic batch dedup
    (earliest event per key) because the file source feeds rows in
    event-time order."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from named_architecture_entity_recognition_spark.streaming.stream import (
        dedup_events_stream,
    )

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    # 3 keys x repeated arrivals, single input file so arrival order is
    # the row order we write (sorted by ts)
    rows = [
        (i, base + dt.timedelta(minutes=i), i % 3, "e", float(i))
        for i in range(12)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    src = str(tmp_path / "src")
    events.orderBy("ts").coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    deduped = dedup_events_stream(stream, keys=("user_id", "event_type"))
    out = str(tmp_path / "out")
    q = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.event_type): r.event_id
        for r in spark.read.parquet(out).collect()
    }

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    batch = {
        (r.user_id, r.event_type): r.event_id
        for r in events.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == batch
    assert len(got) == 3  # one survivor per key


def test_decode_ppm_gradient_comments_and_16bit():
    """The pure-numpy PPM parser handles comments, whitespace runs,
    non-solid rasters, and 2-byte samples."""
    import numpy as np
    import pytest

    from named_architecture_entity_recognition_spark.operators.media import (
        decode_ppm,
    )

    # gradient 4x2 with a comment and extra whitespace in the header
    px = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    buf = b"P6\n# a comment\n 4\t2\n255\n" + px.tobytes()
    w, h, got = decode_ppm(buf)
    assert (w, h) == (4, 2)
    assert (got == px).all()

    # 16-bit samples scale down to 8-bit by maxval
    px16 = np.array([[[65535, 0, 32768]]], dtype=">u2")
    buf16 = b"P6 1 1 65535\n" + px16.tobytes()
    w, h, got16 = decode_ppm(buf16)
    assert (w, h) == (1, 1)
    assert got16[0, 0, 0] == 255 and got16[0, 0, 1] == 0
    assert got16[0, 0, 2] == 32768 * 255 // 65535

    for bad in (b"", b"P5 1 1 255\x00\x00\x00", b"P6 2 2 255\nxx",
                b"P6 1 1 999999\n" + b"\x00" * 6):
        with pytest.raises(ValueError):
            decode_ppm(bad)


def test_extract_ppm_features_decodes_and_quarantines(spark):
    from named_architecture_entity_recognition_spark.operators.media import (
        extract_ppm_features,
        synth_ppm,
    )

    media = spark.createDataFrame(
        [
            ("d1", "m1", bytearray(synth_ppm(3, 2, (10, 20, 30)))),
            ("d2", "m2", bytearray(b"not an image")),
            ("d3", "m3", None),
        ],
        "doc_id string, media_ref string, media_bytes binary",
    )
    rows = {r.doc_id: r for r in extract_ppm_features(media).collect()}
    assert (rows["d1"].width, rows["d1"].height) == (3, 2)
    assert (rows["d1"].mean_r, rows["d1"].mean_g, rows["d1"].mean_b) == (
        10.0, 20.0, 30.0,
    )
    assert rows["d1"].error is None
    assert rows["d2"].error is not None and rows["d2"].width is None
    assert rows["d3"].error is not None


def test_resize_nn_and_thumbnails(spark):
    import numpy as np

    from named_architecture_entity_recognition_spark.operators.media import (
        extract_ppm_thumbnails,
        resize_nn,
        synth_ppm,
    )

    # 4x4 checkerboard downsampled to 2x2 picks the floor-grid corners
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[2:, 2:] = 255
    small = resize_nn(px, 2, 2)
    assert small.shape == (2, 2, 3)
    assert small[0, 0, 0] == 0 and small[1, 1, 0] == 255
    # upscale is deterministic too
    assert resize_nn(small, 4, 4).shape == (4, 4, 3)

    media = spark.createDataFrame(
        [("d1", "m1", bytearray(synth_ppm(4, 4, (255, 0, 128))))],
        "doc_id string, media_ref string, media_bytes binary",
    )
    row = extract_ppm_thumbnails(media, grid=2).collect()[0]
    assert len(row.thumb) == 12
    assert row.thumb[0] == 1.0 and row.thumb[1] == 0.0
    assert row.thumb[2] == 128 / 255


def test_fake_decode_is_md5_portable(spark):
    """Since r4 the fake decoder's features are md5-derived so DuckDB
    can recompute them (q_media_features is fully value-oracled). Pin
    the derivation here in pure Python: any drift in _fake_decode
    breaks the published formula the oracle relies on."""
    import hashlib

    from named_architecture_entity_recognition_spark.operators.media import (
        _fake_decode,
    )

    ref = "media://42"
    w, h, vec = _fake_decode(ref, 4)
    hd = hashlib.md5(ref.encode()).hexdigest()
    assert w == 64 + int(hd[0:4], 16) % 1984
    assert h == 64 + int(hd[4:8], 16) % 1984
    for i, v in enumerate(vec):
        u = int(hashlib.md5(f"{ref}:{i}".encode()).hexdigest()[:8], 16)
        expected = u / 4294967296.0 * 2.0 - 1.0
        assert abs(v - expected) < 2**-24  # one float32 rounding away
        assert -1.0 <= v < 1.0


def test_decode_wav_roundtrip_and_formats():
    """PCM16 WAV decoder inverts the synthetic generator and rejects
    malformed/unsupported input with ValueError (quarantine, not task
    death)."""
    import numpy as np
    import pytest

    from named_architecture_entity_recognition_spark.operators.media import (
        decode_wav,
        synth_wav,
    )

    sr, ch, s = decode_wav(synth_wav(16000, 10, 500, 2))
    assert (sr, ch) == (16000, 1)
    assert s.tolist() == [500, 500, -500, -500, 500, 500, -500, -500, 500, 500]

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"garbage")
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"")
    # non-PCM format code
    buf = bytearray(synth_wav(8000, 4, 100, 1))
    fmt_off = buf.find(b"fmt ") + 8
    buf[fmt_off:fmt_off + 2] = (3).to_bytes(2, "little")  # IEEE float
    with pytest.raises(ValueError, match="PCM only"):
        decode_wav(bytes(buf))
    # truncated data chunk (not whole frames)
    buf = synth_wav(8000, 4, 100, 1)
    with pytest.raises(ValueError):
        decode_wav(buf[:-1] if len(buf) % 2 == 0 else buf[:-2])
    # frame-ALIGNED truncation: the declared data size now overruns the
    # buffer; must quarantine, not silently decode fewer samples
    # (ADVICE r4 — media.py chunk-size bound)
    buf = synth_wav(8000, 4, 100, 1)
    with pytest.raises(ValueError, match="past end of file"):
        decode_wav(buf[:-2])
    # inflated declared data-chunk size likewise quarantines
    buf = bytearray(synth_wav(8000, 4, 100, 1))
    doff = buf.find(b"data") + 4
    buf[doff:doff + 4] = (10_000).to_bytes(4, "little")
    with pytest.raises(ValueError, match="past end of file"):
        decode_wav(bytes(buf))


def test_decode_wav_stereo_mono_mix():
    import numpy as np

    from named_architecture_entity_recognition_spark.operators.media import (
        decode_wav,
    )

    # hand-built 2-channel PCM16: frames (100, 200), (-100, -300)
    samples = np.array([100, 200, -100, -300], dtype="<i2").tobytes()
    hdr = b"RIFF" + (36 + len(samples)).to_bytes(4, "little") + b"WAVE"
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000 * 4).to_bytes(4, "little")
        + (4).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    buf = hdr + fmt + b"data" + len(samples).to_bytes(4, "little") + samples
    sr, ch, s = decode_wav(buf)
    assert (sr, ch) == (8000, 2)
    assert s.tolist() == [150, -200]


def test_extract_wav_features_quarantines_bad_clips(spark):
    from named_architecture_entity_recognition_spark.operators.media import (
        extract_wav_features,
        synth_wav,
    )

    media = spark.createDataFrame(
        [
            ("d1", "m1", bytearray(synth_wav(8000, 9, 1000, 2))),
            ("d2", "m2", bytearray(b"not audio")),
            ("d3", "m3", None),
        ],
        "doc_id string, media_ref string, media_bytes binary",
    )
    rows = {r.doc_id: r for r in extract_wav_features(media).collect()}
    ok = rows["d1"]
    assert ok.error is None and ok.sample_rate == 8000 and ok.n_samples == 9
    assert ok.rms == 1000.0 and ok.zero_crossings == (9 - 1) // 2
    assert rows["d2"].error is not None and rows["d2"].rms is None
    assert rows["d3"].error is not None
