"""Multimodal plumbing (mapInPandas over binary payloads) and
Structured Streaming (windowed aggregation, stateful sessionization)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    extract_media_features,
    frame_sample,
    synth_media,
)
from entity_resolution_pipeline_spark.streaming.windows import (
    EVENTS_SCHEMA,
    sessionize_batch,
    windowed_event_counts,
)


def test_media_features_schema_and_determinism(spark):
    media = synth_media(spark, 30)
    feats = extract_media_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows1 = {r.media_id: r for r in feats.collect()}
    rows2 = {r.media_id: r for r in extract_media_features(media).collect()}
    assert len(rows1) == 30
    for mid, r in rows1.items():
        assert r.width > 0 and r.height > 0
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-5  # L1-normalized histogram
        assert rows2[mid].feature == r.feature  # deterministic


def test_frame_sample_only_video(spark):
    media = synth_media(spark, 30)
    frames = frame_sample(media, every_n=10, max_frames=4)
    kinds = media.select("media_id", "kind").collect()
    video_ids = {r.media_id for r in kinds if r.kind == "video"}
    got = frames.select("media_id", "frame_index").collect()
    assert {r.media_id for r in got} == video_ids
    for r in got:
        assert r.frame_index % 10 == 0


def test_windowed_counts_streaming_equals_batch(spark, tmp_path):
    """file-source stream → memory sink must equal the batch twin."""
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:05:00", 1, "view", 1.0, "{}"),
            (2, "2024-01-01 10:55:00", 1, "view", 2.0, "{}"),
            (3, "2024-01-01 11:05:00", 2, "click", 3.0, "{}"),
            (4, "2024-01-01 12:30:00", 2, "view", 4.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    src = str(tmp_path / "events")
    events.write.parquet(src)

    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_counts(spark.read.parquet(src)).collect()
    }

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in spark.sql("select * from win_counts").collect()
        }
    finally:
        q.stop()
    assert got == batch


def test_sessionize_batch_boundaries(spark):
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 7, "view", 0.0, "{}"),
            (2, "2024-01-01 10:10:00", 7, "view", 0.0, "{}"),
            (3, "2024-01-01 11:30:00", 7, "view", 0.0, "{}"),  # > 30min gap
            (4, "2024-01-01 10:00:00", 8, "view", 0.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = sorted(
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in sessionize_batch(events, gap_seconds=1800).collect()
    )
    assert got == [
        (7, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2),
        (7, "2024-01-01 11:30:00", "2024-01-01 11:30:00", 1),
        (8, "2024-01-01 10:00:00", "2024-01-01 10:00:00", 1),
    ]


def test_sessionize_streaming_closes_sessions(spark, tmp_path):
    """applyInPandasWithState: sessions separated by > gap within one
    batch are emitted; the trailing open session stays in state."""
    from entity_resolution_pipeline_spark.streaming.windows import sessionize

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 7, "view", 0.0, "{}"),
            (2, "2024-01-01 10:10:00", 7, "view", 0.0, "{}"),
            (3, "2024-01-01 11:30:00", 7, "view", 0.0, "{}"),
            (4, "2024-01-01 13:00:00", 7, "view", 0.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    src = str(tmp_path / "sess_events")
    events.write.parquet(src)

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        sessionize(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
            for r in spark.sql("select * from sessions").collect()
        )
    finally:
        q.stop()
    # two closed sessions emitted; the 13:00 session is still open in state
    assert got == [
        (7, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2),
        (7, "2024-01-01 11:30:00", "2024-01-01 11:30:00", 1),
    ]


def test_sessionize_streaming_late_event_parity(spark, tmp_path):
    """A within-watermark late event delivered in a second micro-batch
    must fold into the open session (ADVICE r1: the old kernel moved
    `last` backwards, so the next in-order event measured its gap
    against the late epoch and spuriously split).  Emitted sessions must
    match sessionize_batch over the same events."""
    from entity_resolution_pipeline_spark.streaming.windows import sessionize

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))

    b1 = mk(
        [
            (1, "2024-01-01 10:00:00", 7, "view", 0.0, "{}"),
            (2, "2024-01-01 10:25:00", 7, "view", 0.0, "{}"),
        ]
    )
    # 10:05 is LATE (before batch-1's 10:25) but within the 2h watermark;
    # 10:45 is 20min after the true session end 10:25 (no split) but
    # 40min after the late 10:05 (the buggy kernel split here)
    b2 = mk(
        [
            (3, "2024-01-01 10:05:00", 7, "view", 0.0, "{}"),
            (4, "2024-01-01 10:45:00", 7, "view", 0.0, "{}"),
        ]
    )
    # far-future event: closes the open session so it is emitted
    b3 = mk([(5, "2024-01-01 14:00:00", 7, "view", 0.0, "{}")])

    src = str(tmp_path / "late_events")
    b1.write.mode("append").parquet(src)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        sessionize(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        b2.write.mode("append").parquet(src)
        q.processAllAvailable()
        b3.write.mode("append").parquet(src)
        q.processAllAvailable()
        got = sorted(
            (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
            for r in spark.sql("select * from late_sessions").collect()
        )
    finally:
        q.stop()

    batch_twin = sorted(
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in sessionize_batch(
            b1.unionByName(b2).unionByName(b3), gap_seconds=1800
        ).collect()
    )
    # every emitted (closed) session agrees with the batch twin; the
    # 14:00 session is still open in state, hence not emitted
    assert got == [(7, "2024-01-01 10:00:00", "2024-01-01 10:45:00", 4)]
    assert got == batch_twin[:-1]


def test_real_codecs_roundtrip():
    """T14 real decode (r2 VERDICT #4): BMP/PPM/WAV parsed from actual
    container bytes — row padding, bottom-up vs top-down storage, BGR
    order, PPM comments, RIFF chunk walk, stereo interleave."""
    import numpy as np
    import pytest

    from entity_resolution_pipeline_spark.operators.multimodal import (
        decode_bmp,
        decode_ppm,
        decode_wav,
        encode_bmp,
        encode_wav,
        real_decode,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)  # stride 20, 2 pad bytes
    for top_down in (False, True):
        w, h, out = decode_bmp(encode_bmp(img, top_down=top_down))
        assert (w, h) == (6, 5)
        assert np.array_equal(out, img)
    ppm = b"P6\n# a comment\n6 5\n255\n" + img.tobytes()
    w, h, out = decode_ppm(ppm)
    assert (w, h) == (6, 5) and np.array_equal(out, img)
    s = rng.integers(-32768, 32768, (100, 2)).astype(np.int16)
    rate, ch, out = decode_wav(encode_wav(s, 44100))
    assert (rate, ch) == (44100, 2) and np.array_equal(out, s)
    # compressed formats still fail loudly (no codecs in this container)
    with pytest.raises((NotImplementedError, Exception)):
        real_decode(b"\xff\xd8\xff\xe0JFIF-not-really", "image")


def test_extract_media_features_real_decoder(spark):
    """extract_media_features(decoder=real_decode) over real BMP/WAV
    payloads: dims come from parsed headers, features from decoded
    pixel/sample values (header bytes excluded)."""
    import hashlib

    import numpy as np

    from entity_resolution_pipeline_spark.operators.multimodal import (
        extract_media_features,
        real_decode,
        synth_real_media,
    )

    feats = {
        r.media_id: r
        for r in extract_media_features(
            synth_real_media(spark, 8), decoder=real_decode
        ).collect()
    }
    assert len(feats) == 8
    # even ids: 8x8 BMP; histogram equals the known pixel-stream formula
    stream = np.frombuffer(
        (hashlib.md5(b"2").hexdigest() * 6).encode(), np.uint8
    )
    exp = np.bincount(stream >> 5, minlength=8) / 192
    got = feats[2]
    assert (got.kind, got.width, got.height) == ("image", 8, 8)
    assert np.allclose(got.feature, exp, atol=1e-6)
    # odd ids: 64-frame mono WAV; histogram from the sample formula
    i = np.arange(64, dtype=np.int64)
    exp = np.bincount(((3 * 31 + i * 2654435761) % 65536) // 8192, minlength=8) / 64
    got = feats[3]
    assert (got.kind, got.width, got.height) == ("audio", 64, 1)
    assert np.allclose(got.feature, exp, atol=1e-6)
