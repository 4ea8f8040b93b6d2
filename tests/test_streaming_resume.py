"""Streaming checkpoint/resume: a windowed aggregation over a file
source must survive a query restart — the streaming twin of the
pipeline's stage-checkpoint resumability (north rule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.streaming.windows import (
    EVENTS_SCHEMA,
    windowed_event_counts,
)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_windowed_agg_survives_restart(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")

    batch1 = _mk_events(
        spark,
        [
            (1, "2024-01-01 10:05:00", 1, "view", 1.0, "{}"),
            (2, "2024-01-01 10:25:00", 1, "view", 2.0, "{}"),
        ],
    )
    batch1.write.mode("append").parquet(src)

    def start():
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
        agg = windowed_event_counts(stream, watermark="10 minutes")
        return (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # restart from the checkpoint with a new late-window batch appended
    batch2 = _mk_events(
        spark,
        [
            (3, "2024-01-01 12:05:00", 2, "view", 5.0, "{}"),
            (4, "2024-01-01 12:45:00", 2, "click", 7.0, "{}"),
        ],
    )
    batch2.write.mode("append").parquet(src)

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # append-mode parquet sink emits each finalized window exactly once
    # across the restart (checkpoint replays no batch)
    result = spark.read.schema(
        "window_start timestamp, event_type string, n_events long, sum_value double"
    ).parquet(out)
    rows = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in result.collect()
    }
    # the 10:00 window (2 events) was finalized by the 12:xx watermark
    # advance after restart; no duplicates
    assert rows.get(("2024-01-01 10:00:00", "view")) == (2, 3.0)
    assert len(rows) == len(result.collect())
