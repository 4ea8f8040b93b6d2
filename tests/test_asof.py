"""As-of join vs a driver-side oracle (most-recent right row at or
before each left timestamp, per key), including the equal-ts inclusive
tie rule and the no-match NULL case."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 10:00:00"),
            (2, 10, "2024-01-01 11:00:00"),
            (3, 10, "2024-01-01 09:00:00"),  # before any right row → NULL
            (4, 20, "2024-01-01 10:30:00"),
            (5, 30, "2024-01-01 10:00:00"),  # key with no right rows
        ],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            (10, "2024-01-01 09:30:00", 1.0),
            (10, "2024-01-01 10:00:00", 2.0),  # equal-ts → inclusive match
            (10, "2024-01-01 10:45:00", 3.0),
            (20, "2024-01-01 10:00:00", 9.0),
        ],
        "user_id long, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))

    out = {
        r.event_id: (r.v_asof, str(r.ts_asof))
        for r in asof_join(left, right, by=["user_id"]).collect()
    }
    assert out[1] == (2.0, "2024-01-01 10:00:00")  # inclusive at equal ts
    assert out[2] == (3.0, "2024-01-01 10:45:00")
    assert out[3] == (None, "None")
    assert out[4] == (9.0, "2024-01-01 10:00:00")
    assert out[5] == (None, "None")
    # left row count preserved (left-join semantics)
    assert len(out) == 5
