"""Stream-stream joins (SURVEY §2.9 extension surface).

Inner join of a stream with itself under a time-range constraint:
event pairs from the same user within ``window``. Both sides carry
watermarks so Spark can bound the join state — without the time
constraint + watermarks a stream-stream join would buffer forever;
with them, state older than (watermark - window) is evicted each
micro-batch. That state-eviction contract is what makes this runnable
over an unbounded 100 TB stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_event_pairs(
    events: DataFrame,
    *,
    window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Forward pairs (a.ts <= b.ts <= a.ts + window) per user."""
    left = (
        events.select("user_id", "event_id", "ts")
        .withColumnRenamed("event_id", "id_a")
        .withColumnRenamed("ts", "ts_a")
        .withWatermark("ts_a", watermark)
    )
    right = (
        events.select(
            F.col("user_id").alias("user_id_b"),
            F.col("event_id").alias("id_b"),
            F.col("ts").alias("ts_b"),
        ).withWatermark("ts_b", watermark)
    )
    return left.join(
        right,
        F.expr(
            f"""
            user_id = user_id_b
            AND id_a < id_b
            AND ts_b >= ts_a
            AND ts_b <= ts_a + INTERVAL {window}
            """
        ),
    ).select(
        "user_id",
        "id_a",
        "id_b",
        F.expr("CAST((unix_micros(ts_b) - unix_micros(ts_a)) DIV 1000000 AS BIGINT)").alias(
            "dt_s"
        ),
    )
