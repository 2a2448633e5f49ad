"""Structured Streaming twins of the batch event-window queries
(SURVEY §2.9 T4): tumbling/sliding/session windows with watermarks.

The batch forms in queries/events.py are the oracle-checked
semantics; these run the same logical aggregations as streams. The
driver test tables are finite parquet, so tests drive them through a
memory sink with ``processAllAvailable()`` (synchronous completion)
and compare against the batch results.

Late-data contract (T2): ``withWatermark`` bounds state; in append
mode a window/session only emits once the watermark passes its end,
so the trailing window per key stays open on a finite stream — the
tests assert emitted ⊆ batch accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events table (file source, T1 shape).

    A file stream needs an explicit schema; rather than hard-coding one
    encoding of ``ts`` (the driver fixtures have shipped both INT64
    nanos and ``timestamp[us]``), peek at the batch read's schema —
    schema inference only, no data scan — and normalize through the
    same :func:`~accounting_etl_spark.sources.tables.normalize_events`
    helper as the batch loader so the two cannot drift.
    """
    from accounting_etl_spark.sources.tables import normalize_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_events(raw)


def tumbling_counts(
    events: DataFrame,
    *,
    window: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming tumbling-window counts per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_counts(
    events: DataFrame,
    *,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sliding-window counts per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n",
        )
    )


def session_counts(
    events: DataFrame,
    *,
    gap: str = "4 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming session windows per user (native session_window —
    the Structured Streaming twin of operators/sessionize.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "session_value"
            ),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("session_start_s"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def run_to_memory(df: DataFrame, name: str, *, mode: str = "append"):
    """Drive a finite streaming query to completion into a memory sink.

    Returns the started query after ``processAllAvailable()``; caller
    reads ``spark.sql(f"SELECT * FROM {name}")`` and must stop it.
    """
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    return q
