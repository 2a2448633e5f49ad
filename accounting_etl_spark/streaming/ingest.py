"""Incremental ingestion (SURVEY §2.9 T1-T3) — the Spark form of the
reference's mailbox poller (email_fetcher.py:27-98).

Reference contract → Structured Streaming mapping:
- poll + land only new attachments (skip-if-exists,
  email_fetcher.py:87-90) → streaming file source with checkpointed
  exactly-once file tracking, plus ``dropDuplicates`` on the landing
  key under a watermark for at-least-once landers;
- 30-day lookback (email_fetcher.py:38-42) → event-time filter +
  watermark;
- landing layout ``downloads/YYYY-MM/<name>`` (email_fetcher.py:71-74)
  → ``partitionBy(ingest_month)``;
- the dimension upsert becomes ``foreachBatch`` → merge_upsert, the
  exactly-once sink pattern (each epoch applies one idempotent MERGE).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.upsert import merge_upsert

LANDING_SCHEMA = (
    "filename string, subject string, sender string, "
    "received_at timestamp, size_bytes bigint"
)


def read_landing_stream(
    spark: SparkSession,
    landing_dir: str,
    *,
    schema: str = LANDING_SCHEMA,
    lookback_days: int = 30,
    watermark: str = "1 day",
    dedup_within_watermark: bool = False,
) -> DataFrame:
    """Streaming scan of landed attachment metadata with the
    reference's subject/extension/recency predicates (P9-P11) and
    exactly-once dedup on the landing key (O6/T1).

    ``dedup_within_watermark=True`` switches to
    ``dropDuplicatesWithinWatermark``: duplicate keys are only
    suppressed while they can still arrive (inside the watermark
    delay) and their state is EVICTED once the watermark passes —
    bounded state, the 100 TB posture. The default ``dropDuplicates``
    keeps every key forever (exact, but state grows with the key
    cardinality); use it when the landing key space is small (the
    reference's single-mailbox case).
    """
    raw = spark.readStream.schema(schema).json(landing_dir)
    filtered = (
        raw.filter(F.lower("filename").endswith(".pdf"))
        .filter(
            F.lower("subject").rlike("statement|credit card|mastercard")
        )
        .filter(
            F.col("received_at")
            >= F.date_sub(F.current_date(), lookback_days).cast("timestamp")
        )
        .withColumn("ingest_month", F.date_format("received_at", "yyyy-MM"))
        .withWatermark("received_at", watermark)
    )
    if dedup_within_watermark:
        return filtered.dropDuplicatesWithinWatermark(["filename"])
    return filtered.dropDuplicates(["filename"])


def land_partitioned(stream: DataFrame, out_dir: str, checkpoint: str):
    """K3: month-partitioned landing sink (exactly-once by checkpoint)."""
    return (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .partitionBy("ingest_month")
        .trigger(availableNow=True)
        .start()
    )


def _current_marker(dim_path: str) -> str:
    return os.path.join(dim_path, "_CURRENT")


def read_dim(spark: SparkSession, dim_path: str) -> DataFrame | None:
    """Read the live snapshot of a versioned dim (None before the
    first upsert). The dim directory holds immutable ``v-*`` parquet
    snapshots plus a ``_CURRENT`` pointer file naming the live one."""
    try:
        with open(_current_marker(dim_path)) as f:
            version = f.read().strip()
    except OSError:
        return None
    return spark.read.parquet(os.path.join(dim_path, version))


def foreach_batch_upsert(
    dim_path: str,
    *,
    key: str,
    set_cols: list[str],
    batch_ts_fn: Callable[[int], str] | None = None,
    keep_versions: int = 2,
) -> Callable[[DataFrame, int], None]:
    """K2 as a streaming sink: MERGE each micro-batch into a parquet
    dim. Idempotent per epoch (deterministic batch_ts from epoch id),
    the foreachBatch exactly-once pattern.

    The merge output is written distributed-side to a STAGING
    directory (``v-<epoch>.staging``), renamed into the immutable
    snapshot slot (``v-<epoch>``), then the ``_CURRENT`` pointer is
    swapped atomically (tmp file + rename) — the dim never round-trips
    through driver memory and a crash between write and swap leaves
    the previous snapshot live (readers go through ``read_dim``).

    foreachBatch is at-least-once, so the same epoch can replay after
    a crash. Two guards make that safe:

    * if ``_CURRENT`` already names ``v-<epoch>`` the epoch committed
      fully before the streaming checkpoint did — the merge is
      deterministic, so the replay returns early instead of reading
      the snapshot it would be overwriting (self-overwrite is a Spark
      error and a correctness hazard);
    * otherwise the merge reads from the *previous* snapshot and
      writes to the staging dir, never the directory being read, so a
      replay that raced a partial prior attempt just rebuilds staging.

    Old snapshots beyond ``keep_versions`` (and orphaned staging dirs)
    are pruned after the swap. On a real cluster the same pattern runs
    on the Hadoop FileSystem API (rename is atomic on HDFS) or is
    replaced wholesale by Delta ``MERGE INTO`` (operators/upsert.py
    docstring) — jars absent in this container.
    """

    def apply(batch: DataFrame, epoch_id: int) -> None:
        if not batch.take(1):
            return
        version = f"v-{epoch_id:08d}"
        marker = _current_marker(dim_path)
        try:
            with open(marker) as f:
                committed = f.read().strip()
        except OSError:
            committed = None
        if committed == version:
            # Replay of a fully-committed epoch (pointer swapped, but
            # the streaming checkpoint commit never landed). The merge
            # is deterministic per epoch — nothing to redo, and
            # re-running would read dim_path/v-<epoch> while writing
            # to it. No-op.
            return
        spark = batch.sparkSession
        ts = (
            batch_ts_fn(epoch_id)
            if batch_ts_fn
            else f"epoch-{epoch_id:08d}"
        )
        dim = read_dim(spark, dim_path)
        if dim is None:  # first epoch: empty dim with update schema
            dim = batch.select(
                key, *set_cols,
                F.lit(None).cast("string").alias("created_at"),
                F.lit(None).cast("string").alias("updated_at"),
            ).limit(0)
        merged = merge_upsert(
            dim,
            batch.select(key, *set_cols),
            key=key,
            set_cols=set_cols,
            batch_ts=ts,
        )
        staging = os.path.join(dim_path, version + ".staging")
        merged.write.mode("overwrite").parquet(staging)
        final = os.path.join(dim_path, version)
        shutil.rmtree(final, ignore_errors=True)  # partial prior attempt
        os.replace(staging, final)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, marker)  # atomic pointer swap
        versions = sorted(
            d
            for d in os.listdir(dim_path)
            if d.startswith("v-") and not d.endswith(".staging")
        )
        for stale in versions[:-keep_versions]:
            shutil.rmtree(os.path.join(dim_path, stale), ignore_errors=True)
        for orphan in os.listdir(dim_path):
            if orphan.endswith(".staging"):
                shutil.rmtree(
                    os.path.join(dim_path, orphan), ignore_errors=True
                )

    return apply
