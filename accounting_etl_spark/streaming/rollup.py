"""Continuous rollup maintenance — hypertable-style incremental
aggregates over an append stream.

A 100 TB event table cannot re-aggregate from raw on every dashboard
query; the standard fix (TimescaleDB continuous aggregates, Druid
rollup segments) is a MATERIALIZED partial-aggregate table keyed on
(time bucket, dims), merged incrementally as data lands:

- each micro-batch aggregates map-side to (bucket, keys) PARTIALS —
  the only corpus-sized work, and it shrinks the batch by the rollup
  ratio before anything touches state;
- only the buckets the batch TOUCHES are read back and re-merged
  (watermarked streams bound late data, so the touched set per epoch
  is small and the state table is never rewritten end-to-end);
- merged buckets are written as immutable ``epoch=<id>/bucket=<b>``
  directories and a driver-side JSON MANIFEST maps each bucket to its
  live directory, swapped atomically (tmp + rename) — the snapshot-
  pointer discipline of ``streaming/ingest.py``;
- replays are safe the same two ways as the crawl sink: an epoch
  recorded in the manifest returns early (its swap committed before
  the streaming checkpoint), and an uncommitted replay rebuilds the
  epoch directories from the still-live previous state before
  re-swapping.

Only algebraic aggregates participate (sum/count/min/max — counts
re-merge by summing partials, the ``operators/salting.py`` kinds), so
a rollup row can also be re-aggregated upward to any coarser grain at
read time (:func:`serve`) without touching raw data.  Money sums
should be decimal-typed by the caller (functions/detsum.py): partial
merge reorders reduction and decimal is the order-independent type.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.salting import _MERGE, _PARTIAL

Aggs = list[tuple[str, str, str]]  # (out_name, kind, column)


def _manifest_path(state_dir: str) -> str:
    return os.path.join(state_dir, "_MANIFEST.json")


def _read_manifest(state_dir: str) -> dict:
    try:
        with open(_manifest_path(state_dir)) as f:
            return json.load(f)
    except OSError:
        return {"epochs": [], "buckets": {}}


def _swap_manifest(state_dir: str, manifest: dict) -> None:
    os.makedirs(state_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=state_dir, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(state_dir))


def rollup_partials(
    batch: DataFrame, bucket_col: str, keys: list[str], aggs: Aggs
) -> DataFrame:
    """Aggregate a batch to (bucket, keys) partial rows."""
    return batch.groupBy(bucket_col, *keys).agg(
        *[_PARTIAL[k](c).alias(name) for name, k, c in aggs]
    )


def _remerge(df: DataFrame, bucket_col: str, keys: list[str], aggs: Aggs):
    return df.groupBy(bucket_col, *keys).agg(
        *[_MERGE[k](name).alias(name) for name, k, _ in aggs]
    )


def merge_epoch(
    state_dir: str,
    batch: DataFrame,
    *,
    bucket_col: str,
    keys: list[str],
    aggs: Aggs,
    epoch_id: int,
) -> bool:
    """Merge one batch into the rollup state; returns False on a
    committed-replay early return.

    Crash windows: after the epoch directories are written but before
    the manifest swap, the old manifest is still live — a replay
    recomputes the SAME merge from the old state and overwrites the
    epoch directories it will then swap in.  After the swap, the epoch
    id is in the manifest and the replay returns early.  The merge
    never reads a directory it writes (reads go through the
    still-live manifest; writes land under a fresh ``epoch=<id>``)."""
    manifest = _read_manifest(state_dir)
    if epoch_id in manifest["epochs"]:
        return False
    partials = rollup_partials(batch, bucket_col, keys, aggs)
    spark = batch.sparkSession
    # touched buckets: bounded by the stream's watermark/lateness, one
    # row per bucket — a driver-side list by design (it keys the
    # manifest and the partition-pruned state read). Derived from the
    # RAW batch, not from ``partials`` (r11 optimization): the set of
    # buckets with >= 1 row is identical either way, but distinct over
    # one projected column lets column pruning reach the scan (guide
    # §6) instead of paying the (bucket × keys) aggregation a second
    # time — the merged write below is then the only full-width pass.
    touched = sorted(
        str(r[bucket_col]) for r in
        batch.select(bucket_col).distinct().collect()
    )
    if not touched:
        manifest["epochs"] = manifest["epochs"] + [epoch_id]
        _swap_manifest(state_dir, manifest)
        return True
    existing_paths = [
        manifest["buckets"][b] for b in touched if b in manifest["buckets"]
    ]
    merged = partials
    if existing_paths:
        prior = spark.read.parquet(*existing_paths).select(
            *[f.name for f in partials.schema.fields]
        )
        merged = _remerge(
            partials.unionByName(prior), bucket_col, keys, aggs
        )
        # pin the state schema to the single-level partials schema:
        # Spark widens decimal sums per merge level, and epoch
        # directories written at different depths would diverge (a
        # parquet type-mismatch on the next read). Casting back is the
        # fixed point; a genuine overflow of the original sum type is
        # out of contract (size the decimal for the corpus).
        merged = merged.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in partials.schema.fields
            ]
        )
    # one job writes every touched bucket: hive-partition on a derived
    # copy of the bucket column so the DATA column survives for
    # manifest-listed directory reads
    epoch_dir = os.path.join(state_dir, f"epoch={epoch_id:08d}")
    (
        merged.withColumn("__pb", F.col(bucket_col).cast("string"))
        .repartition(max(1, len(touched)), "__pb")
        .write.mode("overwrite")
        .partitionBy("__pb")
        .parquet(epoch_dir)
    )
    for b in touched:
        manifest["buckets"][b] = os.path.join(epoch_dir, f"__pb={b}")
    manifest["epochs"] = manifest["epochs"] + [epoch_id]
    _swap_manifest(state_dir, manifest)
    return True


def read_rollup(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Live rollup state: one partial-aggregate row per (bucket, keys).
    None before the first merge.

    Live buckets are grouped by their epoch directory and each epoch
    root is read ONCE with a partition-pruning ``__pb IN (...)``
    filter — one listed root per epoch instead of one root path per
    bucket (thousands of roots made the scan stage file-listing-bound;
    pruning reads the identical bytes)."""
    manifest = _read_manifest(state_dir)
    if not manifest["buckets"]:
        return None
    by_epoch: dict[str, list[str]] = {}
    for b, path in manifest["buckets"].items():
        by_epoch.setdefault(os.path.dirname(path), []).append(b)
    parts = []
    for epoch_dir in sorted(by_epoch):
        parts.append(
            spark.read.parquet(epoch_dir)
            .where(F.col("__pb").isin(sorted(by_epoch[epoch_dir])))
            .drop("__pb")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def serve(
    rollup: DataFrame, group_cols: list[str], aggs: Aggs
) -> DataFrame:
    """Final answer at any grain ≥ the rollup grain: re-merge partials
    grouped by ``group_cols`` (a subset of bucket+keys).  Never touches
    raw data — the point of maintaining the rollup."""
    return rollup.groupBy(*group_cols).agg(
        *[_MERGE[k](name).alias(name) for name, k, _ in aggs]
    )


def stream_rollup(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    *,
    bucket_col: str,
    keys: list[str],
    aggs: Aggs,
):
    """Wire :func:`merge_epoch` as an exactly-once foreachBatch sink
    (availableNow trigger; the caller awaits termination)."""

    def apply(batch: DataFrame, epoch_id: int) -> None:
        merge_epoch(
            state_dir,
            batch,
            bucket_col=bucket_col,
            keys=keys,
            aggs=aggs,
            epoch_id=epoch_id,
        )

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
