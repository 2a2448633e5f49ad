"""Training-data export: deterministically shuffled, token-bounded
shards — the last mile of a curation pipeline.

Trainers consume a corpus as a directory of shard files with (a) a
fixed, reproducible global order that is NOT the source order (source
runs — one crawl, one domain — must not cluster inside a shard), and
(b) a bounded token count per shard so data loaders can schedule
work. Both are dataflow problems, not driver loops:

- **Pseudo-shuffle**: order by ``xxhash64(id)`` — deterministic
  across reruns, partitionings, and engines, unlike an RNG
  ``orderBy(rand())`` (the same argument as functions/sampling.py).
- **Shard assignment**: shard = exclusive-prefix-tokens DIV
  shard_tokens over that shuffled order — the distributed prefix-sum
  again (operators/packing.py), so shard boundaries are exact integer
  math and no single-task global window exists in the plan.
- **Write**: ``partitionBy("shard")`` parquet or JSON-lines; each
  shard directory is one loader unit. ``maxRecordsPerFile`` splits
  pathological shards defensively.

The manifest (one row per shard: docs, tokens) is computed from the
same assignment — what a loader reads to plan an epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.packing import prefix_sum


def assign_shards(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    shard_tokens: int,
) -> DataFrame:
    """Add ``shard`` (0-based) under the deterministic pseudo-shuffle
    order. Assignment is by START offset: a document whose start falls
    mid-window shares its shard with the preceding smaller documents,
    so a shard holds at most ``shard_tokens`` of starts but can exceed
    ``shard_tokens`` by up to its last document's overhang (an
    oversized document therefore spans past its shard boundary rather
    than getting a private shard)."""
    shuffled_order = [F.xxhash64(F.col(id_col).cast("string")), F.col(id_col)]
    out = prefix_sum(
        docs,
        order_col=shuffled_order,
        value_col=size_col,
        out_col="__cum_tokens",
    )
    return (
        out.withColumn(
            "shard",
            F.expr(f"(__cum_tokens - {size_col}) div {shard_tokens}").cast(
                "int"
            ),
        )
        .drop("__cum_tokens")
    )


def export_training_shards(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    shard_tokens: int,
    fmt: str = "parquet",
    max_records_per_file: int | None = None,
) -> DataFrame:
    """Write ``docs`` as token-bounded shards under ``path`` and
    return the shard manifest (``shard, n_docs, n_tokens``), which is
    also written to ``<path>/_manifest``.

    ``fmt``: "parquet" or "json" (JSON-lines — the interchange format
    most loader stacks ingest).
    """
    if fmt not in ("parquet", "json"):
        raise ValueError(f"unknown format {fmt!r}")
    sharded = assign_shards(
        docs, id_col=id_col, size_col=size_col, shard_tokens=shard_tokens
    )
    # one shard = one token-bounded unit = one file: repartition on
    # the partition column so tasks don't each write into every shard
    # dir (maxRecordsPerFile still splits oversized shards)
    writer = (
        sharded.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    getattr(writer, fmt)(f"{path}/shards")
    manifest = (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(size_col).cast("bigint").alias("n_tokens"),
        )
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    return manifest
