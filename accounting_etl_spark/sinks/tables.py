"""Distributed table sinks: partitioned and bucketed parquet layout.

The 100 TB layout rules this encodes:
- partition by a low-cardinality pruning key (e.g. ``ingest_month``,
  K3) so queries touch only relevant directories;
- cap file sizes via ``maxRecordsPerFile`` — many ~128 MB files, not
  one giant or thousands of tiny ones;
- bucket fact tables by their dominant join/agg key so later joins
  between co-bucketed tables skip the shuffle entirely (Spark reads
  bucket i of both sides into the same task). Bucketing requires
  ``saveAsTable`` (layout metadata lives in the catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str],
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: str,
    n_buckets: int = 32,
    path: str | None = None,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table; joins between tables bucketed on the
    same key with the same bucket count are shuffle-free."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on)
