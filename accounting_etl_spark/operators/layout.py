"""Data-layout maintenance: small-file compaction and range-clustered
writes.

At 100 TB the table LAYOUT is a first-class performance surface:

- **Small files** (streaming micro-batches, over-parallel writers)
  multiply scan-planning and open costs; periodic compaction rewrites
  a table into ~target-sized files. File count is derived from the
  table's actual on-disk bytes (``df.inputFiles()`` + filesystem
  sizes — driver-side metadata only, never data).
- **Range clustering** sorts data into files whose min/max column
  ranges are disjoint, so parquet row-group statistics (and partition-
  level file pruning in table formats) let a filtered scan skip whole
  files. ``repartitionByRange`` + ``sortWithinPartitions`` is the
  Spark-native Z-order-lite: one shuffle, and every output file covers
  a tight key range — verified by reading the parquet footers back in
  tests.
"""

from __future__ import annotations

from urllib.parse import urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_bytes(df: DataFrame) -> int:
    """Total on-disk bytes behind a file-backed DataFrame, from the
    driver-side file index (no data read)."""
    jvm = df.sparkSession._jvm
    jsc = df.sparkSession._jsc
    conf = jsc.hadoopConfiguration()
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(conf)
        total += fs.getFileStatus(p).getLen()
    return total


def compact(
    df: DataFrame,
    dst_path: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Rewrite ``df`` (file-backed) as ~``target_bytes`` files under
    ``dst_path``; returns the file count chosen.

    Sizing uses the SOURCE's compressed bytes — the honest estimator a
    compaction job has without sampling the rewrite. ``repartition``
    (round-robin) balances rows; use :func:`write_clustered` instead
    when a sort order should survive the rewrite.
    """
    src = table_bytes(df)
    n = max(1, -(-src // target_bytes))
    getattr(df.repartition(n).write.mode("overwrite"), fmt)(dst_path)
    return n


def write_clustered(
    df: DataFrame,
    dst_path: str,
    *,
    cluster_cols: list[str],
    num_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` range-clustered on ``cluster_cols``: each output
    file covers a disjoint key range (parquet footer min/max prove it
    — tests read them back), so predicate scans skip whole files."""
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .format(fmt)
        .save(dst_path)
    )


def _local_path(p: str) -> str:
    u = urlparse(p)
    return u.path if u.scheme in ("file", "") else p
