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
  files. ``repartitionByRange`` + ``sortWithinPartitions``: one
  shuffle, and every output file covers a tight key range — verified
  by reading the parquet footers back in tests.
- **Z-order clustering** (:func:`write_zordered`) range-clusters on a
  Morton bit-interleave of several columns, so file pruning works on
  EVERY clustered dimension, not just the leading sort column — the
  layout Delta's ``OPTIMIZE ZORDER BY`` maintains, built from plain
  shift/and/or Catalyst expressions.
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


def zorder_key(cols: list[Column], *, bits: int = 21) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column into one BIGINT.  ``len(cols) * bits`` must stay ≤ 63.

    Columns must already be NON-NEGATIVE integers on comparable
    scales — for skewed or continuous columns, bucket to a bounded
    integer domain first (e.g. ``ntile`` or fixed-width buckets), the
    same pre-step Delta's ``OPTIMIZE ZORDER BY`` performs with its
    range-partition ids.  Pure shift/and/or column expressions —
    whole-stage codegen, no UDF."""
    d = len(cols)
    if d * bits > 63:
        raise ValueError(f"{d} cols x {bits} bits exceeds a signed int64")
    terms = []
    for ci, c in enumerate(cols):
        cc = c.cast("bigint")
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(cc, b).bitwiseAND(F.lit(1)),
                            b * d + ci)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def write_zordered(
    df: DataFrame,
    dst_path: str,
    *,
    cluster_cols: list[str],
    bits: int = 21,
    num_files: int | None = None,
    align: bool = True,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered on the Morton interleave of
    ``cluster_cols``: every output file covers a compact HYPER-BOX in
    the multi-column key space, so footer min/max stats prune files
    for predicates on ANY clustered column — the multi-dimensional
    generalization of :func:`write_clustered`, which only prunes on
    its leading sort column.  One shuffle (range partition on the z
    key); the key itself is dropped before writing.

    With ``align`` (default) the range key is the z value truncated to
    ``ceil(log2(num_files))`` leading bits — 2^k ALIGNED curve blocks.
    A range partitioner never splits equal keys across partitions, so
    every output file is a union of whole blocks and its bounding box
    stays quadrant-shaped even though the partition boundaries
    themselves come from sampling (unaligned, a sampled boundary can
    straddle a high-order curve split and blow a file's box up to the
    full domain in one dimension)."""
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    z = zorder_key([F.col(c) for c in cluster_cols], bits=bits)
    key = F.col("__z")
    if align:
        shift = max(0, len(cluster_cols) * bits - max(1, (n - 1).bit_length()))
        key = F.shiftright(F.col("__z"), shift)
    (
        df.withColumn("__z", z)
        .withColumn("__zk", key)
        .repartitionByRange(n, F.col("__zk"))
        .sortWithinPartitions("__z")
        .drop("__z", "__zk")
        .write.mode("overwrite")
        .format(fmt)
        .save(dst_path)
    )


def _local_path(p: str) -> str:
    u = urlparse(p)
    return u.path if u.scheme in ("file", "") else p
