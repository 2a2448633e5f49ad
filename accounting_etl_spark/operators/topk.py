"""Top-k per group (W2 'first-match pick', generalized).

The deterministic form of the reference's ``fetchone`` / first-header
pick (database.py:97,114; pdf_parser.py:198-203): rank within the
group under a total order and keep the first k. One shuffle on the
group keys; with AQE skew-join handling this holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_by: list[Column],
    k: int,
    *,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the top ``k`` rows per group; emits ``rank_col`` (1-based)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def topk_per_group_staged(
    df: DataFrame,
    partition_cols: list[str],
    order_by: list[Column],
    k: int,
    *,
    rank_col: str = "rn",
) -> DataFrame:
    """Two-phase top-k for LOW-cardinality groups (e.g. 3 retrieval
    queries ranking a whole corpus): a per-input-partition local top-k
    prunes to ``k × n_partitions`` rows BEFORE the per-group window, so
    the final single-task-per-group sort never funnels the corpus into
    a handful of window tasks.  Requires ``order_by`` to be a total
    order (include a unique tiebreak column) — otherwise the local
    prune could keep a different tied row than the one-phase form.
    """
    w_local = Window.partitionBy(*partition_cols, "__pid").orderBy(*order_by)
    pruned = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .drop("__lr", "__pid")
    )
    return topk_per_group(pruned, partition_cols, order_by, k, rank_col=rank_col)
