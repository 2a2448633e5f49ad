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
