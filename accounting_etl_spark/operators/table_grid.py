"""Words → table cell grid (S4, reference pdf_parser.py:398-437).

The reference gets its chart-of-accounts tables from pdfplumber's
``extract_tables()``. Re-expressed over the positional word stream
(any extractor — pdfplumber or the built-in PDF engine): rows come
from the same anchor-gap clustering the statement parser uses, tables
split on large vertical gaps between rows, columns come from
gap-clustering the word x0 starts, and each cell is its words joined
in reading order. Everything after the row clustering is native
DataFrame ops — one narrow shuffle keyed (path, page), then
aggregation; no driver-side geometry.

Output matches the COA pipeline's input contract
(plans/fixtures.py COA_DDL): (path, page, table_idx, row_idx,
cells array<string>) with one entry per detected column, null for
cells the row leaves empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cluster import cluster_rows_anchor
from .sessionize import sessionize


def words_to_cells(
    words: DataFrame,
    *,
    row_gap: float = 3.0,
    table_gap: float = 18.0,
    min_col_frac: float = 0.5,
) -> DataFrame:
    """(path, page, text, x0, x1, top, bottom) → cell-grid rows.

    ``table_gap``: a vertical gap >= this between consecutive row
    anchors starts a new table on the page. ``min_col_frac``: an x0
    bin must recur in at least this fraction of the table's rows
    (and >= 2 rows) to count as a column anchor.
    """
    rows = cluster_rows_anchor(words, gap=row_gap, row_col="_r")

    # table split: one record per row cluster (its anchor top),
    # sessionized on the vertical axis with the coarser table gap
    anchors = rows.groupBy("path", "page", "_r").agg(
        F.min("top").alias("_anchor")
    )
    tables = sessionize(
        anchors, ["path", "page"], "_anchor", table_gap,
        tiebreak_cols=["_r"], session_col="table_idx",
    ).select("path", "page", "_r", "table_idx")
    rows = rows.join(tables, ["path", "page", "_r"])

    # column anchors per table: x0 bins that repeat across rows are
    # true column starts; continuation words of multi-word cells start
    # at row-dependent x and never recur, so they fall out of the
    # histogram. Each word then maps to the nearest anchor at or left
    # of its x0 — all native ops, anchor arrays are per-table tiny.
    binned = rows.withColumn(
        "_xbin", (F.round(F.col("x0") / 2) * 2).cast("double")
    )
    counts = binned.groupBy("path", "page", "table_idx", "_xbin").agg(
        F.count_distinct("_r").alias("_rows_with")
    )
    n_rows = rows.groupBy("path", "page", "table_idx").agg(
        F.count_distinct("_r").alias("_n")
    )
    starts = (
        counts.join(n_rows, ["path", "page", "table_idx"])
        .filter(
            # strict majority: floor(n*frac)+1 — a bin shared by only
            # half the rows (e.g. one header word coincidentally
            # aligned with one data word) is not a column
            F.col("_rows_with")
            >= F.greatest(
                F.lit(2),
                F.floor(F.col("_n") * F.lit(min_col_frac)) + F.lit(1),
            )
        )
        .groupBy("path", "page", "table_idx")
        .agg(F.array_sort(F.collect_list("_xbin")).alias("_starts"))
    )
    cells_words = (
        binned.join(starts, ["path", "page", "table_idx"])
        .withColumn(
            "col_idx",
            F.greatest(
                F.lit(0),
                F.size(
                    F.filter(
                        "_starts", lambda s: s <= F.col("x0") + F.lit(2.0)
                    )
                )
                - F.lit(1),
            ).cast("bigint"),
        )
    )

    # cell text: words of one (row, col) joined in x order
    cell = (
        cells_words.groupBy("path", "page", "table_idx", "_r", "col_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("x0", "text"))
                    ),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("cell_text"),
            F.min("top").alias("_cell_top"),
        )
    )

    # row_idx: rank of the row cluster within its table; cells array:
    # one slot per column of the TABLE (null where the row is empty)
    n_cols = Window.partitionBy("path", "page", "table_idx")
    row_rank = (
        cell.groupBy("path", "page", "table_idx", "_r")
        .agg(
            F.min("_cell_top").alias("_row_top"),
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct("col_idx", "cell_text"))
                )
            ).alias("_by_col"),
        )
        .withColumn("_max_col", F.max(
            F.array_max(F.map_keys("_by_col"))
        ).over(n_cols))
    )
    w = Window.partitionBy("path", "page", "table_idx").orderBy(
        "_row_top", "_r"
    )
    return (
        row_rank.withColumn(
            "row_idx", F.row_number().over(w) - F.lit(1)
        )
        .withColumn(
            "cells",
            F.transform(
                F.sequence(F.lit(0), F.col("_max_col")),
                lambda c: F.col("_by_col")[c],
            ),
        )
        .select(
            "path", "page", "table_idx",
            F.col("row_idx").cast("int").alias("row_idx"), "cells",
        )
    )
