"""Anchor-based row clustering (A1, reference-exact variant).

The reference clusters sorted words into rows by comparing each
word's ``top`` to the FIRST word of the current cluster (the anchor),
not to the previous word (pdf_parser.py:267-279):

    data_words.sort(key=(top, x0))
    new row when |top - anchor_top| >= 3, anchor := that word's top

Anchor semantics are inherently sequential per group (a prefix scan
with a data-dependent reset), so they are expressed as an Arrow-
batched ``applyInPandas`` per (path, page) — each PDF page is a small
independent group, so the shuffle is narrow and the per-group work is
O(words-on-page). The lag-based general form (operators/sessionize.py)
differs only on chained-jitter inputs where consecutive gaps stay
< 3pt while drift from the anchor exceeds it (tests/test_statement.py
covers the divergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def cluster_rows_anchor(
    df: DataFrame,
    *,
    partition_cols: tuple[str, ...] = ("path", "page"),
    top_col: str = "top",
    order_cols: tuple[str, ...] = ("top", "x0", "text"),
    gap: float = 3.0,
    row_col: str = "row_id",
) -> DataFrame:
    """Assign ``row_col`` per partition using anchor-gap clustering."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(row_col, T.LongType(), False)]
    )
    order = list(order_cols)

    def assign(pdf):
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        ids = []
        anchor = None
        rid = -1
        for t in pdf[top_col]:
            if anchor is None or abs(t - anchor) >= gap:
                rid += 1
                anchor = t
            ids.append(rid)
        pdf[row_col] = ids
        return pdf

    return df.groupBy(*partition_cols).applyInPandas(assign, out_schema)
