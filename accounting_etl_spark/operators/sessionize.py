"""Gap-based sessionization (A1/W1 generalized).

The reference clusters PDF words into rows by vertical gap
(pdf_parser.py:228-281). Generalized, that is a session window over
any ordered numeric/time axis: a new session starts when the gap from
the previous element is >= ``gap``. Expressed as the classic
lag → flag → running-sum idiom — one shuffle on the partition keys,
then narrow window computation; scales to 100 TB because state is
per-partition and streaming-friendly (`session_window` is the
Structured Streaming twin, streaming/windows.py).

Note: the reference's *row clustering* anchors the gap test at the
cluster's FIRST element (pdf_parser.py:267-279), not the previous
one; that variant is sequential per group and lives in
plans/statement.py as an applyInPandas step. This operator is the
general lag-based form used for event sessionization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    gap: float,
    *,
    tiebreak_cols: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a 0-based ``session_col`` per partition by gap >= ``gap``.

    ``order_col`` must be numeric (cast timestamps to epoch seconds
    first); ``tiebreak_cols`` fixes a total order so session ids are
    deterministic under equal order keys (SURVEY §7 watch list).
    """
    order_by: list[Column] = [F.col(order_col)]
    for c in tiebreak_cols or []:
        order_by.append(F.col(c))
    w = Window.partitionBy(*partition_cols).orderBy(*order_by)
    prev = F.lag(order_col).over(w)
    is_new = F.when(
        prev.isNull() | ((F.col(order_col) - prev) >= F.lit(gap)), 1
    ).otherwise(0)
    return df.withColumn(
        session_col, (F.sum(is_new).over(w) - F.lit(1)).cast("bigint")
    )
